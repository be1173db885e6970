from .mesh import make_mesh, t3_param_spec, flow_param_spec, MeshAxes
