from .mesh import make_mesh, t3_param_spec, flow_param_spec, MeshAxes
from .serve import (make_dp_mesh, make_tp_mesh, make_dp_tp_mesh,
                    shard_generation_inputs, shard_t3_for_decode,
                    shard_t3_for_serving, replicate)
from .sp import make_sp_mesh, sp_generate_mel, SeqComm
