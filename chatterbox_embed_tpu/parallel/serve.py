"""Multi-chip batched inference: shard the utterance batch over a dp mesh.

The reference's only scale-out is process-per-GPU via Redis (SURVEY.md §2.6).
Here a single jitted decode/synthesis program spans chips: the CFG-paired
batch rows are placed across `dp` and GSPMD partitions every per-row op;
weights replicate (0.5B fits each chip), so NO collectives run in the decode
loop — perfect weak scaling over ICI-connected chips.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("dp",))


def make_tp_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Tensor-parallel mesh for latency-bound single-utterance decode: the
    0.5B backbone's per-step cost is weight streaming (~1.06 GB bf16), so
    splitting q/k/v/gate/up column-wise and o/down row-wise over tp divides
    the streamed bytes per chip; XLA inserts the two psums per layer over
    ICI. tp must divide num_heads (16): 2, 4, 8 or 16."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("tp",))


def make_dp_tp_mesh(n_devices: Optional[int] = None,
                    tp: Optional[int] = None) -> Mesh:
    """Combined serving mesh: utterance rows shard over `dp`, the T3
    backbone's Megatron layout shards over `tp` (weights stream tp-way
    split per step, rows scale dp-way). tp defaults per parallel.make_mesh
    (largest power-of-two divisor <= 4)."""
    from .mesh import make_mesh
    return make_mesh(n_devices, tp=tp)


def shard_t3_for_decode(mesh: Mesh, t3_params):
    """Place T3 params for a tp (or dp x tp) decode mesh: Megatron layout on
    the Llama backbone, everything else replicated (parallel/mesh.py spec)."""
    from .mesh import t3_param_spec, shard_params
    return shard_params(t3_params, t3_param_spec(t3_params), mesh)


def shard_t3_for_serving(mesh: Mesh, t3_params):
    """Mesh-appropriate T3 placement: Megatron over `tp` when the mesh has
    a non-trivial tp axis, plain replication otherwise (dp-only meshes)."""
    if "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
        return shard_t3_for_decode(mesh, t3_params)
    return replicate(mesh, t3_params)


def _rows_axis(mesh: Mesh, rows: int):
    """Batch rows shard over dp when the mesh has that axis (rows must
    divide it — silent replication would be an invisible loss of data
    parallelism); a tp-only latency mesh replicates rows by design."""
    if "dp" not in mesh.axis_names:
        return None
    if rows % mesh.shape["dp"] != 0:
        raise ValueError(
            f"{rows} batch rows do not divide the dp axis "
            f"({mesh.shape['dp']} devices); pad the batch or resize the mesh")
    return "dp"


def shard_generation_inputs(mesh: Mesh, context, key_valid=None):
    """Place [cond rows; uncond rows] context over dp (row dim must divide
    the mesh). GSPMD propagates the sharding through prefill and the decode
    while-loop, including the KV cache (batch axis 2 of (layers, L, B, H, D)).
    On a tp-only mesh rows replicate and the backbone weights' Megatron
    sharding (shard_t3_for_decode) drives the partitioning instead."""
    rows = _rows_axis(mesh, context.shape[0])
    ctx = jax.device_put(context, NamedSharding(mesh, P(rows, None, None)))
    kv = None
    if key_valid is not None:
        kv = jax.device_put(key_valid, NamedSharding(mesh, P(rows, None)))
    return ctx, kv


def replicate(mesh: Mesh, tree):
    """Replicate parameters across the mesh (one copy per chip)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
