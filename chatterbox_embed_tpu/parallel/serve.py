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


def shard_generation_inputs(mesh: Mesh, context, key_valid=None):
    """Place [cond rows; uncond rows] context over dp (row dim must divide
    the mesh). GSPMD propagates the sharding through prefill and the decode
    while-loop, including the KV cache (batch axis 2 of (layers, L, B, H, D))."""
    ctx = jax.device_put(context, NamedSharding(mesh, P("dp", None, None)))
    kv = None
    if key_valid is not None:
        kv = jax.device_put(key_valid, NamedSharding(mesh, P("dp", None)))
    return ctx, kv


def replicate(mesh: Mesh, tree):
    """Replicate parameters across the mesh (one copy per chip)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
