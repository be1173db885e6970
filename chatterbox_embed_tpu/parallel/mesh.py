"""Device mesh + sharding rules.

The reference has no tensor/model parallelism (SURVEY.md §2.6: no
torch.distributed anywhere; its scale-out is job-level via Redis consumer
groups). Multi-chip here is therefore a NEW capability, not a port:

- inference:  one request per chip is the throughput-optimal layout for a
  0.5B decoder (weights fit easily in 16 GB HBM); batch configs shard the
  CFG-pair/utterance batch over `dp`.
- training:   dp x tp mesh. T3's Llama shards Megatron-style over `tp`
  (column-parallel q/k/v/gate/up, row-parallel o/down) with XLA inserting
  the psums over ICI; everything else replicates. Batch shards over `dp`.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MeshAxes(NamedTuple):
    dp: str = "dp"
    tp: str = "tp"


def make_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """dp x tp mesh over the first n devices. tp defaults to the largest
    power-of-two divisor of n that is <= 4 (a 0.5B model gains nothing from
    wider tp; ICI hops stay nearest-neighbour)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if n % cand == 0:
                tp = cand
                break
    dp = n // tp
    mesh_devices = np.asarray(devices).reshape(dp, tp)
    return Mesh(mesh_devices, ("dp", "tp"))


def _llama_spec(num_layers: int) -> dict:
    layer = {
        "ln1": {"scale": P()},
        "q": {"w": P(None, "tp")},
        "k": {"w": P(None, "tp")},
        "v": {"w": P(None, "tp")},
        "o": {"w": P("tp", None)},
        "ln2": {"scale": P()},
        "gate": {"w": P(None, "tp")},
        "up": {"w": P(None, "tp")},
        "down": {"w": P("tp", None)},
    }
    return {"layers": [layer for _ in range(num_layers)], "norm": {"scale": P()}}


def t3_param_spec(t3_params) -> dict:
    """PartitionSpec tree for T3: Megatron tp on the backbone, replicated
    embeddings/heads/conditioning (they are small)."""
    num_layers = len(t3_params["llama"]["layers"])
    spec = jax.tree.map(lambda _: P(), t3_params)
    spec["llama"] = _llama_spec(num_layers)
    # heads stay replicated: the speech vocab (8194 = 2*17*241) doesn't tile
    # onto power-of-two tp, and at ~8M params they're not worth sharding
    return spec


def flow_param_spec(flow_params) -> dict:
    """The CFM stack is small (~100M); replicate it and shard the batch."""
    return jax.tree.map(lambda _: P(), flow_params)


def shard_params(params, spec, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec)
