"""Sequence parallelism (sp) for the mel-generation stage.

The reference has no model parallelism at all (SURVEY.md §2.6); tp/pp/dp
live in mesh.py / pipeline.py / serve.py. This module adds the remaining
axis: SEQUENCE parallelism for the CFM estimator — the latency-dominant
S3Gen stage (PERF_NOTES: the 10-step Euler scan is ~0.88 s of a batch-8
flow_to_mel) whose work grows with mel length T, not batch. On a multi-chip
host a single long utterance can split its T frames across chips:

- every pointwise op (linears, norms, ODE arithmetic) runs on T/n frames
  per chip with zero communication;
- the causal k=3 convs exchange a 2-frame halo with the left neighbour
  (`ppermute`); the first shard's ppermute fill is zeros == the causal pad,
  so the sharded conv is BIT-IDENTICAL to the unsharded one;
- attention keeps queries sharded and all-gathers K/V over the sp axis
  (at mel lengths K/V are ~1-2 MB: one ICI all-gather per tblock is far
  cheaper than a ring-attention schedule — "How to Scale Your Model"'s
  rule that rings only pay once the gathered operand stops fitting).

Everything is expressed with shard_map + named collectives; XLA lays the
all-gathers on ICI. Validated bit-exactly against the single-device solver
on the virtual CPU mesh (tests/test_parallel.py) — one real chip is all
this container has.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import CFMConfig, FlowDecoderConfig
from ..models import cfm


def make_sp_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("sp",))


class SeqComm:
    """Collective helpers handed to flow_decoder.forward when its T axis is
    sharded over a mesh axis. Methods are only callable inside shard_map."""

    def __init__(self, axis: str = "sp"):
        self.axis = axis

    def halo(self, x: jnp.ndarray, width: int) -> jnp.ndarray:
        """Prepend `width` frames from the left neighbour's tail (zeros on
        the first shard — the causal pad). x: (B, T_local, C)."""
        n = jax.lax.psum(1, self.axis)
        left = jax.lax.ppermute(x[:, -width:], self.axis,
                                [(i, i + 1) for i in range(n - 1)])
        return jnp.concatenate([left, x], axis=1)

    def gather(self, x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
        """All-gather the sharded T axis back to full length."""
        return jax.lax.all_gather(x, self.axis, axis=axis, tiled=True)


def sp_generate_mel(mesh: Mesh, params, mu, spks, cond, mask=None,
                    temperature: float = 1.0,
                    cfm_cfg: CFMConfig = CFMConfig(),
                    dec_cfg: FlowDecoderConfig = FlowDecoderConfig(),
                    dtype=jnp.float32):
    """mu (B, T, 80) -> mel (B, T, 80), T sharded over mesh axis "sp".

    Semantics match cfm.generate_mel exactly: same fixed noise buffer, same
    Euler/CFG math — only the layout differs. T is zero-padded up to a
    multiple of the shard count (padded frames are masked out of attention
    and convs and sliced off the result).
    """
    n = mesh.devices.size
    b, t, nf = mu.shape
    pad = (-t) % n
    if mask is None:
        mask = jnp.ones((b, t, 1), mu.dtype)
    if pad:
        mu = jnp.pad(mu, ((0, 0), (0, pad), (0, 0)))
        cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad), (0, 0)))
    tp = t + pad
    z = jnp.asarray(cfm.fixed_noise(nf)[:, :tp, :]) * temperature
    z = jnp.broadcast_to(z, (b, tp, nf))

    pspec = jax.tree.map(lambda _: P(), params)
    seq = P(None, "sp", None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(pspec, seq, seq, P(), seq, seq),
        out_specs=seq, check_vma=False)
    def run(p, z_s, mu_s, spks_r, cond_s, mask_s):
        return cfm.solve_euler(p, z_s, mu_s, spks_r, cond_s, mask_s,
                               cfm_cfg, dec_cfg, dtype, comm=SeqComm("sp"))

    out = run(params, z, mu, spks, cond, mask)
    return out[:, :t]
