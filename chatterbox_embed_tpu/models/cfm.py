"""Conditional flow matching: Euler ODE solver with classifier-free guidance
(reference: models/s3gen/flow_matching.py:21-123, 188-218; params configs.py:3-10).

TPU design: the 10 Euler steps are one lax.scan whose body is a single
estimator call on a fused CFG batch of 2 (cond / uncond) — no per-step
dispatch, no host sync. ODE state stays fp32; the estimator runs in the
compute dtype. The noise is a fixed deterministic buffer, mirroring the
reference's registered `rand_noise` (flow_matching.py:191,213).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CFMConfig, FlowDecoderConfig
from . import flow_decoder


@functools.lru_cache(maxsize=2)
def fixed_noise(n_feats: int = 80, frames: int = 50 * 300) -> np.ndarray:
    """Deterministic noise buffer (1, frames, n_feats), fp32.

    The reference draws torch.randn at module construction
    (flow_matching.py:191) — deterministic within a process. Ours is a fixed
    numpy Philox stream: bit-stable across processes AND safe to call inside
    a jit trace (no jax ops)."""
    g = np.random.Generator(np.random.Philox(54321))
    return g.standard_normal(size=(1, frames, n_feats), dtype=np.float32)


def t_span_cosine(n_timesteps: int) -> np.ndarray:
    ts = np.linspace(0.0, 1.0, n_timesteps + 1, dtype=np.float32)
    return (1.0 - np.cos(ts * 0.5 * np.pi)).astype(np.float32)


def solve_euler(params, z, mu, spks, cond, mask=None,
                cfm: CFMConfig = CFMConfig(),
                dec_cfg: FlowDecoderConfig = FlowDecoderConfig(),
                dtype=jnp.float32, comm=None, cache_every=None,
                cfg_steps=None):
    """Integrate dx/dt = v(x, t) from noise to mel.

    Args (channel-last):
      z:    (B, T, 80) initial noise
      mu:   (B, T, 80) encoder features
      spks: (B, 80) projected speaker embedding
      cond: (B, T, 80) prompt conditioning
      cache_every: DeepCache stride K (see below). None -> the
        CHATTERBOX_CFM_CACHE env var (trace-time binding); callers that
        derive a default per shape pass it explicitly so the jit key —
        not a hidden env read — owns the behavior.
      cfg_steps: CFG-interval truncation — run the fused cond/uncond CFG
        pair only on the FIRST k Euler steps; the remaining steps integrate
        the cond-only velocity on b rows (half the estimator work per
        step). The guidance direction is set early in the flow (the late
        steps refine detail where cond/uncond have converged), the same
        observation behind diffusion CFG-interval schedules. None/""/k >=
        n_steps -> reference behavior (CFG every step, bit-identical).
        Trace-time static like cache_every; quality is bounded by the same
        full-size mel gate as the DeepCache stride
        (scripts/cfm_cache_gate.py --cfg-steps).
    Returns (B, T, 80) fp32 mel.

    CFG exactly as the reference (flow_matching.py:95-116): the uncond branch
    zeroes mu, spks and cond but keeps x and t.
    """
    b, tlen, nf = z.shape
    t_span = jnp.asarray(t_span_cosine(cfm.n_timesteps))
    ts = t_span[:-1]
    dts = t_span[1:] - t_span[:-1]
    w = cfm.inference_cfg_rate

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)

    # DeepCache-style mid-stack reuse (CHATTERBOX_CFM_CACHE=K, trace-time
    # binding like the other perf knobs): the estimator's mid stack (~85%
    # of the pass) is recomputed only on every K-th step and on the final
    # step; in between the cached mid features ride the scan carry and only
    # the shallow down/up stages run. K=0/1 disables (bit-identical plain
    # path). Changes numerics — quality bounds in tests/test_s3gen.py and
    # scripts/cfm_cache_gate.py (full size).
    if cache_every is None:
        env = os.getenv("CHATTERBOX_CFM_CACHE")
        cache_every = int(env) if env not in (None, "") else 0
    cache_every = int(cache_every)
    n_steps = len(t_span_cosine(cfm.n_timesteps)) - 1
    use_cache = cache_every >= 2 and comm is None and n_steps > 2

    if cfg_steps is None:
        env = os.getenv("CHATTERBOX_CFM_CFG_STEPS")
        cfg_steps = int(env) if env not in (None, "") else None
    # 0/unset/"" = the reference solver (CFG every step) — a non-positive
    # value must NEVER mean "no CFG at all" (that silently disables guidance)
    if cfg_steps is not None and int(cfg_steps) <= 0:
        cfg_steps = None
    k_cfg = n_steps if cfg_steps is None else min(int(cfg_steps), n_steps)

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t, jnp.float32)
        v = flow_decoder.forward(params, x2, mu2, t2, spks2, cond2, mask2,
                                 dec_cfg, dtype, comm=comm)
        v_cond, v_uncond = v[:b], v[b:]
        v_cfg = (1.0 + w) * v_cond - w * v_uncond
        return x + dt * v_cfg, None

    def step_cond(x, t_dt):
        # post-interval step: cond-only velocity on b rows (no uncond pair)
        t, dt = t_dt
        t1 = jnp.full((b,), t, jnp.float32)
        v = flow_decoder.forward(params, x, mu, t1, spks, cond, mask,
                                 dec_cfg, dtype, comm=comm)
        return x + dt * v, None

    if not use_cache:
        x = z.astype(jnp.float32)
        if k_cfg > 0:
            x, _ = jax.lax.scan(step, x, (ts[:k_cfg], dts[:k_cfg]))
        if k_cfg < n_steps:
            x, _ = jax.lax.scan(step_cond, x, (ts[k_cfg:], dts[k_cfg:]))
        return x

    reuse_flags = np.array(
        [i % cache_every != 0 and i != n_steps - 1 for i in range(n_steps)])

    def _mk_step_cached(rows, mu_, spks_, cond_, mask_, pair):
        def step_cached(carry, t_dt_r):
            x, mid = carry
            t, dt, reuse = t_dt_r
            xr = jnp.concatenate([x, x], axis=0) if pair else x
            tr = jnp.full((rows,), t, jnp.float32)

            def fresh(args):
                xr_, mid_ = args
                return flow_decoder.forward_mid_cached(
                    params, xr_, mu_, tr, spks_, cond_, mask_, dec_cfg,
                    dtype, mid_feats=mid_, reuse_mid=False)

            def cached(args):
                xr_, mid_ = args
                return flow_decoder.forward_mid_cached(
                    params, xr_, mu_, tr, spks_, cond_, mask_, dec_cfg,
                    dtype, mid_feats=mid_, reuse_mid=True)

            v, mid = jax.lax.cond(reuse, cached, fresh, (xr, mid))
            if pair:
                v_cond, v_uncond = v[:b], v[b:]
                v_out = (1.0 + w) * v_cond - w * v_uncond
            else:
                v_out = v
            return (x + dt * v_out, mid), None
        return step_cached

    c_down = dec_cfg.channels
    flags = jnp.asarray(reuse_flags)
    x = z.astype(jnp.float32)
    mid = jnp.zeros((2 * b, tlen, c_down), dtype)
    if k_cfg > 0:
        step_pair = _mk_step_cached(2 * b, mu2, spks2, cond2, mask2, True)
        (x, mid), _ = jax.lax.scan(
            step_pair, (x, mid), (ts[:k_cfg], dts[:k_cfg], flags[:k_cfg]))
    if k_cfg < n_steps:
        # the cond rows' cached mid features are the pair batch's first b
        # rows — slice them across the phase boundary so a reuse step right
        # after the interval still sees its own rows' cache
        mid_c = mid[:b]
        step_one = _mk_step_cached(b, mu, spks, cond, mask, False)
        (x, _), _ = jax.lax.scan(
            step_one, (x, mid_c), (ts[k_cfg:], dts[k_cfg:], flags[k_cfg:]))
    return x


def generate_mel(params, mu, spks, cond, mask=None, temperature: float = 1.0,
                 cfm: CFMConfig = CFMConfig(),
                 dec_cfg: FlowDecoderConfig = FlowDecoderConfig(),
                 dtype=jnp.float32, cache_every=None, cfg_steps=None):
    """mu (B, T, 80) -> mel (B, T, 80) using the fixed noise buffer
    (reference: flow_matching.py:193-218)."""
    b, tlen, nf = mu.shape
    z = jnp.asarray(fixed_noise(nf)[:, :tlen, :]) * temperature
    z = jnp.broadcast_to(z, (b, tlen, nf))
    return solve_euler(params, z, mu, spks, cond, mask, cfm, dec_cfg, dtype,
                       cache_every=cache_every, cfg_steps=cfg_steps)


def generate_mel_stream(params, mu, spks, cond, mask, prompt_frames: int,
                        noise_off, temperature: float = 1.0,
                        cfm: CFMConfig = CFMConfig(),
                        dec_cfg: FlowDecoderConfig = FlowDecoderConfig(),
                        dtype=jnp.float32):
    """Windowed streaming variant of generate_mel: the generated region's
    noise comes from the fixed buffer at ABSOLUTE frame positions
    (prompt_frames + noise_off + j), so overlapping window regions integrate
    the identical ODE surface across successive calls — the same pinning the
    reference's flow_cache gives its z tensor (flow_matching.py:58-65).

    noise_off: () int32 — absolute index of the window's first generated
    frame within the utterance.
    """
    b, tlen, nf = mu.shape
    buf = jnp.asarray(fixed_noise(nf))
    zp = buf[:, :prompt_frames]
    zg = jax.lax.dynamic_slice_in_dim(buf, prompt_frames + noise_off,
                                      tlen - prompt_frames, axis=1)
    z = jnp.concatenate([zp, zg], axis=1) * temperature
    z = jnp.broadcast_to(z, (b, tlen, nf))
    return solve_euler(params, z, mu, spks, cond, mask, cfm, dec_cfg, dtype)


def compute_loss(params, key, x1, mu, spks, cond, mask,
                 cfm: CFMConfig = CFMConfig(),
                 dec_cfg: FlowDecoderConfig = FlowDecoderConfig(),
                 dtype=jnp.float32):
    """Flow-matching training loss (reference: flow_matching.py:146-185).

    x1: (B, T, 80) target mel; mask: (B, T, 1).
    """
    b = x1.shape[0]
    k_t, k_z, k_cfg = jax.random.split(key, 3)
    t = jax.random.uniform(k_t, (b,), jnp.float32)
    if cfm.t_scheduler == "cosine":
        t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)
    z = jax.random.normal(k_z, x1.shape, jnp.float32)
    t_b = t[:, None, None]
    y = (1.0 - (1.0 - cfm.sigma_min) * t_b) * z + t_b * x1
    u = x1 - (1.0 - cfm.sigma_min) * z

    if cfm.training_cfg_rate > 0:
        keep = (jax.random.uniform(k_cfg, (b,)) > cfm.training_cfg_rate)
        keepf = keep.astype(jnp.float32)
        mu = mu * keepf[:, None, None]
        spks = spks * keepf[:, None]
        cond = cond * keepf[:, None, None]

    pred = flow_decoder.forward(params, y, mu, t, spks, cond, mask, dec_cfg, dtype)
    num = jnp.sum(jnp.square((pred - u) * mask))
    den = jnp.sum(mask) * u.shape[-1]
    return num / jnp.maximum(den, 1.0)
