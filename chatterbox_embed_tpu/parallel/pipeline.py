"""Pipeline-parallel T3 training: GPipe-style microbatch schedule over a
`pp` mesh axis.

The reference has no distributed training at all (SURVEY.md §2.6); the
dp x tp Megatron step lives in training/train_step.py. This module adds the
third TPU-native scaling axis: the 30-layer Llama backbone is split into S
contiguous STAGES, each stage's layer parameters stacked and sharded over
`pp`, and microbatches flow through the stages with `lax.ppermute` hops over
ICI — the scaling-book pipeline recipe, hand-rolled with shard_map so the
schedule is explicit and differentiable (jax transposes ppermute in the
backward pass, so one jax.grad gives the full pipelined backward).

Numerics are EXACT: the pipelined forward applies the same per-layer math as
llama.forward (no cache), so the loss equals the single-device t3 loss to
float tolerance (tests/test_parallel.py pins loss AND gradients).

Layout:
- stage params: every per-layer weight stacked to (L, ...) then viewed as
  (S, K, ...) and sharded P('pp') on axis 0 — each device scans its K layers.
- embeddings / conditioning / heads: replicated (small); the embedding side
  runs replicated on every device, the head + loss run on the LAST stage
  (other stages' head work is masked out and psum'd away).
- schedule: T = M + S - 1 ticks; at tick t stage s processes microbatch
  t - s (bubble ticks compute on zeros and are masked).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import T3Config
from ..models import layers as L
from ..models import llama as llama_mod
from ..models import t3 as t3_mod


def make_pp_mesh(n_stages: int) -> Mesh:
    devices = jax.devices()[:n_stages]
    assert len(devices) == n_stages, f"need {n_stages} devices"
    return Mesh(np.asarray(devices), ("pp",))


# ---------------------------------------------------------------------------
# parameter restructuring
# ---------------------------------------------------------------------------

def stack_t3_for_pipeline(t3_params, n_stages: int):
    """Split the t3 param tree into {stages, aux}: every per-layer llama
    weight stacked to (S, K, ...) (shard axis 0 over 'pp'); everything else
    (embeddings, cond enc, heads, final norm) replicated in `aux`."""
    layers = t3_params["llama"]["layers"]
    n_layers = len(layers)
    assert n_layers % n_stages == 0, \
        f"{n_layers} layers do not split into {n_stages} stages"
    k = n_layers // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs).reshape(
        (n_stages, k) + np.shape(xs[0])), *layers)
    aux = {kk: v for kk, v in t3_params.items() if kk != "llama"}
    aux["llama_norm"] = t3_params["llama"]["norm"]
    return {"stages": stacked, "aux": aux}


def unstack_t3_from_pipeline(pp_params, cfg: T3Config = T3Config()):
    """Inverse of stack_t3_for_pipeline (checkpoint interchange)."""
    stacked = pp_params["stages"]
    s, k = jax.tree.leaves(stacked)[0].shape[:2]
    layers = []
    for i in range(s * k):
        layers.append(jax.tree.map(lambda x: x[i // k, i % k], stacked))
    aux = dict(pp_params["aux"])
    norm = aux.pop("llama_norm")
    out = dict(aux)
    out["llama"] = {"layers": layers, "norm": norm}
    return out


def pp_param_spec(pp_params) -> dict:
    spec = jax.tree.map(lambda _: P(), pp_params)
    spec["stages"] = jax.tree.map(lambda _: P("pp"), pp_params["stages"])
    return spec


def shard_pp_params(pp_params, mesh: Mesh):
    spec = pp_param_spec(pp_params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), pp_params, spec)


# ---------------------------------------------------------------------------
# stage compute: K stacked llama layers, training forward (no cache)
# ---------------------------------------------------------------------------

def _apply_stage(stage_params, x, cos, sin, mask, cfg: T3Config, dtype):
    """Apply this stage's K stacked layers (mirrors llama.forward's training
    path: pre-norm attention + SwiGLU MLP, softmax in fp32)."""
    lcfg = cfg.llama

    def one_layer(h, lp):
        hin = L.rms_norm(lp["ln1"], h, lcfg.rms_norm_eps)
        q = L.split_heads(L.linear(lp["q"], hin, dtype), lcfg.num_heads)
        kk = L.split_heads(L.linear(lp["k"], hin, dtype), lcfg.num_kv_heads)
        v = L.split_heads(L.linear(lp["v"], hin, dtype), lcfg.num_kv_heads)
        q = llama_mod.apply_rope(q, cos, sin)
        kk = llama_mod.apply_rope(kk, cos, sin)
        att = L.mha(q, kk, v, mask=mask)
        h = h + L.linear(lp["o"], L.merge_heads(att), dtype)
        hin = L.rms_norm(lp["ln2"], h, lcfg.rms_norm_eps)
        mlp = L.linear(lp["down"],
                       jax.nn.silu(L.linear(lp["gate"], hin, dtype))
                       * L.linear(lp["up"], hin, dtype), dtype)
        return h + mlp, None

    h, _ = jax.lax.scan(one_layer, x.astype(dtype), stage_params)
    return h


def _context_and_mask(aux, batch, cfg: T3Config, dtype):
    """Replicated front-end: [cond; text; speech] embeddings + masks/pos
    (the same construction as t3.forward)."""
    cond = t3_mod.T3Cond(speaker_emb=batch["speaker_emb"],
                         cond_prompt_speech_tokens=batch["cond_prompt_tokens"],
                         emotion_adv=batch["emotion_adv"])
    params_view = dict(aux)  # cond_embeds only touches aux-level entries
    ce = t3_mod.cond_embeds(params_view, cond, cfg)
    text_tokens, speech_tokens = batch["text_tokens"], batch["speech_tokens"]
    text_lens, speech_lens = batch["text_lens"], batch["speech_lens"]
    b, lt = text_tokens.shape
    ls = speech_tokens.shape[1]
    te = (L.embedding(aux["text_emb"], text_tokens)
          + aux["text_pos_emb"]["w"][:lt][None])
    se = (L.embedding(aux["speech_emb"], speech_tokens)
          + aux["speech_pos_emb"]["w"][:ls][None])
    x = jnp.concatenate([jnp.broadcast_to(ce, (b,) + ce.shape[1:]), te, se], axis=1)
    t = x.shape[1]
    lc = ce.shape[1]
    idx = jnp.arange(t)
    causal = idx[None, :] <= idx[:, None]
    text_valid = (idx[None] < lc) | ((idx[None] >= lc)
                                     & (idx[None] < lc + text_lens[:, None])) \
        | (idx[None] >= lc + lt)
    speech_valid = (idx[None] < lc + lt) | (idx[None] < lc + lt + speech_lens[:, None])
    key_valid = text_valid & speech_valid
    mask = (causal[None] & key_valid[:, None, :])[:, None]      # (B, 1, T, T)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cos, sin = llama_mod.rope_cos_sin(pos, cfg.llama)
    return x, cos, sin, mask, lc, lt, ls


def _head_loss(aux, h, batch, lc, lt, ls, cfg: T3Config, dtype):
    h = L.rms_norm(aux["llama_norm"], h, cfg.llama.rms_norm_eps)
    text_latents = h[:, lc - 1: lc - 1 + lt]
    speech_latents = h[:, lc + lt - 1: lc + lt - 1 + ls]
    text_logits = L.linear(aux["text_head"], text_latents, dtype)
    speech_logits = L.linear(aux["speech_head"], speech_latents, dtype)

    def masked_ce(logits, targets, lens):
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(lsm, targets[..., None], axis=-1)[..., 0]
        m = jnp.arange(targets.shape[1])[None] < lens[:, None]
        return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1)

    return (masked_ce(text_logits, batch["text_tokens"], batch["text_lens"])
            + masked_ce(speech_logits, batch["speech_tokens"], batch["speech_lens"]))


# ---------------------------------------------------------------------------
# the pipelined loss
# ---------------------------------------------------------------------------

def pp_loss(pp_params, batch: Dict[str, jnp.ndarray], n_stages: int,
            n_micro: int, cfg: T3Config = T3Config(), dtype=jnp.float32):
    """Pipelined T3 loss, called INSIDE shard_map over the 'pp' axis.

    batch arrays are replicated; microbatches split axis 0. Returns the
    scalar loss (identical on every stage after the psum)."""
    s_idx = jax.lax.axis_index("pp")
    stages = jax.tree.map(lambda x: x[0], pp_params["stages"])   # (K, ...)
    aux = pp_params["aux"]

    x, cos, sin, mask, lc, lt, ls = _context_and_mask(aux, batch, cfg, dtype)
    b, t, d = x.shape
    assert b % n_micro == 0, f"batch {b} does not split into {n_micro} microbatches"
    mb = b // n_micro
    x_mb = x.reshape(n_micro, mb, t, d)
    cos_mb = cos.reshape(n_micro, mb, t, -1)
    sin_mb = sin.reshape(n_micro, mb, t, -1)
    mask_mb = mask.reshape(n_micro, mb, 1, t, t)

    n_ticks = n_micro + n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, tt):
        buf, outs = carry
        # stage s works on microbatch i = tt - s (clamped; bubbles masked)
        i = jnp.clip(tt - s_idx, 0, n_micro - 1)
        x_in = jnp.where(s_idx == 0,
                         jax.lax.dynamic_index_in_dim(x_mb, jnp.clip(tt, 0, n_micro - 1),
                                                      keepdims=False),
                         buf)
        y = _apply_stage(stages, x_in,
                         jax.lax.dynamic_index_in_dim(cos_mb, i, keepdims=False),
                         jax.lax.dynamic_index_in_dim(sin_mb, i, keepdims=False),
                         jax.lax.dynamic_index_in_dim(mask_mb, i, keepdims=False),
                         cfg, dtype)
        # last stage banks finished microbatches; everyone forwards its
        # activation one hop down the ring
        j = tt - (n_stages - 1)
        bank = (s_idx == n_stages - 1) & (j >= 0) & (j < n_micro)
        outs = jnp.where(
            bank,
            jax.lax.dynamic_update_index_in_dim(
                outs, y.astype(outs.dtype),
                jnp.clip(j, 0, n_micro - 1), axis=0),
            outs)
        buf_next = jax.lax.ppermute(y, "pp", perm)
        return (buf_next, outs), None

    buf0 = jnp.zeros((mb, t, d), dtype)
    outs0 = jnp.zeros((n_micro, mb, t, d), jnp.float32)
    (_, outs), _ = jax.lax.scan(tick, (buf0, outs0), jnp.arange(n_ticks))

    h = outs.reshape(b, t, d)
    loss = _head_loss(aux, h, batch, lc, lt, ls, cfg, dtype)
    # only the last stage computed on real activations
    loss = jnp.where(s_idx == n_stages - 1, loss, 0.0)
    return jax.lax.psum(loss, "pp")


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------

class PPTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_pp_train_step(mesh: Mesh, n_micro: int, cfg: T3Config = T3Config(),
                       lr: float = 1e-4, dtype=jnp.float32):
    """Returns (jitted step, shard_fn). Params come from
    stack_t3_for_pipeline + shard_pp_params; the batch is replicated (the
    pipeline parallelises LAYERS — combine with dp/tp meshes for batch
    scaling)."""
    from jax import shard_map
    n_stages = mesh.devices.size
    opt = optax.adamw(lr, weight_decay=0.01)

    def sharded_loss(pp_params, batch):
        return pp_loss(pp_params, batch, n_stages, n_micro, cfg, dtype)

    def step(state: PPTrainState, batch):
        in_specs = (pp_param_spec(state.params),
                    jax.tree.map(lambda _: P(), batch))
        smapped = shard_map(sharded_loss, mesh=mesh, in_specs=in_specs,
                            out_specs=P(), check_vma=False)
        loss, grads = jax.value_and_grad(smapped)(state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return PPTrainState(params, opt_state, state.step + 1), {"loss": loss}

    def init_state(pp_params) -> PPTrainState:
        return PPTrainState(pp_params, opt.init(pp_params), jnp.int32(0))

    return jax.jit(step), init_state
