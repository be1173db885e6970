"""Llama-520M backbone for T3 (reference config: models/t3/llama_configs.py:1-33;
the reference runs HF transformers' LlamaModel — here it is a from-scratch JAX
implementation built for TPU decode).

TPU design:
- static KV cache (num_layers, B, L_max, H, D): prefill writes a block with
  one dynamic_update_slice per layer; decode writes one slot. No concat, no
  reallocation, shapes never change -> one compiled program per bucket.
- llama3-scaled RoPE cos/sin are computed from integer position ids inside
  the graph (fp32), so left-padded batches decode correctly.
- attention logits/softmax in fp32, everything else in the compute dtype
  (bf16 on TPU).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LlamaConfig
from . import layers as L


class KVCache(NamedTuple):
    """Sequence-major layout (layers, L, B, H, D): the flash-decode kernel
    views each layer as a tile-aligned (L, B*H*D) slab.

    int8 mode (CHATTERBOX_INT8_KV=1, batched XLA decode only): k/v are int8
    with per-(slot, row, head) fp32 scales — batched decode is KV-bandwidth
    bound (batch 16 measures ~6.2 ms/step ~= 1.06 GB weights + ~4 GB cache
    reads at 819 GB/s), so halving cache bytes attacks the dominant term.
    The scales factor OUT of both attention dots (sum_d q*kq*s = s*(q@kq);
    sum_l w*vq*s = (w*s)@vq), so the int8 slabs feed the MXU directly and
    no dequantized copy is materialized."""
    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None    # (L, Lc, B, H) fp32 iff k int8
    v_scale: Optional[jnp.ndarray] = None


def init(key, cfg: LlamaConfig = LlamaConfig()):
    keys = iter(L.split_keys(key, 8 * cfg.num_layers + 4))
    nk = lambda: next(keys)
    d = cfg.hidden_size
    kv_out = cfg.num_kv_heads * cfg.head_dim
    q_out = cfg.num_heads * cfg.head_dim
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln1": {"scale": np.ones((d,), np.float32)},
            "q": L.linear_init(nk(), d, q_out, bias=False),
            "k": L.linear_init(nk(), d, kv_out, bias=False),
            "v": L.linear_init(nk(), d, kv_out, bias=False),
            "o": L.linear_init(nk(), q_out, d, bias=False),
            "ln2": {"scale": np.ones((d,), np.float32)},
            "gate": L.linear_init(nk(), d, cfg.intermediate_size, bias=False),
            "up": L.linear_init(nk(), d, cfg.intermediate_size, bias=False),
            "down": L.linear_init(nk(), cfg.intermediate_size, d, bias=False),
        })
    return {"layers": layers, "norm": {"scale": np.ones((d,), np.float32)}}


# ---------------------------------------------------------------------------
# RoPE (llama3 scaling, reference config rope_scaling llama_configs.py:23-29)
# ---------------------------------------------------------------------------

def _scaled_inv_freq(cfg: LlamaConfig) -> np.ndarray:
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2, np.float64) / cfg.head_dim))
    wavelen = 2.0 * np.pi / inv
    low_wl = cfg.rope_original_max_position / cfg.rope_low_freq_factor
    high_wl = cfg.rope_original_max_position / cfg.rope_high_freq_factor
    smooth = (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor)
    scaled = np.where(wavelen > low_wl, inv / cfg.rope_scaling_factor,
                      np.where(wavelen < high_wl, inv,
                               (1 - smooth) * inv / cfg.rope_scaling_factor + smooth * inv))
    return scaled.astype(np.float32)


def rope_cos_sin(pos_ids: jnp.ndarray, cfg: LlamaConfig):
    """pos_ids (B, T) int32 -> cos, sin (B, T, head_dim) fp32."""
    inv = jnp.asarray(_scaled_inv_freq(cfg))
    ang = pos_ids[..., None].astype(jnp.float32) * inv          # (B, T, D/2)
    ang = jnp.concatenate([ang, ang], axis=-1)                   # HF half-split layout
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin):
    """x: (B, T, H, D); HF rotate-half convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos[:, :, None, :]
            + rotated.astype(jnp.float32) * sin[:, :, None, :]).astype(x.dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _kv_int8_mode() -> int:
    """Effective int8-KV mode. CHATTERBOX_INT8_KV: 0 = bf16 cache, 1 = int8
    slabs with the convert fused into the bf16 dot, 2 = native int8 x int8
    MXU dots with q/w quantized on the fly. Trace-time binding.

    DEFAULT (env unset): mode 1 on TPU backends, 0 on CPU. Round-4 basis:
    batch-16 decode 5.69 -> 4.69 ms/step, the B=64-row HBM fence doubles
    to 32 utterances, and the full-size fidelity gate passes
    (scripts/int8_quality_gate.py --kv 1: prefill logit cosine 0.9998,
    median same-seed first-divergence 10.5 steps on random weights —
    real checkpoints are peaked and diverge later). Mode 2 was MEASURED
    AND REJECTED as a default (9.40 ms/step at batch 16: the on-the-fly
    probability quantization costs more than the convert it removes).
    CPU stays fp so batch-vs-solo exactness tests keep their meaning."""
    import os
    env = os.getenv("CHATTERBOX_INT8_KV")
    if env is None:
        try:
            return 1 if jax.devices()[0].platform not in ("cpu",) else 0
        except Exception:  # noqa: BLE001
            return 0
    try:
        return int(env)
    except ValueError:
        return 1


def pin_cache_row_major(cache: "KVCache") -> "KVCache":
    """Pin the cache slabs to a row-major device layout (sequence rows
    contiguous). Without this, XLA's layout assignment propagates a
    sequence-MINOR layout out of prefill (driven by its full-sequence
    attention transposes) into the decode while-loop carry, and every
    decode step then pays a FULL-CACHE transpose copy to feed the
    row-major Pallas kernel operands plus scattered element writes for
    the sequence-slot insert (round-4 device trace at B=2:
    copy.615/616 ~275 us/step + 2x ~200 us stacked-insert DUS).
    A layout hint here moves that to ONE transpose at the prefill
    boundary. No-op where the layout API is unavailable.

    NOTE: with_layout_constraint takes a bare Layout, NOT a Format — the
    round-4 first cut passed Format(Layout(...)), whose constructor raises
    without a concrete sharding, and a blanket except silently disabled the
    pin (caught by the r4e device trace: copy.615/616 still present).
    Only ImportError falls back now; API misuse must be loud.

    DEFAULT OFF (CHATTERBOX_PIN_KV=1 re-enables): the q4g product A/B
    measured the pin NEUTRAL at the single-utterance headline (1.969 vs
    1.972 ms/step) and at batch 16 (10.15 vs 10.20) — the copies it
    targeted were already eliminated by the stacked-cache flash entry
    (deferred insert reads layer slabs straight from the (L,Lc,B,H,D)
    buffer), and the r4e batched slowdown the pin was blamed for turned
    out to be the deferred XLA path instead. Kept as an opt-in
    experiment for future libtpu/XLA layout behavior."""
    import os
    if os.getenv("CHATTERBOX_PIN_KV", "0") != "1":
        return cache
    try:
        from jax.experimental.layout import with_layout_constraint, Layout
    except ImportError:
        return cache

    def pin(x):
        if x is None:
            return None
        return with_layout_constraint(
            x, Layout(major_to_minor=tuple(range(x.ndim))))
    return KVCache(pin(cache.k), pin(cache.v),
                   pin(cache.k_scale), pin(cache.v_scale))


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
    shape = (cfg.num_layers, max_len, batch, cfg.num_kv_heads, cfg.head_dim)
    if dtype == jnp.int8:
        sshape = shape[:-1]
        return KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _defer_kv_enabled() -> bool:
    """CHATTERBOX_DEFER_KV=1: the deferred stacked KV insert (parity-kept
    diagnostic path, measured never-better — forward() docstring). Phased
    prefix reads require the eager insert, so t3.start_generation consults
    this to skip the phase derivation under defer."""
    import os
    return os.getenv("CHATTERBOX_DEFER_KV", "") == "1"


def _spy_row(w, lcache: int, cache_pos, defer: bool):
    """Head-mean attention row over CACHE coordinates for the alignment spy.
    Under deferred insert the current token rides an appended column — fold
    it back into its cache slot so downstream span arithmetic is unchanged."""
    row = jnp.mean(w[..., :lcache], axis=1)
    if defer:
        cur = jnp.mean(w[..., lcache], axis=1)               # (B,)
        row = row + cur[:, None] * (jnp.arange(lcache)[None, :]
                                    == jnp.asarray(cache_pos, jnp.int32))
    return row


def forward(params, x: jnp.ndarray, pos_ids: jnp.ndarray,
            attn_mask: Optional[jnp.ndarray] = None,
            cache: Optional[KVCache] = None, cache_pos: int | jnp.ndarray = 0,
            cfg: LlamaConfig = LlamaConfig(), dtype=jnp.float32,
            flash_decode: bool = False, flash_start: int | jnp.ndarray = 0,
            flash_hole: Optional[jnp.ndarray] = None,
            collect_attn_layer: Optional[int] = None,
            read_len: Optional[int] = None):
    """Run the transformer over a block of embeddings.

    Args:
      x: (B, T, D) input embeddings.
      pos_ids: (B, T) RoPE positions.
      attn_mask: bool (B, T, L) where L is the cache length (or T when no
        cache): True = attend. Defaults to causal within the block.
      cache: optional static KVCache; the block's K/V are written at
        [cache_pos, cache_pos+T) and attention runs against the whole cache.
      collect_attn_layer: when set (single-token XLA decode only), also
        return layer N's head-mean attention probabilities over the cache —
        the alignment analyzer's "attention spy" (reference:
        alignment_stream_analyzer.py:59-87 hooks tfmr layer 9).
      read_len: optional STATIC prefix length — attention reads only cache
        slots [0, read_len) (a static slice XLA fuses into the dot operands:
        no copy, no reallocation). This is the phased-cache mechanism: the
        full-capacity cache is allocated ONCE and early decode phases run
        programs that read a shorter prefix, so per-step KV bandwidth tracks
        the live prefix instead of the final capacity. Callers guarantee
        every attended slot (and every insert) lands below read_len, and
        pass attn_mask with key width == read_len. Replaces the round-4
        grow_cache zero-pad migration, whose old+new transient double
        allocation sat at the HBM fence at the b32/1000-cap shape (q4ah).
    Returns (hidden (B, T, D) post final norm, updated cache[, attn_row (B, L)]).
    """
    b, t, d = x.shape
    attn_row = None
    h = x.astype(dtype)
    cos, sin = rope_cos_sin(pos_ids, cfg)

    if attn_mask is None:
        if cache is None:
            attn_mask = jnp.tril(jnp.ones((t, t), bool))[None]
        else:
            lcache = read_len if read_len is not None else cache.k.shape[1]
            idx = jnp.arange(lcache)[None, :]
            q_idx = cache_pos + jnp.arange(t)[:, None]
            attn_mask = (idx[None] <= q_idx[None])               # (1, T, L)

    ck, cv = (cache.k, cache.v) if cache is not None else (None, None)
    cks, cvs = (cache.k_scale, cache.v_scale) if cache is not None else (None, None)
    kv_int8 = ck is not None and ck.dtype == jnp.int8
    assert not (kv_int8 and flash_decode), \
        "int8 KV cache requires the XLA decode path (the flash kernel walks bf16 slabs)"
    # Deferred cache insert (single-token decode): collect every layer's
    # k/v row and write the whole stack in ONE update after the loop, with
    # attention folding the current row explicitly (flash: a final
    # height-1 online-softmax chunk; XLA: an appended logit/value column).
    # Mathematically identical to insert-first (parity-tested), built
    # against the trace-named 434 us/step per-layer insert chain at B=2.
    #
    # DEFAULT OFF everywhere (CHATTERBOX_DEFER_KV=1 re-enables): measured
    # on the product path it never wins —
    #   * bf16 flash B=2: eager 2.439 vs defer 2.634 ms/step (q4i);
    #   * int8-weights flash B=2: 1.975 vs 1.972 — neutral (q4k);
    #   * batch-16 XLA int8-KV: eager 4.79 vs defer 10.2 (q4g — the
    #     where/concat around the logits breaks the int8 convert-into-dot
    #     fusion and the cache dequantizes through HBM every step).
    # Root cause on the flash path (q4j device traces): the single
    # strided (L,1,B,H,D) stacked update is NOT aliased in place by XLA —
    # dynamic_update_slice.20/.21 each copy the full cache (~200 us/step)
    # and the stacked-cache kernel operand adds full-cache copies
    # (copy.615/616, ~275 us/step), so the 434 us of in-place per-layer
    # inserts it removes come back as ~670 us of copies.
    defer = t == 1 and cache is not None and _defer_kv_enabled()
    # Per-row cache positions (continuous batching): cache_pos may be a (B,)
    # vector when rows sit at DIFFERENT generation depths (slot-refill decode,
    # models/t3_engine.py). Each row's k/v lands in its own sequence column
    # via one scatter per layer; callers pass the per-row attention mask.
    per_row_pos = getattr(cache_pos, "ndim", 0) == 1
    if per_row_pos:
        assert t == 1 and cache is not None and not flash_decode and not defer, \
            "per-row cache_pos requires the eager single-token XLA decode path"
    new_ks, new_vs = [], []
    lcache_n = ck.shape[1] if ck is not None else 0
    # effective attention key width: the phased prefix, or the whole cache
    lw = read_len if read_len is not None else lcache_n
    assert read_len is None or (not flash_decode and not defer), \
        "read_len (phased prefix) requires the eager XLA cache path"
    for i, lp in enumerate(params["layers"]):
        hin = L.rms_norm(lp["ln1"], h, cfg.rms_norm_eps)
        q = L.split_heads(L.linear(lp["q"], hin, dtype), cfg.num_heads)
        k = L.split_heads(L.linear(lp["k"], hin, dtype), cfg.num_kv_heads)
        v = L.split_heads(L.linear(lp["v"], hin, dtype), cfg.num_kv_heads)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if defer:
            new_ks.append(k[:, 0])               # (B, H, D)
            new_vs.append(v[:, 0])
        elif cache is not None and per_row_pos:
            # slot-refill decode: row b writes its k/v at sequence column
            # cache_pos[b] (rows advance independently). One (B,)-indexed
            # scatter per slab; inside the engine's donated while_loop carry
            # XLA applies it in place like the shared-column DUS.
            rows = jnp.arange(b)
            if kv_int8:
                kf = k[:, 0].astype(jnp.float32)            # (B, H, D)
                vf = v[:, 0].astype(jnp.float32)
                ks = jnp.max(jnp.abs(kf), axis=-1) / 127.0 + 1e-12   # (B, H)
                vs = jnp.max(jnp.abs(vf), axis=-1) / 127.0 + 1e-12
                ck = ck.at[i, cache_pos, rows].set(
                    jnp.round(kf / ks[..., None]).astype(jnp.int8))
                cv = cv.at[i, cache_pos, rows].set(
                    jnp.round(vf / vs[..., None]).astype(jnp.int8))
                cks = cks.at[i, cache_pos, rows].set(ks)
                cvs = cvs.at[i, cache_pos, rows].set(vs)
            else:
                ck = ck.at[i, cache_pos, rows].set(k[:, 0].astype(ck.dtype))
                cv = cv.at[i, cache_pos, rows].set(v[:, 0].astype(cv.dtype))
        elif cache is not None:
            # in-place slab update on the stacked sequence-major cache: inside
            # a while_loop carry XLA aliases this to a true in-place write
            if kv_int8:
                kf = jnp.swapaxes(k, 0, 1)[None].astype(jnp.float32)
                vf = jnp.swapaxes(v, 0, 1)[None].astype(jnp.float32)
                ks = jnp.max(jnp.abs(kf), axis=-1) / 127.0 + 1e-12  # (1,T,B,H)
                vs = jnp.max(jnp.abs(vf), axis=-1) / 127.0 + 1e-12
                kq = jnp.round(kf / ks[..., None]).astype(jnp.int8)
                vq = jnp.round(vf / vs[..., None]).astype(jnp.int8)
                ck = jax.lax.dynamic_update_slice(ck, kq, (i, cache_pos, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, vq, (i, cache_pos, 0, 0, 0))
                cks = jax.lax.dynamic_update_slice(cks, ks, (i, cache_pos, 0, 0))
                cvs = jax.lax.dynamic_update_slice(cvs, vs, (i, cache_pos, 0, 0))
            else:
                k_seq = jnp.swapaxes(k, 0, 1)[None].astype(ck.dtype)   # (1, T, B, H, D)
                v_seq = jnp.swapaxes(v, 0, 1)[None].astype(cv.dtype)
                ck = jax.lax.dynamic_update_slice(ck, k_seq, (i, cache_pos, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, v_seq, (i, cache_pos, 0, 0, 0))
        # the alignment spy needs the attention probabilities of ONE layer;
        # every other layer keeps the flash kernel when it is enabled
        flash_this = flash_decode and (collect_attn_layer is None
                                       or i != collect_attn_layer)
        if flash_this and t == 1 and cache is not None:
            # Pallas variable-length decode kernel: only touches cache slots
            # [flash_start, cache_pos] instead of the whole padded capacity;
            # flash_hole (B, 2) masks per-row dead text-pad ranges (ragged
            # right-padded batches)
            from ..kernels.flash_decode import decode_attention
            if defer:
                # stacked-cache entry: the kernel DMAs layer i's slabs from
                # the whole cache (no per-layer slice copy) and folds the
                # deferred current row in-kernel
                att = decode_attention(q[:, 0], ck, cv, cache_pos,
                                       start=flash_start, hole=flash_hole,
                                       layer=jnp.int32(i),
                                       k_cur=k[:, 0], v_cur=v[:, 0])[:, None]
            else:
                # Per-layer ck[i]/cv[i] slice copies (~290 us/step at B=2)
                # are the MEASURED-CHEAPEST way to feed the kernel: routing
                # the eager path through the stacked-cache entry instead
                # (traced layer index, no slices) measured 10.66 vs 2.01
                # ms/step (q4l) — XLA inserts a defensive full-cache copy
                # around EVERY custom call whose operand is DUS-mutated
                # later in the same while body (30 x ~280 us), the same
                # copy-insertion that sank the deferred variant.
                att = decode_attention(q[:, 0], ck[i], cv[i], cache_pos,
                                       start=flash_start,
                                       hole=flash_hole)[:, None]
        elif t == 1 and cache is not None:
            # XLA decode on the sequence-major cache WITHOUT transposing it:
            # a (B, L, H, D) transpose per layer per step churns gigabytes at
            # large batch (the batch-32 worker-crash culprit).
            # With `defer` the history excludes the current slot and the
            # current token's exact (unquantized) k/v row arrives as one
            # appended logit/value column.
            km = attn_mask[:, 0]                                   # (B|1, L)
            if defer:
                km = km & (jnp.arange(lw)[None, :]
                           < jnp.asarray(cache_pos, jnp.int32))
                lcur = (jnp.sum(q[:, 0].astype(jnp.float32)
                                * k[:, 0].astype(jnp.float32), axis=-1)
                        / np.sqrt(cfg.head_dim))[..., None]        # (B, H, 1)
            if kv_int8 and _kv_int8_mode() == 2:
                # mode 2: NATIVE int8 x int8 MXU dots (no int8->bf16 convert
                # anywhere near the cache). q is quantized per (B, H) on the
                # fly; the per-slot k scale factors out of the d-sum. For
                # the value dot, the per-slot v scale is folded into the
                # fp32 probabilities FIRST, then the product is quantized
                # with one per-(B, H) scale — sum_l (w*s_l)*vq = ws * wi@vq.
                qs = (jnp.max(jnp.abs(q[:, 0].astype(jnp.float32)),
                              axis=-1, keepdims=True) / 127.0 + 1e-12)
                qi = jnp.round(q[:, 0].astype(jnp.float32) / qs).astype(jnp.int8)
                logits = jnp.einsum("bhd,lbhd->bhl", qi, ck[i][:lw],
                                    preferred_element_type=jnp.int32)
                logits = (logits.astype(jnp.float32) * qs
                          * jnp.transpose(cks[i][:lw], (1, 2, 0)))
                logits = logits / np.sqrt(cfg.head_dim)
                logits = jnp.where(km[:, None, :], logits, jnp.float32(-1e10))
                if defer:
                    logits = jnp.concatenate([logits, lcur], axis=-1)
                w = jax.nn.softmax(logits, axis=-1)
                if collect_attn_layer is not None and i == collect_attn_layer:
                    attn_row = _spy_row(w, lw, cache_pos, defer)
                wv = w[..., :lw] * jnp.transpose(cvs[i][:lw], (1, 2, 0))
                ws = jnp.max(wv, axis=-1, keepdims=True) / 127.0 + 1e-20
                wi = jnp.round(wv / ws).astype(jnp.int8)
                att_i = jnp.einsum("bhl,lbhd->bhd", wi, cv[i][:lw],
                                   preferred_element_type=jnp.int32)
                att = att_i.astype(jnp.float32) * ws
                if defer:
                    att = att + w[..., lw:] * v[:, 0].astype(jnp.float32)
                att = att.astype(dtype)[:, None]
            else:
                kc = ck[i][:lw].astype(dtype)                      # (L, B, H, D)
                vc = cv[i][:lw].astype(dtype)
                logits = jnp.einsum("bhd,lbhd->bhl", q[:, 0], kc,
                                    preferred_element_type=jnp.float32)
                if kv_int8:
                    # per-slot scale factors out of the dot: the int8 slab
                    # feeds the MXU directly, no dequantized copy (mode 1;
                    # relies on XLA fusing the int8->bf16 convert into the
                    # dot — mode 2 above removes the convert entirely)
                    logits = logits * jnp.transpose(cks[i][:lw], (1, 2, 0))
                logits = logits / np.sqrt(cfg.head_dim)
                logits = jnp.where(km[:, None, :], logits, jnp.float32(-1e10))
                if defer:
                    logits = jnp.concatenate([logits, lcur], axis=-1)
                w = jax.nn.softmax(logits, axis=-1)
                if collect_attn_layer is not None and i == collect_attn_layer:
                    attn_row = _spy_row(w, lw, cache_pos, defer)
                wl = w[..., :lw]
                if kv_int8:
                    wl = wl * jnp.transpose(cvs[i][:lw], (1, 2, 0))
                att = jnp.einsum("bhl,lbhd->bhd", wl.astype(dtype), vc)
                if defer:
                    att = (att.astype(jnp.float32)
                           + w[..., lw:] * v[:, 0].astype(jnp.float32)
                           ).astype(dtype)
                att = att[:, None]
        else:
            if cache is not None:
                k_att = jnp.swapaxes(ck[i][:lw], 0, 1).astype(dtype)  # (B, L, H, D)
                v_att = jnp.swapaxes(cv[i][:lw], 0, 1).astype(dtype)
                if kv_int8:
                    k_att = k_att * jnp.swapaxes(cks[i][:lw], 0, 1)[..., None].astype(dtype)
                    v_att = v_att * jnp.swapaxes(cvs[i][:lw], 0, 1)[..., None].astype(dtype)
            else:
                k_att, v_att = k, v
            att = L.mha(q, k_att, v_att, mask=attn_mask[:, None] if attn_mask.ndim == 3 else attn_mask)
        h = h + L.linear(lp["o"], L.merge_heads(att), dtype)

        hin = L.rms_norm(lp["ln2"], h, cfg.rms_norm_eps)
        mlp = L.linear(lp["down"],
                       jax.nn.silu(L.linear(lp["gate"], hin, dtype)) * L.linear(lp["up"], hin, dtype),
                       dtype)
        h = h + mlp

    if defer:
        # ONE stacked write for all layers' k/v rows (strided across the
        # layer axis, but a single device op instead of 60-120 tiny ones)
        kst = jnp.stack(new_ks)[:, None]                     # (L, 1, B, H, D)
        vst = jnp.stack(new_vs)[:, None]
        if kv_int8:
            kf = kst.astype(jnp.float32)
            vf = vst.astype(jnp.float32)
            ks_s = jnp.max(jnp.abs(kf), axis=-1) / 127.0 + 1e-12   # (L,1,B,H)
            vs_s = jnp.max(jnp.abs(vf), axis=-1) / 127.0 + 1e-12
            ck = jax.lax.dynamic_update_slice(
                ck, jnp.round(kf / ks_s[..., None]).astype(jnp.int8),
                (0, cache_pos, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, jnp.round(vf / vs_s[..., None]).astype(jnp.int8),
                (0, cache_pos, 0, 0, 0))
            cks = jax.lax.dynamic_update_slice(cks, ks_s, (0, cache_pos, 0, 0))
            cvs = jax.lax.dynamic_update_slice(cvs, vs_s, (0, cache_pos, 0, 0))
        else:
            ck = jax.lax.dynamic_update_slice(ck, kst.astype(ck.dtype),
                                              (0, cache_pos, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, vst.astype(cv.dtype),
                                              (0, cache_pos, 0, 0, 0))

    h = L.rms_norm(params["norm"], h, cfg.rms_norm_eps)
    if cache is not None:
        cache = KVCache(ck, cv, cks, cvs)
    if collect_attn_layer is not None:
        assert attn_row is not None, \
            "collect_attn_layer requires the single-token XLA decode path"
        return h, cache, attn_row
    return h, cache


def decode_step(params, x: jnp.ndarray, pos_id: jnp.ndarray, cache: KVCache,
                cache_pos: jnp.ndarray, cfg: LlamaConfig = LlamaConfig(),
                dtype=jnp.float32):
    """One-token decode: x (B, 1, D), pos_id (B, 1). Attends to cache slots
    [0, cache_pos]. Returns (hidden (B, 1, D), cache)."""
    lcache = cache.k.shape[1]
    mask = (jnp.arange(lcache)[None, None, :] <= cache_pos)      # (1, 1, L)
    return forward(params, x, pos_id, mask, cache, cache_pos, cfg, dtype)
