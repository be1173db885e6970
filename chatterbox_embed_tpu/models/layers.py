"""Minimal functional NN toolkit.

Models in this package are pure functions over explicit parameter pytrees
(nested dicts of jnp arrays). Compared to a module framework this keeps
- checkpoint conversion trivial (the tree layout *is* the torch name map),
- jit/pjit/sharding boundaries explicit,
- weight-norm folding and dtype policy a plain tree_map.

Conventions:
- Linear:   {"w": (in, out), "b": (out,)?}           y = x @ w + b
- Conv1d:   {"w": (width, in/groups, out), "b": (out,)?}  NWC layout
- Norms:    {"scale": (c,), "bias": (c,)}
- Embedding:{"w": (vocab, dim)}
All matmul-bearing ops accept a `dtype` for the compute precision (bf16 on
TPU); parameters are stored fp32 and cast at use (XLA fuses the cast).
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def _cast(p, dtype):
    return p.astype(dtype) if dtype is not None and p.dtype != dtype else p


# ---------------------------------------------------------------------------
# initialisers
#
# Randomness comes from numpy Philox streams derived from the jax key data:
# init stays OFF the accelerator and OFF the XLA compiler entirely (on
# remote-dispatch backends every uniquely-shaped eager op costs a full
# remote compile; a single fused init graph is equally pathological to
# compile). Deterministic per key, like the jax equivalent.
# ---------------------------------------------------------------------------

def split_keys(key, n: int = 2):
    """jax.random.split equivalent that never touches jax: returns
    SeedSequence children usable as keys for uniform_/normal_/split_keys."""
    if isinstance(key, np.random.SeedSequence):
        return key.spawn(n)
    data = np.asarray(jax.random.key_data(key)).astype(np.uint32).ravel()
    return np.random.SeedSequence([int(d) for d in data]).spawn(n)


def _np_rng(key) -> np.random.Generator:
    if not isinstance(key, np.random.SeedSequence):
        data = np.asarray(jax.random.key_data(key)).astype(np.uint32).ravel()
        key = np.random.SeedSequence([int(d) for d in data])
    return np.random.Generator(np.random.Philox(key))


_POOL_BITS = 20
_POOL_N = 1 << _POOL_BITS
_POOL_THRESHOLD = 1 << 16   # tensors above this use the pool
_pools: dict = {}


def _pool(kind: str) -> np.ndarray:
    """Shared random pools for large-tensor init: this environment's CPU
    generates ~3M randoms/s, so 0.5B-parameter models would take minutes to
    init exactly. Tensors above the pool size are filled from a rotated pool
    (deterministic per key, correctly scaled, adequate for random-weight
    development/benchmarking); small tensors keep exact Philox streams."""
    if kind not in _pools:
        g = np.random.Generator(np.random.SFC64(0xC0FFEE))
        _pools["uniform"] = g.random(size=_POOL_N, dtype=np.float32)
        _pools["normal"] = g.standard_normal(size=_POOL_N, dtype=np.float32)
    return _pools[kind]


def _key_offset(key) -> int:
    if isinstance(key, np.random.SeedSequence):
        return int(key.generate_state(1, np.uint32)[0]) % _POOL_N
    data = np.asarray(jax.random.key_data(key)).astype(np.uint64).ravel()
    return int(data[-1]) % _POOL_N


def uniform_(key, shape, bound):
    n = int(np.prod(shape))
    if n <= _POOL_THRESHOLD:
        r = _np_rng(key).random(size=shape, dtype=np.float32)
    else:
        r = np.resize(np.roll(_pool("uniform"), -_key_offset(key)), n).reshape(shape)
    return r * np.float32(2 * bound) - np.float32(bound)


def normal_(key, shape, std=1.0):
    n = int(np.prod(shape))
    if n <= _POOL_THRESHOLD:
        return _np_rng(key).standard_normal(size=shape, dtype=np.float32) * np.float32(std)
    r = np.resize(np.roll(_pool("normal"), -_key_offset(key)), n).reshape(shape)
    return r * np.float32(std)


def linear_init(key, d_in, d_out, bias=True):
    """torch.nn.Linear default init (kaiming uniform fan_in, bias 1/sqrt(fan))."""
    k1, k2 = split_keys(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": uniform_(k1, (d_in, d_out), math.sqrt(3.0) * bound)}
    if bias:
        p["b"] = uniform_(k2, (d_out,), bound)
    return p


def linear(p, x, dtype=None):
    d = dtype or x.dtype
    if "w_q" in p:
        # int8 weight streaming: HBM reads halve vs bf16; dequant fuses into
        # the dot. Per-output-channel symmetric scales.
        w = p["w_q"].astype(d) * _cast(p["scale"], d)
    else:
        w = _cast(p["w"], d)
    y = x.astype(d) @ w
    if "b" in p:
        y = y + _cast(p["b"], y.dtype)
    return y


def quantize_linear(p, axis: int = 0):
    """fp weight dict -> int8 dict {w_q, scale(, b)}; symmetric per-out-channel."""
    w = np.asarray(p["w"], np.float32)
    amax = np.max(np.abs(w), axis=axis, keepdims=True)
    scale = (amax / 127.0 + 1e-12).astype(np.float32)
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    out = {"w_q": wq, "scale": scale}
    if "b" in p:
        out["b"] = np.asarray(p["b"])
    return out


def embedding_init(key, vocab, dim, std=1.0):
    return {"w": normal_(key, (vocab, dim), std)}


def embedding(p, ids, dtype=None):
    w = _cast(p["w"], dtype) if dtype else p["w"]
    return jnp.take(w, ids, axis=0)


def layer_norm_init(dim):
    return {"scale": np.ones((dim,), np.float32), "bias": np.zeros((dim,), np.float32)}


def layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def rms_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * p["scale"]).astype(x.dtype)


def group_norm_init(dim):
    return layer_norm_init(dim)


def group_norm(p, x, num_groups, eps=1e-5):
    """x: (..., T, C) channel-last. Matches torch GroupNorm over (C/G, T)."""
    *lead, t, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(*lead, t, g, c // g)
    mu = jnp.mean(xf, axis=(-3, -1), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(-3, -1), keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(*lead, t, c)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def batch_norm_init(dim):
    """Inference-mode batch norm: running stats are folded at load time."""
    return {"scale": np.ones((dim,), np.float32), "bias": np.zeros((dim,), np.float32),
            "mean": np.zeros((dim,), np.float32), "var": np.ones((dim,), np.float32)}


def batch_norm(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return ((x.astype(jnp.float32) - p["mean"]) * inv + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# convolutions (channel-last NWC: TPU-native layout)
# ---------------------------------------------------------------------------

def conv1d_init(key, width, d_in, d_out, bias=True, groups=1):
    k1, k2 = split_keys(key)
    fan_in = d_in // groups * width
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": uniform_(k1, (width, d_in // groups, d_out), math.sqrt(3.0) * bound)}
    if bias:
        p["b"] = uniform_(k2, (d_out,), bound)
    return p


def conv1d(p, x, stride=1, padding="SAME", dilation=1, groups=1, dtype=None):
    """x: (B, T, C_in) -> (B, T', C_out). padding: 'SAME'|'VALID'|int|(lo,hi)."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    elif isinstance(padding, tuple):
        padding = [padding]
    d = dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(d), _cast(p["w"], d),
        window_strides=(stride,), padding=padding,
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in p:
        y = y + _cast(p["b"], y.dtype)
    return y


def conv_transpose1d(p, x, stride, padding, dtype=None, out_padding=0):
    """torch ConvTranspose1d semantics. p["w"]: (width, out, in) stored WOI.

    x: (B, T, C_in) -> (B, (T-1)*stride - 2*padding + width + out_padding, C_out)
    """
    d = dtype or x.dtype
    width = p["w"].shape[0]
    pad_lo = width - 1 - padding
    pad_hi = width - 1 - padding + out_padding
    y = jax.lax.conv_general_dilated(
        x.astype(d), _cast(p["w"], d)[::-1],  # flip taps: transpose == correlation with flipped kernel
        window_strides=(1,), padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WOI", "NWC"),
    )
    if "b" in p:
        y = y + _cast(p["b"], y.dtype)
    return y


def conv2d_init(key, kh, kw, d_in, d_out, bias=True):
    k1, k2 = split_keys(key)
    fan_in = d_in * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": uniform_(k1, (kh, kw, d_in, d_out), math.sqrt(3.0) * bound)}
    if bias:
        p["b"] = uniform_(k2, (d_out,), bound)
    return p


def conv2d(p, x, stride=(1, 1), padding="SAME", dtype=None):
    """x: (B, H, W, C)."""
    d = dtype or x.dtype
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x.astype(d), _cast(p["w"], d), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + _cast(p["b"], y.dtype)
    return y


# ---------------------------------------------------------------------------
# attention (plain XLA; the Pallas decode kernel lives in kernels/)
# ---------------------------------------------------------------------------

def mha(q, k, v, mask=None, bias=None, scale=None):
    """q: (B, Tq, H, D); k, v: (B, Tk, H, D); mask: bool (..., Tq, Tk) or bias.

    Softmax in fp32 regardless of input dtype.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e10))
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
    return out


def mha_chunked(q, k, v, mask=None, q_chunk: int = 256):
    """Query-chunked attention: peak memory (B, H, q_chunk, Tk) instead of
    (B, H, Tq, Tk). Same semantics as mha(); used where Tq*Tk logits would
    blow HBM (the CFM estimator at batch x long mel).

    mask: bool (B, 1, 1, Tk) key mask or None.
    """
    b, tq, h, d = q.shape
    pad = (-tq) % q_chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_chunks = q.shape[1] // q_chunk
    qc = q.reshape(b, n_chunks, q_chunk, h, d)

    def one(qi):
        return mha(qi, k, v, mask=mask)

    out = jax.lax.map(one, jnp.moveaxis(qc, 1, 0))
    out = jnp.moveaxis(out, 0, 1).reshape(b, n_chunks * q_chunk, h, d)
    return out[:, :tq]


def pallas_gate(default_ok: bool = True, cpu_ok: bool = True) -> bool:
    """The ONE place that decides whether a Pallas kernel path engages:
    CHATTERBOX_PALLAS=1 forces on, =0 forces off, otherwise `default_ok`
    (the caller's shape heuristic) on TPU backends and False on CPU (no
    interpreter in hot paths). Shared by the T3 decode kernel and the
    flash self-attention paths so override semantics never diverge.

    cpu_ok=False marks a kernel path with NO CPU interpreter (the stock
    flash_attention op behind mha_flash) — =1 then still refuses to
    engage it on CPU backends instead of crashing in pallas lowering
    (the repo's own kernels auto-select interpret mode and keep
    cpu_ok=True)."""
    env = os.getenv("CHATTERBOX_PALLAS")
    if not cpu_ok:
        try:
            if jax.devices()[0].platform in ("cpu",):
                return False
        except Exception:  # noqa: BLE001
            return False
    if env == "1":
        return True
    if env is not None:
        return False
    if not default_ok:
        return False
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False


def use_flash_attention(rows: int) -> bool:
    """Flash self-attention gate: batched shapes only (>= 4 rows — below
    that the kernel grid cannot amortise and XLA wins). The stock kernel
    has no interpret path, so this never engages on CPU."""
    return pallas_gate(rows >= 4, cpu_ok=False)


_FLASH_VMEM_BUDGET = 14 << 20  # scoped VMEM limit is 16 MB; leave slack


def _flash_vmem_footprint(bb: int, bq: int, tp: int, has_ab: bool,
                          d: int, itemsize: int) -> int:
    """Model of the stock flash kernel's scoped-VMEM bytes for one grid
    program: fp32 scores tile (+ an ab bias tile when present), the
    double-buffered k/v input tiles (these scale with block_b * T and were
    MISSING from the round-2 model — at b=8/T=2432/d=64 they add ~10 MB and
    the old choice of block_b=8 allocated 21 MB against the 16 MB scoped
    limit, the q4ac continuous-serving OOM), q/out tiles and segment-id
    tiles (q ids are lane-broadcast to (bq, 128) s32). Validated against the
    compiler's reported 21.00M at (bb=8, bq=128, tp=2432, d=64): model says
    21.9M."""
    logits = bb * bq * tp * 4 * (2 if has_ab else 1)
    kv = 4 * bb * tp * d * itemsize          # k + v tiles, double-buffered
    q_out = 6 * bb * bq * d * itemsize       # q (x2 buffers) + out tiles
    seg_ids = 2 * bb * (tp + bq * 128) * 4   # kv ids + lane-broadcast q ids
    return logits + kv + q_out + seg_ids


def _flash_block_choice(b: int, tp: int, has_ab: bool,
                        d: int = 64, itemsize: int = 2) -> tuple:
    """Flash kernel tile sizes for a padded seq length `tp` (128-multiple).

    The default 128-everywhere grid spawns (B*H*T/128) overhead-bound
    micro-programs at these shapes (T under ~2k) and LOSES to XLA
    (scripts/microbench_cfm.py: 72.6 vs 41.2 ms). Whole-row kv blocks + as
    many batch rows per program as fit the full scoped-VMEM footprint
    (_flash_vmem_footprint) keep the program count near B*H/block_b with
    one pass over kv: 29.8 ms."""
    block_q = 128
    for cand in range(min(tp, 1024), 0, -128):
        # long rows / ab bias bound block_q too: at T=2048 with the
        # conformer's ab bias a 1024-row tile is ~16 MB and overflows VMEM
        if tp % cand == 0 and _flash_vmem_footprint(
                1, cand, tp, has_ab, d, itemsize) <= _FLASH_VMEM_BUDGET:
            block_q = cand
            break
    block_b = 1
    for cand in (8, 4, 2):
        if b % cand == 0 and _flash_vmem_footprint(
                cand, block_q, tp, has_ab, d, itemsize) <= _FLASH_VMEM_BUDGET:
            block_b = cand
            break
    return block_q, block_b


def mha_flash(q, k, v, key_valid=None, ab=None):
    """Self-attention via the stock Pallas TPU flash kernel — online softmax
    in VMEM, so the (B, H, T, T) logits never touch HBM (they are 58% of a
    CFM estimator pass at batch 16, scripts/microbench_cfm.py). Same
    semantics as mha() with a key-validity mask; TPU only.

    q, k, v: (B, T, H, D); key_valid: (B, T) bool or None; ab: optional
    (B, H, T, T) additive score bias, applied BEFORE sm_scale (the rel-pos
    `bd` term of the conformer's Transformer-XL scores rides through here —
    it must be materialised either way, but the ac logits, the combined
    fp32 scores and the softmax weights stay in VMEM).

    T pads to a 128 multiple for the kernel grid. Pad/invalid positions get
    segment id 0 vs the valid tokens' 1, so valid queries never attend them;
    invalid queries attend only each other, which keeps their outputs finite
    (callers re-mask outputs — the fully-masked-row NaN rule from the repo's
    own flash_decode kernel applies here too).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    b, t, h, d = q.shape
    pad = (-t) % 128
    if key_valid is None:
        key_valid = jnp.ones((b, t), jnp.bool_)
    if pad:
        pad4 = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = (jnp.pad(x, pad4) for x in (q, k, v))
        key_valid = jnp.pad(key_valid, ((0, 0), (0, pad)))
        if ab is not None:
            ab = jnp.pad(ab, ((0, 0), (0, 0), (0, pad), (0, pad)))
    tp = t + pad
    block_q, block_b = _flash_block_choice(b, tp, ab is not None,
                                           d, q.dtype.itemsize)
    if _flash_vmem_footprint(block_b, block_q, tp, ab is not None, d,
                             q.dtype.itemsize) > _FLASH_VMEM_BUDGET:
        # Even a single whole-row program overflows scoped VMEM (T beyond
        # ~28k at d=64) — fall back to the chunked XLA path rather than OOM.
        if ab is not None:  # pragma: no cover - conformer T never gets here
            raise ValueError("flash ab bias unsupported at this T")
        mask = key_valid[:, None, None, :]
        return mha_chunked(q, k, v, mask=mask, q_chunk=block_q)[:, :t]
    blocks = BlockSizes(block_q=block_q, block_k_major=tp, block_k=tp,
                        block_b=block_b)
    ids = key_valid.astype(jnp.int32)
    out = flash_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        ab=None if ab is None else ab.astype(jnp.float32),
        segment_ids=SegmentIds(q=ids, kv=ids), causal=False,
        sm_scale=1.0 / math.sqrt(d), block_sizes=blocks)
    return jnp.swapaxes(out, 1, 2)[:, :t]


def split_heads(x, n_heads):
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def merge_heads(x):
    b, t, h, d = x.shape
    return x.reshape(b, t, h * d)


# activations
def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def snake(x, alpha):
    """Snake activation x + sin^2(alpha x)/alpha (reference: hifigan.py:34-84)."""
    a = alpha.astype(x.dtype)
    return x + jnp.square(jnp.sin(x * a)) / (a + 1e-9)
