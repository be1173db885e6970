"""Jitted sampling ops for autoregressive decode: vocab masking, temperature,
repetition penalty, min-p, top-p, categorical draw (reference behaviors:
models/t3/t3.py:303-361 wiring HF's RepetitionPenaltyLogitsProcessor,
MinPLogitsWarper, TopPLogitsWarper).

TPU design: everything is a fixed-shape vector op over the 8194-wide logit
row — no host round-trips inside the decode loop. The repetition penalty uses
a persistent per-utterance count buffer updated by scatter-add instead of
re-scanning the growing token history each step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-jnp.inf)


def vocab_mask_logits(logits: jnp.ndarray, valid_size: int, eos_id: int) -> jnp.ndarray:
    """Allow ids < valid_size plus the EOS id (reference: t3.py:333-348)."""
    v = logits.shape[-1]
    ids = jnp.arange(v)
    ok = (ids < valid_size) | (ids == eos_id)
    return jnp.where(ok, logits, NEG_INF)


def repetition_penalty(logits: jnp.ndarray, counts: jnp.ndarray,
                       penalty: float) -> jnp.ndarray:
    """HF semantics: for every id already generated, divide positive logits by
    `penalty`, multiply negative ones."""
    seen = counts > 0
    penalised = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalised, logits)


def min_p_filter(logits: jnp.ndarray, min_p: float) -> jnp.ndarray:
    """Drop ids with prob < min_p * max_prob (HF MinPLogitsWarper)."""
    probs = jax.nn.softmax(logits, axis=-1)
    thresh = min_p * jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= thresh
    return jnp.where(keep, logits, NEG_INF)


def top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering (HF TopPLogitsWarper, min_tokens_to_keep=1).
    `top_p` may be traced; callers gate the >= 1.0 no-op case statically."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (incl. the first over)
    keep_sorted = cum - probs < top_p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    # threshold logit = smallest kept logit
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits >= thresh, logits, NEG_INF)


def sample_token(key, logits: jnp.ndarray) -> jnp.ndarray:
    """Categorical draw from (possibly -inf-masked) logits. (..., V) -> (...,)."""
    return jax.random.categorical(key, logits, axis=-1)


def _is_concrete_one(v) -> bool:
    """True only for a concrete scalar exactly 1.0 (traced values are never
    concrete, so under jit the op is kept and stays shape-stable)."""
    try:
        return np.ndim(v) == 0 and float(v) == 1.0
    except Exception:  # noqa: BLE001 — tracers refuse concretisation
        return False


def process_logits(logits: jnp.ndarray, counts: jnp.ndarray, *,
                   valid_size: int, eos_id: int, temperature: float,
                   repetition_penalty_val: float, min_p: float, top_p: float,
                   use_top_p: bool = True) -> jnp.ndarray:
    """Full pipeline in the reference's order (t3.py:333-357):
    vocab mask -> temperature -> repetition penalty -> min-p -> top-p.
    The four warper params are scalars or per-row (U, 1) arrays; this is the
    pipeline the decode loop (t3.decode_block) compiles. `use_top_p` is the
    static gate that keeps the vocab sort out of the hot loop when top-p is
    off (the reference's TopPLogitsWarper no-ops at 1.0)."""
    x = vocab_mask_logits(logits, valid_size, eos_id)
    if not _is_concrete_one(temperature):
        x = x / temperature
    x = repetition_penalty(x, counts, repetition_penalty_val)
    x = min_p_filter(x, min_p)
    if use_top_p:
        x = top_p_filter(x, top_p)
    return x
