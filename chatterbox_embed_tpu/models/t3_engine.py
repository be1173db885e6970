"""Continuous-batching T3 decode engine (slot-refill decoding).

The lock-step paths (t3.generate_batch / serving's WORKER_MAX_BATCH pooling)
decode a FIXED set of rows: a row that hits EOS early idles (masked) until the
whole block's EOS early-exit fires, and new requests wait for the next pooled
batch. This engine keeps a fixed set of S decode *slots* hot instead: each
slot holds one in-flight request, rows advance at independent depths, and when
a row finishes, the host prefills a queued request into the freed slot between
blocks — the vLLM-style continuous batching design, built TPU-first:

- ONE compiled decode-block program serves every occupancy pattern: per-slot
  generation depth ``i``, left-pad, sampling params, PRNG keys and EOS state
  are all TRACED (S,)-vectors inside the engine state; nothing about which
  slot holds which request is baked into the program.
- Per-row cache columns: row b's k/v insert lands at its own sequence column
  (llama.forward's per-row cache_pos scatter); the attention mask bounds each
  row at [pad_b, p_len + i_b]. Geometry (text bucket, cond width, capacity)
  is fixed per engine, so the cache layout is identical for every occupant
  of a slot.
- Refill is two dispatches, not a recompile: the standard bucketed prefill
  program (t3._context_prefill with capacity = p_len) builds the new
  request's 2 CFG rows, and one jitted insert program scatters its cache
  columns + logits + bookkeeping into the engine state at a traced slot id.
- Request isolation is exact: every per-row op (attention with per-row
  masks, per-row RoPE positions, per-row sampling keys) is independent of
  the other rows, so a request decodes the SAME tokens regardless of which
  slot it lands in or what traffic surrounds it (pinned by
  tests/test_continuous.py).

RNG contract: each request samples with its OWN key chain
``fold_in(PRNGKey(request_seed), step)`` — per-request determinism that does
not depend on batch composition (the lock-step paths draw one batch-shaped
sample per step instead, so engine tokens match `t3.generate` exactly only in
the near-greedy regime; see test_engine_near_greedy_matches_generate).

Voice conditioning lives entirely in the prefilled KV columns, so slots are
voice-agnostic: multi-voice traffic needs no extra plumbing.

The reference has no counterpart (it is hard-limited to batch 1 —
reference tts.py generate loop, SURVEY.md §2.6); COMPONENTS.md round-4
"Future work" sketched this design and the per-block host round-trip cost
that makes it a real-TPU-host (microsecond-RTT) feature: through the axon
tunnel each block pays one RTT, so pick block sizes accordingly.

Alignment-analyzer decode (CHATTERBOX_ALIGNMENT) and the Pallas flash/fused
kernels are lock-step-only and not composed here: the engine targets the
batched XLA decode (the measured winner at >= 4 rows, PERF_NOTES.md), where
the int8 KV cache default applies unchanged.

Multi-chip: pass ``mesh=`` (ContinuousServer forwards ``tts.mesh`` from
``tts.enable_mesh``) — slot/batch axes shard over ``dp`` via
``engine_sharding`` and GSPMD propagates through the insert and decode-block
programs; the Megatron ``tp`` weight sharding divides the streamed bytes per
chip exactly as in the lock-step mesh decode. dp placement is bit-identical
to the single-chip engine (every engine op is row-local; pinned by
tests/test_continuous.py and the driver dryrun).
"""
from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import T3Config
from ..ops import sampling
from . import layers as L
from . import llama
from . import t3


class EngineState(NamedTuple):
    """Device-resident state of an S-slot engine (B = 2S rows: CFG layout
    [cond rows 0..S-1; uncond rows S..2S-1], like t3.decode_block).

    RING-COLUMN cache layout (the key to lock-step-speed inserts): the
    generated-KV region [p_len, p_len + R) is a ring indexed by the GLOBAL
    engine step g — every step, ALL rows write physical column
    p_len + (g mod R), one shared-scalar dynamic_update_slice per slab,
    exactly the lock-step insert. Because a live slot advances every global
    step, occupant tokens sit at ws ∈ [g_start, g_start + i] where ws is the
    per-column written-at-step vector — so per-row validity is a cheap
    compare mask, no per-row scatter anywhere. A slot's span can never wrap
    onto itself (its lifetime in steps == its token count ≤ R = the engine
    token cap), and stale/junk columns are excluded by the ws window. The
    q4x ablation measured the per-row-scatter layout this replaces at
    +1.5 ms/slot-step on v5e (PERF_NOTES continuous-batching section)."""
    cache: llama.KVCache         # (L, total, 2S, H, D) sequence-major
    logits: jnp.ndarray          # (2S, V) fp32 — logits at each row's position
    counts: jnp.ndarray          # (S, V) int32 repetition-penalty counts
    i: jnp.ndarray               # (S,) int32 tokens generated per slot
    done: jnp.ndarray            # (S,) bool — free or finished slots
    pad: jnp.ndarray             # (S,) int32 left-pad of the slot's context
    keys: jnp.ndarray            # (S, 2) uint32 per-request PRNG keys
    limit: jnp.ndarray           # (S,) int32 per-request max_new_tokens
    temperature: jnp.ndarray     # (S, 1) fp32 per-request sampling params
    cfg_weight: jnp.ndarray      # (S, 1)
    rep_penalty: jnp.ndarray     # (S, 1)
    min_p: jnp.ndarray           # (S, 1)
    top_p: jnp.ndarray           # (S, 1)
    g: jnp.ndarray               # () int32 global engine step counter
    g_start: jnp.ndarray         # (S,) int32 occupant's join step
    ws: jnp.ndarray              # (R,) int32 ring column written-at step (-1 = never)


def engine_geometry(cfg: T3Config, text_bucket: int, cond_w: int,
                    max_new_tokens: int):
    """(p_len, total): fixed context width and cache capacity shared by every
    slot. Context layout per slot: [pad junk; cond; text; BOS; BOS] — CFG is
    always on (the engine is a serving path; cfg_weight 0 rows keep the CFG
    layout semantics, exactly like t3.start_generation's per-row-weights
    note)."""
    p_len = text_bucket + cond_w + 2
    return p_len, p_len + max_new_tokens


def engine_init(cfg: T3Config, *, slots: int, text_bucket: int, cond_w: int,
                max_new_tokens: int, dtype=jnp.float32,
                kv_int8: bool = False) -> EngineState:
    """All-free engine state. Free slots are done=True with pad=p_len, so
    their attention window is the single all-zero column at p_len (finite
    softmax, no NaN) until a request is inserted."""
    p_len, total = engine_geometry(cfg, text_bucket, cond_w, max_new_tokens)
    s = slots
    cache = llama.init_cache(cfg.llama, 2 * s, total,
                             jnp.int8 if kv_int8 else dtype)
    v = cfg.speech_tokens_dict_size
    return EngineState(
        cache=cache,
        logits=jnp.zeros((2 * s, v), jnp.float32),
        counts=jnp.zeros((s, v), jnp.int32),
        i=jnp.zeros((s,), jnp.int32),
        done=jnp.ones((s,), jnp.bool_),
        pad=jnp.full((s,), p_len, jnp.int32),
        keys=jnp.zeros((s, 2), jnp.uint32),
        limit=jnp.zeros((s,), jnp.int32),
        temperature=jnp.ones((s, 1), jnp.float32),
        cfg_weight=jnp.zeros((s, 1), jnp.float32),
        rep_penalty=jnp.ones((s, 1), jnp.float32),
        min_p=jnp.zeros((s, 1), jnp.float32),
        top_p=jnp.ones((s, 1), jnp.float32),
        g=jnp.int32(0),
        g_start=jnp.zeros((s,), jnp.int32),
        ws=jnp.full((total - p_len,), -1, jnp.int32),
    )


def engine_sharding(mesh, state: EngineState) -> EngineState:
    """EngineState-of-NamedShardings for a serving mesh: slot/batch axes
    shard over `dp` (cache batch is axis 2 of (L, total, 2S, H, D); the S-
    and 2S-leading vectors shard on axis 0), ring bookkeeping (g, ws)
    replicates, and a tp-only mesh replicates everything — the Megatron
    weight sharding (parallel/serve.shard_t3_for_serving) drives the
    partitioning there, exactly like the lock-step mesh decode. GSPMD
    propagates these through engine_insert and the decode while-loop, so
    the engine programs stay geometry-keyed (no per-occupancy recompiles)
    on a mesh too."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    s_slots = int(state.done.shape[0])
    dp = dict(mesh.shape).get("dp", 1)
    row = "dp" if dp > 1 else None
    if row and s_slots % dp != 0:
        raise ValueError(
            f"{s_slots} engine slots do not divide the dp axis ({dp} "
            "devices); pick WORKER_SLOTS / ContinuousServer slots as a "
            "multiple of dp")

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    ck = state.cache
    return EngineState(
        cache=llama.KVCache(
            ns(None, None, row), ns(None, None, row),
            None if ck.k_scale is None else ns(None, None, row),
            None if ck.v_scale is None else ns(None, None, row)),
        logits=ns(row), counts=ns(row), i=ns(row), done=ns(row),
        pad=ns(row), keys=ns(row), limit=ns(row), temperature=ns(row),
        cfg_weight=ns(row), rep_penalty=ns(row), min_p=ns(row),
        top_p=ns(row), g=ns(), g_start=ns(row), ws=ns())


def prefill_request(params, cond: t3.T3Cond, text_tokens: np.ndarray, *,
                    text_bucket: int, p_len: int, cfg: T3Config,
                    dtype=jnp.float32, kv_int8: bool = False):
    """Prefill ONE request's 2 CFG rows into a p_len-capacity DecodeState
    using the standard bucketed prefill program (one compiled program per
    engine geometry — warm after the first request). Returns (state, pad)."""
    tt = np.atleast_2d(np.asarray(text_tokens, np.int32))
    assert tt.shape[0] == 1, "engine requests are single utterances"
    lt = tt.shape[1]
    assert lt <= text_bucket, f"text ({lt} tokens) exceeds engine bucket {text_bucket}"
    pad = text_bucket - lt
    tb = jnp.asarray(np.pad(tt, ((0, 0), (pad, 0))))
    sub = t3._context_prefill(params, cond, tb, None, jnp.int32(pad), cfg,
                              p_len, True, dtype, kv_int8)
    return sub, pad


@functools.partial(jax.jit, donate_argnames=("state",))
def engine_insert(state: EngineState, sub, slot, key,
                  meta) -> EngineState:
    """Insert a prefilled request into slot `slot` (traced — one compiled
    program serves every slot). sub: t3.DecodeState from prefill_request
    (cache capacity exactly p_len). meta: (7,) fp32
    [limit, pad, temperature, cfg_weight, repetition_penalty, min_p, top_p]
    packed into one transfer (each separate host arg costs an RTT on remote
    backends)."""
    s_slots = state.done.shape[0]
    p_len = sub.cache.k.shape[1]
    rows = jnp.stack([slot, s_slots + slot])

    ck = state.cache.k.at[:, :p_len, rows].set(sub.cache.k)
    cv = state.cache.v.at[:, :p_len, rows].set(sub.cache.v)
    cks, cvs = state.cache.k_scale, state.cache.v_scale
    if cks is not None:
        cks = cks.at[:, :p_len, rows].set(sub.cache.k_scale)
        cvs = cvs.at[:, :p_len, rows].set(sub.cache.v_scale)

    limit = meta[0].astype(jnp.int32)
    pad = meta[1].astype(jnp.int32)
    return state._replace(
        cache=llama.KVCache(ck, cv, cks, cvs),
        logits=state.logits.at[rows].set(sub.logits),
        counts=state.counts.at[slot].set(sub.counts[0]),
        i=state.i.at[slot].set(0),
        done=state.done.at[slot].set(False),
        pad=state.pad.at[slot].set(pad),
        keys=state.keys.at[slot].set(key),
        limit=state.limit.at[slot].set(limit),
        temperature=state.temperature.at[slot, 0].set(meta[2]),
        cfg_weight=state.cfg_weight.at[slot, 0].set(meta[3]),
        rep_penalty=state.rep_penalty.at[slot, 0].set(meta[4]),
        min_p=state.min_p.at[slot, 0].set(meta[5]),
        top_p=state.top_p.at[slot, 0].set(meta[6]),
        # ring bookkeeping: the occupant's tokens will be written at global
        # steps [g, g + limit), i.e. ws values in [g_start, g_start + i]
        g_start=state.g_start.at[slot].set(state.g),
    )


@functools.partial(jax.jit,
                   static_argnames=("cfg", "block", "p_len", "use_top_p",
                                    "dtype", "ablate"),
                   donate_argnames=("state",))
def engine_decode_block(params, state: EngineState, cfg: T3Config,
                        block: int, p_len: int, use_top_p: bool,
                        dtype=jnp.float32, ablate: str = ""):
    """Decode up to `block` tokens on every live slot (early-exits when all
    slots finish). Returns (state, tokens (block, S) int32, n_steps ()).

    Mirrors t3.decode_block's body with the per-request scalars promoted to
    per-row vectors (RoPE position p_len - pad_b + i_b, PRNG key
    fold_in(keys[s], i[s]), EOS/limit per row) while the KV INSERT stays the
    lock-step shared-scalar dynamic_update_slice via the ring-column layout
    (EngineState docstring): write column = p_len + (g mod R); per-row
    validity is the ws window [g_start, g_start + i]. Finished rows keep
    emitting EOS (the host trims at the first EOS) and stop advancing; their
    ring writes are junk on dead rows and never enter any live mask.

    `ablate` is PROBE-ONLY (scripts/continuous_probe.py --ablate) — "rng"
    reverts the per-slot key chains to one batch-shaped categorical draw per
    step (lock-step RNG; breaks request-isolation semantics) to price the
    per-row sampling chain. Never set in production."""
    s_slots = state.done.shape[0]
    b = 2 * s_slots
    total = state.cache.k.shape[1]
    eos = cfg.stop_speech_token

    def sample_from(st: EngineState):
        lc, lu = st.logits[:s_slots], st.logits[s_slots:]
        lg = lc + st.cfg_weight * (lc - lu)
        lg = sampling.process_logits(
            lg, st.counts, valid_size=cfg.start_speech_token, eos_id=eos,
            temperature=st.temperature, repetition_penalty_val=st.rep_penalty,
            min_p=st.min_p, top_p=st.top_p, use_top_p=use_top_p)
        if "rng" in ablate:   # probe-only: lock-step RNG shape
            return sampling.sample_token(
                jax.random.fold_in(st.keys[0], st.i[0]), lg)
        ks = jax.vmap(jax.random.fold_in)(st.keys, st.i)
        return jax.vmap(sampling.sample_token)(ks, lg)        # (S,)

    class Carry(NamedTuple):
        state: EngineState
        tokens: jnp.ndarray                                   # (block, S)
        j: jnp.ndarray

    def cond_fn(c: Carry):
        return (~jnp.all(c.state.done)) & (c.j < block)

    def body_fn(c: Carry):
        st = c.state
        tok = sample_from(st)
        tok = jnp.where(st.done, eos, tok)
        tokens = c.tokens.at[c.j].set(tok.astype(jnp.int32))
        counts = st.counts.at[jnp.arange(s_slots), tok].add(1)
        done = st.done | (tok == eos) | (st.i + 1 >= st.limit)

        emb = (L.embedding(params["speech_emb"], tok)
               + params["speech_pos_emb"]["w"][st.i + 1])     # (S, D)
        emb = jnp.concatenate([emb, emb], axis=0)[:, None]    # (2S, 1, D)
        i2 = jnp.concatenate([st.i, st.i])
        pad2 = jnp.concatenate([st.pad, st.pad])
        gs2 = jnp.concatenate([st.g_start, st.g_start])
        kidx = jnp.arange(total)
        pos_id = (p_len - pad2 + i2)[:, None]                 # (2S, 1) RoPE
        # ring-column insert: ALL rows write this step's shared physical
        # column — the same dynamic_update_slice shape as lock-step decode
        ring_col = jnp.mod(st.g, total - p_len)
        cache_pos = p_len + ring_col                          # () shared
        ws2 = jax.lax.dynamic_update_slice(st.ws, st.g[None], (ring_col,))
        # validity: prefill window per row + the occupant's ws window
        wsx = jnp.concatenate([jnp.full((p_len,), -1, jnp.int32), ws2])
        mask = (((kidx[None, :] >= pad2[:, None]) & (kidx[None, :] < p_len))
                | ((wsx[None, :] >= gs2[:, None])
                   & (wsx[None, :] - gs2[:, None] <= i2[:, None])))
        hh, cache2 = llama.forward(params["llama"], emb.astype(dtype), pos_id,
                                   mask[:, None, :], cache=st.cache,
                                   cache_pos=cache_pos, cfg=cfg.llama,
                                   dtype=dtype)
        logits = L.linear(params["speech_head"], hh[:, -1], jnp.float32)
        i_new = jnp.where(st.done, st.i, st.i + 1)
        st2 = st._replace(cache=cache2, logits=logits, counts=counts,
                          i=i_new, done=done, g=st.g + 1, ws=ws2)
        return Carry(st2, tokens, c.j + 1)

    state = state._replace(cache=llama.pin_cache_row_major(state.cache))
    init = Carry(state, jnp.full((block, s_slots), eos, jnp.int32),
                 jnp.int32(0))
    final = jax.lax.while_loop(cond_fn, body_fn, init)
    return final.state, final.tokens, final.j


# ---------------------------------------------------------------------------
# host-side scheduler (token level)
# ---------------------------------------------------------------------------

@dataclass
class _Slot:
    rid: Optional[int] = None
    buf: List[np.ndarray] = field(default_factory=list)
    count: int = 0
    limit: int = 0


class ContinuousDecoder:
    """Host orchestration: a request queue, S device slots, block-wise decode
    with refill between blocks. Token-level API — serving/continuous.py wires
    it into the full TTS pipeline.

    Per block: one decode-block dispatch + one batched device_get; per refill:
    one prefill dispatch + one insert dispatch. All programs are keyed on the
    engine geometry only, so a long-running engine never recompiles.
    """

    def __init__(self, params, cfg: T3Config = T3Config(), *, slots: int = 8,
                 text_bucket: int = 192, max_new_tokens: int = 512,
                 block: int = 64, dtype=jnp.float32,
                 kv_int8: Optional[bool] = None, use_top_p: bool = False,
                 mesh=None, retain_results: bool = True, _ablate: str = ""):
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.mesh = mesh
        self.text_bucket = text_bucket
        self.max_new_cap = max_new_tokens
        self.block = block
        self.dtype = dtype
        self.kv_int8 = (llama._kv_int8_mode() > 0 if kv_int8 is None
                        else kv_int8)
        self.use_top_p = use_top_p
        self._ablate = _ablate    # probe-only (engine_decode_block docstring)
        self.cond_w = 2 + cfg.perceiver_num_queries
        self.p_len, self.total = engine_geometry(
            cfg, text_bucket, self.cond_w, max_new_tokens)
        self.state = engine_init(cfg, slots=slots, text_bucket=text_bucket,
                                 cond_w=self.cond_w,
                                 max_new_tokens=max_new_tokens, dtype=dtype,
                                 kv_int8=self.kv_int8)
        if mesh is not None:
            # multi-chip engine: slot axes over dp / Megatron weights over tp
            # (engine_sharding docstring). Params must already be mesh-placed
            # (tts.enable_mesh / parallel.serve.shard_t3_for_serving) —
            # mixing a mesh-sharded state with single-device params is the
            # committed-device crash the round-3 streaming fix documents.
            self.state = jax.device_put(self.state,
                                        engine_sharding(mesh, self.state))
        self._queue: List[dict] = []
        self._slots = [_Slot() for _ in range(slots)]
        # retain_results=False for run-forever callers that consume step()'s
        # return value — retaining every finished token array forever is a
        # host-memory leak at serving timescales (drain() callers keep True)
        self.retain_results = retain_results
        self._results: Dict[int, np.ndarray] = {}
        self._next_rid = 0
        # per-block partial outputs: {rid: this block's new ids} for every
        # request that advanced in the LAST step() — finished requests are
        # trimmed at EOS/limit. Streaming consumers (serving/continuous.py
        # streamed requests) read this to synthesise audio incrementally
        # while the request is still decoding.
        self.last_block_tokens: Dict[int, np.ndarray] = {}
        self.blocks_run = 0
        # host-side stage timers (exposed for probes/ops): refill covers the
        # per-request prefill + insert dispatches, decode covers the block
        # dispatch + the batched result fetch
        self.t_refill = 0.0
        self.t_decode = 0.0
        self.steps_run = 0

    # -- submission ---------------------------------------------------------

    def submit(self, text_tokens: np.ndarray, cond: t3.T3Cond, *,
               temperature: float = 0.8, cfg_weight: float = 0.5,
               repetition_penalty: float = 1.2, min_p: float = 0.05,
               top_p: float = 1.0, seed: int = 0,
               max_new_tokens: Optional[int] = None) -> int:
        """Queue one utterance. Returns a request id; the decoded ids (EOS
        included, like t3.generate) appear in step()'s completions."""
        if t3.cond_width(cond, self.cfg) != self.cond_w:
            raise ValueError(
                "engine slots are laid out for prompt-token conds "
                f"(cond width {self.cond_w}); got width "
                f"{t3.cond_width(cond, self.cfg)}")
        n_text = np.atleast_2d(np.asarray(text_tokens)).shape[1]
        if n_text > self.text_bucket:
            raise ValueError(f"text ({n_text} tokens) exceeds the engine's "
                             f"text bucket ({self.text_bucket}); chunk the "
                             "text or build a wider engine")
        if top_p < 1.0 and not self.use_top_p:
            raise ValueError("top_p < 1.0 requires use_top_p=True at engine "
                             "construction (static program variant)")
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append(dict(
            rid=rid, text=np.atleast_2d(np.asarray(text_tokens, np.int32)),
            cond=cond, temperature=float(temperature),
            cfg_weight=float(cfg_weight),
            repetition_penalty=float(repetition_penalty),
            min_p=float(min_p), top_p=float(top_p), seed=int(seed),
            max_new=min(int(max_new_tokens or self.max_new_cap),
                        self.max_new_cap)))
        return rid

    # -- engine loop --------------------------------------------------------

    def _refill(self):
        t0 = time.time()
        for s_idx, sl in enumerate(self._slots):
            if sl.rid is not None or not self._queue:
                continue
            req = self._queue.pop(0)
            cond = req["cond"]
            if self.mesh is not None:
                # cond arrays may be committed to one device (tokenizer
                # output) — replicate onto the mesh before they mix with
                # mesh-placed params, same as t3.start_generation's mesh
                # branch
                from ..parallel.serve import replicate
                cond = replicate(self.mesh, cond)
            sub, pad = prefill_request(
                self.params, cond, req["text"],
                text_bucket=self.text_bucket, p_len=self.p_len, cfg=self.cfg,
                dtype=self.dtype, kv_int8=self.kv_int8)
            meta = np.asarray(
                [req["max_new"], pad, req["temperature"], req["cfg_weight"],
                 req["repetition_penalty"], req["min_p"], req["top_p"]],
                np.float32)
            self.state = engine_insert(
                self.state, sub, jnp.int32(s_idx),
                jax.random.PRNGKey(req["seed"]), jnp.asarray(meta))
            self._slots[s_idx] = _Slot(rid=req["rid"], buf=[], count=0,
                                       limit=req["max_new"])
        self.t_refill += time.time() - t0

    @property
    def idle(self) -> bool:
        return not self._queue and all(s.rid is None for s in self._slots)

    def step(self) -> Dict[int, np.ndarray]:
        """Refill free slots, decode one block, return {rid: ids} finished
        this block."""
        self._refill()
        if all(s.rid is None for s in self._slots):
            return {}
        t0 = time.time()
        self.state, tokens, n = engine_decode_block(
            self.params, self.state, self.cfg, self.block, self.p_len,
            self.use_top_p, self.dtype, self._ablate)
        tokens_h, n_h, done_h = jax.device_get(
            (tokens, n, self.state.done))
        self.t_decode += time.time() - t0
        self.blocks_run += 1
        self.steps_run += int(n_h)
        nj = int(n_h)
        eos = self.cfg.stop_speech_token
        out: Dict[int, np.ndarray] = {}
        self.last_block_tokens = {}
        for s_idx, sl in enumerate(self._slots):
            if sl.rid is None:
                continue
            prev = sl.count
            sl.buf.append(tokens_h[:nj, s_idx])
            sl.count += nj
            if bool(done_h[s_idx]):
                seq = np.concatenate(sl.buf) if sl.buf else np.zeros((0,), np.int32)
                eos_pos = np.nonzero(seq == eos)[0]
                end = int(eos_pos[0]) + 1 if eos_pos.size else seq.shape[0]
                # a limit-terminated row keeps emitting fill-EOS once done;
                # clamping at the limit drops the artificial EOS while a
                # genuine EOS (always within the limit) stays included
                end = min(end, sl.limit)
                out[sl.rid] = seq[:end]
                self.last_block_tokens[sl.rid] = seq[prev:end]
                if self.retain_results:
                    self._results[sl.rid] = out[sl.rid]
                self._slots[s_idx] = _Slot()
            else:
                # a live (not done) row's block tokens are all real samples
                # (an EOS would have flipped done)
                self.last_block_tokens[sl.rid] = tokens_h[:nj, s_idx]
        return out

    def drain(self) -> Dict[int, np.ndarray]:
        """Run until every queued/live request completes; returns all results
        accumulated so far (including earlier step() completions)."""
        while not self.idle:
            self.step()
        return dict(self._results)
