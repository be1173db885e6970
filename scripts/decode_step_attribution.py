"""Component-level attribution of the B=2 decode step (VERDICT r3 #1).

The single-utterance CFG decode runs ~2.3 ms/step bf16 against a ~1.3 ms
weight-streaming floor. Rounds 2-3 bounded the residual only coarsely
(sampling+head ~0.34 ms by elimination; fused-step study: "serial small-op
chain"). This measures a CUMULATIVE ablation ladder where each variant
mirrors the real llama decode layer built from the same layers.py
primitives and the same full-size params, so adjacent differences attribute
cost per component:

  V0 matmul_chain   rms_norm + q/k/v + o + gate/up/down + residuals + final
                    norm (attention output zeroed; no rope/cache/attention).
                    This IS the weight-streaming serial chain: compare
                    directly against the 1.3 ms floor (1.06 GB / 819 GB/s).
  V1 +rope          V0 + RoPE on q/k.
  V2 +insert        V1 + the per-layer sequence-major cache writes
                    (dynamic_update_slice x2, donated carry).
  V3 +flash_attn    V2 + the Pallas flash decode attention (= product path).
  V3x +xla_attn     V2 + the XLA einsum attention (the batch path).
  V4 +sample_head   V3 + speech head matmul (fp32, V=8194) + CFG mix +
                    process_logits + sample + counts scatter + embed lookup
                    (= the full product body minus alignment).

Timing: lax.scan with donated carry; fresh inputs per timed call (the
remote backend memoizes identical executions); slope over two scan lengths
removes the RTT constant (PERF_NOTES timing traps).

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/decode_step_attribution.py
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import T3Config
from chatterbox_embed_tpu.models import t3 as t3_mod
from chatterbox_embed_tpu.models import llama
from chatterbox_embed_tpu.models import layers as L
from chatterbox_embed_tpu.ops import sampling
from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

CFG = T3Config()
LC = CFG.llama
B = 2                      # single-utterance CFG pair
TOTAL = 512
POS0 = 384                 # mid-decode position
DTYPE = jnp.bfloat16
S_SHORT, S_LONG = 128, 512


def _tiny():
    """CPU-smoke config: validates the harness mechanics, not the numbers."""
    global CFG, LC, TOTAL, POS0, DTYPE, S_SHORT, S_LONG
    from chatterbox_embed_tpu.config import LlamaConfig
    CFG = T3Config(llama=LlamaConfig(hidden_size=64, intermediate_size=128,
                                     num_layers=2, num_heads=4, num_kv_heads=4,
                                     head_dim=16),
                   max_text_tokens=64, max_speech_tokens=128,
                   speech_cond_prompt_len=8)
    LC = CFG.llama
    global FLASH_OK
    TOTAL, POS0, DTYPE = 128, 64, jnp.float32
    S_SHORT, S_LONG = 4, 12
    FLASH_OK = False


FLASH_OK = True


def build_params():
    t0 = time.time()
    params = init_on_cpu(t3_mod.init, jax.random.PRNGKey(0), CFG)
    params = to_default_device(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x,
        params))
    jax.block_until_ready(params)
    print(f"[attr] params ready {time.time() - t0:.1f}s", file=sys.stderr)
    return params


def layer_step(lp, h, cos, sin, ck, cv, li, cache_pos, variant: str):
    """One llama layer mirroring llama.forward's t==1 decode path, with the
    cumulative ablation `variant`."""
    hin = L.rms_norm(lp["ln1"], h, LC.rms_norm_eps)
    q = L.split_heads(L.linear(lp["q"], hin, DTYPE), LC.num_heads)
    k = L.split_heads(L.linear(lp["k"], hin, DTYPE), LC.num_kv_heads)
    v = L.split_heads(L.linear(lp["v"], hin, DTYPE), LC.num_kv_heads)
    if variant != "V0":
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
    if variant not in ("V0", "V1"):
        k_seq = jnp.swapaxes(k, 0, 1)[None].astype(ck.dtype)
        v_seq = jnp.swapaxes(v, 0, 1)[None].astype(cv.dtype)
        ck = jax.lax.dynamic_update_slice(ck, k_seq, (li, cache_pos, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_seq, (li, cache_pos, 0, 0, 0))
    if variant in ("V3", "V4") and FLASH_OK:
        from chatterbox_embed_tpu.kernels.flash_decode import decode_attention
        att = decode_attention(q[:, 0], ck[li], cv[li], cache_pos,
                               start=jnp.int32(0), hole=None)[:, None]
    elif variant == "V3x" or (variant in ("V3", "V4") and not FLASH_OK):
        kc, vc = ck[li].astype(DTYPE), cv[li].astype(DTYPE)
        logits = jnp.einsum("bhd,lbhd->bhl", q[:, 0], kc,
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(LC.head_dim)
        km = (jnp.arange(TOTAL)[None, :] <= cache_pos)
        logits = jnp.where(km[:, None, :], logits, jnp.float32(-1e10))
        w = jax.nn.softmax(logits, axis=-1)
        att = jnp.einsum("bhl,lbhd->bhd", w.astype(DTYPE), vc)[:, None]
    else:
        att = jnp.zeros_like(q)
    h = h + L.linear(lp["o"], L.merge_heads(att), DTYPE)
    hin = L.rms_norm(lp["ln2"], h, LC.rms_norm_eps)
    mlp = L.linear(lp["down"],
                   jax.nn.silu(L.linear(lp["gate"], hin, DTYPE))
                   * L.linear(lp["up"], hin, DTYPE), DTYPE)
    return h + mlp, ck, cv


def make_scan(variant: str, steps: int):
    sp = t3_mod.SamplingParams(jnp.float32(0.7), jnp.float32(0.5),
                               jnp.float32(1.2), jnp.float32(0.05))

    # params are a jit ARGUMENT (like the product decode): closing over the
    # full-size tree bakes ~1 GB of weights into the HLO as constants and
    # the remote compile endpoint rejects the body (HTTP 413)
    @functools.partial(jax.jit, static_argnames=(), donate_argnums=(0, 1))
    def run(cache_k, cache_v, x0, key, params):
        lparams = params["llama"]

        def body(c, i):
            h, ck, cv, counts = c
            cache_pos = POS0 + (i % 64)          # stay in-capacity
            pos_id = jnp.full((B, 1), cache_pos, jnp.int32)
            cos, sin = llama.rope_cos_sin(pos_id, LC)
            hh = h
            for li, lp in enumerate(lparams["layers"]):
                hh, ck, cv = layer_step(lp, hh, cos, sin, ck, cv, li,
                                        cache_pos, variant)
            hh = L.rms_norm(lparams["norm"], hh, LC.rms_norm_eps)
            if variant == "V4":
                logits = L.linear(params["speech_head"], hh[:, -1], jnp.float32)
                lc, lu = logits[:1], logits[1:]
                lg = lc + sp.cfg_weight * (lc - lu)
                lg = sampling.process_logits(
                    lg, counts, valid_size=CFG.start_speech_token,
                    eos_id=CFG.stop_speech_token, temperature=sp.temperature,
                    repetition_penalty_val=sp.repetition_penalty,
                    min_p=sp.min_p, top_p=jnp.float32(1.0), use_top_p=False)
                tok = sampling.sample_token(jax.random.fold_in(key, i), lg)
                counts = counts.at[jnp.arange(1), tok].add(1)
                emb = (L.embedding(params["speech_emb"], tok)
                       + params["speech_pos_emb"]["w"][(i + 1) % 512][None])
                nh = jnp.concatenate([emb, emb], axis=0)[:, None, :].astype(DTYPE)
            else:
                # feed the output back so steps cannot be elided
                nh = (hh * jnp.float32(1e-3).astype(DTYPE))
            return (nh, ck, cv, counts), ()

        counts0 = jnp.zeros((1, CFG.speech_tokens_dict_size), jnp.int32)
        (h, ck, cv, _), _ = jax.lax.scan(body, (x0, cache_k, cache_v, counts0),
                                         jnp.arange(steps))
        return h, ck[0, 0, 0, 0, 0], cv[0, 0, 0, 0, 0]

    return run


def fresh_cache(rng):
    shape = (LC.num_layers, TOTAL, B, LC.num_kv_heads, LC.head_dim)
    return (jnp.asarray(rng.standard_normal(shape), DTYPE),
            jnp.asarray(rng.standard_normal(shape), DTYPE))


def time_variant(params, variant: str):
    rng = np.random.default_rng(1)
    out = {}
    for steps in (S_SHORT, S_LONG):
        fn = make_scan(variant, steps)
        # compile + warm with one throwaway call
        ck, cv = fresh_cache(rng)
        x0 = jnp.asarray(rng.standard_normal((B, 1, LC.hidden_size)), DTYPE)
        r = fn(ck, cv, x0, jax.random.PRNGKey(0), params)
        np.asarray(r[1])                          # fetch barrier
        ts = []
        for it in range(3):
            ck, cv = fresh_cache(rng)
            x0 = jnp.asarray(rng.standard_normal((B, 1, LC.hidden_size)), DTYPE)
            t0 = time.time()
            r = fn(ck, cv, x0, jax.random.PRNGKey(it + 1), params)
            np.asarray(r[1])
            ts.append(time.time() - t0)
        out[steps] = float(np.median(ts))
    slope_ms = 1000.0 * (out[S_LONG] - out[S_SHORT]) / (S_LONG - S_SHORT)
    return slope_ms, out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="V0,V1,V2,V3,V3x,V4",
                    help="comma list (V3 needs the TPU Pallas kernel)")
    ap.add_argument("--steps", default=None,
                    help="override short,long scan lengths e.g. 16,64")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke config")
    args = ap.parse_args()
    global S_SHORT, S_LONG
    if args.tiny:
        _tiny()
    if args.steps:
        S_SHORT, S_LONG = (int(x) for x in args.steps.split(","))
    params = build_params()
    rows = {}
    for variant in args.variants.split(","):
        ms, raw = time_variant(params, variant)
        rows[variant] = ms
        print(f"[attr] {variant}: {ms:.3f} ms/step  (raw {raw})",
              file=sys.stderr)
    attr = {"weight_floor_ms": 1.3}
    if "V0" in rows:
        attr["matmul_chain_ms"] = rows["V0"]
        attr["chain_over_floor_ms"] = rows["V0"] - 1.3
    if "V1" in rows and "V0" in rows:
        attr["rope_ms"] = rows["V1"] - rows["V0"]
    if "V2" in rows and "V1" in rows:
        attr["cache_insert_ms"] = rows["V2"] - rows["V1"]
    if "V3" in rows and "V2" in rows:
        attr["flash_attention_ms"] = rows["V3"] - rows["V2"]
    if "V3x" in rows and "V2" in rows:
        attr["xla_attention_ms"] = rows["V3x"] - rows["V2"]
    if "V4" in rows and "V3" in rows:
        attr["sampling_head_ms"] = rows["V4"] - rows["V3"]
    if "V4" in rows:
        attr["full_product_ms"] = rows["V4"]
    print(json.dumps({"per_variant_ms": rows, "attribution": attr}))


if __name__ == "__main__":
    main()
