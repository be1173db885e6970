"""T3 parity vs the mounted torch reference (models/t3/t3.py).

A tiny Llama config is injected into the reference's LLAMA_CONFIGS registry
and the (1024-hardcoded) Perceiver ctor is re-bound at matching tiny dims, so
the REAL reference T3 module runs end-to-end on CPU. Weights convert through
utils.weights.convert_t3 — the same path full checkpoints take.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import refload
from chatterbox_embed_tpu.config import T3Config, LlamaConfig
from chatterbox_embed_tpu.models import t3 as t3_mod
from chatterbox_embed_tpu.utils import weights as W

TOL = dict(atol=3e-3, rtol=1e-2)

H, HEADS, LAYERS, SPK = 64, 4, 2, 16

OURS_CFG = T3Config(
    llama=LlamaConfig(hidden_size=H, intermediate_size=128, num_layers=LAYERS,
                      num_heads=HEADS, num_kv_heads=HEADS, head_dim=16),
    text_tokens_dict_size=48, speech_tokens_dict_size=40,
    start_text_token=4, stop_text_token=0,
    start_speech_token=36, stop_speech_token=37,
    max_text_tokens=64, max_speech_tokens=128,
    speaker_embed_size=SPK, speech_cond_prompt_len=6)


@pytest.fixture(scope="module")
def ref_t3():
    llama_cfgs = refload.load("chatterbox.models.t3.llama_configs")
    cond_enc_mod = refload.load("chatterbox.models.t3.modules.cond_enc")
    perceiver_mod = refload.load("chatterbox.models.t3.modules.perceiver")
    t3_cfg_mod = refload.load("chatterbox.models.t3.modules.t3_config")

    tiny = dict(llama_cfgs.LLAMA_520M_CONFIG_DICT)
    tiny.update(hidden_size=H, intermediate_size=128, num_hidden_layers=LAYERS,
                num_attention_heads=HEADS, num_key_value_heads=HEADS, head_dim=16)
    llama_cfgs.LLAMA_CONFIGS["tiny"] = tiny

    class TinyHP(t3_cfg_mod.T3Config):
        text_tokens_dict_size = 48
        start_text_token = 4
        stop_text_token = 0
        speech_tokens_dict_size = 40
        start_speech_token = 36
        stop_speech_token = 37
        max_text_tokens = 64
        max_speech_tokens = 128
        llama_config_name = "tiny"
        speaker_embed_size = SPK
        speech_cond_prompt_len = 6

    # T3CondEnc instantiates Perceiver() with its hardcoded 1024-d defaults;
    # re-bind to the tiny hidden size (same module, different ctor args).
    real_perceiver = perceiver_mod.Perceiver
    cond_enc_mod.Perceiver = lambda: real_perceiver(
        pre_attention_query_token=32, pre_attention_query_size=H,
        embedding_dim=H, num_attn_heads=4)
    try:
        t3_top = refload.load("chatterbox.models.t3.t3")
        torch.manual_seed(0)
        model = t3_top.T3(TinyHP()).eval()
    finally:
        cond_enc_mod.Perceiver = real_perceiver
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray,
                          W.convert_t3(sd, num_layers=LAYERS))
    return model, params


def _conds(rng, cond_enc_mod):
    spk = rng.standard_normal((1, SPK)).astype(np.float32)
    prompt = rng.integers(0, 36, (1, 6)).astype(np.int64)
    ref_cond = cond_enc_mod.T3Cond(
        speaker_emb=torch.from_numpy(spk),
        cond_prompt_speech_tokens=torch.from_numpy(prompt),
        emotion_adv=0.5 * torch.ones(1, 1, 1))
    our_cond = t3_mod.T3Cond(
        speaker_emb=jnp.asarray(spk),
        cond_prompt_speech_tokens=jnp.asarray(prompt.astype(np.int32)),
        emotion_adv=0.5)
    return ref_cond, our_cond


def test_cond_embeds_parity(ref_t3, rng):
    model, params = ref_t3
    cond_enc_mod = refload.load("chatterbox.models.t3.modules.cond_enc")
    ref_cond, our_cond = _conds(rng, cond_enc_mod)
    with torch.no_grad():
        ref = model.prepare_conditioning(ref_cond).numpy()
    ours = t3_mod.cond_embeds(params, our_cond, OURS_CFG)
    assert ours.shape == ref.shape  # (1, 34, H)
    np.testing.assert_allclose(np.asarray(ours), ref, **TOL)


def test_teacher_forced_forward_parity(ref_t3, rng):
    """Reference projects latents at the token's own position; ours uses the
    standard next-token shift (documented in t3.loss). Compare shifted."""
    model, params = ref_t3
    cond_enc_mod = refload.load("chatterbox.models.t3.modules.cond_enc")
    ref_cond, our_cond = _conds(rng, cond_enc_mod)
    lt, ls = 10, 14
    text = rng.integers(1, 48, (1, lt)).astype(np.int64)
    text[:, 0] = 4   # BOT
    text[:, -1] = 0  # EOT
    speech = rng.integers(0, 36, (1, ls)).astype(np.int64)
    with torch.no_grad():
        out = model(t3_cond=ref_cond,
                    text_tokens=torch.from_numpy(text),
                    text_token_lens=torch.tensor([lt]),
                    speech_tokens=torch.from_numpy(speech),
                    speech_token_lens=torch.tensor([ls]))
    tl, sl = t3_mod.forward(params, our_cond,
                            jnp.asarray(text.astype(np.int32)), jnp.asarray([lt]),
                            jnp.asarray(speech.astype(np.int32)), jnp.asarray([ls]),
                            OURS_CFG)
    np.testing.assert_allclose(np.asarray(tl)[:, 1:], out.text_logits.numpy()[:, :-1],
                               **TOL)
    np.testing.assert_allclose(np.asarray(sl)[:, 1:], out.speech_logits.numpy()[:, :-1],
                               **TOL)


@pytest.mark.parametrize("cfg_weight", [0.5, 0.0])
def test_inference_token_parity(ref_t3, rng, cfg_weight):
    """Near-greedy decode (tiny temperature makes multinomial deterministic):
    the full reference inference loop (vocab mask -> temperature -> repetition
    penalty -> min-p -> top-p -> sample -> KV-cached step) must emit the
    identical token stream."""
    model, params = ref_t3
    cond_enc_mod = refload.load("chatterbox.models.t3.modules.cond_enc")
    ref_cond, our_cond = _conds(rng, cond_enc_mod)
    lt = 8
    text = rng.integers(1, 48, (1, lt)).astype(np.int64)
    text[:, 0] = 4
    text[:, -1] = 0
    n_rows = 2 if cfg_weight > 0 else 1
    text_in = np.repeat(text, n_rows, axis=0)
    kw = dict(max_new_tokens=24, temperature=1e-3, min_p=0.05, top_p=1.0,
              repetition_penalty=1.2)
    with torch.no_grad():
        ref_tokens = model.inference(
            t3_cond=cond_enc_mod.T3Cond(
                speaker_emb=ref_cond.speaker_emb,
                cond_prompt_speech_tokens=ref_cond.cond_prompt_speech_tokens,
                emotion_adv=ref_cond.emotion_adv),
            text_tokens=torch.from_numpy(text_in),
            cfg_weight=cfg_weight, **kw).numpy()[0]
    ours = t3_mod.generate(params, our_cond, text.astype(np.int32),
                           cfg_weight=cfg_weight, seed=0, cfg=OURS_CFG, **kw)
    n = min(len(ours), len(ref_tokens))
    assert n >= 8, (ours, ref_tokens)
    np.testing.assert_array_equal(np.asarray(ours)[:n], ref_tokens[:n])
