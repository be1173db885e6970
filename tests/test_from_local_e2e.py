"""End-to-end converted-checkpoint path (the round-1 gap: from_local died on
the missing tokenizer converter before reaching any model).

A synthetic checkpoint directory is built from the REAL reference torch
modules at tiny sizes — their state_dicts carry the exact reference tensor
names, including train-only extras (VoiceEncoder similarity_weight, Llama
embed_tokens) and DSP buffers (tokenizer._mel_filters/window) that the
converter must consume-or-allowlist. Then:

    ChatterboxTTS.from_local(dir) -> prepare_conditionals_with_audio_prompt
        -> generate("hello world") -> 24 kHz waveform.

Reference load path: tts.py:448-500; conditional prep: tts.py:387-417.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import refload
from test_s3tokenizer_parity import _TorchTokenizer, TINY as TOK_TINY
from chatterbox_embed_tpu.config import (ChatterboxConfig, T3Config, LlamaConfig,
                                         S3GenConfig, FlowConfig, ConformerConfig,
                                         FlowDecoderConfig, HiFTConfig,
                                         CAMPPlusConfig, VoiceEncConfig)

H, LAYERS = 64, 2

TINY_CC = ChatterboxConfig(
    t3=T3Config(
        llama=LlamaConfig(hidden_size=H, intermediate_size=128, num_layers=LAYERS,
                          num_heads=4, num_kv_heads=4, head_dim=16),
        text_tokens_dict_size=32, start_text_token=3, stop_text_token=0,
        max_text_tokens=64, max_speech_tokens=128,
        speaker_embed_size=256, speech_cond_prompt_len=6),
    s3gen=S3GenConfig(
        flow=FlowConfig(
            encoder=ConformerConfig(input_size=512, output_size=512,
                                    attention_heads=8, linear_units=96,
                                    num_blocks=1, num_up_blocks=4),
            decoder=FlowDecoderConfig(in_channels=320, out_channels=80,
                                      channels=32, attention_head_dim=8,
                                      num_heads=2, n_blocks=1, num_mid_blocks=1,
                                      time_embed_dim=128)),
        hift=HiFTConfig(base_channels=32, f0_cond_channels=24),
        campplus=CAMPPlusConfig(growth_rate=4, bn_size=2, init_channels=16),
        tokenizer=TOK_TINY),
    voice_encoder=VoiceEncConfig())


def _sd(module, prefix=""):
    return {prefix + k: np.ascontiguousarray(v.detach().numpy())
            for k, v in module.state_dict().items()}


def _build_reference_t3():
    llama_cfgs = refload.load("chatterbox.models.t3.llama_configs")
    cond_enc_mod = refload.load("chatterbox.models.t3.modules.cond_enc")
    perceiver_mod = refload.load("chatterbox.models.t3.modules.perceiver")
    t3_cfg_mod = refload.load("chatterbox.models.t3.modules.t3_config")
    tiny = dict(llama_cfgs.LLAMA_520M_CONFIG_DICT)
    tiny.update(hidden_size=H, intermediate_size=128, num_hidden_layers=LAYERS,
                num_attention_heads=4, num_key_value_heads=4, head_dim=16)
    llama_cfgs.LLAMA_CONFIGS["tiny-e2e"] = tiny

    class TinyHP(t3_cfg_mod.T3Config):
        text_tokens_dict_size = 32
        start_text_token = 3
        stop_text_token = 0
        max_text_tokens = 64
        max_speech_tokens = 128
        llama_config_name = "tiny-e2e"
        speech_cond_prompt_len = 6

    real_perceiver = perceiver_mod.Perceiver
    cond_enc_mod.Perceiver = lambda: real_perceiver(
        pre_attention_query_token=32, pre_attention_query_size=H,
        embedding_dim=H, num_attn_heads=4)
    try:
        t3_top = refload.load("chatterbox.models.t3.t3")
        model = t3_top.T3(TinyHP()).eval()
    finally:
        cond_enc_mod.Perceiver = real_perceiver
    return model


def _build_reference_s3gen_sd():
    ue = refload.load("chatterbox.models.s3gen.transformer.upsample_encoder")
    dec = refload.load("chatterbox.models.s3gen.decoder")
    fm = refload.load("chatterbox.models.s3gen.flow_matching")
    fl = refload.load("chatterbox.models.s3gen.flow")
    hg = refload.load("chatterbox.models.s3gen.hifigan")
    f0 = refload.load("chatterbox.models.s3gen.f0_predictor")
    xv = refload.load("chatterbox.models.s3gen.xvector")

    encoder = ue.UpsampleConformerEncoder(input_size=512, output_size=512,
                                          attention_heads=8, linear_units=96,
                                          num_blocks=1)
    estimator = dec.ConditionalDecoder(in_channels=320, out_channels=80,
                                       channels=[32], attention_head_dim=8,
                                       n_blocks=1, num_mid_blocks=1, num_heads=2,
                                       act_fn="gelu")
    flow = fl.CausalMaskedDiffWithXvec(
        encoder=encoder, decoder=fm.CausalConditionalCFM(estimator=estimator)).eval()
    hift = hg.HiFTGenerator(
        in_channels=80, base_channels=32, upsample_rates=[8, 5, 3],
        upsample_kernel_sizes=[16, 11, 7], istft_params={"n_fft": 16, "hop_len": 4},
        source_resblock_kernel_sizes=[7, 7, 11],
        source_resblock_dilation_sizes=[[1, 3, 5]] * 3,
        f0_predictor=f0.ConvRNNF0Predictor(num_class=1, in_channels=80,
                                           cond_channels=24)).eval()
    camp = xv.CAMPPlus(feat_dim=80, embedding_size=192, growth_rate=4,
                       bn_size=2, init_channels=16).eval()
    tok = _TorchTokenizer(TOK_TINY).eval()

    sd = {}
    sd.update(_sd(flow, "flow."))
    sd.update(_sd(hift, "mel2wav."))
    sd.update(_sd(camp, "speaker_encoder."))
    sd.update(_sd(tok, "tokenizer."))
    # registered buffers the reference ships inside the tokenizer
    # (s3tokenizer.py:44-52) — must be allowlisted, not consumed
    sd["tokenizer._mel_filters"] = np.zeros((128, 201), np.float32)
    sd["tokenizer.window"] = np.hanning(401)[:400].astype(np.float32)
    return sd


def _write_tokenizer_json(path):
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    vocab = {"[STOP]": 0, "[UNK]": 1, "[SPACE]": 2, "[START]": 3}
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[c] = 4 + i
    tok = Tokenizer(BPE(vocab=vocab, merges=[], unk_token="[UNK]"))
    tok.add_special_tokens(["[START]", "[STOP]", "[SPACE]"])
    tok.save(str(path))


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    from safetensors.numpy import save_file
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("ckpt")
    ve = refload.load("chatterbox.models.voice_encoder.voice_encoder")
    save_file(_sd(ve.VoiceEncoder().eval()), str(d / "ve.safetensors"))
    save_file(_sd(_build_reference_t3()), str(d / "t3_cfg.safetensors"))
    save_file(_build_reference_s3gen_sd(), str(d / "s3gen.safetensors"))
    _write_tokenizer_json(d / "tokenizer.json")
    # 1 s 220 Hz tone as the reference voice
    from scipy.io import wavfile
    t = np.arange(16000) / 16000.0
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wavfile.write(str(d / "ref.wav"), 16000, (wav * 32767).astype(np.int16))
    return d


def test_from_local_generate_end_to_end(ckpt_dir):
    from chatterbox_embed_tpu.tts import ChatterboxTTS
    tts = ChatterboxTTS.from_local(ckpt_dir, config=TINY_CC)
    assert tts.conds is None  # no conds.pt in the synthetic dir
    tts.prepare_conditionals_with_audio_prompt(str(ckpt_dir / "ref.wav"))
    gen = tts.conds.gen
    assert int(np.asarray(gen["prompt_token"]).max()) < 6561
    assert np.asarray(gen["prompt_feat"]).shape[-1] == 80
    wav = tts.generate("hello world", audio_prompt_path=str(ckpt_dir / "ref.wav"),
                       max_new_tokens=32, seed=1)
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert wav.shape[1] > 0 and np.isfinite(wav).all()
    # conditional cache: same key -> hit, not a re-prepare
    tts._get_or_prepare_conditionals(audio_prompt_path=str(ckpt_dir / "ref.wav"))
    tts._get_or_prepare_conditionals(audio_prompt_path=str(ckpt_dir / "ref.wav"))
    stats = tts.get_conditional_cache_stats()
    assert stats["hits"] >= 1


def test_vc_from_local(ckpt_dir):
    from chatterbox_embed_tpu.vc import ChatterboxVC
    vc = ChatterboxVC.from_local(ckpt_dir, config=TINY_CC)
    vc.set_target_voice(str(ckpt_dir / "ref.wav"))
    out = vc.generate(str(ckpt_dir / "ref.wav"))
    out = np.asarray(out)
    assert out.size > 0 and np.isfinite(out).all()


def test_from_local_int8(ckpt_dir, monkeypatch):
    """int8 opt-in on the converted-checkpoint path: quantized backbone loads
    and generates; env flag is equivalent to the kwarg."""
    from chatterbox_embed_tpu.tts import ChatterboxTTS
    tts = ChatterboxTTS.from_local(ckpt_dir, config=TINY_CC, int8=True)
    lp = tts.t3_params["llama"]["layers"][0]["q"]
    assert np.asarray(lp["w_q"]).dtype == np.int8 and "scale" in lp
    wav = tts.generate("hello world", audio_prompt_path=str(ckpt_dir / "ref.wav"),
                       max_new_tokens=16, seed=1)
    assert wav.shape[1] > 0 and np.isfinite(np.asarray(wav)).all()
    monkeypatch.setenv("CHATTERBOX_INT8", "1")
    tts2 = ChatterboxTTS.from_local(ckpt_dir, config=TINY_CC)
    lp2 = tts2.t3_params["llama"]["layers"][0]["q"]
    assert np.asarray(lp2["w_q"]).dtype == np.int8
    # CHATTERBOX_INT8=0 keeps fp even on accelerator backends (kill-switch)
    monkeypatch.setenv("CHATTERBOX_INT8", "0")
    tts3 = ChatterboxTTS.from_local(ckpt_dir, config=TINY_CC)
    assert "w" in tts3.t3_params["llama"]["layers"][0]["q"]
    # S3Gen int8 flow-stack opt-in on the same path
    monkeypatch.setenv("CHATTERBOX_INT8_S3GEN", "1")
    tts4 = ChatterboxTTS.from_local(ckpt_dir, config=TINY_CC)
    blk = tts4.s3gen_params["flow"]["decoder"]["down"]["tblocks"][0]["q"]
    assert np.asarray(blk["w_q"]).dtype == np.int8
    wav = tts4.generate("hello again", audio_prompt_path=str(ckpt_dir / "ref.wav"),
                        max_new_tokens=16, seed=2)
    assert wav.shape[1] > 0 and np.isfinite(np.asarray(wav)).all()
