"""Auxiliary subsystems: alignment analyzer, orbax checkpointing, misc utils,
profiling timers."""
import numpy as np
import pytest


def test_alignment_analyzer_monotonic_pass():
    from chatterbox_embed_tpu.models.alignment import AlignmentStreamAnalyzer
    text_len = 20
    a = AlignmentStreamAnalyzer(text_len)
    # clean monotonic alignment: no flags until completion, then long tail
    for i in range(text_len):
        row = np.zeros(text_len)
        row[i] = 1.0
        r = a.step(row)
        assert not r.repetition and not r.false_start
    assert r.complete
    # dwell at the end -> long tail eventually
    for _ in range(20):
        row = np.zeros(text_len)
        row[-1] = 1.0
        r = a.step(row)
    assert r.long_tail


def test_alignment_analyzer_eos_bias():
    from chatterbox_embed_tpu.models.alignment import (AlignmentStreamAnalyzer,
                                                       AlignmentAnalysisResult)
    a = AlignmentStreamAnalyzer(10, eos_idx=5)
    logits = np.zeros(8, np.float32)
    res = AlignmentAnalysisResult(False, True, False, False, True, 9)
    out = a.bias_logits(logits, res)
    assert np.argmax(out) == 5                      # forced EOS
    res2 = AlignmentAnalysisResult(False, False, False, False, False, 3)
    out2 = a.bias_logits(logits, res2)
    assert out2[5] < -1e20                          # suppressed EOS


def test_alignment_repetition_flag():
    from chatterbox_embed_tpu.models.alignment import AlignmentStreamAnalyzer
    a = AlignmentStreamAnalyzer(30)
    positions = [2, 10, 2, 12, 3, 14, 4]            # repeated back-jumps
    r = None
    for p in positions:
        row = np.zeros(30)
        row[p] = 1.0
        r = a.step(row)
    assert r.repetition


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    from chatterbox_embed_tpu.utils import checkpoint as ckpt
    from chatterbox_embed_tpu.models import voice_encoder as VE
    params = VE.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: np.asarray(x), params)
    path = str(tmp_path / "ve_ckpt")
    ckpt.save_params(path, params)
    back = ckpt.load_params(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_misc_utils():
    from chatterbox_embed_tpu.utils.misc import AttrDict, peak_db, rms_db, get_git_sha
    d = AttrDict(a=1)
    assert d.a == 1
    d.b = 2
    assert d["b"] == 2
    x = 0.5 * np.ones(100)
    assert abs(peak_db(x) - (-6.02)) < 0.1
    assert abs(rms_db(x) - (-6.02)) < 0.1
    assert get_git_sha() is None or len(get_git_sha()) >= 6


def test_stage_timers():
    from chatterbox_embed_tpu.utils.profiling import StageTimers
    t = StageTimers()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0
