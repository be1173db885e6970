"""Batched + multi-chip serving example (capabilities beyond the reference,
which decodes one utterance at a time: SURVEY §2.6).

Single chip, lock-step batch (weights stream ONCE per step for all rows):
    python examples/example_batch_serving.py --random --ref voice.wav

Multi-chip dp x tp mesh (rows over dp, Megatron weights over tp) — on a
real slice, or locally on a virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/example_batch_serving.py --random --ref voice.wav --mesh 2x4

Perf knobs (measured on v5e, PERF_NOTES.md):
    CHATTERBOX_INT8=0        disable the int8 T3 backbone (TPU default on)
    CHATTERBOX_INT8_KV=1     int8 KV cache for batched decode (KV-bandwidth
                             bound at batch >= 8)
    CHATTERBOX_INT8_S3GEN=1  int8 flow-stack linears
    CHATTERBOX_S3GEN_SUB_BATCH=16  S3Gen live-batch cap
"""
import argparse
import time

from chatterbox_embed_tpu.stitching.stitcher import write_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="directory with converted safetensors")
    ap.add_argument("--random", action="store_true", help="random weights (dev)")
    ap.add_argument("--ref", required=True, help="reference voice wav")
    ap.add_argument("--mesh", default=None,
                    help="dp x tp serving mesh, e.g. 2x4 (omit = single chip)")
    ap.add_argument("--out-prefix", default="batch")
    args = ap.parse_args()

    from chatterbox_embed_tpu import ChatterboxTTS
    tts = (ChatterboxTTS.from_random() if args.random
           else ChatterboxTTS.from_local(args.ckpt))
    if args.mesh:
        dp, tp = (int(x) for x in args.mesh.lower().split("x"))
        tts.enable_mesh(n_devices=dp * tp, tp=tp)

    texts = [
        "The first sentence decodes in lock step with all the others.",
        "Every decode step streams the backbone weights exactly once.",
        "Per row sampling parameters ride along as traced vectors.",
        "And the flow matcher synthesises the whole batch together.",
    ]
    tts.prepare_conditionals_with_audio_prompt(args.ref, exaggeration=0.5)
    t0 = time.time()
    wavs = tts.generate_batch(texts, cfg_weight=0.4, temperature=0.7,
                              max_new_tokens=300, seed=0)
    wall = time.time() - t0
    for i, w in enumerate(wavs):
        write_wav(f"{args.out_prefix}-{i}.wav", w, tts.sr)
    audio = sum(w.size for w in wavs) / tts.sr
    print(f"{len(wavs)} utterances, {audio:.1f}s audio in {wall:.1f}s "
          f"(rtf {wall / max(audio, 1e-9):.4f}); per-request perf: {tts.perf}")


if __name__ == "__main__":
    main()
