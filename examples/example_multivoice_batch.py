"""Multi-voice batched serving (round-4 capability, beyond the reference —
the reference runs ONE voice per job; here requests for DIFFERENT voices
decode in the same lock-step batch).

How it works (chatterbox_embed_tpu/tts.py generate_batch):
  - T3: each row carries its own speaker embedding / cond prompt tokens /
    emotion as per-row conditioning rows; the backbone weights stream ONCE
    per step for the whole batch regardless of how many voices ride in it.
  - S3Gen: per-row reference prompts of DIFFERENT lengths are padded to a
    common 64-token bucket and laid out contiguously per row by a gather
    (models/s3gen.py prompt_len) — output parity vs each voice's solo run
    is pinned by tests/test_s3gen.py.
  - The stacked per-voice prompt bundle is device-cached per voice tuple,
    so a serving frontend that groups requests by a stable voice set pays
    the host->device transfer once.

Frontend pattern: collect pending short requests for up to ~100 ms, group
them (any mix of voices), then:

    wavs = tts.generate_batch([r.text for r in reqs],
                              conds=[r.conds for r in reqs],
                              seed=0)

The Redis worker does this natively for full story jobs: WORKER_MAX_BATCH=N
drains up to N waiting TTS jobs into one pooled multi-voice decode
(serving/jobs.py:generate_tts_stories_batch) — per-job stitching, storage,
and status are unchanged.

Run (dev, random weights):
    python examples/example_multivoice_batch.py --random \
        --refs alice.wav bob.wav carol.wav
"""
import argparse
import time

from chatterbox_embed_tpu.stitching.stitcher import write_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="directory with converted safetensors")
    ap.add_argument("--random", action="store_true", help="random weights (dev)")
    ap.add_argument("--refs", nargs="+", required=True,
                    help="one reference wav per voice")
    ap.add_argument("--out-prefix", default="mv")
    args = ap.parse_args()

    from chatterbox_embed_tpu import ChatterboxTTS
    tts = (ChatterboxTTS.from_random() if args.random
           else ChatterboxTTS.from_local(args.ckpt))

    # one Conditionals per voice (a serving frontend would cache these per
    # voice_id — tts._get_or_prepare_conditionals does exactly that)
    voices = []
    for ref in args.refs:
        tts.prepare_conditionals_with_audio_prompt(ref, exaggeration=0.5)
        voices.append(tts.conds)

    texts = [f"Hello, this is voice number {i}." for i in range(len(voices))]
    t0 = time.time()
    wavs = tts.generate_batch(texts, conds=voices, cfg_weight=0.4,
                              temperature=0.7, max_new_tokens=200, seed=0)
    wall = time.time() - t0
    for i, w in enumerate(wavs):
        write_wav(f"{args.out_prefix}-{i}.wav", w, tts.sr)
    audio = sum(w.size for w in wavs) / tts.sr
    print(f"{len(wavs)} voices in one batch, {audio:.1f}s audio in {wall:.1f}s "
          f"(rtf {wall / max(audio, 1e-9):.4f})")


if __name__ == "__main__":
    main()
