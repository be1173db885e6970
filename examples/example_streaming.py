"""Streaming TTS example — a capability the reference does not expose.

The first audio chunk is synthesised by ONE fused device dispatch
(chatterbox_embed_tpu/streaming.py: context + prefill + 25-token decode +
flow window + vocoder; TTFA p50 0.133 s on a TPU v5e), then the windowed
incremental path emits ~1 s chunks at O(prompt + window) cost per chunk.

With converted checkpoints:
    python examples/example_streaming.py --ckpt /path/to/ckpts --ref voice.wav
Without (random weights; exercises the full path, output is not speech):
    python examples/example_streaming.py --random --ref voice.wav
"""
import argparse
import time

import numpy as np

from chatterbox_embed_tpu.stitching.stitcher import write_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="directory with converted safetensors")
    ap.add_argument("--random", action="store_true", help="random weights (dev)")
    ap.add_argument("--ref", required=True, help="reference voice wav")
    ap.add_argument("--text", default="Real-time speech streams chunk by "
                    "chunk, the first one in a single fused dispatch.")
    ap.add_argument("--out", default="test-stream.wav")
    args = ap.parse_args()

    from chatterbox_embed_tpu import ChatterboxTTS
    tts = (ChatterboxTTS.from_random() if args.random
           else ChatterboxTTS.from_local(args.ckpt))
    tts.prepare_conditionals_with_audio_prompt(args.ref)

    t0 = time.time()
    chunks = []
    for i, chunk in enumerate(tts.stream_generate(args.text)):
        tag = "TTFA" if i == 0 else "chunk"
        print(f"[{tag}] +{time.time() - t0:.3f}s: {chunk.size} samples")
        chunks.append(chunk)
    wav = np.concatenate(chunks) if chunks else np.zeros(1, np.float32)
    write_wav(args.out, wav, tts.sr)
    print(f"wrote {args.out}: {wav.size / tts.sr:.2f}s in {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
