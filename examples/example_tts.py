"""Single-utterance TTS example (reference: example_tts.py).

With converted checkpoints:
    python examples/example_tts.py --ckpt /path/to/ckpts --ref voice.wav
Without (random weights; exercises the full path, output is not speech):
    python examples/example_tts.py --random --ref voice.wav
"""
import argparse

from chatterbox_embed_tpu.stitching.stitcher import write_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="directory with converted safetensors")
    ap.add_argument("--random", action="store_true", help="random weights (dev)")
    ap.add_argument("--ref", required=True, help="reference voice wav")
    ap.add_argument("--text", default="Ezreal and Jinx teamed up with Ahri, "
                    "Yasuo, and Teemo to take down the enemy's Nexus in record time.")
    ap.add_argument("--out", default="test-tts.wav")
    args = ap.parse_args()

    from chatterbox_embed_tpu import ChatterboxTTS
    tts = (ChatterboxTTS.from_random() if args.random
           else ChatterboxTTS.from_local(args.ckpt))
    wav = tts.generate(args.text, audio_prompt_path=args.ref,
                       exaggeration=0.5, cfg_weight=0.3, temperature=0.6)
    write_wav(args.out, wav[0], tts.sr)
    print(f"wrote {args.out}: {wav.shape[1] / tts.sr:.2f}s @ {tts.sr} Hz")


if __name__ == "__main__":
    main()
