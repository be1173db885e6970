"""Voice conversion example (reference: example_vc.py)."""
import argparse

from chatterbox_embed_tpu.stitching.stitcher import write_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="directory with converted safetensors")
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--source", required=True, help="audio to convert")
    ap.add_argument("--target", required=True, help="target voice wav")
    ap.add_argument("--out", default="test-vc.wav")
    args = ap.parse_args()

    from chatterbox_embed_tpu import ChatterboxVC
    vc = (ChatterboxVC.from_random() if args.random
          else ChatterboxVC.from_local(args.ckpt))
    wav = vc.generate(args.source, target_voice_path=args.target)
    write_wav(args.out, wav[0], vc.sr)
    print(f"wrote {args.out}: {wav.shape[1] / vc.sr:.2f}s @ {vc.sr} Hz")


if __name__ == "__main__":
    main()
