"""Side-by-side comparison GIF maker (reference
pytorch_pwc_master/comparison/comparison.py capability): overlay/alternate two
images or an image + flow visualization into an animated GIF."""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("one")
    ap.add_argument("two")
    ap.add_argument("--out", default="comparison.gif")
    ap.add_argument("--duration-ms", type=int, default=500)
    args = ap.parse_args(argv)

    from PIL import Image

    a = Image.open(args.one).convert("RGB")
    b = Image.open(args.two).convert("RGB").resize(a.size)
    a.save(
        args.out, save_all=True, append_images=[b],
        duration=args.duration_ms, loop=0,
    )
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
