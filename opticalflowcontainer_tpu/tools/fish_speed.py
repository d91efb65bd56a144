"""ROI-based object speed from a still pair (reference calcFishSpeed.py
capability): estimate flow, report full-image and ROI mean displacement,
convert to m/s with pixel_to_meter and dt, render ROI + flow-shifted ROI
overlays and an HSV flow image.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("one")
    ap.add_argument("two")
    ap.add_argument("--roi", type=int, nargs=4, metavar=("X", "Y", "W", "H"),
                    default=None, help="region of interest (default: center third)")
    ap.add_argument("--pixel-to-meter", type=float, default=0.000566)
    ap.add_argument("--dt", type=float, default=1.0 / 30.0)
    ap.add_argument("--model", default="farneback")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out-prefix", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

    import cv2
    import numpy as np

    from .run_pair import estimate_pair

    img1 = cv2.imread(args.one)
    img2 = cv2.imread(args.two)
    assert img1 is not None and img2 is not None, "cannot read inputs"
    H, W = img1.shape[:2]
    if args.roi is None:
        args.roi = [W // 3, H // 3, W // 3, H // 3]
    x, y, w, h = args.roi
    if not (w > 0 and h > 0 and 0 <= x and 0 <= y
            and x + w <= W and y + h <= H):
        raise SystemExit(
            f"--roi {x} {y} {w} {h} is not inside the {W}x{H} image "
            "(numpy would silently clamp the slice and the reported speed "
            "would cover a different region, or NaN on an empty one)")

    flow = np.asarray(estimate_pair(img1, img2, args.model, args.ckpt, args.cpu))
    full_mu = flow.reshape(-1, 2).mean(axis=0)
    roi_mu = flow[y : y + h, x : x + w].reshape(-1, 2).mean(axis=0)
    vx = roi_mu[0] / args.dt * args.pixel_to_meter
    vy = roi_mu[1] / args.dt * args.pixel_to_meter
    print(f"full-image mean displacement: ({full_mu[0]:+.2f}, {full_mu[1]:+.2f}) px")
    print(f"ROI mean displacement:        ({roi_mu[0]:+.2f}, {roi_mu[1]:+.2f}) px")
    print(f"ROI speed: vx={vx:+.4f} m/s  vy={vy:+.4f} m/s "
          f"(dt={args.dt}s, p2m={args.pixel_to_meter})")

    if args.out_prefix:
        from ..runtime.viz import flow_to_bgr

        a = img1.copy()
        b = img2.copy()
        cv2.rectangle(a, (x, y), (x + w, y + h), (0, 255, 0), 2)
        sx, sy = int(round(roi_mu[0])), int(round(roi_mu[1]))
        cv2.rectangle(b, (x, y), (x + w, y + h), (0, 255, 0), 2)
        cv2.rectangle(b, (x + sx, y + sy), (x + w + sx, y + h + sy), (0, 0, 255), 2)
        cv2.imwrite(args.out_prefix + "_one.png", a)
        cv2.imwrite(args.out_prefix + "_two.png", b)
        cv2.imwrite(args.out_prefix + "_flow.png", flow_to_bgr(flow))
        print("wrote", args.out_prefix + "_{one,two,flow}.png")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
