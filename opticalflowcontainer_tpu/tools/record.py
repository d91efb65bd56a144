"""Frame capture utility (reference record_video.py / capture_frame.py
capability, sans RealSense): read N frames from a video source (file path or
camera index) and write an XVID AVI and/or numbered PNGs."""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help="video file path or camera index")
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--out-avi", default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--fps", type=float, default=None,
                    help="output AVI fps (default: the source's fps when it "
                         "reports one, else 30)")
    args = ap.parse_args(argv)

    import os

    import cv2

    src = int(args.source) if args.source.isdigit() else args.source
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise SystemExit(f"cannot open source {args.source}")
    if args.fps is None:
        # write at the source's native rate or playback speed changes;
        # cameras often report 0 here, fall back to 30 like the reference
        args.fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    writer = None
    n = 0
    try:
        while n < args.frames:
            ok, frame = cap.read()
            if not ok:
                break
            if args.out_avi:
                if writer is None:
                    writer = cv2.VideoWriter(
                        args.out_avi, cv2.VideoWriter_fourcc(*"XVID"), args.fps,
                        (frame.shape[1], frame.shape[0]),
                    )
                    if not writer.isOpened():
                        # cv2.VideoWriter fails SILENTLY (missing codec or
                        # directory) and every write() becomes a no-op
                        raise SystemExit(
                            f"cannot open video writer for {args.out_avi}")
                writer.write(frame)
            if args.out_dir:
                os.makedirs(args.out_dir, exist_ok=True)
                cv2.imwrite(os.path.join(args.out_dir, f"frame_{n:05d}.png"), frame)
            n += 1
    finally:
        cap.release()
        if writer is not None:
            writer.release()
    print(f"captured {n} frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
