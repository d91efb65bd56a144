"""Two-image flow CLI: estimate flow between two stills, write .flo and/or an
HSV visualization PNG (reference pytorch_pwc_master/run.py equivalent).

Backends: every method the eval harness knows (farneback — default, no
weights needed — raft, raft_large, pwcnet, neuflow, liteflownet,
liteflownet3), with packaged TPU-trained weights by default, a flat-npz
training candidate via ``--ckpt cand.npz``, or a torch checkpoint via
``--ckpt path.pytorch`` where a converter exists.  Method construction is
shared with ``eval/run_eval.py`` so the two CLIs can never drift.
"""
from __future__ import annotations

import argparse
import os


def estimate_pair(img1, img2, model_name: str = "farneback", ckpt: str | None = None,
                  on_cpu: bool = False):
    """Flow [H,W,2] float32 from two BGR uint8 images (cv2.imread layout)."""
    import numpy as np

    if on_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ..eval.run_eval import _make_method

    run = _make_method(model_name, ckpt, quick=False)
    # the eval methods take RGB floats in [0, 1]
    i1 = np.ascontiguousarray(img1[..., 2::-1]).astype(np.float32) / 255.0
    i2 = np.ascontiguousarray(img2[..., 2::-1]).astype(np.float32) / 255.0
    return np.asarray(run(i1, i2))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("one")
    ap.add_argument("two")
    ap.add_argument("--model", default="farneback")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out-flo", default=None)
    ap.add_argument("--out-png", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    # remote TPU compiles are 20-300 s; persistent cache makes repeat CLI
    # invocations hit compiled programs (same policy as bench.py)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

    import cv2
    import numpy as np

    img1 = cv2.imread(args.one)
    img2 = cv2.imread(args.two)
    assert img1 is not None and img2 is not None, "cannot read inputs"
    flow = np.asarray(estimate_pair(img1, img2, args.model, args.ckpt, args.cpu))
    print(f"flow: shape={flow.shape} mean u={flow[..., 0].mean():+.3f} "
          f"mean v={flow[..., 1].mean():+.3f} max |f|={np.abs(flow).max():.3f}")
    if args.out_flo:
        from ..utils import write_flo

        write_flo(args.out_flo, flow)
        print("wrote", args.out_flo)
    if args.out_png:
        from ..runtime.viz import flow_to_bgr

        cv2.imwrite(args.out_png, flow_to_bgr(flow))
        print("wrote", args.out_png)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
