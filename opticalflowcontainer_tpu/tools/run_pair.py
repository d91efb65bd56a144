"""Two-image flow CLI: estimate flow between two stills, write .flo and/or an
HSV visualization PNG (reference pytorch_pwc_master/run.py equivalent).

Backends: farneback (default, no weights needed) or any model with a
checkpoint (--model pwcnet --ckpt path.pytorch).
"""
from __future__ import annotations

import argparse


def estimate_pair(img1, img2, model_name: str = "farneback", ckpt: str | None = None,
                  on_cpu: bool = False):
    import numpy as np

    if on_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if model_name == "farneback":
        from ..classical import calc_optical_flow_farneback
        from ..core.color import bgr_to_gray

        g1 = np.asarray(bgr_to_gray(img1.astype(np.float32)))
        g2 = np.asarray(bgr_to_gray(img2.astype(np.float32)))
        return np.asarray(calc_optical_flow_farneback(g1, g2))

    import jax

    i1 = img1.astype("float32") / 255.0
    i2 = img2.astype("float32") / 255.0
    if model_name == "pwcnet":
        from ..models import PWCNet
        from ..models.pwcnet import estimate
        from ..models.convert import convert_pwcnet

        model = PWCNet()
        params = _load(convert_pwcnet, ckpt, model, i1, i2)
        return estimate(model, params, i1, i2)
    if model_name == "raft":
        from ..models import RAFTSmall
        from ..models.raft import estimate as raft_estimate

        model = RAFTSmall()
        params = model.init(jax.random.PRNGKey(0), i1[:64, :64], i2[:64, :64], 2)
        return raft_estimate(model, params, i1, i2)
    raise SystemExit(f"unknown model {model_name}")


def _load(converter, ckpt, model, i1, i2):
    import jax

    if ckpt:
        import torch

        sd = torch.load(ckpt, map_location="cpu")
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        return converter({k: v.numpy() for k, v in sd.items()})
    return model.init(jax.random.PRNGKey(0), i1, i2)


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
