"""Flow eval harness CLI: EPE tables for any method over Sintel / KITTI /
synthetic data (fills the reference's missing benchmark numbers, SURVEY.md §6).

  python -m opticalflowcontainer_tpu.eval.run_eval --method farneback --cpu
  python -m opticalflowcontainer_tpu.eval.run_eval --method raft --sintel /data/sintel
"""
from __future__ import annotations

import argparse
import json
import time


def _make_method(name: str, ckpt: str | None, quick: bool):
    import numpy as np

    if name == "farneback":
        import functools

        import jax

        from ..classical import calc_optical_flow_farneback

        fn = jax.jit(functools.partial(calc_optical_flow_farneback))

        def run(img1, img2):
            g1 = (img1[..., :3].mean(-1) * 255).astype(np.float32)
            g2 = (img2[..., :3].mean(-1) * 255).astype(np.float32)
            return np.asarray(fn(g1, g2))

        return run
    if name in ("raft", "raft_large", "pwcnet", "neuflow",
                "liteflownet", "liteflownet3"):
        import jax

        if name in ("raft", "raft_large"):
            from ..models import RAFT, RAFTSmall
            from ..models.raft import (
                estimate,
                load_raft_small_synth,
                load_raft_synth,
            )

            loaded = (load_raft_synth() if name == "raft_large"
                      else load_raft_small_synth())
            model = loaded[0] if loaded else (
                RAFT() if name == "raft_large" else RAFTSmall())

            def run(img1, img2):
                if not hasattr(run, "params"):
                    run.params = loaded[1] if loaded else model.init(
                        jax.random.PRNGKey(0), img1[:64, :64], img2[:64, :64], 2
                    )
                return np.asarray(estimate(model, run.params, img1, img2,
                                           iters=4 if quick else 12))

            return run
        if name == "neuflow":
            from ..models import NeuFlowLite
            from ..models.neuflow import estimate as nf_estimate
            from ..models.neuflow import load_neuflow_lite_synth

            loaded = load_neuflow_lite_synth()
            model = loaded[0] if loaded else NeuFlowLite()

            def run(img1, img2):
                if not hasattr(run, "params"):
                    run.params = loaded[1] if loaded else model.init(
                        jax.random.PRNGKey(0), img1[:64, :64], img2[:64, :64]
                    )
                return np.asarray(nf_estimate(model, run.params, img1, img2))

            return run
        if name == "pwcnet":
            from ..models import PWCNet
            from ..models.pwcnet import estimate as pwc_estimate
            from ..models.pwcnet import load_pwcnet_synth
            from ..models.convert import convert_pwcnet

            loaded = load_pwcnet_synth()
            model = loaded[0] if loaded else PWCNet()

            def run(img1, img2):
                if not hasattr(run, "params"):
                    if ckpt:
                        import torch

                        sd = torch.load(ckpt, map_location="cpu")
                        run.params = convert_pwcnet(
                            {k: v.numpy() for k, v in sd.items()}
                        )
                    elif loaded:
                        run.params = loaded[1]
                    else:
                        run.params = model.init(jax.random.PRNGKey(0), img1, img2)
                return np.asarray(pwc_estimate(model, run.params, img1, img2))

            return run
        if name == "liteflownet3":
            from ..models import LiteFlowNet3
            from ..models.convert import convert_liteflownet3
            from ..models.liteflownet3 import estimate as lfn3_estimate
            from ..models.liteflownet3 import load_liteflownet3_synth

            loaded = load_liteflownet3_synth()
            model = loaded[0] if loaded else LiteFlowNet3()

            def run(img1, img2):
                if not hasattr(run, "params"):
                    if ckpt:
                        import torch

                        sd = torch.load(ckpt, map_location="cpu")
                        run.params = convert_liteflownet3(
                            {k: v.numpy() for k, v in sd.items()}
                        )
                    elif loaded:
                        run.params = loaded[1]
                    else:
                        run.params = model.init(
                            jax.random.PRNGKey(0), img1, img2)
                return np.asarray(lfn3_estimate(model, run.params, img1, img2))

            return run
        if name == "liteflownet":
            from ..models import LiteFlowNet
            from ..models.convert import convert_liteflownet
            from ..models.liteflownet import estimate as lfn_estimate
            from ..models.liteflownet import load_liteflownet_synth

            loaded = load_liteflownet_synth()
            model = loaded[0] if loaded else LiteFlowNet()

            def run(img1, img2):
                if not hasattr(run, "params"):
                    if ckpt:
                        import torch

                        sd = torch.load(ckpt, map_location="cpu")
                        run.params = convert_liteflownet(
                            {k: v.numpy() for k, v in sd.items()}
                        )
                    elif loaded:
                        run.params = loaded[1]
                    else:
                        run.params = model.init(
                            jax.random.PRNGKey(0), img1, img2)
                return np.asarray(lfn_estimate(model, run.params, img1, img2))

            return run
    raise SystemExit(f"unknown method {name}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="farneback")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--sintel", default=None, help="MPI-Sintel root")
    ap.add_argument("--kitti", default=None, help="KITTI-2015 root")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--hard", action="store_true",
                    help="hard synthetic suite: large motion + illumination "
                         "change + noise (brightness-constancy breaker)")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from .datasets import KittiFlowDataset, SintelDataset, synthetic_eval_pairs
    from .epe import epe_stats, outlier_rate

    if args.sintel:
        data = SintelDataset(args.sintel)
        pairs = [data[i] for i in range(min(len(data), args.n))]
        src = "sintel"
    elif args.kitti:
        data = KittiFlowDataset(args.kitti)
        pairs = [data[i] for i in range(min(len(data), args.n))]
        src = "kitti"
    else:
        pairs = synthetic_eval_pairs(args.n, hard=args.hard)
        src = "synthetic-hard" if args.hard else "synthetic"
    if not pairs:
        raise SystemExit(f"no eval pairs found for {src}")

    # comma-separated methods emit one JSON line each (reproduces the README
    # EPE table: --method farneback,raft,neuflow [--hard])
    for method in args.method.split(","):
        run = _make_method(method, args.ckpt, args.quick)
        all_stats = []
        t_total = 0.0
        for img1, img2, gt, valid in pairs:
            t0 = time.perf_counter()
            flow = run(img1, img2)
            t_total += time.perf_counter() - t0
            s = epe_stats(flow, gt, valid)
            s["fl_all"] = outlier_rate(flow, gt, valid)
            all_stats.append(s)

        agg = {k: float(np.mean([s[k] for s in all_stats])) for k in all_stats[0]}
        agg.update(method=method, dataset=src, n=len(pairs),
                   sec_per_pair=t_total / len(pairs))
        print(json.dumps(agg))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
