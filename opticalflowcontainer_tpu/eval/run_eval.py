"""Flow eval harness CLI: EPE tables for any method over Sintel / KITTI /
synthetic data (fills the reference's missing benchmark numbers, SURVEY.md §6).

  python -m opticalflowcontainer_tpu.eval.run_eval --method farneback --cpu
  python -m opticalflowcontainer_tpu.eval.run_eval --method raft --sintel /data/sintel
"""
from __future__ import annotations

import argparse
import json
import time


def _npz_params(path: str):
    """Flax params from a flat-npz checkpoint at an explicit path (the
    tools/train_flow.py save format) — lets ``--ckpt candidate.npz`` evaluate
    a training candidate for ANY learned method without touching the
    packaged weights under models/weights/."""
    import numpy as np
    from flax.traverse_util import unflatten_dict

    data = np.load(path)
    tree = unflatten_dict({tuple(k.split("/")): data[k] for k in data.files})
    return {"params": tree}


def _make_method(name: str, ckpt: str | None, quick: bool):
    import numpy as np

    npz = _npz_params(ckpt) if (ckpt and ckpt.endswith(".npz")) else None

    if name == "farneback":
        import jax

        from ..classical import calc_optical_flow_farneback
        from ..core.color import rgb_to_gray

        def flow_fn(i1, i2):
            # BT.601 luma, matching the runtime ingest path (core/color.py;
            # eval images are RGB floats in [0, 1])
            return calc_optical_flow_farneback(
                rgb_to_gray(i1[..., :3]) * 255.0,
                rgb_to_gray(i2[..., :3]) * 255.0)

        fn = jax.jit(flow_fn)

        def run(img1, img2):
            return np.asarray(fn(img1.astype(np.float32),
                                 img2.astype(np.float32)))

        run.flow_fn = flow_fn
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
                    run.params = npz if npz is not None else (
                        loaded[1] if loaded else model.init(
                            jax.random.PRNGKey(0),
                            img1[:64, :64], img2[:64, :64], 2))
                return np.asarray(estimate(model, run.params, img1, img2,
                                           iters=4 if quick else 12))

            run.flow_fn = lambda i1, i2: estimate(
                model, run.params, i1, i2, iters=4 if quick else 12)
            return run
        if name == "neuflow":
            from ..models import NeuFlowLite
            from ..models.neuflow import estimate as nf_estimate
            from ..models.neuflow import load_neuflow_lite_synth

            loaded = load_neuflow_lite_synth()
            model = loaded[0] if loaded else NeuFlowLite()

            def run(img1, img2):
                if not hasattr(run, "params"):
                    run.params = npz if npz is not None else (
                        loaded[1] if loaded else model.init(
                            jax.random.PRNGKey(0),
                            img1[:64, :64], img2[:64, :64]))
                return np.asarray(nf_estimate(model, run.params, img1, img2))

            run.flow_fn = lambda i1, i2: nf_estimate(
                model, run.params, i1, i2)
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
                    if npz is not None:
                        run.params = npz
                    elif ckpt:
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

            run.flow_fn = lambda i1, i2: pwc_estimate(
                model, run.params, i1, i2)
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
                    if npz is not None:
                        run.params = npz
                    elif ckpt:
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

            run.flow_fn = lambda i1, i2: lfn3_estimate(
                model, run.params, i1, i2)
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
                    if npz is not None:
                        run.params = npz
                    elif ckpt:
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

            run.flow_fn = lambda i1, i2: lfn_estimate(
                model, run.params, i1, i2)
            return run
    raise SystemExit(f"unknown method {name}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="farneback")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--sintel", default=None, help="MPI-Sintel root")
    ap.add_argument("--kitti", default=None, help="KITTI-2015 root")
    ap.add_argument("--n", type=int, default=None,
                help="pairs to evaluate (default 8; 32 for --fishnet)")
    ap.add_argument("--hard", action="store_true",
                    help="hard synthetic suite: large motion + illumination "
                         "change + noise (brightness-constancy breaker)")
    ap.add_argument("--fishnet", action="store_true",
                    help="deployment-domain suite: exact-GT affine warps of "
                         "the fishnet golden image + procedural textures at "
                         "640x480 (n defaults to 32; combine with --hard)")
    ap.add_argument("--time-device", action="store_true",
                    help="also measure pure device ms/frame per method at "
                         "the eval operating point (in-jit scan chain — "
                         "accuracy and latency at the SAME point)")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from .datasets import (
        KittiFlowDataset,
        SintelDataset,
        fishnet_eval_pairs,
        synthetic_eval_pairs,
    )
    from .epe import epe_stats, outlier_rate

    if args.sintel:
        data = SintelDataset(args.sintel)
        pairs = [data[i] for i in range(min(len(data), args.n or 8))]
        src = "sintel"
    elif args.kitti:
        data = KittiFlowDataset(args.kitti)
        pairs = [data[i] for i in range(min(len(data), args.n or 8))]
        src = "kitti"
    elif args.fishnet:
        n = args.n or 32
        pairs = fishnet_eval_pairs(n, hard=args.hard)
        src = "fishnet-hard" if args.hard else "fishnet"
    else:
        pairs = synthetic_eval_pairs(args.n or 8, hard=args.hard)
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
        if args.time_device and hasattr(run, "flow_fn"):
            agg["device_ms_per_frame"] = round(
                _device_ms_per_frame(run.flow_fn, pairs[0][0], pairs[0][1],
                                     reps=4 if args.quick else 24), 3)
        print(json.dumps(agg))
    return 0


def _device_ms_per_frame(flow_fn, img1, img2, reps: int = 24) -> float:
    """Pure device time of one flow call at the eval operating point: an
    in-jit ``lax.scan`` chain (each rep's input depends on the previous
    rep's output scalar, so XLA cannot hoist the body) with ONE host sync —
    the honest-timing recipe for the axon tunnel (CLAUDE.md)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    i1 = jnp.asarray(img1, jnp.float32)
    i2 = jnp.asarray(img2, jnp.float32)

    def chain(a, b):
        def body(c, _):
            f = flow_fn(a + 0.0 * c, b)
            return jnp.sum(f).astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return s

    fn = jax.jit(chain)
    float(fn(i1, i2))  # compile
    best = min(
        (lambda t0: (float(fn(i1, i2)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(3)
    )
    return best / reps * 1000.0


if __name__ == "__main__":
    raise SystemExit(main())
