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
    """Flax params from a flat-npz checkpoint at an explicit path — lets
    ``--ckpt candidate.npz`` evaluate a training candidate for ANY learned
    method without touching the packaged weights under models/weights/."""
    from ..models.common import load_flat_npz

    return load_flat_npz(path)


def _learned_spec(name: str):
    """(make_model, load_packaged, estimate, torch_converter, extra_kwargs_fn)
    for each learned method — one table instead of five copy-pasted
    branches."""
    if name in ("raft", "raft_large"):
        from ..models import RAFT, RAFTSmall
        from ..models.convert import convert_raft_small
        from ..models.raft import (
            estimate,
            load_raft_small_synth,
            load_raft_synth,
        )

        def kw(quick):
            return {"iters": 4 if quick else 12}

        if name == "raft":
            return RAFTSmall, load_raft_small_synth, estimate, convert_raft_small, kw
        return RAFT, load_raft_synth, estimate, None, kw
    no_kw = lambda quick: {}  # noqa: E731
    if name == "neuflow":
        from ..models import NeuFlowLite
        from ..models.neuflow import estimate, load_neuflow_lite_synth

        return NeuFlowLite, load_neuflow_lite_synth, estimate, None, no_kw
    if name == "neuflow_v2":
        from ..models.neuflow_v2 import (
            NeuFlowV2,
            convert_neuflow_v2,
            estimate,
            load_neuflow_v2_synth,
        )

        def v2_kw(quick):
            return {"iters_s8": 2 if quick else 8}

        def v2_conv(sd):
            import torch

            return convert_neuflow_v2(
                {k: torch.as_tensor(v) for k, v in sd.items()})[1]

        return NeuFlowV2, load_neuflow_v2_synth, estimate, v2_conv, v2_kw
    if name == "pwcnet":
        from ..models import PWCNet
        from ..models.convert import convert_pwcnet
        from ..models.pwcnet import estimate, load_pwcnet_synth

        return PWCNet, load_pwcnet_synth, estimate, convert_pwcnet, no_kw
    if name == "liteflownet3":
        from ..models import LiteFlowNet3
        from ..models.convert import convert_liteflownet3
        from ..models.liteflownet3 import estimate, load_liteflownet3_synth

        return LiteFlowNet3, load_liteflownet3_synth, estimate, convert_liteflownet3, no_kw
    if name == "liteflownet":
        from ..models import LiteFlowNet
        from ..models.convert import convert_liteflownet
        from ..models.liteflownet import estimate, load_liteflownet_synth

        return LiteFlowNet, load_liteflownet_synth, estimate, convert_liteflownet, no_kw
    return None


def _make_method(name: str, ckpt: str | None, quick: bool,
                 bf16: bool = False):
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
    spec = _learned_spec(name)
    if spec is not None:
        import jax

        make_model, load_packaged, est, torch_conv, kw_fn = spec
        est_kw = kw_fn(quick)
        loaded = load_packaged()
        model = loaded[0] if loaded else make_model()
        # converted reference checkpoints are BGR-trained (the models'
        # documented input convention; the reference node converts
        # rgb8 -> BGR before the net, opticalflow_node.py:44-46) while the
        # eval datasets provide RGB — flip for torch ckpts only; flat-npz
        # candidates and the packaged synth weights were trained on this
        # pipeline's own channel order
        to_bgr = bool(ckpt) and not ckpt.endswith(".npz")

        def get_params(img1, img2):
            if npz is not None:
                return npz
            if ckpt:
                if torch_conv is None:
                    raise SystemExit(
                        f"--ckpt {ckpt}: method {name} accepts only flat-npz "
                        "checkpoints (no torch-checkpoint converter exists "
                        "for it)")
                import torch

                sd = torch.load(ckpt, map_location="cpu")
                if isinstance(sd, dict) and "model" in sd:
                    sd = sd["model"]
                return torch_conv({k: v.numpy() for k, v in sd.items()})
            if loaded:
                return loaded[1]
            init_args = (img1[:64, :64], img2[:64, :64])
            if name in ("raft", "raft_large"):
                init_args += (2,)
            elif name == "neuflow_v2":
                init_args += (1,)
            return model.init(jax.random.PRNGKey(0), *init_args)

        def flow_fn_p(params, i1, i2):
            if to_bgr:
                i1, i2 = i1[..., ::-1], i2[..., ::-1]
            if bf16:
                import jax.numpy as jnp

                i1, i2 = i1.astype(jnp.bfloat16), i2.astype(jnp.bfloat16)
            return est(model, params, i1, i2, **est_kw)

        def run(img1, img2):
            if not hasattr(run, "params"):
                run.params = get_params(img1, img2)
                if bf16:
                    import jax.numpy as jnp

                    from ..models.common import cast_params

                    run.params = cast_params(run.params, jnp.bfloat16)
            return np.asarray(flow_fn_p(run.params,
                                        img1.astype(np.float32),
                                        img2.astype(np.float32)))

        # flow_fn_p takes params as an ARGUMENT so device timing can jit it
        # without baking the weight tree into the HLO as literals (CLAUDE.md:
        # trace-time operator literals blew the axon remote-compile limit)
        run.flow_fn_p = flow_fn_p
        run.flow_fn = lambda i1, i2: flow_fn_p(run.params, i1, i2)
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
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 serving precision for learned methods: params "
                         "+ inputs cast to bf16, fp32 flow out (the TPU "
                         "analogue of the reference NeuFlow node's fp16, "
                         "reference neuflow_node.py:50) — measures the "
                         "accuracy cost of the reduced-precision latency "
                         "path; ignored by classical methods")
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
        run = _make_method(method, args.ckpt, args.quick, bf16=args.bf16)
        all_stats = []
        t_total = 0.0
        for img1, img2, gt, valid in pairs:
            t0 = time.perf_counter()
            flow = run(img1, img2)
            t_total += time.perf_counter() - t0
            s = epe_stats(flow, gt, valid)
            s["fl_all"] = outlier_rate(flow, gt, valid)
            all_stats.append(s)

        # nanmean: a frame with an empty valid mask yields NaN stats and must
        # not poison the aggregate
        agg = {k: float(np.nanmean([s[k] for s in all_stats]))
               for k in all_stats[0]}
        # classical methods ignore --bf16 (help text) — label their rows
        # fp32 so a mixed-method run never publishes a mislabeled number;
        # flow_fn_p only exists on learned-method runners
        method_bf16 = args.bf16 and hasattr(run, "flow_fn_p")
        agg.update(method=method, dataset=src, n=len(pairs),
                   sec_per_pair=t_total / len(pairs),
                   dtype="bf16" if method_bf16 else "fp32")
        if args.time_device:
            agg["device_ms_per_frame"] = round(
                _device_ms_per_frame(run, pairs[0][0], pairs[0][1],
                                     reps=4 if args.quick else 24), 3)
        print(json.dumps(agg))
    return 0


def _device_ms_per_frame(run, img1, img2, reps: int = 24) -> float:
    """Pure device time of one flow call at the eval operating point: an
    in-jit ``lax.scan`` chain (each rep's input depends on the previous
    rep's output scalar, so XLA cannot hoist the body) with ONE host sync —
    the honest-timing recipe for the axon tunnel (CLAUDE.md).

    Learned methods are timed through ``run.flow_fn_p(params, i1, i2)`` with
    the weight tree passed as jit ARGUMENTS — a closure over host-numpy
    params would bake every weight into the HLO as literals and blow the
    axon remote-compile upload (the round-2 session-5 failure mode)."""
    import time

    import jax
    import jax.numpy as jnp

    i1 = jnp.asarray(img1, jnp.float32)
    i2 = jnp.asarray(img2, jnp.float32)
    flow_fn_p = getattr(run, "flow_fn_p", None)
    if flow_fn_p is not None:
        params = jax.device_put(run.params)
    else:
        params = None

        def flow_fn_p(p, a, b):
            return run.flow_fn(a, b)

    def chain(p, a, b):
        def body(c, _):
            f = flow_fn_p(p, a + 0.0 * c, b)
            return jnp.sum(f).astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return s

    fn = jax.jit(chain)
    float(fn(params, i1, i2))  # compile
    best = min(
        (lambda t0: (float(fn(params, i1, i2)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(3)
    )
    return best / reps * 1000.0


if __name__ == "__main__":
    raise SystemExit(main())
