"""Model-zoo latency table: device ms/frame for every learned family at its
reference operating point, in fp32 or bf16 serving precision.

The reference measures per-frame inference time with ad-hoc CSV logging per
node (reference pwc_node.py:40-45, sub_n_pub_lfn3_node.py:51-58) and never
publishes a table (SURVEY.md §6).  This tool is the missing table generator:
one JSON line per family with honest device timing through the axon tunnel
(scan-chained dependent calls, full/half chain difference to cancel the
per-execution RTT — the bench.py methodology, see bench.py make_chain).

Operating points mirror the reference nodes:

- liteflownet / liteflownet3: 640x480 camera frames (reference
  lfn3_node.py:29-31, the RealSense default).
- pwcnet: 448x640 (mult-of-64 contract, reference pwc_net.py:233-257).
- raft_small / raft_large: 384x512 @ 12 iterations (reference
  visualize_raft.py uses torchvision raft_large; BASELINE config 4).
- neuflow_lite / neuflow_v2: 432x768 (the reference NeuFlow node's fixed
  input, reference neuflow_node.py:50-51).

bf16 serving (--bf16) is the TPU analogue of the reference NeuFlow node's
fp16 tactic (reference neuflow_node.py:50): params + inputs cast to bf16
(models.common.cast_params), flow contract stays fp32 out.

Run:  python -m opticalflowcontainer_tpu.tools.zoo_latency [--bf16]
          [--models raft_small,neuflow_lite] [--reps 48] [--cpu] [--quick]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _spec(name: str, quick: bool = False):
    """(H, W, load_fn, step_factory) for one family.  step_factory(model) ->
    step(params, img1, img2) returning the final flow field — params stay a
    jit ARGUMENT all the way into the timing chain, never a closure constant
    (trace-time weight literals inflate every axon remote-compile upload and
    blew the request limit outright in round 2 — CLAUDE.md session-5).
    ``quick`` drops iterative models to tiny iteration counts (the
    run_eval._learned_spec quick pattern) so the CI smoke can afford to
    compile every family."""
    if name == "liteflownet":
        from ..models import liteflownet as m

        return 480, 640, m.load_liteflownet_synth, (
            lambda model: lambda p, a, b: m.estimate(model, p, a, b))
    if name == "liteflownet3":
        from ..models import liteflownet3 as m

        return 480, 640, m.load_liteflownet3_synth, (
            lambda model: lambda p, a, b: m.estimate(model, p, a, b))
    if name == "pwcnet":
        from ..models import pwcnet as m

        return 448, 640, m.load_pwcnet_synth, (
            lambda model: lambda p, a, b: m.estimate(model, p, a, b))
    if name in ("raft_small", "raft_large"):
        from ..models import raft as m

        load = m.load_raft_small_synth if name == "raft_small" else m.load_raft_synth
        iters = 2 if quick else 12
        return 384, 512, load, (
            lambda model: lambda p, a, b: m.estimate(
                model, p, a, b, iters=iters))
    if name == "neuflow_lite":
        from ..models import neuflow as m

        return 432, 768, m.load_neuflow_lite_synth, (
            lambda model: lambda p, a, b: m.estimate(model, p, a, b))
    if name == "neuflow_v2":
        from ..models import neuflow_v2 as m

        iters_s8 = 1 if quick else 8
        return 432, 768, m.load_neuflow_v2_synth, (
            lambda model: lambda p, a, b: m.estimate(
                model, p, a, b, iters_s8=iters_s8))
    raise SystemExit(f"unknown model {name!r}")


ALL = ("liteflownet", "liteflownet3", "pwcnet", "raft_small", "raft_large",
       "neuflow_lite", "neuflow_v2")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(ALL),
                    help="comma list from: " + " ".join(ALL))
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 params + inputs (fp32 flow out)")
    ap.add_argument("--reps", type=int, default=48,
                    help="scan-chain length (half-chain difference cancels "
                         "the tunnel RTT)")
    ap.add_argument("--rounds", type=int, default=3,
                    help="best-of-N timed executions per chain")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="tiny 96x128 shapes, reps=4 (CI smoke)")
    args = ap.parse_args(argv)

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ..models.common import cast_params

    if args.quick:
        args.reps, args.rounds = 4, 1
    reps, reps_half = args.reps, max(args.reps // 2, 1)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    rows = []
    for name in args.models.split(","):
        name = name.strip()
        H, W, load, factory = _spec(name, quick=args.quick)
        if args.quick:
            H, W = 96, 128
        loaded = load()
        if loaded is None:
            print(f"# {name}: packaged weights absent, skipped",
                  file=sys.stderr)
            continue
        model, params = loaded
        if args.bf16:
            params = cast_params(params, jnp.bfloat16)
        params = jax.device_put(params)
        step = factory(model)
        base = rng.uniform(0, 1, (H + 8, W + 8, 3)).astype(np.float32)
        i1 = jnp.asarray(base[4 : 4 + H, 4 : 4 + W], dtype)
        i2 = jnp.asarray(base[4 : 4 + H, 2 : 2 + W], dtype)

        def make_chain(n):
            def chain(p, a, b):
                def body(carry, _):
                    out = step(p, a + (0.0 * carry).astype(a.dtype), b)
                    return out.astype(jnp.float32).sum(), None

                s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return s

            return jax.jit(chain)

        fn, fn_half = make_chain(reps), make_chain(reps_half)
        t0 = time.time()
        float(fn(params, i1, i2))
        compile_s = time.time() - t0
        float(fn_half(params, i1, i2))

        def timed(f):
            return min(
                (lambda s: (float(f(params, i1, i2)),
                            time.time() - s)[1])(time.time())
                for _ in range(args.rounds)
            )

        t_full, t_half = timed(fn), timed(fn_half)
        wall_ms = t_full / reps * 1000
        dev_ms = ((t_full - t_half) / (reps - reps_half) * 1000
                  if reps > reps_half else wall_ms)
        if not (0.0 < dev_ms <= wall_ms):
            # RTT jitter made the chain difference non-physical (negative or
            # above the amortized wall time, which device time can never be)
            dev_ms = wall_ms
        row = {
            "model": name, "height": H, "width": W,
            "dtype": "bf16" if args.bf16 else "fp32",
            "device_ms_per_frame": round(dev_ms, 2),
            "wall_ms_per_frame": round(wall_ms, 2),
            "fps": round(1000.0 / dev_ms, 1),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
