"""Per-stage roofline of the Farneback block-warp pipeline on the live chip.

Round-3 left a contradiction: BENCH_r03 recorded a 640 GB/s streaming
ceiling with the pipeline at 216 GB/s (33.8%), while the round-3 fusion memo
declined further kernel work against a 318 GB/s ceiling ("68%, bandwidth
bound").  One number cannot arbitrate that; this tool measures

1. **ceiling variants** — the streaming ceiling probe at several working-set
   sizes (a 128 MB read-only set can go partially cache-resident and
   overstate HBM) plus a read+write copy chain (the pipeline's actual mix);
2. **per-stage device time** — poly expansion, the block-warp update kernel,
   the blur+solve, and the inter-level resizes, each isolated as an in-jit
   scan chain at every pyramid level of the headline operating point
   (720p clip T=5), timed with the RTT-cancelling two-length-chain recipe;
3. **per-stage analytic bytes** (classical.farneback.farneback_traffic_
   breakdown) -> achieved GB/s per stage against the defensible ceiling.

All large arrays are jit ARGUMENTS (closure-captured device arrays serialize
into the HLO as literals and blow the axon remote-compile request limit —
round-2 session-5 finding).

Usage (detach it — cold compiles are 20-300 s each through the tunnel):

    nohup python -m opticalflowcontainer_tpu.tools.stage_roofline \
        --out /tmp/stage_roofline.json &

Results append to --out as they land (one JSON object per line), so a hung
remote compile loses only the legs after it.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/stage_roofline.json")
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--clip", type=int, default=5)
    ap.add_argument("--reps", type=int, default=64,
                    help="full chain length (half-chain is reps//2)")
    ap.add_argument("--no-ceilings", action="store_true")
    ap.add_argument("--no-stages", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from opticalflowcontainer_tpu.classical import farneback as fb
    from opticalflowcontainer_tpu.core.resize import resize_bilinear

    out_f = open(args.out, "a", buffering=1)

    def emit(rec: dict):
        rec["t"] = time.strftime("%H:%M:%S")
        out_f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), file=sys.stderr)

    H, W, T = args.height, args.width, args.clip
    reps, reps_h = args.reps, max(args.reps // 2, 1)

    def make_chain(step_fn, n):
        """bench.py's chain recipe: n dependent calls behind one sync; the
        ``+ 0*carry`` data dependency stops XLA hoisting (verified r2)."""
        def chain(*targs):
            def body(c, _):
                return step_fn(c, *targs), None
            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return s
        return jax.jit(chain)

    def timed_pair(step_fn, *targs, n=3):
        """Compile + best-of-n time a (reps, reps_h) chain pair; returns
        (device s/rep via chain difference, wall s/rep, unreliable, compile_s).
        """
        f_full, f_half = make_chain(step_fn, reps), make_chain(step_fn, reps_h)
        t0 = time.time()
        float(f_full(*targs))
        compile_s = time.time() - t0
        float(f_half(*targs))

        def best(f):
            return min(
                (lambda s: (float(f(*targs)), time.time() - s)[1])(time.time())
                for _ in range(n))

        t_full, t_half = best(f_full), best(f_half)
        per_rep_wall = t_full / reps
        dev = ((t_full - t_half) / (reps - reps_h)
               if reps > reps_h else per_rep_wall)
        unreliable = not (0.0 < dev <= per_rep_wall * 1.25)
        if unreliable:
            dev = per_rep_wall
        return dev, per_rep_wall, unreliable, compile_s

    # ---------------------------------------------------------- ceilings
    if not args.no_ceilings:
        for mb in (128, 512, 1024):
            nelem = mb * 1024 * 1024 // 4
            xs = jnp.arange(nelem, dtype=jnp.float32)

            def read_step(c, x):
                # maximum, not sum(x+c): XLA folds linear reductions
                return jnp.maximum(x, c).sum() * 1e-12

            dev, wall, unrel, comp = timed_pair(read_step, xs)
            emit({"leg": f"ceiling_read_{mb}mb",
                  "gbps": round(mb * (1 << 20) / max(dev, 1e-9) / 1e9, 1),
                  "ms_per_rep": round(dev * 1e3, 3), "unreliable": unrel,
                  "compile_s": round(comp, 1)})
            del xs

        # read+write mix: each rep reads the array and writes a same-size
        # result (the carry), modelling the pipeline's actual traffic mix
        mb = 256
        nelem = mb * 1024 * 1024 // 4
        ys = jnp.arange(nelem, dtype=jnp.float32)

        def make_rw(n):
            def fn(y):
                def body(c, _):
                    return c * 1.0000001 + 1.0, None
                s, _ = jax.lax.scan(body, y, None, length=n)
                return s.sum() * 1e-12
            return jax.jit(fn)

        f_full, f_half = make_rw(reps), make_rw(reps_h)
        t0 = time.time()
        float(f_full(ys))
        comp = time.time() - t0
        float(f_half(ys))
        tf = min((lambda s: (float(f_full(ys)), time.time() - s)[1])(time.time())
                 for _ in range(3))
        th = min((lambda s: (float(f_half(ys)), time.time() - s)[1])(time.time())
                 for _ in range(3))
        dev = (tf - th) / (reps - reps_h)
        unrel = not (0.0 < dev <= tf / reps * 1.25)
        if unrel:
            dev = tf / reps
        emit({"leg": f"ceiling_rw_{mb}mb",
              "gbps": round(2 * mb * (1 << 20) / max(dev, 1e-9) / 1e9, 1),
              "ms_per_rep": round(dev * 1e3, 3), "unreliable": unrel,
              "compile_s": round(comp, 1)})
        del ys

        # MXU ceiling: chained big bf16 matmul (the poly/solve stages run as
        # dense banded-operator matmuls; their defensible ceiling is the
        # slice's measured matmul rate, not HBM).  The CARRY is the full
        # output matrix: a scalar carry (y[0,0]) lets XLA strength-reduce
        # the sliced dot to one row (measured 7.7 "PF/s" — DCE, not MXU).
        n = 4096
        a0 = jnp.ones((n, n), jnp.bfloat16)
        # row-stochastic-ish b keeps the chained product bounded (~1.0)
        b = jnp.full((n, n), 1.0 / n, jnp.bfloat16)

        def make_mxu(nreps):
            def fn(a, b):
                def body(y, _):
                    y2 = jnp.dot(y, b, preferred_element_type=jnp.float32)
                    return y2.astype(jnp.bfloat16), None
                y, _ = jax.lax.scan(body, a, None, length=nreps)
                return y.astype(jnp.float32).sum() * 1e-12
            return jax.jit(fn)

        f_full, f_half = make_mxu(reps), make_mxu(reps_h)
        t0 = time.time()
        float(f_full(a0, b))
        comp = time.time() - t0
        float(f_half(a0, b))
        tf = min((lambda s: (float(f_full(a0, b)), time.time() - s)[1])(
            time.time()) for _ in range(3))
        th = min((lambda s: (float(f_half(a0, b)), time.time() - s)[1])(
            time.time()) for _ in range(3))
        dev = (tf - th) / (reps - reps_h)
        unrel = not (0.0 < dev <= tf / reps * 1.25)
        if unrel:
            dev = tf / reps
        emit({"leg": "ceiling_mxu_bf16",
              "tflops": round(2.0 * n ** 3 / max(dev, 1e-9) / 1e12, 1),
              "ms_per_rep": round(dev * 1e3, 3), "unreliable": unrel,
              "compile_s": round(comp, 1)})
        del a0, b

        # VPU ceiling: chained elementwise select+FMA mix on a VMEM-busting
        # f32 set — the update kernel's tap selection is this op class
        nelem = 16 * 1024 * 1024
        xs = jnp.arange(nelem, dtype=jnp.float32) * 1e-7

        def vpu_step(c, x):
            y = x + c
            for _ in range(8):
                # 4 elem-ops per pass element: compare, select, mul, add
                y = jnp.where(y > 0.5, y * 0.999, y + 0.001)
            return y.max() * 1e-9

        dev, wall, unrel, comp = timed_pair(vpu_step, xs)
        emit({"leg": "ceiling_vpu_f32",
              "telemops": round(8 * 4 * nelem / max(dev, 1e-9) / 1e12, 2),
              "ms_per_rep": round(dev * 1e3, 3), "unreliable": unrel,
              "compile_s": round(comp, 1)})
        del xs

    if args.no_stages:
        return 0

    def xla_tflops(step_fn, dev, *targs):
        """Achieved TF/s of a stage from XLA's own flop count (exact for
        XLA-only stages; NOT used for the pallas update kernel, whose flops
        XLA's cost analysis overcharges ~3x)."""
        try:
            f = jax.jit(lambda *a: step_fn(jnp.float32(0), *a))
            ca = f.lower(*targs).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            return (round(flops / max(dev, 1e-9) / 1e12, 1),
                    round(flops / 1e9, 2))
        except Exception:
            return None, None

    # ------------------------------------------------------------- stages
    fbkw = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                poly_n=5, poly_sigma=1.2)
    bd = fb.farneback_traffic_breakdown(
        H, W, levels=fbkw["levels"], pyr_scale=fbkw["pyr_scale"],
        iterations=fbkw["iterations"], clip_frames=T)
    fields = T - 1
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H + 8, W + 2 * T)).astype(np.float32)
    frames = jnp.asarray(np.stack(
        [base[4: 4 + H, 2 * t: 2 * t + W] for t in range(T)]))

    bh, bwd = fb.BLOCK_WARP_BLOCK
    pad_y, pad_x = fb.BLOCK_WARP_PAD
    n_levels = fb._num_levels(H, W, fbkw["levels"], fbkw["pyr_scale"])
    share_all = H * W <= fb.CLIP_SHARE_ALL_MAX_PIXELS
    lv_info = {lv["k"]: lv for lv in bd["levels"]}
    if args.cpu:
        fb.BLOCK_WARP_INTERPRET = True  # smoke-testing the harness off-TPU

    for k in range(n_levels, -1, -1):
        scale = fbkw["pyr_scale"] ** k
        lh, lw = fb._level_size(H, W, scale)
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        rows_out, cols_out = fb._round_up(lh, bh), fb._round_up(lw, bwd)
        mats1 = fb._poly_direct_matrices(
            H, W, lh, lw, smooth_sz, float(sigma), fbkw["poly_n"],
            float(fbkw["poly_sigma"]), pad_y, pad_x, rows_out, cols_out)
        mats0 = fb._poly_direct_matrices(
            H, W, lh, lw, smooth_sz, float(sigma), fbkw["poly_n"],
            float(fbkw["poly_sigma"]), 0, 0, rows_out, cols_out)
        r0src = (fb.BLOCK_WARP_R0SRC == "all"
                 or (fb.BLOCK_WARP_R0SRC == "finest" and k == 0))
        shared = share_all or k == 0
        lv = lv_info[k]

        # ---- poly stage (the form the clip pipeline uses at this level)
        if shared and r0src:
            def poly_step(c, fr, mats1=mats1):
                R = fb._poly_planes_direct(fr + 0.0 * c, mats1,
                                           out_dtype=fb.BLOCK_WARP_DTYPE,
                                           phases=fb.BLOCK_WARP_PHASES)
                return R.astype(jnp.float32).sum()
        elif shared:
            def poly_step(c, fr, mats1=mats1):
                R = fb._poly_planes_direct(fr + 0.0 * c, mats1,
                                           out_dtype=fb.BLOCK_WARP_DTYPE)
                return R.astype(jnp.float32).sum()
        else:
            def poly_step(c, fr, mats0=mats0, mats1=mats1):
                R0 = fb._poly_planes_direct(fr[:-1] + 0.0 * c, mats0,
                                            out_dtype=fb.R0_DTYPE)
                R1 = fb._poly_planes_direct(
                    fr[1:], mats1, out_dtype=fb.BLOCK_WARP_DTYPE,
                    phases=fb.BLOCK_WARP_PHASES)
                return (R0.astype(jnp.float32).sum()
                        + R1.astype(jnp.float32).sum())

        dev, wall, unrel, comp = timed_pair(poly_step, frames)
        tfs, gfl = xla_tflops(poly_step, dev, frames)
        emit({"leg": f"poly_k{k}", "lh": lh, "lw": lw,
              "ms": round(dev * 1e3, 3),
              "ms_per_field": round(dev * 1e3 / fields, 3),
              "model_mb_per_field": round(lv["poly"] / 1e6, 1),
              "gbps": round(lv["poly"] * fields / max(dev, 1e-9) / 1e9, 1),
              "xla_gflops": gfl, "achieved_tflops": tfs,
              "unreliable": unrel, "compile_s": round(comp, 1)})

        # ---- update stage (block-warp kernel, one iteration)
        u0 = jnp.asarray(rng.uniform(-1.5, 1.5, (fields, lh, lw)), jnp.float32)
        v0 = jnp.asarray(rng.uniform(-1.5, 1.5, (fields, lh, lw)), jnp.float32)
        if shared and r0src:
            Rall2 = jax.jit(
                lambda fr: fb._poly_planes_direct(
                    fr, mats1, out_dtype=fb.BLOCK_WARP_DTYPE,
                    phases=fb.BLOCK_WARP_PHASES))(frames)

            def upd_step(c, R, u, v):
                M = fb._update_matrices_planes(
                    None, R, u + 0.0 * c, v, (lh, lw),
                    src_prestacked=True, r0_from_src=True, clip_shift=True)
                return M.astype(jnp.float32).sum()

            upd_args = (Rall2, u0, v0)
        elif shared:
            Rall = jax.jit(
                lambda fr: fb._poly_planes_direct(
                    fr, mats1, out_dtype=fb.BLOCK_WARP_DTYPE))(frames)
            R0s = jax.jit(lambda Ra: jax.lax.slice(
                Ra, (0, 0, pad_y, pad_x),
                (fields, 5, pad_y + rows_out, pad_x + cols_out)))(Rall)

            def upd_step(c, R0a, R1a, u, v):
                M = fb._update_matrices_planes(R0a, R1a, u + 0.0 * c, v,
                                               (lh, lw))
                return M.astype(jnp.float32).sum()

            upd_args = (R0s, Rall[1:], u0, v0)
        else:
            R0s = jax.jit(
                lambda fr: fb._poly_planes_direct(
                    fr[:-1], mats0, out_dtype=fb.R0_DTYPE))(frames)
            R1s_ = jax.jit(
                lambda fr: fb._poly_planes_direct(
                    fr[1:], mats1, out_dtype=fb.BLOCK_WARP_DTYPE,
                    phases=fb.BLOCK_WARP_PHASES))(frames)

            def upd_step(c, R0a, R1a, u, v):
                M = fb._update_matrices_planes(R0a, R1a, u + 0.0 * c, v,
                                               (lh, lw), src_prestacked=True)
                return M.astype(jnp.float32).sum()

            upd_args = (R0s, R1s_, u0, v0)

        dev, wall, unrel, comp = timed_pair(upd_step, *upd_args)
        # output-pixel rate: the kernel's work is per-pixel tap selection
        # (5 planes x 6x6 taps in the slow tier, 3x3 in the fast tier), so
        # px/s x taps x planes x ~2 is its elem-op rate — compare against
        # the ceiling_vpu_f32 leg and the measured decomposition floor
        # (realign=none: DMA+selection only, probe_r4)
        emit({"leg": f"update_k{k}", "lh": lh, "lw": lw,
              "ms": round(dev * 1e3, 3),
              "ms_per_field": round(dev * 1e3 / fields, 3),
              "model_mb": round(lv["update_per_iter"] / 1e6, 1),
              "gbps": round(lv["update_per_iter"] / max(dev, 1e-9) / 1e9, 1),
              "mpx_per_s": round(lh * lw * fields / max(dev, 1e-9) / 1e6, 1),
              "unreliable": unrel, "compile_s": round(comp, 1)})

        # ---- solve stage (blur + 2x2 solve, one iteration)
        M0 = jnp.asarray(
            rng.uniform(-1, 1, (fields, 5, lh, lw)),
            jnp.float32).astype(fb.SOLVE_DTYPE)

        def slv_step(c, M):
            u, v = fb._solve_flow_planes(
                (M.astype(jnp.float32) * (1.0 + 0.0 * c)).astype(M.dtype),
                fbkw["winsize"], False)
            return u.sum() + v.sum()

        dev, wall, unrel, comp = timed_pair(slv_step, M0)
        tfs, gfl = xla_tflops(slv_step, dev, M0)
        emit({"leg": f"solve_k{k}", "lh": lh, "lw": lw,
              "ms": round(dev * 1e3, 3),
              "ms_per_field": round(dev * 1e3 / fields, 3),
              "model_mb": round(lv["solve_per_iter"] / 1e6, 1),
              "gbps": round(lv["solve_per_iter"] / max(dev, 1e-9) / 1e9, 1),
              "xla_gflops": gfl, "achieved_tflops": tfs,
              "unreliable": unrel, "compile_s": round(comp, 1)})

    # ---- resize stage: all inter-level flow resizes chained together
    coarse = fb._level_size(H, W, fbkw["pyr_scale"] ** n_levels)
    u_init = jnp.zeros((fields,) + coarse, jnp.float32)

    def rsz_step(c, u):
        u = u + c
        acc = jnp.float32(0)
        for k2 in range(n_levels - 1, -1, -1):
            nh, nw = fb._level_size(H, W, fbkw["pyr_scale"] ** k2)
            u = resize_bilinear(u, (nh, nw)) / fbkw["pyr_scale"]
            acc = acc + u.sum() * 1e-9
        return acc

    dev, wall, unrel, comp = timed_pair(rsz_step, u_init)
    # the model counts u AND v resizes; the probe resizes only u -> halve
    rsz_bytes = bd["resize"] / 2.0
    emit({"leg": "resize_u_only", "ms": round(dev * 1e3, 3),
          "ms_per_field": round(dev * 1e3 / fields, 3),
          "model_mb_per_field": round(rsz_bytes / 1e6, 1),
          "gbps": round(rsz_bytes * fields / max(dev, 1e-9) / 1e9, 1),
          "unreliable": unrel, "compile_s": round(comp, 1)})

    # ---- full pipeline for cross-check
    def full_step(c, fr):
        return fb.farneback_clip(fr + 0.0 * c, **fbkw).sum()

    dev, wall, unrel, comp = timed_pair(full_step, frames)
    emit({"leg": "full_clip", "ms": round(dev * 1e3, 3),
          "ms_per_field": round(dev * 1e3 / fields, 3),
          "model_mb_per_field": round(bd["total"] / 1e6, 1),
          "gbps": round(bd["total"] * fields / max(dev, 1e-9) / 1e9, 1),
          "unreliable": unrel, "compile_s": round(comp, 1)})
    emit({"leg": "model_totals_mb_per_field",
          "poly": round(bd["poly"] / 1e6, 1),
          "update": round(bd["update"] / 1e6, 1),
          "solve": round(bd["solve"] / 1e6, 1),
          "resize": round(bd["resize"] / 1e6, 1),
          "total": round(bd["total"] / 1e6, 1)})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
