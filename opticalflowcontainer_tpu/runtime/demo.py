"""End-to-end runtime demo: synthetic camera -> Farneback flow node ->
velocity topics.  ``python -m opticalflowcontainer_tpu.runtime.demo``.

The synthetic scene translates at a known metric velocity, so the printed
velocities should converge to the ground truth — a self-checking smoke run of
the full streaming path (capture thread -> bounded queue -> inference thread
-> velocity estimation -> pub/sub).
"""
from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--velocity", type=float, default=0.05, help="ground truth m/s")
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--fused", action="store_true",
                    help="fused device path: ingest->flow->velocity scalar "
                         "in one program per frame (runtime.fused)")
    ap.add_argument("--model", default="farneback",
                    choices=("farneback", "neuflow", "raft", "raft_large"),
                    help="flow backend; learned models use the packaged "
                         "TPU-trained weights and the fused model path")
    ap.add_argument("--bf16", action="store_true",
                    help="serve the learned model in bfloat16 (the "
                         "reference NeuFlow node's fp16 tactic; see "
                         "FusedModelStream)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .bus import Bus
    from .nodes import FlowNode, NodeParams, make_farneback_backend
    from .sources import SyntheticCamera

    bus = Bus()
    pixel_to_meter = 0.000857
    cam = SyntheticCamera(
        bus,
        width=args.width,
        height=args.height,
        fps=args.fps,
        n_frames=args.frames,
        velocity_mps=args.velocity,
        pixel_to_meter=pixel_to_meter,
    )
    fb_kwargs = dict(levels=2, winsize=13, iterations=2)
    if args.model != "farneback":
        import functools

        from .fused import make_fused_model_backend

        if args.model == "neuflow":
            from ..models.neuflow import estimate, load_neuflow_lite_synth

            loaded = load_neuflow_lite_synth()
        else:
            from ..models.raft import (
                estimate as raft_estimate,
                load_raft_small_synth,
                load_raft_synth,
            )

            estimate = functools.partial(raft_estimate, iters=8)
            loaded = (load_raft_synth() if args.model == "raft_large"
                      else load_raft_small_synth())
        if loaded is None:
            print(f"no packaged weights for {args.model}")
            return 1
        backend = make_fused_model_backend(loaded[0], loaded[1], estimate,
                                           bf16=args.bf16)
    elif args.fused:
        from .fused import make_fused_farneback_backend

        backend = make_fused_farneback_backend(**fb_kwargs)
    else:
        backend = make_farneback_backend(**fb_kwargs)
    node = FlowNode(
        backend,
        NodeParams(width=args.width, height=args.height,
                   pixel_to_meter=pixel_to_meter, name="FARNEBACK"),
        bus,
    )

    # pre-warm: compile the backend before streaming so no frames are dropped
    # to jit latency (the reference warms its model in the node ctor too)
    f0, f1 = cam.frame_at(0), cam.frame_at(1)
    if args.fused or args.model != "farneback":
        backend.stream.warmup(f0)
        backend.stream.reset()
    else:
        node.backend(f0.mean(-1).astype("float32"), f1.mean(-1).astype("float32"), 1 / args.fps)

    received = []
    bus.subscribe(
        "/optical_flow/FARNEBACK_smooth_velocity",
        lambda m: received.append(m) or print(
            f"t={m.header.stamp:9.3f}  vx={m.x:+.4f} m/s  (gt {args.velocity:+.4f})"
        ),
    )

    t0 = time.time()
    node.start_stream(cam)
    node.wait(timeout=60)
    node.stop()
    if not received:
        print("no velocities produced (all frames dropped?)")
        return 1
    elapsed = time.time() - t0
    print(
        f"processed {node.frames_processed}/{args.frames} frames in {elapsed:.2f}s "
        f"({node.frames_processed / elapsed:.1f} fps vs camera {args.fps:g}; "
        f"dropped {args.frames - 1 - node.frames_processed}); "
        f"final smooth vx = {received[-1].x:+.4f} m/s vs gt {args.velocity:+.4f}"
    )
    err = abs(received[-1].x - args.velocity)
    print(f"velocity error: {err * 1000:.2f} mm/s ({'OK' if err < 0.01 else 'HIGH'})")
    return 0 if err < 0.01 else 1


if __name__ == "__main__":
    raise SystemExit(main())
