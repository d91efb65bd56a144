"""Train flow models (RAFT-small / NeuFlowLite) on synthetic affine motion
and package the weights.

The reference ships pretrained checkpoints it downloads at node start
(reference opticalflow_node.py:28-32, lfn3_node.py:54-56, neuflow_node.py:38);
this build has no dataset/network access, so the packaged learned weights come
from this tool: exact-ground-truth affine warps of procedural textures (the
same family the eval harness scores on, eval/datasets.py:synthetic_eval_pairs,
covering its easy AND hard ranges with photometric augmentation).

  python -m opticalflowcontainer_tpu.tools.train_flow --model raft_small \
      --steps 6000
  python -m opticalflowcontainer_tpu.tools.train_flow --model neuflow_lite \
      --steps 6000

Checkpoints land under --ckpt-dir every --ckpt-every steps (orbax,
parallel/checkpoint.py) and the final params are exported as the flat npz
``models.raft.load_raft_small_synth`` / ``models.neuflow.load_neuflow_lite_synth``
load.
"""
from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _draw_mesh(rng, base):
    """Overlay a procedural net/mesh on ``base`` in place: two families of
    jittered parallel lines (random spacing/angle/polarity/thickness) — the
    deployment domain's dominant structure (thin periodic fishnet strands,
    reference junction_detector.cpp:31-214) that Gaussian-blob textures never
    produce.  Periodicity is what breaks matching models trained without it
    (measured: NeuFlowLite p50 17.8 px on the fishnet eval source vs 0.5-0.7
    on blob textures — locked onto the wrong mesh cell)."""
    import cv2
    import numpy as np

    h, w = base.shape
    spacing = rng.uniform(10, 48)
    ang = rng.uniform(0, np.pi)
    thick = int(rng.integers(1, 3))
    # line intensity: darker or brighter than the background
    val = float(rng.uniform(0.0, 0.25) if rng.uniform() < 0.5
                else rng.uniform(0.75, 1.0))
    jitter = rng.uniform(0, 0.25) * spacing
    diag = int(np.hypot(h, w)) + 1
    for fam in range(2):
        a = ang + np.pi / 2 * fam + rng.uniform(-0.06, 0.06)
        dx, dy = np.cos(a), np.sin(a)
        nx, ny = -dy, dx  # line normal
        n_lines = int(diag / spacing) + 2
        for k in range(-n_lines, n_lines):
            # polyline with sinusoidal jitter so strands are not ideal lines
            ts = np.linspace(-diag, diag, 16)
            off = k * spacing + jitter * np.sin(
                ts / rng.uniform(20, 80) + rng.uniform(0, 6.28))
            xs = w / 2 + dx * ts + nx * off
            ys = h / 2 + dy * ts + ny * off
            pts = np.stack([xs, ys], -1).astype(np.int32)
            cv2.polylines(base, [pts], False, val, thick, cv2.LINE_AA)


def make_affine_batch(rng, B=8, H=96, W=128, max_t=16.0, max_angle=8.0,
                      scales=(0.92, 1.1), textures=3, photometric=True,
                      mesh_prob=0.0, color_prob=0.0):
    """Exact-GT affine frame pairs on multi-scale procedural texture.

    Returns dict(img1, img2 [B,H,W,3] float32 in [0,1], flow [B,H,W,2]).
    Motion model matches eval/datasets.py:synthetic_eval_pairs (rotation +
    scale + translation about the image center) covering both its easy and
    hard ranges; ``photometric`` adds the hard suite's gain/offset change on
    frame 2 + sensor noise on both frames (half the samples, so the easy
    regime stays represented).  ``mesh_prob`` overlays a procedural fishnet
    mesh (see :func:`_draw_mesh`); ``color_prob`` replaces the gray-replicated
    3-channel output with random per-channel gain/offset colorization (the
    deployment imagery is colored — nets on blue water — while gray-replicated
    training never shows R!=G!=B statistics).
    """
    import cv2
    import numpy as np

    # canvas margin covering the worst-case inverse-warp displacement (a
    # fixed pad leaked zero-border pixels into img2 at >=128x192 — corrupted
    # supervision); the same helper sizes the eval generators' canvases
    from ..eval.datasets import affine_warp_pad

    pad = affine_warp_pad(H, W, max_t, max_angle, scales)
    img1 = np.zeros((B, H, W, 3), np.float32)
    img2 = np.zeros((B, H, W, 3), np.float32)
    flow = np.zeros((B, H, W, 2), np.float32)
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32) + pad,
                         np.arange(H, dtype=np.float32) + pad)
    for i in range(B):
        base = np.zeros((H + 2 * pad, W + 2 * pad), np.float32)
        for s in range(textures):
            sigma = 0.8 + 1.2 * s + rng.uniform(0, 0.8)
            base += cv2.GaussianBlur(
                rng.uniform(0, 1, base.shape).astype(np.float32), (0, 0), sigma
            ) * rng.uniform(0.4, 1.0)
        base -= base.min()
        base /= max(base.max(), 1e-6)
        if rng.uniform() < mesh_prob:
            _draw_mesh(rng, base)
        ang = rng.uniform(-max_angle, max_angle)
        sc = rng.uniform(*scales)
        tx, ty = rng.uniform(-max_t, max_t, 2)
        M = cv2.getRotationMatrix2D((W / 2 + pad, H / 2 + pad), ang, sc)
        M[:, 2] += (tx, ty)
        f1 = base[pad : pad + H, pad : pad + W]
        f2 = cv2.warpAffine(base, M, base.shape[::-1])[pad : pad + H, pad : pad + W]
        if photometric and rng.uniform() < 0.5:
            f2 = np.clip(f2 * rng.uniform(0.6, 1.4) + rng.uniform(-0.1, 0.1), 0, 1)
            f1 = np.clip(f1 + rng.normal(0, 0.016, f1.shape), 0, 1).astype(np.float32)
            f2 = np.clip(f2 + rng.normal(0, 0.016, f2.shape), 0, 1).astype(np.float32)
        if rng.uniform() < color_prob:
            # per-channel affine colorization, identical on both frames:
            # luminance structure stays the GT-warped signal, channels get
            # distinct gains/offsets (colored nets on colored water)
            g = rng.uniform(0.3, 1.0, 3).astype(np.float32)
            o = rng.uniform(0.0, 0.5, 3).astype(np.float32) * (1.0 - g)
            img1[i] = np.clip(f1[..., None] * g + o, 0, 1)
            img2[i] = np.clip(f2[..., None] * g + o, 0, 1)
        else:
            img1[i] = f1[..., None]
            img2[i] = f2[..., None]
        # forward flow(p1) = M p1 - p1 (same derivation as the eval pairs)
        x2 = M[0, 0] * xs + M[0, 1] * ys + M[0, 2]
        y2 = M[1, 0] * xs + M[1, 1] * ys + M[1, 2]
        flow[i, ..., 0] = x2 - xs
        flow[i, ..., 1] = y2 - ys
    return {"img1": img1, "img2": img2, "flow": flow}


WEIGHTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "weights",
)


def _kaiming_rescale(tree, gain=1.55):
    """Init-time conv-kernel gain for norm-free leaky-conv trunks (PWC, LFN3).

    flax lecun_normal decays activation std ~0.7x per leaky conv and PWC's
    18-conv norm-free extractor collapses to ~1e-4 std by level 6 (measured),
    leaving training in the predict-zero basin.  The theoretical
    leaky-kaiming gain (1.407) still decayed ~0.89x/conv empirically; 1.55
    measures flat (level stds 0.33-0.62).  Init-time only — checkpoint compat
    untouched."""
    import jax

    def walk(d):
        for v in d.values():
            if isinstance(v, dict):
                walk(v)
        if "kernel" in d:
            d["kernel"] = d["kernel"] * gain

    tree = jax.tree_util.tree_map(lambda x: x, tree)  # copy
    walk(tree["params"])
    return tree


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="raft_small",
                    choices=("raft_small", "raft_large", "neuflow_lite",
                             "neuflow_v2", "pwcnet", "liteflownet3",
                             "liteflownet"))
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8,
                    help="refinement iterations (RAFT GRU iters; "
                         "NeuFlow-v2 s8 refinement iters)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--seed", type=int, default=1000)
    ap.add_argument("--out", default=None,
                    help="npz path (default: packaged <model>_synth.npz)")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--resume", action="store_true",
                    help="initialize from the existing --out npz")
    ap.add_argument("--curriculum", action="store_true",
                    help="ramp motion magnitude from tiny to full over the "
                         "first 60%% of steps — helps direct-regression "
                         "decoders (PWC) escape the predict-zero basin where "
                         "large-displacement warps destroy the corr signal")
    ap.add_argument("--distill", default=None,
                    choices=("raft_large", "raft_small"),
                    help="teacher distillation: supervise on the packaged "
                         "teacher's predicted flow instead of GT (the "
                         "standard fix for direct-regression pyramids that "
                         "plateau from scratch — teacher fields are "
                         "smoother/achievable regression targets); "
                         "fine-tune on GT afterwards with --resume")
    ap.add_argument("--init-extractor", default=None, metavar="NPZ",
                    help="pwcnet only: graft a feature-distilled extractor "
                         "(tools/pwc_distill_extractor.py) over the fresh "
                         "init before training — stage B of the LFN3-trunk "
                         "bootstrap (VERDICT r4 item 8)")
    ap.add_argument("--freeze-extractor", action="store_true",
                    help="pwcnet only: zero the extractor's gradients so "
                         "stage-B training moves only decoders/refiner")
    ap.add_argument("--motion-mix", action="store_true",
                    help="interleave easy/hard motion regimes per batch "
                         "(50%% eval-easy <=4 px/2deg/2%% zoom, 50%% full "
                         "range) — the single-recipe 240x320 fine-tune "
                         "overfit LFN3 to large motion, trading fishnet-easy "
                         "0.730 -> 1.05 for hard 20 -> 12 (VERDICT r4 item 4)")
    ap.add_argument("--mesh-prob", type=float, default=0.0,
                    help="probability of overlaying a procedural fishnet "
                         "mesh on each training texture (deployment-domain "
                         "structure; see _draw_mesh)")
    ap.add_argument("--color-prob", type=float, default=0.0,
                    help="probability of per-channel colorization instead "
                         "of gray-replicated 3-channel frames")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.curriculum and args.motion_mix:
        # the per-step schedule branch would silently pick curriculum and
        # reproduce exactly the large-motion overfit --motion-mix fixes
        raise SystemExit("--curriculum and --motion-mix are mutually "
                         "exclusive (the curriculum branch would win every "
                         "step and the mix would never fire)")

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import jax.numpy as jnp
    import optax
    from flax.traverse_util import flatten_dict

    from ..parallel import train_step
    from ..parallel.train import TrainState
    from ..parallel.checkpoint import save_checkpoint

    name = args.model
    out = args.out or os.path.join(WEIGHTS_DIR, f"{name}_synth.npz")
    if not out.endswith(".npz"):
        # np.savez appends .npz to a bare path, which would silently break
        # the --resume os.path.exists check and the final "weights ->" message
        out += ".npz"
    ckpt_dir = args.ckpt_dir or f"checkpoints/{name}_synth"
    rng = np.random.default_rng(args.seed)
    warmup = min(args.warmup, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, args.lr * 0.02
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=1e-5))
    i0 = jnp.zeros((args.height, args.width, 3), jnp.float32)

    if name in ("raft_small", "raft_large"):
        from ..models import RAFT, RAFTSmall
        model = RAFTSmall() if name == "raft_small" else RAFT()
        init = lambda key: model.init(key, i0, i0, 2)

        def step_body(s, b):
            return train_step(model, tx, s, b, iters=args.iters)
    elif name in ("pwcnet", "liteflownet3", "liteflownet"):
        from ..core.resize import resize_area

        # original PWC multi-scale supervision: per-level L1 against the GT
        # downsampled to each level's resolution, in the net's /20 units
        # (fine->coarse weights from the PWC-Net paper schedule); the three
        # coarse-to-fine direct-regression families share it, restricted to
        # the levels each one actually predicts (PWC 6..2, LFN3 6..3,
        # LFN 6..2)
        lvl_w = {6: 0.32, 5: 0.08, 4: 0.02, 3: 0.01, 2: 0.005}
        if name == "pwcnet":
            from ..models import PWCNet

            model = PWCNet()
        elif name == "liteflownet3":
            from ..models import LiteFlowNet3

            model = LiteFlowNet3()
        else:
            from ..models import LiteFlowNet

            model = LiteFlowNet()
        # all three trunks are norm-free leaky-conv stacks: rescale the
        # default lecun init so activations do not decay level over level
        init = lambda key: _kaiming_rescale(model.init(key, i0, i0))

        def step_body(s, b):
            def loss_fn(params):
                def one(i1, i2, gt):
                    _, pyr = model.apply(params, i1, i2, return_pyramid=True)
                    total = 0.0
                    for lvl, fl in pyr.items():
                        Hl, Wl = fl.shape[0], fl.shape[1]
                        gt_l = resize_area(
                            gt.transpose(2, 0, 1), (Hl, Wl)
                        ).transpose(1, 2, 0) * (1.0 / 20.0)
                        total = total + lvl_w[lvl] * jnp.abs(fl - gt_l).mean()
                    return total

                return jnp.mean(jax.vmap(one)(b["img1"], b["img2"], b["flow"]))

            loss, grads = jax.value_and_grad(loss_fn)(s.params)
            if args.freeze_extractor and "extractor" in grads.get("params", {}):
                grads = dict(grads)
                grads["params"] = dict(grads["params"])
                grads["params"]["extractor"] = jax.tree_util.tree_map(
                    jnp.zeros_like, grads["params"]["extractor"])
            updates, opt_state = tx.update(grads, s.opt_state, s.params)
            if args.freeze_extractor and "extractor" in updates.get(
                    "params", {}):
                # zeroing grads is not enough: adamw's DECOUPLED weight
                # decay contributes -lr*wd*p to the update regardless of the
                # gradient, drifting the "frozen" grafted extractor by
                # ~lr*wd per step — zero the final updates too
                updates = dict(updates)
                updates["params"] = dict(updates["params"])
                updates["params"]["extractor"] = jax.tree_util.tree_map(
                    jnp.zeros_like, updates["params"]["extractor"])
            params = optax.apply_updates(s.params, updates)
            return TrainState(params, opt_state, s.step + 1), loss
    else:
        if name == "neuflow_v2":
            from ..models.neuflow_v2 import NeuFlowV2

            model = NeuFlowV2()
            init = lambda key: model.init(key, i0, i0, 1)

            def apply_aux(params, i1, i2):
                return model.apply(params, i1, i2, args.iters,
                                   return_aux=True)
        else:
            from ..models import NeuFlowLite

            model = NeuFlowLite()
            init = lambda key: model.init(key, i0, i0)

            def apply_aux(params, i1, i2):
                return model.apply(params, i1, i2, return_aux=True)

        def step_body(s, b):
            # final + auxiliary (pre-refinement global-matching) L1 loss, so
            # the matching stage learns instead of hiding behind the refiner
            def loss_fn(params):
                def one(i1, i2, gt):
                    out_f, aux = apply_aux(params, i1, i2)
                    return (jnp.abs(out_f - gt).mean()
                            + 0.3 * jnp.abs(aux - gt).mean())

                return jnp.mean(
                    jax.vmap(one)(b["img1"], b["img2"], b["flow"])
                )

            loss, grads = jax.value_and_grad(loss_fn)(s.params)
            updates, opt_state = tx.update(grads, s.opt_state, s.params)
            params = optax.apply_updates(s.params, updates)
            return TrainState(params, opt_state, s.step + 1), loss

    teacher_fn = None
    if args.distill:
        from ..models.raft import load_raft_small_synth, load_raft_synth

        loaded = (load_raft_synth() if args.distill == "raft_large"
                  else load_raft_small_synth())
        if loaded is None:
            raise SystemExit(
                f"--distill {args.distill}: packaged teacher weights not "
                f"found under {WEIGHTS_DIR}")
        t_model, t_params = loaded
        teacher_fn = jax.jit(lambda i1, i2: jax.vmap(
            lambda a, b: t_model.apply(t_params, a, b, 12)[-1])(i1, i2))
        print(f"distilling from {args.distill} teacher")

    if args.resume and os.path.exists(out):
        # resume from the --out npz itself (the packaged loader() reads the
        # packaged path, which differs when --out points elsewhere, e.g. a
        # distillation scratch npz)
        from flax.traverse_util import unflatten_dict

        data = np.load(out)
        params = {"params": unflatten_dict(
            {tuple(k.split("/")): data[k] for k in data.files})}
        print(f"resumed params from {out}")
    else:
        params = init(jax.random.PRNGKey(args.seed))
    if args.init_extractor:
        if name != "pwcnet":
            raise SystemExit("--init-extractor is a pwcnet stage-B option")
        from flax.traverse_util import unflatten_dict

        data = np.load(args.init_extractor)
        ext = unflatten_dict(
            {tuple(k.split("/")): data[k] for k in data.files})
        got = {k: v.shape for k, v in flatten_dict(ext).items()}
        want = {k: v.shape
                for k, v in flatten_dict(params["params"]["extractor"]).items()}
        if got != want:
            raise SystemExit(
                f"--init-extractor shape mismatch: {got} != {want}")
        params = dict(params)
        params["params"] = dict(params["params"], extractor=jax.tree_util
                                .tree_map(jnp.asarray, ext))
        print(f"grafted distilled extractor from {args.init_extractor}")
    if args.freeze_extractor and "extractor" not in params.get("params", {}):
        # without this, --freeze-extractor on e.g. raft_small would silently
        # train everything (the in-step guard checks the same key)
        raise SystemExit(f"--freeze-extractor: model {name!r} has no "
                         "'extractor' param group (pwcnet stage-B option)")
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    step_fn = jax.jit(step_body)

    def export(params, path):
        flat = flatten_dict(jax.device_get(params)["params"])
        np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})

    t0 = time.time()
    losses = []
    for step in range(1, args.steps + 1):
        if args.curriculum:
            f = min(step / max(args.steps * 0.6, 1.0), 1.0)
            mkw = dict(max_t=2.0 + 14.0 * f, max_angle=1.0 + 7.0 * f,
                       scales=(1.0 - 0.08 * f, 1.0 + 0.1 * f))
        elif args.motion_mix and step % 2 == 0:
            # even steps: the eval-easy regime (run_eval --fishnet easy:
            # <=4 px translation, +/-2deg, +/-2% zoom) so fine-tuning keeps
            # small-motion accuracy while odd steps train the full range
            mkw = dict(max_t=4.0, max_angle=2.0, scales=(0.98, 1.02))
        else:
            mkw = {}
        batch = make_affine_batch(rng, args.batch, args.height, args.width,
                                  mesh_prob=args.mesh_prob,
                                  color_prob=args.color_prob, **mkw)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if teacher_fn is not None:
            batch["flow"] = teacher_fn(batch["img1"], batch["img2"])
        state, loss = step_fn(state, batch)
        if step % args.log_every == 0 or step == 1:
            loss = float(loss)  # sync
            losses.append(loss)
            rate = step / max(time.time() - t0, 1e-9)
            print(f"step {step:5d}  loss {loss:8.4f}  lr {sched(step):.2e}  "
                  f"{rate:.2f} steps/s", flush=True)
        if args.ckpt_every and step % args.ckpt_every == 0:
            save_checkpoint(ckpt_dir, jax.device_get(state), step)
            export(state.params, out)
            print(f"checkpoint @ {step} -> {ckpt_dir}; npz -> {out}",
                  flush=True)
    export(state.params, out)
    print(f"done: {args.steps} steps in {time.time() - t0:.0f}s; "
          f"final loss {losses[-1]:.4f}; weights -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
