"""Stage-A PWC bootstrap: distill the trained LFN3 trunk into PWC's extractor.

PWC-Net's pure direct-regression pyramid has never left the predict-zero
basin in this sandbox (24k curriculum steps and a RAFT-teacher distillation
both plateaued at easy EPE ~2.6 px; models/pwcnet.py:load_pwcnet_synth).
VERDICT r4 item 8's last costed idea — initialize PWC's extractor from the
trained LFN3 trunk — is shape-impossible (PWC levels are 3-conv stride
blocks at 16/32/64/96/128/196 channels vs the LFN trunk's 7x7-stem
32/32/64/96/128/192 topology), so this implements the faithful version:
FEATURE distillation.  PWC's extractor (+ per-level 1x1 adapters, discarded
afterwards) is trained so its pyramid matches the packaged LFN3 trunk's
features at the five shared resolutions (PWC level k at 1/2^k <-> LFN
l(k+1), k=1..5); the resulting extractor params are exported for
``train_flow.py --model pwcnet --init-extractor <npz>`` to graft before
stage-B training of the decoders on GT.

Run:  python -m opticalflowcontainer_tpu.tools.pwc_distill_extractor \
          --steps 3000 --out /tmp/pwc_extractor.npz
"""
from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=2000)
    ap.add_argument("--out", default="/tmp/pwc_extractor.npz")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

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
    import flax.linen as nn
    import optax
    from flax.traverse_util import flatten_dict

    from ..models.liteflownet import Features
    from ..models.liteflownet3 import load_liteflownet3_synth
    from ..models.pwcnet import Extractor
    from .train_flow import make_affine_batch

    loaded = load_liteflownet3_synth()
    if loaded is None:
        raise SystemExit("packaged liteflownet3_synth.npz not found — the "
                         "distillation teacher is the packaged LFN3 trunk")
    _, lfn3_params = loaded
    trunk_params = {"params": lfn3_params["params"]["features"]}
    trunk = Features()

    class Student(nn.Module):
        """PWC extractor + per-level 1x1 adapters to the trunk's channels.
        Adapters absorb the channel mismatch; they are NOT exported."""

        @nn.compact
        def __call__(self, img):
            feats = Extractor(name="extractor")(img)
            outs = []
            for k, ch in enumerate((32, 64, 96, 128, 192)):
                outs.append(nn.Dense(ch, name=f"adapt{k + 1}")(feats[k]))
            return outs

        # PWC levels 1..5 (1/2..1/32) <-> LFN trunk l2..l6; PWC level 6
        # (1/64) has no trunk analogue and keeps its init.

    student = Student()
    rng_np = np.random.default_rng(args.seed)
    i0 = jnp.zeros((args.height, args.width, 3), jnp.float32)
    params = student.init(jax.random.PRNGKey(args.seed), i0)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, min(200, args.steps // 10 + 1), args.steps,
        args.lr * 0.02)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = tx.init(params)

    def targets(tp, img):
        # the trunk sees LFN3's input convention (per-image mean removed,
        # liteflownet3.py __call__); the student sees PWC's raw [0,1]
        t = trunk.apply(tp, img - img.mean(axis=(0, 1), keepdims=True))
        return t[1:6]  # l2..l6

    # teacher params ride as a jit ARGUMENT like the student's — a closure
    # capture would serialize the whole trunk tree into the HLO uploaded to
    # the axon remote compiler (the round-2 session-5 failure mode)
    @jax.jit
    def step(params, opt_state, trunk_p, imgs):
        def loss_fn(p):
            def one(img):
                outs = student.apply(p, img)
                tgts = targets(trunk_p, img)
                total = 0.0
                for o, t in zip(outs, tgts):
                    t = jax.lax.stop_gradient(t)
                    total = total + jnp.mean((o - t) ** 2) / (
                        jnp.mean(t**2) + 1e-6)
                return total / len(outs)

            return jnp.mean(jax.vmap(one)(imgs))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    t0 = time.time()
    for it in range(1, args.steps + 1):
        batch = make_affine_batch(rng_np, args.batch, args.height, args.width,
                                  mesh_prob=0.3, color_prob=0.5)
        imgs = jnp.asarray(np.concatenate(
            [batch["img1"][: args.batch // 2],
             batch["img2"][: (args.batch + 1) // 2]]))
        params, opt_state, loss = step(params, opt_state, trunk_params, imgs)
        if it % args.log_every == 0 or it == 1:
            print(f"step {it:5d}  feat-loss {float(loss):7.4f}  "
                  f"{it / max(time.time() - t0, 1e-9):.2f} steps/s",
                  flush=True)

    ext = jax.device_get(params)["params"]["extractor"]
    flat = flatten_dict(ext)
    np.savez(args.out, **{"/".join(k): np.asarray(v) for k, v in flat.items()})
    print(f"done: extractor -> {args.out} (final feat-loss {float(loss):.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
