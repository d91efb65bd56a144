"""Headline benchmark: dense 720p Farneback flow fields/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": "farneback_720p_fields_per_sec", "value": N, "unit": "fields/s",
   "vs_baseline": N / 1000}
(baseline = the BASELINE.json north-star target of 1000 dense 720p fields/s/chip).

Timing methodology: the axon remote runtime's ``block_until_ready`` does not
actually block, so each timed call is chained through a data dependency on the
previous result and a single scalar sync ends the region.  The in-jit
reduction keeps device->host traffic to 4 bytes.  A persistent compilation
cache is enabled because remote compiles through the tunnel are slow.

``--quick`` uses a smaller batch/fewer reps; ``--json-only`` suppresses the
human-readable lines.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_FIELDS_PER_SEC = 1000.0  # BASELINE.json north star (v5e target)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--reps", type=int, default=None)
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import jax.numpy as jnp

    from opticalflowcontainer_tpu.classical import farneback_batched

    B = args.batch or (2 if args.quick else 8)
    reps = args.reps or (2 if args.quick else 6)
    H, W = 720, 1280

    def fb_checksum(a, b):
        flow = farneback_batched(
            a, b, pyr_scale=0.5, levels=3, winsize=15, iterations=3,
            poly_n=5, poly_sigma=1.2,
        )
        return flow.sum(), flow[0, 0, 0, 0]

    fn = jax.jit(fb_checksum)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    b = jnp.roll(a, 2, axis=2)

    t0 = time.time()
    s, _ = fn(a, b)
    s0 = float(s)  # full sync
    compile_s = time.time() - t0
    if not args.json_only:
        print(f"# backend={jax.default_backend()} B={B} compile+first={compile_s:.1f}s "
              f"checksum={s0:.0f}", file=sys.stderr)

    # timed region: chain reps calls by data dependency, one sync at the end
    t0 = time.time()
    s = jnp.float32(0)
    for _ in range(reps):
        s, _ = fn(a + 0.0 * s, b)
    _ = float(s)
    elapsed = time.time() - t0
    per_batch = elapsed / reps
    fields_per_sec = B / per_batch

    if not args.json_only:
        print(f"# per-batch {per_batch * 1000:.1f} ms | p50 batch latency ~ same "
              f"(sequential chain)", file=sys.stderr)
    print(json.dumps({
        "metric": "farneback_720p_fields_per_sec",
        "value": round(fields_per_sec, 2),
        "unit": "fields/s",
        "vs_baseline": round(fields_per_sec / BASELINE_FIELDS_PER_SEC, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
