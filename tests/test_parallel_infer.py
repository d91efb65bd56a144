"""shard_map inference tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest
import jax

from opticalflowcontainer_tpu.parallel import make_mesh
from opticalflowcontainer_tpu.parallel.infer import (
    make_sharded_flow_fn,
    make_spatial_sharded_flow_fn,
)


def _toy_flow_fn(prev, cur):
    # stand-in flow: per-pixel intensity difference as u, zeros as v
    d = (cur - prev)[..., None]
    return jax.numpy.concatenate([d, jax.numpy.zeros_like(d)], axis=-1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_flow_psum_matches_global_mean(rng):
    mesh = make_mesh(8, data=8, model=1)
    fn = make_sharded_flow_fn(_toy_flow_fn, mesh)
    prev = rng.standard_normal((16, 32, 48)).astype(np.float32)
    cur = rng.standard_normal((16, 32, 48)).astype(np.float32)
    flow, mean_u = fn(prev, cur)
    assert flow.shape == (16, 32, 48, 2)
    np.testing.assert_allclose(
        float(mean_u), float((cur - prev).mean()), rtol=1e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_sharded_farneback_matches_single(rng):
    """Batch x height sharded Farneback == unsharded result (XLA SPMD halo
    correctness check on a real conv/gather pipeline)."""
    import functools

    from opticalflowcontainer_tpu.classical import farneback_batched

    fb = functools.partial(farneback_batched, levels=1, winsize=11, iterations=1)
    mesh = make_mesh(8, data=4, model=2)
    fn = make_spatial_sharded_flow_fn(fb, mesh)
    import cv2

    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (4, 64, 80)).astype(np.float32), (0, 0), 2
    )
    prev = base
    cur = np.roll(base, 2, axis=2)
    sharded = np.asarray(fn(prev, cur))
    single = np.asarray(jax.jit(fb)(prev, cur))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pallas_blockwarp_under_shard_map(rng, monkeypatch):
    """The TPU Farneback hot path is a pallas_call; the supported multi-chip
    composition is shard_map DP (the kernel runs UNPARTITIONED inside each
    per-chip shard — spatial sharding of a pallas_call is unsupported,
    parallel/infer.py docstring).  Prove the composition: the block-warp
    Farneback under make_sharded_flow_fn on an 8-way mesh equals the
    unsharded call."""
    import functools

    import opticalflowcontainer_tpu.classical.farneback as fb_mod
    from opticalflowcontainer_tpu.classical import farneback_batched

    monkeypatch.setattr(fb_mod, "BLOCK_WARP_INTERPRET", True)
    monkeypatch.setattr(fb_mod, "_on_tpu", lambda: True)

    fb = functools.partial(farneback_batched, levels=1, winsize=11,
                           iterations=1)
    mesh = make_mesh(8, data=8, model=1)
    fn = make_sharded_flow_fn(fb, mesh)
    import cv2

    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (8, 64, 80)).astype(np.float32), (0, 0), 2
    )
    prev = base
    cur = np.roll(base, 2, axis=2)
    flow_s, mean_u = fn(prev, cur)
    single = np.asarray(jax.jit(fb)(prev, cur))
    np.testing.assert_allclose(np.asarray(flow_s), single, atol=1e-3)
    np.testing.assert_allclose(float(mean_u), single[..., 0].mean(),
                               rtol=1e-4)
