"""Farneback cv2-parity tests (BASELINE config 1: <=0.1 px mean EPE)."""
import cv2
import numpy as np
import pytest

from opticalflowcontainer_tpu.classical import (
    calc_optical_flow_farneback,
    farneback_batched,
    OPTFLOW_FARNEBACK_GAUSSIAN,
)

DEFAULTS = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3, poly_n=5, poly_sigma=1.2)


def _pair(rng, H, W, M):
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (H + 80, W + 80)).astype(np.float32), (0, 0), 2.5
    )
    f1 = base[40 : 40 + H, 40 : 40 + W].astype(np.uint8)
    f2 = cv2.warpAffine(base, M, (W + 80, H + 80))[40 : 40 + H, 40 : 40 + W].astype(
        np.uint8
    )
    return f1, f2


def _epe(ours, ref):
    return float(np.linalg.norm(np.asarray(ours) - ref, axis=-1).mean())


def test_translation_parity(rng):
    f1, f2 = _pair(rng, 120, 160, np.float32([[1, 0, -2.3], [0, 1, 1.7]]))
    ref = cv2.calcOpticalFlowFarneback(f1, f2, None, flags=0, **DEFAULTS)
    ours = calc_optical_flow_farneback(
        f1.astype(np.float32), f2.astype(np.float32), **DEFAULTS
    )
    assert _epe(ours, ref) < 0.01
    # and it actually finds the motion
    assert abs(float(np.asarray(ours)[..., 0].mean()) - ref[..., 0].mean()) < 0.01


def test_rotation_zoom_parity(rng):
    f1, f2 = _pair(rng, 160, 200, cv2.getRotationMatrix2D((100, 80), 2.0, 1.02))
    ref = cv2.calcOpticalFlowFarneback(f1, f2, None, flags=0, **DEFAULTS)
    ours = calc_optical_flow_farneback(
        f1.astype(np.float32), f2.astype(np.float32), **DEFAULTS
    )
    assert _epe(ours, ref) < 0.1


def test_gaussian_flag_parity(rng):
    f1, f2 = _pair(rng, 120, 160, np.float32([[1, 0, -1.4], [0, 1, 2.8]]))
    ref = cv2.calcOpticalFlowFarneback(
        f1, f2, None, flags=OPTFLOW_FARNEBACK_GAUSSIAN, **DEFAULTS
    )
    ours = calc_optical_flow_farneback(
        f1.astype(np.float32),
        f2.astype(np.float32),
        flags=OPTFLOW_FARNEBACK_GAUSSIAN,
        **DEFAULTS,
    )
    assert _epe(ours, ref) < 0.05


def test_nondefault_params_parity(rng):
    f1, f2 = _pair(rng, 121, 159, np.float32([[1, 0, 2.0], [0, 1, 1.0]]))
    args = dict(pyr_scale=0.8, levels=4, winsize=13, iterations=2, poly_n=7, poly_sigma=1.5)
    ref = cv2.calcOpticalFlowFarneback(f1, f2, None, flags=0, **args)
    ours = calc_optical_flow_farneback(
        f1.astype(np.float32), f2.astype(np.float32), **args
    )
    assert _epe(ours, ref) < 0.05


def test_batched_matches_single(rng):
    f1a, f2a = _pair(rng, 96, 128, np.float32([[1, 0, 1.5], [0, 1, -0.5]]))
    f1b, f2b = _pair(rng, 96, 128, np.float32([[1, 0, -1.0], [0, 1, 2.0]]))
    prev = np.stack([f1a, f1b]).astype(np.float32)
    nxt = np.stack([f2a, f2b]).astype(np.float32)
    args = dict(pyr_scale=0.5, levels=2, winsize=11, iterations=2, poly_n=5, poly_sigma=1.1)
    batched = np.asarray(farneback_batched(prev, nxt, **args))
    single = np.asarray(calc_optical_flow_farneback(prev[1], nxt[1], **args))
    np.testing.assert_allclose(batched[1], single, atol=1e-5)


def test_clip_initial_flow_matches_pairwise():
    """farneback_clip must accept the 'flow' initial-flow kwarg (routes via
    the pairwise fallback) and broadcast an unbatched [H, W, 2] seed to the
    T-1 pairs — matching per-pair calls with the same seed exactly."""
    import jax.numpy as jnp
    import numpy as np

    from opticalflowcontainer_tpu.classical.farneback import (
        OPTFLOW_USE_INITIAL_FLOW,
        calc_optical_flow_farneback,
        farneback_clip,
    )

    rng = np.random.default_rng(7)
    base = rng.uniform(0, 255, (40, 64)).astype(np.float32)
    fr = np.stack([base, np.roll(base, 1, 1), np.roll(base, 2, 1)])
    seed = jnp.ones((40, 64, 2), jnp.float32) * 0.5

    clip = farneback_clip(jnp.asarray(fr), flow=seed,
                          flags=OPTFLOW_USE_INITIAL_FLOW)
    assert clip.shape == (2, 40, 64, 2)
    for k in range(2):
        pair = calc_optical_flow_farneback(
            jnp.asarray(fr[k]), jnp.asarray(fr[k + 1]), flow=seed,
            flags=OPTFLOW_USE_INITIAL_FLOW)
        assert float(jnp.abs(clip[k] - pair).max()) == 0.0

    import pytest

    with pytest.raises(TypeError, match="unexpected keyword"):
        farneback_clip(jnp.asarray(fr), winsze=15)
