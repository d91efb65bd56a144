"""Fused blur+2x2-solve kernel == the XLA border-folded matmul solve."""
import numpy as np
import pytest

import jax.numpy as jnp

import opticalflowcontainer_tpu.classical.farneback as fb
from opticalflowcontainer_tpu.ops.solve2x2 import blur_solve_2x2


@pytest.mark.parametrize("gaussian", [False, True])
@pytest.mark.parametrize("hw", [(96, 256), (90, 200)])
def test_blur_solve_matches_xla_solve(gaussian, hw, rng, monkeypatch):
    H, W = hw
    B = 2
    # realistic normal-equation planes: positive-definite-ish G
    a = rng.normal(size=(B, H, W)).astype(np.float32)
    b = rng.normal(size=(B, H, W)).astype(np.float32)
    c = rng.normal(size=(B, H, W)).astype(np.float32)
    M = np.stack([a * a + 0.5, 0.3 * a * b, b * b + 0.5, c, a * c], axis=1)
    Mj = jnp.asarray(M)

    monkeypatch.setattr(fb, "SOLVE_FUSE", False)
    ue, ve = fb._solve_flow_planes(Mj, 15, gaussian)

    H2, W2 = fb._round_up(H, 48), fb._round_up(W, 128)
    bw_ = max(d for d in (640, 512, 384, 256, 128) if W2 % d == 0)
    Mp = jnp.pad(Mj, ((0, 0), (0, 0), (0, H2 - H), (0, W2 - W)), mode="edge")
    u, v = blur_solve_2x2(Mp, winsize=15, gaussian=gaussian,
                          block=(48, bw_), interpret=True)
    # kernel blur runs bf16 taps (MXU path): ~0.4% relative on G/h, mostly
    # cancelling in the solve — tolerance reflects that, the device-EPE bench
    # check guards the real 0.1 px bar
    np.testing.assert_allclose(np.asarray(u)[..., :H, :W], np.asarray(ue),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(v)[..., :H, :W], np.asarray(ve),
                               atol=2e-2)
