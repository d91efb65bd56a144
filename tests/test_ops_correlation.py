"""Correlation op tests: brute-force oracle implementing the reference kernel
semantics (CuPy kernel_Correlation_updateOutput / correlation_cuda), lax vs
Pallas(interpret) parity, and gradient checks."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opticalflowcontainer_tpu.ops import correlation_lax, unfold
from opticalflowcontainer_tpu.ops.correlation_pallas import correlation_pallas


def _brute(f1, f2, max_disp, disp_stride=1, out_stride=1):
    H, W, C = f1.shape
    D = max_disp // disp_stride
    K = 2 * D + 1
    Ho, Wo = -(-H // out_stride), -(-W // out_stride)
    out = np.zeros((Ho, Wo, K * K), np.float32)
    for yo in range(Ho):
        for xo in range(Wo):
            y, x = yo * out_stride, xo * out_stride
            for c in range(K * K):
                dy = (c // K - D) * disp_stride
                dx = (c % K - D) * disp_stride
                y2, x2 = y + dy, x + dx
                if 0 <= y2 < H and 0 <= x2 < W:
                    out[yo, xo, c] = f1[y, x] @ f2[y2, x2] / C
    return out


CONFIGS = [
    (4, 1, 1),   # PWC / LFN3 cross-corr, 81 ch
    (3, 1, 1),   # LiteFlowNet fine, 49 ch
    (6, 2, 1),   # LFN3 self-corr level 4, 49 ch
    (8, 2, 1),   # LFN3 self-corr level 3, 81 ch
    (6, 2, 2),   # LiteFlowNet coarse (strided output), 49 ch
]


@pytest.mark.parametrize("max_disp,ds,os_", CONFIGS)
def test_correlation_lax_matches_brute(rng, max_disp, ds, os_):
    f1 = rng.standard_normal((13, 17, 8)).astype(np.float32)
    f2 = rng.standard_normal((13, 17, 8)).astype(np.float32)
    ref = _brute(f1, f2, max_disp, ds, os_)
    ours = np.asarray(correlation_lax(f1, f2, max_disp, ds, os_))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("max_disp,ds", [(4, 1), (3, 1), (6, 2)])
def test_correlation_pallas_matches_lax(rng, max_disp, ds):
    f1 = rng.standard_normal((12, 16, 24)).astype(np.float32)
    f2 = rng.standard_normal((12, 16, 24)).astype(np.float32)
    ref = np.asarray(correlation_lax(f1, f2, max_disp, ds, 1))
    ours = np.asarray(correlation_pallas(f1, f2, max_disp, ds, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_correlation_batched_vmap(rng):
    f1 = rng.standard_normal((2, 10, 12, 6)).astype(np.float32)
    f2 = rng.standard_normal((2, 10, 12, 6)).astype(np.float32)
    out = np.asarray(correlation_lax(f1, f2, 3))
    single = np.asarray(correlation_lax(f1[1], f2[1], 3))
    np.testing.assert_allclose(out[1], single, atol=1e-6)


def test_correlation_grad_check(rng):
    f1 = rng.standard_normal((6, 7, 4)).astype(np.float32)
    f2 = rng.standard_normal((6, 7, 4)).astype(np.float32)

    def loss_lax(a, b):
        return jnp.sum(correlation_lax(a, b, 2) ** 2)

    def loss_pallas(a, b):
        return jnp.sum(correlation_pallas(a, b, 2, 1, 1) ** 2)

    g_lax = jax.grad(loss_lax, argnums=(0, 1))(f1, f2)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1))(f1, f2)
    for gl, gp in zip(g_lax, g_pal):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(gp), rtol=1e-4, atol=1e-5)
    # finite differences on a few coordinates (fp32 => coarse eps/tolerance)
    eps = 1e-2
    for idx in [(0, 0, 0), (3, 4, 2), (5, 6, 3)]:
        d = np.zeros_like(f1)
        d[idx] = eps
        fd = (loss_lax(jnp.asarray(f1 + d), f2) - loss_lax(jnp.asarray(f1 - d), f2)) / (
            2 * eps
        )
        np.testing.assert_allclose(
            float(fd), float(np.asarray(g_lax[0])[idx]), rtol=5e-2, atol=1e-3
        )


def test_unfold_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, 3, 9, 11)).astype(np.float32)
    ref = (
        F.unfold(torch.from_numpy(x), kernel_size=3, padding=1)
        .reshape(1, 3, 9, 9, 11)
        .numpy()
    )  # [B, C, k*k, H, W]
    ours = np.asarray(unfold(x.transpose(0, 2, 3, 1), 3))  # [B, H, W, k*k, C]
    ours_t = ours.transpose(0, 4, 3, 1, 2)
    np.testing.assert_allclose(ours_t, ref, atol=1e-6)
