"""Warp-convention parity tests against torch.grid_sample (CPU torch is the
oracle for the three reference conventions)."""
import numpy as np
import torch
import torch.nn.functional as F

from opticalflowcontainer_tpu.core import (
    warp_align_corners,
    warp_half_pixel,
    warp_with_mask,
    warp_bilinear,
)


def _torch_backwarp(inp, flow, align_corners, half_pixel_grid):
    """Reference-style backwarp in torch (NCHW), returns NCHW numpy."""
    B, C, H, W = inp.shape
    if half_pixel_grid:
        hor = torch.linspace(-1.0 + 1.0 / W, 1.0 - 1.0 / W, W)
        ver = torch.linspace(-1.0 + 1.0 / H, 1.0 - 1.0 / H, H)
    else:
        hor = torch.linspace(-1.0, 1.0, W)
        ver = torch.linspace(-1.0, 1.0, H)
    grid = torch.stack(
        [hor.view(1, -1).expand(H, -1), ver.view(-1, 1).expand(-1, W)], dim=-1
    )[None].expand(B, -1, -1, -1)
    nflow = torch.stack(
        [flow[:, 0] * (2.0 / (W - 1.0)), flow[:, 1] * (2.0 / (H - 1.0))], dim=-1
    )
    return F.grid_sample(
        inp, grid + nflow, mode="bilinear", padding_mode="zeros",
        align_corners=align_corners,
    ).numpy()


def _data(rng, B=1, C=3, H=20, W=28, mag=4.0):
    img = rng.uniform(0, 1, (B, C, H, W)).astype(np.float32)
    flow = rng.uniform(-mag, mag, (B, 2, H, W)).astype(np.float32)
    return img, flow


def test_warp_align_corners_matches_torch(rng):
    img, flow = _data(rng)
    ref = _torch_backwarp(torch.from_numpy(img), torch.from_numpy(flow), True, False)
    ours = np.asarray(
        warp_align_corners(img.transpose(0, 2, 3, 1), flow.transpose(0, 2, 3, 1))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_warp_half_pixel_matches_torch_lfn3(rng):
    img, flow = _data(rng)
    ref = _torch_backwarp(torch.from_numpy(img), torch.from_numpy(flow), False, True)
    ours = np.asarray(
        warp_half_pixel(img.transpose(0, 2, 3, 1), flow.transpose(0, 2, 3, 1))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_warp_with_mask_matches_torch_pwc(rng):
    img, flow = _data(rng, mag=6.0)
    t_img, t_flow = torch.from_numpy(img), torch.from_numpy(flow)
    ones = torch.ones(1, 1, img.shape[2], img.shape[3])
    out = _torch_backwarp(torch.cat([t_img, ones], 1), t_flow, True, False)
    mask = (out[:, -1:] > 0.999).astype(np.float32)
    ref = out[:, :-1] * mask
    ours = np.asarray(
        warp_with_mask(img.transpose(0, 2, 3, 1), flow.transpose(0, 2, 3, 1))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_warp_zero_flow_identity(rng):
    img, _ = _data(rng)
    nhwc = img.transpose(0, 2, 3, 1)
    flow = np.zeros(nhwc.shape[:-1] + (2,), np.float32)
    np.testing.assert_allclose(np.asarray(warp_bilinear(nhwc, flow)), nhwc, atol=1e-6)
