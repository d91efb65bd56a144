"""LiteFlowNet (v1) in flax (NHWC), architecture-compatible with the
reference's sniklaus pytorch-liteflownet variant (reference
optical_flow/liteflownet.py) for checkpoint conversion.

Per level (6 -> 2): Matching (49-ch correlation — stride-2 correlation +
grouped 49-ch deconv upsample at the fine levels 2-3), Subpixel (warped
-feature residual), Regularization (feature-driven distance weights over an
unfolded flow neighborhood — the new flow is the weighted local average).
Warp convention: align_corners=True pixel warp (reference liteflownet.py:9-27).
Output: level-2 (half-res) flow x20.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import Conv, Deconv, leaky
from ..core.warp import warp_align_corners
from ..core.resize import resize_bilinear
from ..ops import local_correlation, unfold

# per-level constants, indexed by pyramid level (2..6)
_FLOW_SCALE = {2: 10.0, 3: 5.0, 4: 2.5, 5: 1.25, 6: 0.625}
_HEAD_K = {2: 7, 3: 5, 4: 5, 5: 3, 6: 3}
_DIST_CH = {2: 49, 3: 25, 4: 25, 5: 9, 6: 9}
# mean-BGR subtraction constants (reference liteflownet.py:213-218)
_MEAN_ONE = (0.411618, 0.434631, 0.454253)
_MEAN_TWO = (0.410782, 0.433645, 0.452793)


class Features(nn.Module):
    """6-level trunk: 32(7x7) / 32 / 64 / 96 / 128 / 192, stride 2 from L2."""

    @nn.compact
    def __call__(self, x):
        l1 = leaky(Conv(32, kernel=7, name="conv1")(x))
        y = leaky(Conv(32, stride=2, name="conv2a")(l1))
        y = leaky(Conv(32, name="conv2b")(y))
        l2 = leaky(Conv(32, name="conv2c")(y))
        y = leaky(Conv(64, stride=2, name="conv3a")(l2))
        l3 = leaky(Conv(64, name="conv3b")(y))
        y = leaky(Conv(96, stride=2, name="conv4a")(l3))
        l4 = leaky(Conv(96, name="conv4b")(y))
        l5 = leaky(Conv(128, stride=2, name="conv5")(l4))
        l6 = leaky(Conv(192, stride=2, name="conv6")(l5))
        return [l1, l2, l3, l4, l5, l6]


class Matching(nn.Module):
    level: int

    @nn.compact
    def __call__(self, feat1, feat2, flow):
        lvl = self.level
        if lvl == 2:
            featconv = Conv(64, kernel=1, padding=0, name="feat")
            feat1 = leaky(featconv(feat1))
            feat2 = leaky(featconv(feat2))
        if flow is not None:
            flow = Deconv(2, use_bias=False, groups=2, name="upflow")(flow)
            feat2 = warp_align_corners(feat2, flow * _FLOW_SCALE[lvl])
        if lvl >= 4:
            corr = leaky(local_correlation(feat1, feat2, max_disp=3))
        else:
            # fine levels: strided correlation + learned 49-group upsample
            corr = leaky(local_correlation(feat1, feat2, max_disp=6, disp_stride=2, out_stride=2))
            corr = Deconv(49, use_bias=False, groups=49, name="upcorr")(corr)
            corr = corr[: feat1.shape[0], : feat1.shape[1]]
        x = leaky(Conv(128, name="main0")(corr))
        x = leaky(Conv(64, name="main1")(x))
        x = leaky(Conv(32, name="main2")(x))
        res = Conv(2, kernel=_HEAD_K[lvl], name="head")(x)
        return res if flow is None else flow + res


class Subpixel(nn.Module):
    level: int

    @nn.compact
    def __call__(self, feat1, feat2, flow):
        lvl = self.level
        if lvl == 2:
            featconv = Conv(64, kernel=1, padding=0, name="feat")
            feat1 = leaky(featconv(feat1))
            feat2 = leaky(featconv(feat2))
        warped = warp_align_corners(feat2, flow * _FLOW_SCALE[lvl])
        x = jnp.concatenate([feat1, warped, flow], axis=-1)
        x = leaky(Conv(128, name="main0")(x))
        x = leaky(Conv(64, name="main1")(x))
        x = leaky(Conv(32, name="main2")(x))
        return flow + Conv(2, kernel=_HEAD_K[lvl], name="head")(x)


class Regularization(nn.Module):
    level: int

    @nn.compact
    def __call__(self, img1, img2, feat1, flow):
        lvl = self.level
        k = _HEAD_K[lvl]
        diff = jnp.sqrt(
            jnp.sum((img1 - warp_align_corners(img2, flow * _FLOW_SCALE[lvl])) ** 2,
                    axis=-1, keepdims=True)
        )
        diff = jax.lax.stop_gradient(diff)
        if lvl < 5:
            feat1 = leaky(Conv(128, kernel=1, padding=0, name="feat")(feat1))
        x = jnp.concatenate(
            [diff, flow - flow.mean(axis=(0, 1), keepdims=True), feat1], axis=-1
        )
        for i, ch in enumerate((128, 128, 64, 64, 32, 32)):
            x = leaky(Conv(ch, name=f"main{i}")(x))
        dch = _DIST_CH[lvl]
        if lvl >= 5:
            dist = Conv(dch, kernel=k, name="dist")(x)
        else:
            # separable k x 1 then 1 x k
            p = k // 2
            dist = nn.Conv(dch, (k, 1), padding=((p, p), (0, 0)), name="dist_v")(x)
            dist = nn.Conv(dch, (1, k), padding=((0, 0), (p, p)), name="dist_h")(dist)
        dist = -(dist**2)
        dist = jnp.exp(dist - dist.max(axis=-1, keepdims=True))
        divisor = 1.0 / dist.sum(axis=-1, keepdims=True)
        un = unfold(flow, k)  # [H, W, k*k, 2]
        sx = Conv(1, kernel=1, padding=0, name="scale_x")(dist * un[..., 0]) * divisor
        sy = Conv(1, kernel=1, padding=0, name="scale_y")(dist * un[..., 1]) * divisor
        return jnp.concatenate([sx, sy], axis=-1)


class LiteFlowNet(nn.Module):
    """(img1, img2) NHWC BGR in [0,1], unbatched [H, W, 3] with H, W multiples
    of 32 -> flow [H/2, W/2, 2] x20 (level-2 native resolution)."""

    @nn.compact
    def __call__(self, img1, img2, return_pyramid: bool = False):
        """``return_pyramid=True`` additionally returns the per-level raw
        flows {level: [H/2^l, W/2^l, 2]} in the net's /20 units (training
        supervision — the reference is inference-only and has no analogue)."""
        img1 = img1 - jnp.asarray(_MEAN_ONE, img1.dtype)
        img2 = img2 - jnp.asarray(_MEAN_TWO, img2.dtype)
        features = Features(name="features")
        feats1 = features(img1)
        feats2 = features(img2)
        # image pyramids at feature resolutions (levels 2..6)
        im1 = [img1]
        im2 = [img2]
        for lvl in range(1, 6):
            size = feats1[lvl].shape[0], feats1[lvl].shape[1]
            im1.append(resize_bilinear(im1[-1], size, channel_last=True))
            im2.append(resize_bilinear(im2[-1], size, channel_last=True))
        flow = None
        pyramid = {}
        for lvl in (6, 5, 4, 3, 2):
            i = lvl - 1
            flow = Matching(lvl, name=f"matching{lvl}")(feats1[i], feats2[i], flow)
            flow = Subpixel(lvl, name=f"subpixel{lvl}")(feats1[i], feats2[i], flow)
            flow = Regularization(lvl, name=f"regularization{lvl}")(
                im1[i], im2[i], feats1[i], flow
            )
            pyramid[lvl] = flow
        # flow leaves the net in fp32 regardless of serving dtype
        out = flow.astype(jnp.float32) * 20.0
        if return_pyramid:
            return out, pyramid
        return out


def _pad_to(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def load_liteflownet_synth():
    """Packaged LFN weights if present (tools/train_flow.py --model
    liteflownet — TPU-trained on synthetic affine motion), else None.  The
    reference's real-weights path (the sniklaus URL checkpoint, reference
    opticalflow_node.py:28-32) is the parity-proven converter
    ``convert.convert_liteflownet``; this synthetic checkpoint exists so the
    LFN family has a runnable learned path in the offline sandbox too."""
    from .raft import _load_weights_npz

    return _load_weights_npz("liteflownet_synth.npz", LiteFlowNet())


@functools.partial(jax.jit, static_argnums=(0,))
def _estimate(model, params, img1, img2):
    H, W = img1.shape[0], img1.shape[1]
    Hp, Wp = _pad_to(H, 32), _pad_to(W, 32)
    i1 = resize_bilinear(img1, (Hp, Wp), channel_last=True)
    i2 = resize_bilinear(img2, (Hp, Wp), channel_last=True)
    flow = model.apply(params, i1, i2)
    flow = resize_bilinear(flow, (H, W), channel_last=True)
    return flow * jnp.asarray([W / Wp, H / Hp], flow.dtype)


def estimate(model: "LiteFlowNet", params, img1: jax.Array, img2: jax.Array) -> jax.Array:
    """The reference node's pre/post contract (reference
    opticalflow_node.py:71-95 / lfn3_sub_node.py:181-199): resize the inputs
    to multiples of 32, run the net, bilinear-resize the flow to the input
    size and rescale u, v by the width/height ratios.  One jitted program,
    params as jit arguments (not HLO literals)."""
    return _estimate(model, params, img1, img2)
