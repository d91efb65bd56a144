"""LiteFlowNet3 in flax (NHWC), architecture-compatible with the reference
(reference liteflownet3/liteflownet3.py) for checkpoint conversion.

Differences vs LiteFlowNet v1 that define LFN3 (SURVEY.md §2.2):

- levels [3, 4, 5, 6] only; output is the level-3 (quarter-res) flow x20
- **confidence maps**: Regularization at levels 5 and 4 emits a sigmoid
  confidence; Matching at levels 4 and 3 upsamples it (netUpconf), combines it
  with a dilated *self*-correlation (d=6/8, stride2=2) into conf/disp nets,
  applies **flow-field deformation** (the upsampled flow is itself backwarped
  by the predicted displacement map), and modulates the cross-correlation with
  learned per-channel scalar/offset before the flow head
- half-pixel warp convention (align_corners=False; reference
  liteflownet3.py:12-30)
- per-image (not fixed) mean subtraction (reference liteflownet3.py:260-261)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import Conv, Deconv, leaky
from .liteflownet import Features  # identical trunk (32/32/64/96/128/192)
from ..core.warp import warp_half_pixel
from ..core.resize import resize_bilinear
from ..ops import local_correlation, unfold

_FLOW_SCALE = {3: 5.0, 4: 2.5, 5: 1.25, 6: 0.625}
_HEAD_K = {3: 5, 4: 5, 5: 3, 6: 3}
_DIST_CH = {3: 25, 4: 25, 5: 9, 6: 9}
_AUTO_DISP = {3: 8, 4: 6}  # self-correlation max displacement (stride2 = 2)


class Matching(nn.Module):
    level: int

    @nn.compact
    def __call__(self, feat1, feat2, flow, conf):
        lvl = self.level
        disp = None
        if lvl <= 4:
            conf = Deconv(1, use_bias=False, name="upconf")(conf)
            auto = leaky(
                local_correlation(feat1, feat1, max_disp=_AUTO_DISP[lvl], disp_stride=2)
            )
            x = jnp.concatenate([auto, conf], axis=-1)
            x = leaky(Conv(128, name="conf0")(x))
            x = leaky(Conv(64, name="conf1")(x))
            cf = leaky(Conv(32, name="conf2")(x))
            conf = nn.sigmoid(Conv(1, kernel=5, name="conf_head")(cf))
            disp = Conv(2, kernel=5, name="disp_head")(cf)
        if flow is not None:
            flow = Deconv(2, use_bias=False, groups=2, name="upflow")(flow)
        if lvl <= 4:
            # flow-field deformation: warp the flow field by the disp map
            flow = warp_half_pixel(flow, disp)
        if flow is not None:
            feat2 = warp_half_pixel(feat2, flow * _FLOW_SCALE[lvl])
        corr = leaky(local_correlation(feat1, feat2, max_disp=4))
        if lvl <= 4:
            cfeat = jnp.concatenate([feat1, corr, conf], axis=-1)
            cfeat = leaky(Conv(128, name="corr0")(cfeat))
            cfeat = leaky(Conv(64, name="corr1")(cfeat))
            scalar = Conv(81, kernel=1, padding=0, name="corr_scalar1")(
                leaky(Conv(32, name="corr_scalar0")(cfeat))
            )
            offset = Conv(81, kernel=1, padding=0, name="corr_offset1")(
                leaky(Conv(32, name="corr_offset0")(cfeat))
            )
            corr = scalar * corr + offset
        x = corr
        for i, ch in enumerate((128, 128, 96, 64, 32)):
            x = leaky(Conv(ch, name=f"main{i}")(x))
        res = Conv(2, kernel=_HEAD_K[lvl], name="head")(x)
        return (res if flow is None else flow + res), conf


class Subpixel(nn.Module):
    level: int

    @nn.compact
    def __call__(self, feat1, feat2, flow):
        lvl = self.level
        warped = warp_half_pixel(feat2, flow * _FLOW_SCALE[lvl])
        x = jnp.concatenate([feat1, warped, flow], axis=-1)
        for i, ch in enumerate((128, 128, 96, 64, 32)):
            x = leaky(Conv(ch, name=f"main{i}")(x))
        return flow + Conv(2, kernel=_HEAD_K[lvl], name="head")(x)


class Regularization(nn.Module):
    level: int

    @nn.compact
    def __call__(self, img1, img2, feat1, flow):
        lvl = self.level
        k = _HEAD_K[lvl]
        diff = jnp.sqrt(
            jnp.sum(
                (img1 - warp_half_pixel(img2, flow * _FLOW_SCALE[lvl])) ** 2,
                axis=-1,
                keepdims=True,
            )
        )
        diff = jax.lax.stop_gradient(diff)
        if lvl <= 4:
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
            p = k // 2
            dist = nn.Conv(dch, (k, 1), padding=((p, p), (0, 0)), name="dist_v")(x)
            dist = nn.Conv(dch, (1, k), padding=((0, 0), (p, p)), name="dist_h")(dist)
        conf = None
        if lvl in (4, 5):
            ck = 5 if lvl == 4 else 3
            conf = nn.sigmoid(Conv(1, kernel=ck, name="conf_head")(x))
        dist = -(dist**2)
        dist = jnp.exp(dist - dist.max(axis=-1, keepdims=True))
        divisor = 1.0 / dist.sum(axis=-1, keepdims=True)
        un = unfold(flow, k)
        sx = Conv(1, kernel=1, padding=0, name="scale_x")(dist * un[..., 0]) * divisor
        sy = Conv(1, kernel=1, padding=0, name="scale_y")(dist * un[..., 1]) * divisor
        return jnp.concatenate([sx, sy], axis=-1), conf


class LiteFlowNet3(nn.Module):
    """(img1, img2) NHWC BGR in [0,1], unbatched [H, W, 3], H and W multiples
    of 32 -> flow [H/4, W/4, 2] x20 (level-3 native resolution)."""

    @nn.compact
    def __call__(self, img1, img2, return_pyramid: bool = False):
        """``return_pyramid=True`` additionally returns the per-level raw
        flows {level: [H/2^l, W/2^l, 2]} in the net's /20 units (training
        supervision — the reference is inference-only and has no analogue)."""
        img1 = img1 - img1.mean(axis=(0, 1), keepdims=True)
        img2 = img2 - img2.mean(axis=(0, 1), keepdims=True)
        features = Features(name="features")
        feats1 = features(img1)
        feats2 = features(img2)
        im1 = [img1]
        im2 = [img2]
        for lvl in range(1, 6):
            size = feats1[lvl].shape[0], feats1[lvl].shape[1]
            im1.append(resize_bilinear(im1[-1], size, channel_last=True))
            im2.append(resize_bilinear(im2[-1], size, channel_last=True))
        flow = None
        conf = None
        pyramid = {}
        for lvl in (6, 5, 4, 3):
            i = lvl - 1
            flow, conf = Matching(lvl, name=f"matching{lvl}")(
                feats1[i], feats2[i], flow, conf
            )
            flow = Subpixel(lvl, name=f"subpixel{lvl}")(feats1[i], feats2[i], flow)
            flow, rconf = Regularization(lvl, name=f"regularization{lvl}")(
                im1[i], im2[i], feats1[i], flow
            )
            if rconf is not None:
                conf = rconf
            pyramid[lvl] = flow
        # flow leaves the net in fp32 regardless of serving dtype
        out = flow.astype(jnp.float32) * 20.0
        if return_pyramid:
            return out, pyramid
        return out


def _pad_to(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def load_liteflownet3_synth():
    """Packaged LFN3 weights if present (tools/train_flow.py --model
    liteflownet3 — TPU-trained on synthetic affine motion), else None.  The
    reference's real-weights path (its packaged network-sintel.pytorch,
    reference lfn3_node.py:54-56) is the parity-proven converter
    ``convert.convert_liteflownet3``; this synthetic checkpoint exists so the
    LFN3 family has a runnable learned path in the offline sandbox too."""
    from .raft import _load_weights_npz

    return _load_weights_npz("liteflownet3_synth.npz", LiteFlowNet3())


@functools.partial(jax.jit, static_argnums=(0,))
def _estimate(model, params, img1, img2):
    H, W = img1.shape[0], img1.shape[1]
    Hp, Wp = _pad_to(H, 32), _pad_to(W, 32)
    i1 = resize_bilinear(img1, (Hp, Wp), channel_last=True)
    i2 = resize_bilinear(img2, (Hp, Wp), channel_last=True)
    flow = model.apply(params, i1, i2)
    flow = resize_bilinear(flow, (H, W), channel_last=True)
    return flow * jnp.asarray([W / Wp, H / Hp], flow.dtype)


def estimate(model: "LiteFlowNet3", params, img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Reference lfn3 node contract (reference lfn3_sub_node.py:181-199):
    resize inputs to multiples of 32, forward, resize the quarter-res flow to
    the input size, rescale u and v.  One jitted program, params as jit
    arguments (not HLO literals)."""
    return _estimate(model, params, img1, img2)
