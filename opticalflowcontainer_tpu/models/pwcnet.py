"""PWC-Net in flax (NHWC), architecture-compatible with the reference's
sniklaus pytorch-pwc variant (reference pwc_net.py:43-231) so converted
checkpoints drop in.

Structure: 6-level feature extractor (16/32/64/96/128/196 ch), coarse-to-fine
DenseNet-style decoders at levels 6..2 (81-ch correlation volume, masked
backwarp, 4x4/s2 upflow+upfeat deconvs, per-level flow scale
[5.0, 2.5, 1.25, 0.625]), dilated context refiner (1,2,4,8,16,1,1) added to the
level-2 flow, all scaled x20.  Native output resolution is 1/4 input;
``estimate`` implements the pad-to-64 / resize-back / rescale-uv contract
(reference pwc_net.py:233-257).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import Conv, Deconv, leaky
from ..core.warp import warp_with_mask
from ..core.resize import resize_bilinear
from ..ops import local_correlation

_EXTRACTOR_CH = (16, 32, 64, 96, 128, 196)
_DENSE_CH = (128, 128, 96, 64, 32)
_FLOW_SCALE = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}


class _Level(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = leaky(Conv(self.features, stride=2, name="conv0")(x))
        x = leaky(Conv(self.features, name="conv1")(x))
        x = leaky(Conv(self.features, name="conv2")(x))
        return x


class Extractor(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        for i, ch in enumerate(_EXTRACTOR_CH):
            x = _Level(ch, name=f"level{i + 1}")(x)
            feats.append(x)
        return feats


class Decoder(nn.Module):
    level: int

    @nn.compact
    def __call__(self, feat1, feat2, prev):
        if prev is None:
            corr = leaky(local_correlation(feat1, feat2, max_disp=4))
            feat = corr
        else:
            prev_flow, prev_feat = prev
            flow_up = Deconv(2, name="upflow")(prev_flow)
            feat_up = Deconv(2, name="upfeat")(prev_feat)
            warped = warp_with_mask(feat2, flow_up * _FLOW_SCALE[self.level])
            corr = leaky(local_correlation(feat1, warped, max_disp=4))
            feat = jnp.concatenate([corr, feat1, flow_up, feat_up], axis=-1)
        for i, ch in enumerate(_DENSE_CH):
            feat = jnp.concatenate(
                [leaky(Conv(ch, name=f"dense{i}")(feat)), feat], axis=-1
            )
        flow = Conv(2, name="predict")(feat)
        return flow, feat


class Refiner(nn.Module):
    @nn.compact
    def __call__(self, x):
        for i, (ch, d) in enumerate(
            zip((128, 128, 128, 96, 64, 32), (1, 2, 4, 8, 16, 1))
        ):
            x = leaky(Conv(ch, dilation=d, name=f"conv{i}")(x))
        return Conv(2, dilation=1, name="conv6")(x)


class PWCNet(nn.Module):
    """Forward: (img1, img2) NHWC in [0, 1] -> flow at 1/4 resolution, x20
    scaled to full-res pixel units.  Unbatched [H, W, 3]; vmap for batches."""

    @nn.compact
    def __call__(self, img1, img2, return_pyramid: bool = False):
        """``return_pyramid=True`` additionally returns the per-level raw
        flows {level: flow} (in the net's /20 units at each level's own
        resolution) for multi-scale training supervision — the original
        PWC-Net training scheme; the reference ships inference only."""
        extractor = Extractor(name="extractor")
        f1 = extractor(img1)
        f2 = extractor(img2)
        prev = None
        pyramid = {}
        for lvl, idx in ((6, 5), (5, 4), (4, 3), (3, 2), (2, 1)):
            flow, feat = Decoder(lvl, name=f"decoder{lvl}")(f1[idx], f2[idx], prev)
            prev = (flow, feat)
            pyramid[lvl] = flow
        flow, feat = prev
        flow = flow + Refiner(name="refiner")(feat)
        pyramid[2] = flow
        # flow leaves the net in fp32 regardless of serving dtype
        out = flow.astype(jnp.float32) * 20.0
        if return_pyramid:
            return out, pyramid
        return out


def _pad_to(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@functools.partial(jax.jit, static_argnums=(0,))
def _run(model, params, img1, img2):
    return model.apply(params, img1, img2)


def estimate(model: PWCNet, params, img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Reference estimate() contract (pwc_net.py:233-257): resize to a
    multiple of 64, forward, bilinear-resize the quarter-res flow to the input
    size, rescale u and v by the resize ratios."""
    H, W = img1.shape[0], img1.shape[1]
    Hp, Wp = _pad_to(H, 64), _pad_to(W, 64)
    i1 = resize_bilinear(img1, (Hp, Wp), channel_last=True)
    i2 = resize_bilinear(img2, (Hp, Wp), channel_last=True)
    flow = _run(model, params, i1, i2)
    flow = resize_bilinear(flow, (H, W), channel_last=True)
    return flow * jnp.asarray([W / Wp, H / Hp], flow.dtype)


def load_pwcnet_synth():
    """Packaged PWC weights: the round-5 LFN3-trunk bootstrap (best
    in-sandbox result; honest framing below — the parity-proven converter
    remains PWC's quality path).

    From-scratch, unlike RAFT/NeuFlowLite/LFN/LFN3, PWC never reached a
    useful accuracy within this sandbox's training horizon: flat loss over
    8k steps after fixing the norm-free extractor's init-scale collapse
    (train_flow._kaiming_rescale), easy EPE stuck at ~2.6 px after 24k
    curriculum steps, and an 8k-step RAFT-large-teacher distillation run
    (tools/train_flow.py --distill raft_large, round 3) landed at the SAME
    2.63 px — the pure direct-regression pyramid is the bottleneck, not the
    labels (the original trains ~1.2M iterations).  The round-5 two-stage
    bootstrap broke the plateau: tools/pwc_distill_extractor.py distills
    the trained LFN3 trunk into PWC's extractor through per-level 1x1
    adapters (feature MSE 0.21), then train_flow --init-extractor
    --freeze-extractor runs 8k decoder-only steps.  Result: synthetic easy
    EPE 2.63 -> 1.52, fishnet 640x480 easy 2.99 / hard 16.1 — runnable,
    but still far from a real converted checkpoint, so the parity-proven
    convert.convert_pwcnet (reference pwc_net.py:219) stays the quality
    path for real deployments."""
    from .raft import _load_weights_npz

    return _load_weights_npz("pwcnet_synth.npz", PWCNet())
