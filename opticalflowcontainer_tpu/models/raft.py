"""RAFT in flax (NHWC): all-pairs correlation volume + ConvGRU refinement.

Covers the reference's RAFT capability (visualize_raft.py uses torchvision
``raft_large``) and BASELINE config 4 (RAFT-small with the correlation-volume
lookup).  Architecture follows the RAFT paper / torchvision:

- ``RAFTSmall``: bottleneck feature encoder (32/32/64/96 -> 128 @ 1/8,
  InstanceNorm), context encoder (-> 96 hidden + 64 context), 4-level
  correlation pyramid with radius-3 lookup, SmallMotionEncoder + ConvGRU(96),
  bilinear 8x flow upsampling, 12 iterations.
- ``RAFT`` (large): residual encoder -> 256 @ 1/8, hidden/context 128 each,
  radius-4 lookup, SepConvGRU(128), convex-combination learned 8x upsampling,
  12 iterations.

The iteration loop is statically unrolled (weights shared across iterations);
the all-pairs volume is a single [HW, C] x [C, HW] matmul (MXU) and lookups
are statically-unrolled bilinear gathers (ops/allpairs.py).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import Conv, leaky
from ..core.resize import resize_bilinear
from ..core.backend import on_tpu
from ..ops import all_pairs_correlation, corr_pyramid, corr_lookup, pack_corr_pyramid


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False) on [H, W, C] (or [..., H, W, C]).

    Statistics are computed in fp32 regardless of the serving dtype: bf16
    spatial reductions both lose precision and lower to a measurably slower
    path on TPU (NeuFlowLite bf16 serving regressed 42% with bf16 stats)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(-3, -2), keepdims=True)
        var = x32.var(axis=(-3, -2), keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class BottleneckBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        f4 = self.features // 4
        y = nn.relu(InstanceNorm()(Conv(f4, kernel=1, padding=0, name="conv1")(x)))
        y = nn.relu(
            InstanceNorm()(Conv(f4, kernel=3, stride=self.stride, name="conv2")(y))
        )
        y = nn.relu(InstanceNorm()(Conv(self.features, kernel=1, padding=0, name="conv3")(y)))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = InstanceNorm()(
                Conv(self.features, kernel=1, padding=0, stride=self.stride, name="down")(x)
            )
        return nn.relu(x + y)


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.relu(
            InstanceNorm()(Conv(self.features, stride=self.stride, name="conv1")(x))
        )
        y = nn.relu(InstanceNorm()(Conv(self.features, name="conv2")(y)))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = InstanceNorm()(
                Conv(self.features, kernel=1, padding=0, stride=self.stride, name="down")(x)
            )
        return nn.relu(x + y)


class Encoder(nn.Module):
    """1/8-resolution encoder trunk."""

    layers: Sequence[int] = (32, 32, 64, 96)
    out_features: int = 128
    block: str = "bottleneck"
    normalize: bool = True

    @nn.compact
    def __call__(self, x):
        Block = BottleneckBlock if self.block == "bottleneck" else ResidualBlock
        y = Conv(self.layers[0], kernel=7, stride=2, name="stem")(x)
        if self.normalize:
            y = InstanceNorm()(y)
        y = nn.relu(y)
        for i, (ch, s) in enumerate(zip(self.layers[1:], (1, 2, 2))):
            y = Block(ch, stride=s, name=f"block{i}a")(y)
            y = Block(ch, stride=1, name=f"block{i}b")(y)
        return Conv(self.out_features, kernel=1, padding=0, name="proj")(y)


class ConvGRU(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(Conv(self.hidden, name="convz")(hx))
        r = nn.sigmoid(Conv(self.hidden, name="convr")(hx))
        q = jnp.tanh(
            Conv(self.hidden, name="convq")(jnp.concatenate([r * h, x], axis=-1))
        )
        return (1.0 - z) * h + z * q


class SepConvGRU(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, h, x):
        for suffix, ksize in (("h", (1, 5)), ("v", (5, 1))):
            p = (ksize[0] // 2, ksize[1] // 2)
            pad = ((p[0], p[0]), (p[1], p[1]))
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=pad, name=f"convz_{suffix}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=pad, name=f"convr_{suffix}")(hx))
            q = jnp.tanh(
                nn.Conv(self.hidden, ksize, padding=pad, name=f"convq_{suffix}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1.0 - z) * h + z * q
        return h


class SmallMotionEncoder(nn.Module):
    corr_channels: int

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(Conv(96, kernel=1, padding=0, name="convc1")(corr))
        f = nn.relu(Conv(64, kernel=7, name="convf1")(flow.astype(corr.dtype)))
        f = nn.relu(Conv(32, name="convf2")(f))
        out = nn.relu(Conv(80, name="conv")(jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)  # 82


class MotionEncoder(nn.Module):
    corr_channels: int

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(Conv(256, kernel=1, padding=0, name="convc1")(corr))
        c = nn.relu(Conv(192, name="convc2")(c))
        f = nn.relu(Conv(128, kernel=7, name="convf1")(flow.astype(corr.dtype)))
        f = nn.relu(Conv(64, name="convf2")(f))
        out = nn.relu(Conv(126, name="conv")(jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)  # 128


class FlowHead(nn.Module):
    mid: int = 128

    @nn.compact
    def __call__(self, h):
        return Conv(2, name="conv2")(nn.relu(Conv(self.mid, name="conv1")(h)))


def _upsample8_bilinear(flow):
    H, W = flow.shape[0] * 8, flow.shape[1] * 8
    return resize_bilinear(flow, (H, W), channel_last=True) * 8.0


class _RAFTBase(nn.Module):
    small: bool = True
    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 3

    def setup(self):
        if self.small:
            self.fnet = Encoder((32, 32, 64, 96), 128, "bottleneck", name="fnet")
            self.cnet = Encoder((32, 32, 64, 96), 160, "bottleneck", name="cnet")
            self.hidden, self.context = 96, 64
            corr_ch = self.corr_levels * (2 * self.corr_radius + 1) ** 2
            self.motion = SmallMotionEncoder(corr_ch, name="motion")
            self.gru = ConvGRU(self.hidden, name="gru")
            self.head = FlowHead(128, name="head")
            self.mask_head = None
        else:
            self.fnet = Encoder((64, 64, 96, 128), 256, "residual", name="fnet")
            self.cnet = Encoder((64, 64, 96, 128), 256, "residual", name="cnet")
            self.hidden, self.context = 128, 128
            corr_ch = self.corr_levels * (2 * self.corr_radius + 1) ** 2
            self.motion = MotionEncoder(corr_ch, name="motion")
            self.gru = SepConvGRU(self.hidden, name="gru")
            self.head = FlowHead(256, name="head")
            self.mask_conv1 = Conv(256, name="mask1")
            self.mask_conv2 = Conv(64 * 9, kernel=1, padding=0, name="mask2")

    def _upsample_convex(self, flow, h):
        """Learned convex-combination 8x upsampling (RAFT-large)."""
        Hc, Wc = flow.shape[0], flow.shape[1]
        mask = self.mask_conv2(nn.relu(self.mask_conv1(h))) * 0.25
        mask = mask.reshape(Hc, Wc, 8, 8, 9).astype(jnp.float32)
        mask = jax.nn.softmax(mask, axis=-1)
        from ..ops import unfold

        patches = unfold(flow * 8.0, 3)  # [Hc, Wc, 9, 2]
        up = jnp.einsum("hwabk,hwkc->hwabc", mask, patches)
        return up.transpose(0, 2, 1, 3, 4).reshape(Hc * 8, Wc * 8, 2)

    def __call__(self, img1, img2, iters: int | None = None,
                 final_only: bool = False):
        """img1/img2 [H, W, 3] in [0,1], H and W multiples of 8.  Returns the
        stack of per-iteration upsampled flows [iters, H, W, 2], or (with
        ``final_only=True``, the inference contract) just the LAST upsampled
        flow [H, W, 2] — the per-iteration 8x upsamples exist only for the
        training sequence loss, and for RAFT-large each one is a full
        convex-combination head (mask convs + einsum); skipping them is free
        accuracy-wise and keeps the iteration loop's live set small."""
        # `or` would silently turn an explicit iters=0 into the default
        iters = self.iters if iters is None else iters
        img1 = img1 * 2.0 - 1.0
        img2 = img2 * 2.0 - 1.0
        # one batched fnet pass over both frames: same weights/numerics, half
        # the op count on the dispatch-bound fixed leg (tiny-channel convs +
        # InstanceNorms dominate latency, not flops — CLAUDE.md r2s6)
        f12 = self.fnet(jnp.stack([img1, img2]))
        f1, f2 = f12[0], f12[1]
        c = self.cnet(img1)
        h = jnp.tanh(c[..., : self.hidden])
        ctx = nn.relu(c[..., self.hidden :])
        vol = all_pairs_correlation(f1, f2)
        pyr = corr_pyramid(vol, self.corr_levels)
        if on_tpu():
            # fat-row pack once per frame; every GRU iteration's lookup then
            # gathers 1 row per (pixel, level) instead of 2r+2 (allpairs.py)
            pyr = pack_corr_pyramid(pyr, self.corr_radius)
        flow = jnp.zeros(f1.shape[:2] + (2,), jnp.float32)

        if final_only and iters < 1:
            # iters=0 is meaningful for the stacked contract (empty stack of
            # refinements) but final_only has no "final" to return — the
            # zero-init flow upsampled is the only defensible answer, and
            # clearer than the flows[-1] IndexError at trace time (ADVICE r4)
            return (_upsample8_bilinear(flow) if self.small
                    else self._upsample_convex(flow, h))

        flows = []
        for it in range(iters):
            corr = corr_lookup(pyr, flow, self.corr_radius).astype(f1.dtype)
            m = self.motion(flow, corr)
            # [context, motion] — torchvision/official RAFT input order, so a
            # converted torchvision checkpoint drops in without channel
            # scrambling (the packaged synth weights were permuted to match).
            h = self.gru(h, jnp.concatenate([ctx, m], axis=-1))
            delta = self.head(h)
            # the flow field itself stays fp32 (coordinate precision)
            flow = flow + delta.astype(jnp.float32)
            if final_only and it != iters - 1:
                continue
            if self.small:
                flows.append(_upsample8_bilinear(flow))
            else:
                flows.append(self._upsample_convex(flow, h))
        if final_only:
            return flows[-1]
        return jnp.stack(flows)


class RAFTSmall(_RAFTBase):
    small: bool = True
    corr_radius: int = 3


class RAFT(_RAFTBase):
    small: bool = False
    corr_radius: int = 4


def _pad_to(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@functools.partial(jax.jit, static_argnums=(0, 4))
def _estimate(model, params, img1, img2, iters):
    H, W = img1.shape[0], img1.shape[1]
    Hp, Wp = _pad_to(H, 8), _pad_to(W, 8)
    i1 = resize_bilinear(img1, (Hp, Wp), channel_last=True)
    i2 = resize_bilinear(img2, (Hp, Wp), channel_last=True)
    flow = model.apply(params, i1, i2, iters, final_only=True)
    flow = resize_bilinear(flow, (H, W), channel_last=True)
    return flow * jnp.asarray([W / Wp, H / Hp], flow.dtype)


def estimate(model, params, img1: jax.Array, img2: jax.Array, iters: int = 12):
    """Resize-to-multiple-of-8 / forward / resize-back / rescale contract.

    The whole contract runs as ONE jitted program (params as jit arguments,
    never baked as HLO literals — CLAUDE.md: out-of-jit dispatches through
    axon cost seconds, and trace-time weight literals blow the remote-compile
    upload limit)."""
    return _estimate(model, params, img1, img2, int(iters))


def _load_weights_npz(fname: str, model):
    """Load a packaged flat-npz checkpoint (written by tools/train_flow.py).
    Returns (model, params) or None when the artifact is absent."""
    import os

    from .common import load_flat_npz

    path = os.path.join(os.path.dirname(__file__), "weights", fname)
    if not os.path.exists(path):
        return None
    return model, load_flat_npz(path)


def load_raft_small_synth():
    """Packaged RAFT-small weights, TPU-trained on synthetic affine motion
    with photometric augmentation (tools/train_flow.py; the reference's
    pretrained downloads are unreachable offline, reference
    visualize_raft.py:12 uses torchvision pretrained weights)."""
    return _load_weights_npz("raft_small_synth.npz", RAFTSmall())


def load_raft_synth():
    """Packaged RAFT (large) weights, same training recipe."""
    return _load_weights_npz("raft_large_synth.npz", RAFT())
