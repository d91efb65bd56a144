"""NeuFlow-v2: the paper architecture (flax, NHWC), converter-ready.

The reference's NeuFlow node loads the authors' pretrained module from
HuggingFace at runtime (`/root/reference/ros2_ws/src/nueflow/nueflow/
neuflow_node.py:38` ``from_pretrained``) and its architecture source is
gitignored in the reference tree; this sandbox has no egress, so weights and
the exact module code are unreachable (README "NeuFlow honesty note").
:class:`NeuFlowLite` (models/neuflow.py) remains the SERVING default — it is
trained and benchmarked in-repo.

This module implements the NeuFlow-v2 architecture as published (Zhang et
al., "NeuFlow v2: High-Efficiency Optical Flow Estimation on Edge Devices",
2024) so a converted checkpoint can drop in when weights become reachable:

- simple multi-scale CNN backbone feeding 1/8 and 1/16 features,
- one cross-attention layer + global correlation softmax matching at 1/16
  (GMFlow-style: the matched target coordinates' expectation gives an
  initial flow that handles large displacement without iteration),
- self-attention flow propagation at 1/16,
- iterative lightweight recurrent refinement (local correlation, radius 4)
  at 1/16 then 1/8,
- learned convex-combination 8x upsampling (RAFT-style mask).

Where the paper under-specifies a dimension the config below makes the
choice explicit (``NeuFlowV2Config``); the converter maps by (module-group,
ordered shape signature) rather than by exact parameter name, so checkpoint
key-name drift surfaces as a clear error listing both sides instead of a
silent mismatch.

TPU notes: attention at 1/16 is a dense [N, N] matmul (N = HW/256 tokens —
1296 at the reference's fixed 432x768 serving size, neuflow_node.py:50),
squarely MXU-shaped; all correlation/matching stages are batched matmuls;
refinement convs keep >= 64 channels so lanes stay full.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import Conv
from .raft import InstanceNorm
from ..core.resize import resize_bilinear
from ..ops import all_pairs_correlation, local_correlation, unfold


@dataclasses.dataclass(frozen=True)
class NeuFlowV2Config:
    dim_s16: int = 128      # feature width at 1/16 (matching stage)
    dim_s8: int = 128       # feature width at 1/8 (refinement stage)
    hidden: int = 128       # recurrent hidden state width
    corr_radius: int = 4    # local correlation radius in refinement
    iters_s16: int = 1      # refinement iterations at 1/16
    iters_s8: int = 8       # refinement iterations at 1/8
    heads: int = 1          # cross-attention heads


class _ConvBlock(nn.Module):
    """conv(s2)-norm-relu + conv-norm-relu: one backbone downsampling stage."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(InstanceNorm()(Conv(self.features, stride=2, name="down")(x)))
        return nn.relu(InstanceNorm()(Conv(self.features, name="conv")(x)))


class BackboneV2(nn.Module):
    """Simple multi-scale backbone: each pyramid scale of the IMAGE gets its
    own conv stage whose output joins the trunk at matching resolution
    (NeuFlow's "directly fetch each scale" design — cheap, shallow, and every
    stage sees raw image detail).  Emits (feat_s8, feat_s16)."""

    dim_s8: int = 128
    dim_s16: int = 128

    @nn.compact
    def __call__(self, img):
        # image pyramid (area/bilinear downsample)
        H, W = img.shape[-3], img.shape[-2]
        i2 = resize_bilinear(img, (H // 2, W // 2), channel_last=True)
        i4 = resize_bilinear(img, (H // 4, W // 4), channel_last=True)
        i8 = resize_bilinear(img, (H // 8, W // 8), channel_last=True)
        f2 = _ConvBlock(32, name="block1")(img)                 # 1/2
        f4 = _ConvBlock(48, name="block2")(
            jnp.concatenate([f2, i2], axis=-1))                 # 1/4
        f8 = _ConvBlock(64, name="block4")(
            jnp.concatenate([f4, i4], axis=-1))                 # 1/8
        s8 = nn.relu(InstanceNorm()(Conv(self.dim_s8, name="conv8")(
            jnp.concatenate([f8, i8], axis=-1))))
        f16 = _ConvBlock(self.dim_s16, name="block8")(s8)       # 1/16
        s16 = Conv(self.dim_s16, kernel=1, padding=0, name="conv16")(f16)
        return s8, s16


def _pos_embed_2d(H: int, W: int, dim: int) -> np.ndarray:
    """Fixed sinusoidal 2-D positional embedding [H, W, dim] (GMFlow's)."""
    d4 = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(d4, dtype=np.float64) / max(d4, 1)))
    ys = np.arange(H, dtype=np.float64)[:, None] * omega[None]
    xs = np.arange(W, dtype=np.float64)[:, None] * omega[None]
    ey = np.concatenate([np.sin(ys), np.cos(ys)], -1)  # [H, dim/2]
    ex = np.concatenate([np.sin(xs), np.cos(xs)], -1)  # [W, dim/2]
    out = np.zeros((H, W, d4 * 4), np.float32)
    out[..., : d4 * 2] = ex[None, :, :]
    out[..., d4 * 2 :] = ey[:, None, :]
    if out.shape[-1] < dim:  # dim not divisible by 4: zero-pad the tail
        out = np.pad(out, ((0, 0), (0, 0), (0, dim - out.shape[-1])))
    return out


class CrossAttention(nn.Module):
    """One global cross-attention layer at 1/16 (tokens = all positions).
    Query from one image's features, key/value from the other's; symmetric
    use below updates both feature maps with shared weights."""

    dim: int
    heads: int = 1

    @nn.compact
    def __call__(self, q_feat, kv_feat):
        H, W, C = q_feat.shape
        N = H * W
        pe = jnp.asarray(_pos_embed_2d(H, W, C))
        qin = (q_feat + pe).reshape(N, C)
        kin = (kv_feat + pe).reshape(N, C)
        vin = kv_feat.reshape(N, C)
        hd = C // self.heads
        q = nn.Dense(C, name="q")(qin).reshape(N, self.heads, hd)
        k = nn.Dense(C, name="k")(kin).reshape(N, self.heads, hd)
        v = nn.Dense(C, name="v")(vin).reshape(N, self.heads, hd)
        att = jnp.einsum("nhc,mhc->hnm", q, k) / jnp.sqrt(jnp.float32(hd))
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("hnm,mhc->nhc", att, v).reshape(N, C)
        out = nn.Dense(C, name="proj")(out)
        # norm + MLP (pre-LN transformer block, single layer)
        y = nn.LayerNorm(name="norm1")(qin + out)
        z = nn.Dense(C * 2, name="mlp1")(y)
        z = nn.gelu(z)
        z = nn.Dense(C, name="mlp2")(z)
        y = nn.LayerNorm(name="norm2")(y + z)
        return y.reshape(H, W, C)


def _coords_grid(H: int, W: int) -> jnp.ndarray:
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    return jnp.stack([xs, ys], axis=-1)  # [H, W, 2] (x, y)


def global_matching_flow(f1, f2):
    """GMFlow global correlation softmax matching: flow = E_prob[target] -
    source coordinates.  f1/f2 [H, W, C] -> flow [H, W, 2]."""
    H, W, C = f1.shape
    corr = all_pairs_correlation(f1, f2).reshape(H * W, H * W)
    prob = jax.nn.softmax(corr.astype(jnp.float32), axis=-1)
    grid = _coords_grid(H, W).reshape(H * W, 2)
    tgt = prob @ grid
    return (tgt - grid).reshape(H, W, 2)


class FlowAttention(nn.Module):
    """Self-attention flow propagation (GMFlow): push matched flow into
    low-texture regions using feature self-similarity as the kernel."""

    @nn.compact
    def __call__(self, feat, flow):
        H, W, C = feat.shape
        N = H * W
        q = nn.Dense(C, name="q")(feat.reshape(N, C))
        k = nn.Dense(C, name="k")(feat.reshape(N, C))
        att = jax.nn.softmax(
            (q @ k.T) / jnp.sqrt(jnp.float32(C)), axis=-1)
        return (att @ flow.reshape(N, 2).astype(att.dtype)).reshape(H, W, 2)


class RefineBlock(nn.Module):
    """Lightweight recurrent refinement: local correlation (radius r) at the
    current flow + context -> ConvGRU -> delta flow (NeuFlow-v2's "simple
    RNN" replacement for heavy transformer refinement)."""

    hidden: int
    radius: int = 4

    @nn.compact
    def __call__(self, h, f1, f2, flow):
        from ..core.warp import warp_bilinear

        f2w = warp_bilinear(f2, flow)
        corr = local_correlation(f1, f2w, self.radius)
        x = jnp.concatenate(
            [corr.astype(f1.dtype), f1,
             flow.astype(f1.dtype)], axis=-1)
        x = nn.relu(Conv(self.hidden, name="enc1")(x))
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(Conv(self.hidden, name="convz")(hx))
        r = nn.sigmoid(Conv(self.hidden, name="convr")(hx))
        q = jnp.tanh(Conv(self.hidden, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        h = (1.0 - z) * h + z * q
        delta = Conv(2, name="flow_head")(nn.relu(Conv(96, name="head1")(h)))
        return h, flow + delta.astype(jnp.float32)


class ConvexUpsample(nn.Module):
    """RAFT-style learned convex-combination 8x upsampling."""

    @nn.compact
    def __call__(self, flow, h):
        Hc, Wc = flow.shape[0], flow.shape[1]
        m = nn.relu(Conv(128, name="mask1")(h))
        mask = Conv(64 * 9, kernel=1, padding=0, name="mask2")(m) * 0.25
        mask = jax.nn.softmax(
            mask.reshape(Hc, Wc, 8, 8, 9).astype(jnp.float32), axis=-1)
        patches = unfold(flow * 8.0, 3)  # [Hc, Wc, 9, 2]
        up = jnp.einsum("hwabk,hwkc->hwabc", mask, patches)
        return up.transpose(0, 2, 1, 3, 4).reshape(Hc * 8, Wc * 8, 2)


class NeuFlowV2(nn.Module):
    """img1/img2 [H, W, 3] in [0,1], H/W multiples of 16 -> flow [H, W, 2]."""

    config: NeuFlowV2Config = NeuFlowV2Config()

    @nn.compact
    def __call__(self, img1, img2, iters_s8: int | None = None,
                 return_aux: bool = False):
        cfg = self.config
        backbone = BackboneV2(cfg.dim_s8, cfg.dim_s16, name="backbone")
        f1_8, f1_16 = backbone(img1 * 2.0 - 1.0)
        f2_8, f2_16 = backbone(img2 * 2.0 - 1.0)

        # cross-attention feature update at 1/16 (shared weights, symmetric)
        xattn = CrossAttention(cfg.dim_s16, cfg.heads, name="cross_attn")
        g1 = xattn(f1_16, f2_16)
        g2 = xattn(f2_16, f1_16)

        # global matching + flow self-attention propagation
        flow16 = global_matching_flow(g1, g2)
        flow16 = FlowAttention(name="flow_attn")(g1, flow16)

        # recurrent refinement at 1/16
        h16 = jnp.tanh(Conv(cfg.hidden, name="init_h16")(g1))
        refine16 = RefineBlock(cfg.hidden, cfg.corr_radius, name="refine16")
        for _ in range(cfg.iters_s16):
            h16, flow16 = refine16(h16, g1, g2, flow16)

        # upsample to 1/8 and refine
        H8, W8 = f1_8.shape[0], f1_8.shape[1]
        flow8 = resize_bilinear(flow16, (H8, W8), channel_last=True) * 2.0
        h8 = jnp.tanh(Conv(cfg.hidden, name="init_h8")(f1_8))
        refine8 = RefineBlock(cfg.hidden, cfg.corr_radius, name="refine8")
        n8 = cfg.iters_s8 if iters_s8 is None else iters_s8
        for _ in range(n8):
            h8, flow8 = refine8(h8, f1_8, f2_8, flow8)

        up = ConvexUpsample(name="up")(flow8, h8)
        if return_aux:
            # auxiliary supervision target: the refined 1/16 matching flow
            # upsampled to full resolution (full-res pixel units) — trains
            # the cross-attention + global-matching stage directly instead
            # of letting it hide behind the s8 refiner (same recipe that
            # unblocked NeuFlowLite training, CLAUDE.md r2 s2)
            H, W = img1.shape[0], img1.shape[1]
            aux = resize_bilinear(flow16, (H, W), channel_last=True) * 16.0
            return up, aux
        return up


def _pad_to(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@functools.partial(jax.jit, static_argnums=(0, 4))
def _estimate(model, params, img1, img2, iters_s8):
    H, W = img1.shape[0], img1.shape[1]
    Hp, Wp = _pad_to(H, 16), _pad_to(W, 16)
    i1 = resize_bilinear(img1, (Hp, Wp), channel_last=True)
    i2 = resize_bilinear(img2, (Hp, Wp), channel_last=True)
    flow = model.apply(params, i1, i2, iters_s8)
    flow = resize_bilinear(flow, (H, W), channel_last=True)
    return flow * jnp.asarray([W / Wp, H / Hp], flow.dtype)


def estimate(model, params, img1, img2, iters_s8: int = 8):
    """Resize-to-16-multiple / forward / resize-back contract (one jitted
    program, params as jit args — never HLO literals)."""
    return _estimate(model, params, img1, img2, int(iters_s8))


def load_neuflow_v2_synth():
    """Load the packaged NeuFlow-v2 checkpoint (TPU-trained on the synthetic
    affine recipe, tools/train_flow.py --model neuflow_v2 — the in-sandbox
    weights story; the reference downloads the authors' HF checkpoint at
    runtime, neuflow_node.py:38, which this sandbox cannot).  Returns
    (model, params) or None when absent."""
    from .raft import _load_weights_npz

    return _load_weights_npz("neuflow_v2_synth.npz", NeuFlowV2())


# ------------------------------------------------------------- converter

def convert_neuflow_v2(state_dict: dict, model: NeuFlowV2 | None = None):
    """Best-effort torch-checkpoint converter, ready for weight arrival.

    The official NeuFlow-v2 checkpoint is unreachable here (no egress; the
    reference loads it from HuggingFace at runtime, neuflow_node.py:38), so
    exact key names cannot be verified.  This maps by (module-group, ordered
    shape signature): torch tensors are grouped by top-level module prefix,
    HWIO/OIHW transposed as needed, and matched against this model's
    parameter leaves IN ORDER within each group.  Any count or shape
    mismatch raises with BOTH sides listed — when real weights arrive, the
    `_GROUP_MAP` table below is the single place to fix.
    """
    import torch  # CPU build, parity oracle only

    model = model or NeuFlowV2()
    rng = np.random.default_rng(0)
    H = W = 64
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32), 1)

    _GROUP_MAP = {  # torch top-level prefix -> flax top-level module
        "backbone": "backbone",
        "cross_attn": "cross_attn", "transformer": "cross_attn",
        "flow_attn": "flow_attn",
        "refine_s16": "refine16", "refine16": "refine16",
        "refine_s8": "refine8", "refine8": "refine8",
        "conv_s16": "init_h16", "init_h16": "init_h16",
        "conv_s8": "init_h8", "init_h8": "init_h8",
        "upsample": "up", "up": "up",
    }

    def t2j(t: "torch.Tensor") -> np.ndarray:
        a = t.detach().cpu().numpy()
        if a.ndim == 4:   # OIHW -> HWIO
            return np.transpose(a, (2, 3, 1, 0))
        if a.ndim == 2:   # torch Linear [out, in] -> flax Dense [in, out]
            return a.T
        return a

    groups: dict[str, list[tuple[str, np.ndarray]]] = {}
    for k, v in state_dict.items():
        top = k.split(".")[0]
        dst = _GROUP_MAP.get(top)
        if dst is None:
            raise KeyError(
                f"unmapped checkpoint module '{top}' (key {k}); extend "
                f"_GROUP_MAP — known: {sorted(_GROUP_MAP)}")
        groups.setdefault(dst, []).append((k, t2j(v)))

    # tokens that carry no identity (every Conv has a 'kernel'/'weight');
    # matching keys on them would make unrelated leaves look alike
    _GENERIC = {"weight", "bias", "kernel", "scale", "params",
                "running_mean", "running_var", "w", "b"}

    def _tokens(s: str) -> set:
        return {t for t in s.replace("'", ".").replace("[", ".")
                .replace("]", ".").split(".") if t} - _GENERIC

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for dst, items in groups.items():
        leaves = [(jax.tree_util.keystr(p), a) for p, a in flat
                  if f"'{dst}'" in jax.tree_util.keystr(p)]
        shapes_t = [a.shape for _, a in items]
        shapes_j = [a.shape for _, a in leaves]
        if sorted(map(str, shapes_t)) != sorted(map(str, shapes_j)):
            raise ValueError(
                f"group '{dst}': checkpoint shapes {shapes_t} != model "
                f"shapes {shapes_j}; fix _GROUP_MAP or the architecture "
                f"dims in NeuFlowV2Config")
        # bucket both sides by shape; a unique shape within the group is an
        # unambiguous match, but same-shape tensors (q/k/v/proj Dense
        # kernels, convz/convr/convq, Conv bias vs norm scale) MUST be
        # resolved by name — torch state_dict order is module-definition
        # order, not flax's alphabetical flatten order, so positional
        # matching would silently scramble a real checkpoint (ADVICE r4)
        t_by_shape: dict[str, list[tuple[str, np.ndarray]]] = {}
        for k, a in items:
            t_by_shape.setdefault(str(a.shape), []).append((k, a))
        j_by_shape: dict[str, list[tuple[str, np.ndarray]]] = {}
        for path, a in leaves:
            j_by_shape.setdefault(str(a.shape), []).append((path, a))
        for shp, t_items in t_by_shape.items():
            j_items = j_by_shape[shp]
            if len(t_items) == 1:
                out[j_items[0][0]] = t_items[0][1]
                continue
            def _leaf(s: str) -> str:
                parts = [t for t in s.replace("'", ".").replace("[", ".")
                         .replace("]", ".").split(".") if t]
                return parts[-1] if parts else ""

            # torch's generic leaf names map to several flax ones — use as a
            # tiebreaker between same-module leaves (norm.scale vs norm.bias)
            _LEAF_COMPAT = {"weight": {"kernel", "scale", "weight"},
                            "w": {"kernel", "scale", "weight"}}

            taken = set()
            for k, a in t_items:
                tk = _tokens(k) - {dst}
                lk = _leaf(k)
                ok_leaves = _LEAF_COMPAT.get(lk, {lk})
                cands = [p for p, _ in j_items if p not in taken]
                scores = {p: 2 * len(tk & _tokens(p))
                          + (1 if _leaf(p) in ok_leaves else 0)
                          for p in cands}
                best = max(scores.values(), default=0)
                hits = [p for p in cands if scores[p] == best]
                if best == 0 or len(hits) != 1:
                    raise ValueError(
                        f"group '{dst}': {len(t_items)} checkpoint tensors "
                        f"share shape {shp} and key '{k}' does not name-match"
                        f" exactly one model leaf (candidates: {cands}); "
                        f"refusing to match positionally — extend _GROUP_MAP "
                        f"with per-leaf names for this module")
                taken.add(hits[0])
                out[hits[0]] = a

    def fill(path, leaf):
        return jnp.asarray(out[jax.tree_util.keystr(path)])

    return model, jax.tree_util.tree_map_with_path(fill, params)
