"""Torch-primitives RAFT-small oracle for the parity test.

torchvision is not installed in this environment, so this mirror provides the
independent-oracle half of the RAFT parity check: the same architecture as
``models/raft.py:RAFTSmall`` expressed in PyTorch ops whose semantics we do
NOT control — ``F.grid_sample`` (volume lookup), ``F.avg_pool2d`` (pyramid),
``F.interpolate`` (8x upsample), ``nn.InstanceNorm2d``, NCHW ``nn.Conv2d``.
Weight-level parity through ``convert.convert_raft_small`` then proves the
flax model's layer wiring, the all-pairs volume scaling, the windowed
bilinear lookup's zero-outside/channel-order semantics and the upsampling
convention against torch's implementations.

Module names mirror the flax tree so the converter is mechanical.
(Reference RAFT capability: visualize_raft.py:12-23 via torchvision.)
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def _in(x):
    return F.instance_norm(x, eps=1e-5)


class TBottleneck(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        f4 = cout // 4
        self.conv1 = nn.Conv2d(cin, f4, 1)
        self.conv2 = nn.Conv2d(f4, f4, 3, stride, 1)
        self.conv3 = nn.Conv2d(f4, cout, 1)
        self.has_down = stride != 1 or cin != cout
        if self.has_down:
            self.down = nn.Conv2d(cin, cout, 1, stride)

    def forward(self, x):
        y = F.relu(_in(self.conv1(x)))
        y = F.relu(_in(self.conv2(y)))
        y = F.relu(_in(self.conv3(y)))
        if self.has_down:
            x = _in(self.down(x))
        return F.relu(x + y)


class TEncoder(nn.Module):
    def __init__(self, layers=(32, 32, 64, 96), out=128):
        super().__init__()
        self.stem = nn.Conv2d(3, layers[0], 7, 2, 3)
        cin = layers[0]
        for i, (ch, s) in enumerate(zip(layers[1:], (1, 2, 2))):
            setattr(self, f"block{i}a", TBottleneck(cin, ch, s))
            setattr(self, f"block{i}b", TBottleneck(ch, ch, 1))
            cin = ch
        self.proj = nn.Conv2d(cin, out, 1)

    def forward(self, x):
        y = F.relu(_in(self.stem(x)))
        for i in range(3):
            y = getattr(self, f"block{i}a")(y)
            y = getattr(self, f"block{i}b")(y)
        return self.proj(y)


class TMotion(nn.Module):
    def __init__(self, corr_ch):
        super().__init__()
        self.convc1 = nn.Conv2d(corr_ch, 96, 1)
        self.convf1 = nn.Conv2d(2, 64, 7, 1, 3)
        self.convf2 = nn.Conv2d(64, 32, 3, 1, 1)
        self.conv = nn.Conv2d(96 + 32, 80, 3, 1, 1)

    def forward(self, flow, corr):
        c = F.relu(self.convc1(corr))
        f = F.relu(self.convf2(F.relu(self.convf1(flow))))
        out = F.relu(self.conv(torch.cat([c, f], 1)))
        return torch.cat([out, flow], 1)  # 82


class TGRU(nn.Module):
    def __init__(self, hidden=96, inp=64 + 82):
        super().__init__()
        self.convz = nn.Conv2d(hidden + inp, hidden, 3, 1, 1)
        self.convr = nn.Conv2d(hidden + inp, hidden, 3, 1, 1)
        self.convq = nn.Conv2d(hidden + inp, hidden, 3, 1, 1)

    def forward(self, h, x):
        hx = torch.cat([h, x], 1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], 1)))
        return (1 - z) * h + z * q


class THead(nn.Module):
    def __init__(self, hidden=96, mid=128):
        super().__init__()
        self.conv1 = nn.Conv2d(hidden, mid, 3, 1, 1)
        self.conv2 = nn.Conv2d(mid, 2, 3, 1, 1)

    def forward(self, h):
        return self.conv2(F.relu(self.conv1(h)))


def _lookup(pyr, flow, r):
    """Windowed multi-scale lookup via F.grid_sample (zeros padding), channel
    order matching ops/allpairs.corr_lookup: level-major, then row-major
    (dy, dx).  Pixel coordinates are normalized with the align_corners=False
    formula — in pixel space this samples identically to the official RAFT
    sampler (align_corners=True) for any level size >= 2, and unlike that
    formula it stays well-defined on a 1x1 coarsest level (W-1 = 0 degenerates
    the align_corners=True normalization)."""
    _, _, H, W = flow.shape
    ys, xs = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32),
        indexing="ij",
    )
    cx = xs[None] + flow[0, 0]
    cy = ys[None] + flow[0, 1]
    n = 2 * r + 1
    dy, dx = torch.meshgrid(
        torch.arange(-r, r + 1, dtype=torch.float32),
        torch.arange(-r, r + 1, dtype=torch.float32),
        indexing="ij",
    )
    feats = []
    for lvl, vol in enumerate(pyr):  # vol [HW, 1, H2, W2]
        H2, W2 = vol.shape[2], vol.shape[3]
        s = 0.5**lvl
        x = cx.reshape(H * W, 1, 1) * s + dx.reshape(1, n, n)
        y = cy.reshape(H * W, 1, 1) * s + dy.reshape(1, n, n)
        gx = (2 * x + 1) / W2 - 1
        gy = (2 * y + 1) / H2 - 1
        grid = torch.stack([gx, gy], dim=-1)  # [HW, n, n, 2]
        g = F.grid_sample(vol, grid, mode="bilinear", padding_mode="zeros",
                          align_corners=False)  # [HW, 1, n, n]
        feats.append(g.reshape(H, W, n * n))
    out = torch.cat(feats, dim=-1)  # [H, W, L*n*n]
    return out.permute(2, 0, 1)[None]


class TorchRAFTSmall(nn.Module):
    def __init__(self, corr_levels=4, corr_radius=3):
        super().__init__()
        self.levels, self.radius = corr_levels, corr_radius
        self.fnet = TEncoder((32, 32, 64, 96), 128)
        self.cnet = TEncoder((32, 32, 64, 96), 160)
        corr_ch = corr_levels * (2 * corr_radius + 1) ** 2
        self.motion = TMotion(corr_ch)
        self.gru = TGRU()
        self.head = THead()

    def forward(self, img1, img2, iters=3):
        img1 = img1 * 2 - 1
        img2 = img2 * 2 - 1
        f1 = self.fnet(img1)
        f2 = self.fnet(img2)
        c = self.cnet(img1)
        h = torch.tanh(c[:, :96])
        ctx = F.relu(c[:, 96:])
        _, C, H, W = f1.shape
        a = f1.reshape(C, H * W).T  # [HW, C]
        b = f2.reshape(C, H * W)
        vol = (a @ b) / C**0.5  # [HW, HW]
        vol = vol.reshape(H * W, 1, H, W)
        pyr = [vol]
        for _ in range(self.levels - 1):
            pyr.append(F.avg_pool2d(pyr[-1], 2, stride=2))
        flow = torch.zeros(1, 2, H, W)
        for _ in range(iters):
            corr = _lookup(pyr, flow, self.radius)
            m = self.motion(flow, corr)
            h = self.gru(h, torch.cat([ctx, m], 1))
            flow = flow + self.head(h)
        up = F.interpolate(flow, scale_factor=8, mode="bilinear",
                           align_corners=False)
        return up * 8.0
