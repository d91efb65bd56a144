"""Flow eval datasets: Sintel / KITTI loaders (gated on data presence — this
environment has no datasets and zero egress) plus a synthetic generator so the
eval harness is always runnable.

BASELINE config 4 names Sintel/KITTI eval for the RAFT path; point
``SintelDataset``/``KittiFlowDataset`` at standard extracted layouts.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from ..utils.flo import read_flo


class SintelDataset:
    """MPI-Sintel layout: <root>/training/{clean,final}/<scene>/frame_XXXX.png
    + <root>/training/flow/<scene>/frame_XXXX.flo."""

    def __init__(self, root: str, split: str = "training", pass_: str = "clean"):
        self.root = root
        self.pairs: list[tuple[str, str, str]] = []
        img_dir = os.path.join(root, split, pass_)
        flow_dir = os.path.join(root, split, "flow")
        if not os.path.isdir(img_dir):
            return
        for scene in sorted(os.listdir(img_dir)):
            frames = sorted(glob.glob(os.path.join(img_dir, scene, "*.png")))
            for a, b in zip(frames[:-1], frames[1:]):
                flo = os.path.join(
                    flow_dir, scene, os.path.basename(a).replace(".png", ".flo")
                )
                if os.path.exists(flo):
                    self.pairs.append((a, b, flo))

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        import cv2

        a, b, flo = self.pairs[i]
        img1 = cv2.imread(a)[..., ::-1].astype(np.float32) / 255.0
        img2 = cv2.imread(b)[..., ::-1].astype(np.float32) / 255.0
        return img1, img2, read_flo(flo), None


class KittiFlowDataset:
    """KITTI-2015 layout: <root>/training/image_2/*_10.png + *_11.png and
    flow_occ/*_10.png (uint16-encoded flow with validity channel)."""

    def __init__(self, root: str, split: str = "training"):
        self.root = root
        base = os.path.join(root, split)
        self.ids = []
        if os.path.isdir(os.path.join(base, "image_2")):
            self.ids = sorted(
                f[:-7] for f in os.listdir(os.path.join(base, "image_2"))
                if f.endswith("_10.png")
            )
        self.base = base

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, i):
        import cv2

        fid = self.ids[i]
        img1 = cv2.imread(os.path.join(self.base, "image_2", fid + "_10.png"))[..., ::-1]
        img2 = cv2.imread(os.path.join(self.base, "image_2", fid + "_11.png"))[..., ::-1]
        raw = cv2.imread(
            os.path.join(self.base, "flow_occ", fid + "_10.png"), cv2.IMREAD_UNCHANGED
        )
        flow = (raw[..., 2::-1][..., :2].astype(np.float32) - 2**15) / 64.0
        valid = raw[..., 0] > 0
        return (
            img1.astype(np.float32) / 255.0,
            img2.astype(np.float32) / 255.0,
            flow,
            valid,
        )


def affine_warp_pad(H: int, W: int, max_t: float, max_angle: float,
                    scales: tuple[float, float]) -> int:
    """Canvas margin covering the worst-case INVERSE-warp displacement of a
    crop pixel (warpAffine samples src at M^-1 p): for p = c + r,
    |M^-1 p - p| <= |(1/sc) R^-1 - I| |r| + |t|/sc, maximized at the crop
    corner and a scale-range endpoint.  A size-INDEPENDENT pad silently
    leaks warp-border pixels into frame 2 while the GT still claims exact
    affine motion (at 640x480 hard-regime draws the corner displacement
    reaches ~92 px vs the old fixed 48)."""
    diag = 0.5 * float(np.hypot(H, W))
    ang_r = float(np.deg2rad(max_angle))
    rot_gain = max(
        float(np.sqrt(1.0 + k * k - 2.0 * k * np.cos(ang_r)))
        for k in (1.0 / min(scales), 1.0 / max(scales))
    )
    return int(np.ceil(rot_gain * diag
                       + np.sqrt(2.0) * max_t / min(scales))) + 4


def synthetic_eval_pairs(n: int = 8, H: int = 128, W: int = 160, seed: int = 0,
                         hard: bool = False):
    """Warped-noise pairs with exact ground truth (affine flows) — the
    always-available eval set.

    ``hard=True`` is the regime where brightness-constancy methods break:
    displacements up to ~16 px (beyond the Farneback pyramid's comfortable
    range at this size), stronger rotation/zoom, a global illumination change
    on the second frame (gain + offset), and sensor noise on both frames.
    Learned models trained with photometric augmentation keep working here;
    this is the suite that motivates the learned zoo over the classical path.
    """
    import cv2

    rng = np.random.default_rng(seed)
    pad = (affine_warp_pad(H, W, 16.0, 8.0, (0.92, 1.1)) if hard
           else affine_warp_pad(H, W, 4.0, 2.0, (0.98, 1.02)))
    out = []
    for i in range(n):
        base = cv2.GaussianBlur(
            rng.uniform(0, 255, (H + 2 * pad, W + 2 * pad)).astype(np.float32),
            (0, 0), 2.0,
        )
        if hard:
            # finer second texture layer: sharper content, more aliasing
            base = 0.7 * base + 0.3 * cv2.GaussianBlur(
                rng.uniform(0, 255, base.shape).astype(np.float32), (0, 0), 0.8
            )
            ang = rng.uniform(-8, 8)
            scale = rng.uniform(0.92, 1.1)
            tx, ty = rng.uniform(-16, 16, 2)
        else:
            ang = rng.uniform(-2, 2)
            scale = rng.uniform(0.98, 1.02)
            tx, ty = rng.uniform(-4, 4, 2)
        M = cv2.getRotationMatrix2D((W / 2 + pad, H / 2 + pad), ang, scale)
        M[:, 2] += (tx, ty)
        f1 = base[pad : pad + H, pad : pad + W]
        f2 = cv2.warpAffine(base, M, base.shape[::-1])[pad : pad + H, pad : pad + W]
        if hard:
            gain = rng.uniform(0.6, 1.4)
            offset = rng.uniform(-25, 25)
            f2 = np.clip(f2 * gain + offset, 0, 255)
            f1 = np.clip(f1 + rng.normal(0, 4, f1.shape), 0, 255).astype(np.float32)
            f2 = np.clip(f2 + rng.normal(0, 4, f2.shape), 0, 255).astype(np.float32)
        xs, ys = np.meshgrid(np.arange(W) + pad, np.arange(H) + pad)
        # warpAffine: f2(p) = base(M^-1 p), so base point X appears in f2 at
        # p2 = M X  =>  forward flow(p1) = M p1 - p1
        x2 = M[0, 0] * xs + M[0, 1] * ys + M[0, 2]
        y2 = M[1, 0] * xs + M[1, 1] * ys + M[1, 2]
        gt = np.stack([x2 - xs, y2 - ys], axis=-1).astype(np.float32)
        g1 = np.repeat(f1[..., None], 3, -1) / 255.0
        g2 = np.repeat(f2[..., None], 3, -1) / 255.0
        out.append((g1.astype(np.float32), g2.astype(np.float32), gt, None))
    return out


_FISHNET_PNG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "data", "fishnet_golden.png",
)


def fishnet_eval_pairs(n: int = 32, H: int = 480, W: int = 640, seed: int = 0,
                       hard: bool = False, image_path: str | None = None):
    """Deployment-domain eval pairs at the camera operating point: exact-GT
    affine warps of the fishnet golden image (the reference's deployment
    regime — fishnet inspection, reference junction_detector.cpp:31-214)
    interleaved with three procedural textures, all at 640x480 (reference
    camera default, lfn3_node.py:29-31).

    Motion/illumination regimes match :func:`synthetic_eval_pairs`
    (easy: <=4 px translation, +-2 deg; hard: <=16 px + gain/offset +
    noise).  Returns [(img1 RGB f32 [0,1], img2, gt [H,W,2], valid=None)].
    """
    import cv2

    rng = np.random.default_rng(seed)
    pad = (affine_warp_pad(H, W, 16.0, 8.0, (0.92, 1.1)) if hard
           else affine_warp_pad(H, W, 4.0, 2.0, (0.98, 1.02)))

    sources = []
    path = image_path or _FISHNET_PNG
    if os.path.exists(path):
        bgr = cv2.imread(path).astype(np.float32) / 255.0
        rgb = bgr[..., ::-1]
        # reflect-pad so the warp has plausible net content beyond the frame
        sy = max(H + 2 * pad - rgb.shape[0], 0)
        sx = max(W + 2 * pad - rgb.shape[1], 0)
        rgb = cv2.copyMakeBorder(
            rgb, (sy + 1) // 2, (sy + 1) // 2, (sx + 1) // 2, (sx + 1) // 2,
            cv2.BORDER_REFLECT_101)
        sources.append(np.ascontiguousarray(rgb, np.float32))
    for sig in (2.0, 1.2, 3.0):  # three texture scales
        base = cv2.GaussianBlur(
            rng.uniform(0, 1, (H + 2 * pad, W + 2 * pad)).astype(np.float32),
            (0, 0), sig)
        base -= base.min()
        base /= max(base.max(), 1e-6)
        sources.append(np.repeat(base[..., None], 3, -1))

    out = []
    for i in range(n):
        src = sources[i % len(sources)]
        sh, sw = src.shape[:2]
        oy = (sh - (H + 2 * pad)) // 2
        ox = (sw - (W + 2 * pad)) // 2
        base = src[oy : oy + H + 2 * pad, ox : ox + W + 2 * pad]
        if hard:
            ang = rng.uniform(-8, 8)
            scale = rng.uniform(0.92, 1.1)
            tx, ty = rng.uniform(-16, 16, 2)
        else:
            ang = rng.uniform(-2, 2)
            scale = rng.uniform(0.98, 1.02)
            tx, ty = rng.uniform(-4, 4, 2)
        M = cv2.getRotationMatrix2D((W / 2 + pad, H / 2 + pad), ang, scale)
        M[:, 2] += (tx, ty)
        f1 = base[pad : pad + H, pad : pad + W]
        f2 = cv2.warpAffine(base, M, (base.shape[1], base.shape[0]))[
            pad : pad + H, pad : pad + W]
        if hard:
            gain = rng.uniform(0.6, 1.4)
            offset = rng.uniform(-0.1, 0.1)
            f2 = np.clip(f2 * gain + offset, 0, 1)
            f1 = np.clip(f1 + rng.normal(0, 0.016, f1.shape), 0, 1)
            f2 = np.clip(f2 + rng.normal(0, 0.016, f2.shape), 0, 1)
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float64) + pad,
                             np.arange(H, dtype=np.float64) + pad)
        x2 = M[0, 0] * xs + M[0, 1] * ys + M[0, 2]
        y2 = M[1, 0] * xs + M[1, 1] * ys + M[1, 2]
        gt = np.stack([x2 - xs, y2 - ys], axis=-1).astype(np.float32)
        out.append((f1.astype(np.float32), f2.astype(np.float32), gt, None))
    return out
