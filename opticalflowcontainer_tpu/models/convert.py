"""torch checkpoint -> flax params converters for the model zoo.

The reference loads pretrained weights four ways (SURVEY.md §5 checkpoint
table): sniklaus URL downloads with a ``module``->``net`` key rename
(reference opticalflow_node.py:28-32), packaged files
(reference lfn3_node.py:54-56), HF safetensors, and raw checkpoint dicts.
These converters take any of those as a flat ``{name: ndarray}`` state dict
(load with ``torch.load(..., map_location='cpu')`` or safetensors and pass
``{k: v.numpy() for k, v in sd.items()}``) and emit flax param trees for the
architecture-compatible models here.

Conventions handled: OIHW->HWIO conv transpose, ConvTranspose2d IOHW->flipped
HWIO (grouped deconvs included), the ``module``->``net`` rename, and the
Sequential-index -> named-module mapping.

Each converter is driven by an explicit (torch_name, flax_path, kind, groups)
table — tests walk the tables against ``model.init`` trees to prove the
mapping is complete and shape-exact without needing the real checkpoints
(which the reference snapshot itself strips: .MISSING_LARGE_BLOBS).
"""
from __future__ import annotations

from typing import Mapping, NamedTuple

import numpy as np

from .common import convert_torch_conv, convert_torch_deconv


class Entry(NamedTuple):
    torch_name: str          # torch module prefix (keys are <name>.weight/.bias)
    flax_path: tuple[str, ...]
    kind: str                # 'conv' (wrapped in our Conv), 'rawconv', 'deconv'
    groups: int = 1


# ---------------------------------------------------------------- tables

def pwcnet_table() -> list[Entry]:
    t: list[Entry] = []
    levels = ["netOne", "netTwo", "netThr", "netFou", "netFiv", "netSix"]
    for i, lname in enumerate(levels):
        for j in range(3):
            t.append(Entry(f"netExtractor.{lname}.{j * 2}",
                           ("extractor", f"level{i + 1}", f"conv{j}"), "conv"))
    decoders = {2: "netTwo", 3: "netThr", 4: "netFou", 5: "netFiv", 6: "netSix"}
    dense = ["netOne", "netTwo", "netThr", "netFou", "netFiv"]
    for lvl, dname in decoders.items():
        if lvl < 6:
            t.append(Entry(f"{dname}.netUpflow", (f"decoder{lvl}", "upflow"), "deconv"))
            t.append(Entry(f"{dname}.netUpfeat", (f"decoder{lvl}", "upfeat"), "deconv"))
        for i, sub in enumerate(dense):
            t.append(Entry(f"{dname}.{sub}.0", (f"decoder{lvl}", f"dense{i}"), "conv"))
        t.append(Entry(f"{dname}.netSix.0", (f"decoder{lvl}", "predict"), "conv"))
    for i in range(7):
        t.append(Entry(f"netRefiner.netMain.{i * 2}", ("refiner", f"conv{i}"), "conv"))
    return t


_FEATURE_MAP = [
    ("netOne.0", "conv1"),
    ("netTwo.0", "conv2a"), ("netTwo.2", "conv2b"), ("netTwo.4", "conv2c"),
    ("netThr.0", "conv3a"), ("netThr.2", "conv3b"),
    ("netFou.0", "conv4a"), ("netFou.2", "conv4b"),
    ("netFiv.0", "conv5"),
    ("netSix.0", "conv6"),
]


def _features_entries() -> list[Entry]:
    return [Entry(f"netFeatures.{tn}", ("features", ours), "conv") for tn, ours in _FEATURE_MAP]


def liteflownet_table() -> list[Entry]:
    """ModuleList index i corresponds to level [2,3,4,5,6][i]."""
    t = _features_entries()
    for idx, lvl in enumerate((2, 3, 4, 5, 6)):
        m, s, r = f"netMatching.{idx}", f"netSubpixel.{idx}", f"netRegularization.{idx}"
        if lvl == 2:
            t.append(Entry(f"{m}.netFeat.0", (f"matching{lvl}", "feat"), "conv"))
            t.append(Entry(f"{s}.netFeat.0", (f"subpixel{lvl}", "feat"), "conv"))
        if lvl != 6:
            t.append(Entry(f"{m}.netUpflow", (f"matching{lvl}", "upflow"), "deconv", 2))
        if lvl < 4:
            t.append(Entry(f"{m}.netUpcorr", (f"matching{lvl}", "upcorr"), "deconv", 49))
        for i in range(3):
            t.append(Entry(f"{m}.netMain.{i * 2}", (f"matching{lvl}", f"main{i}"), "conv"))
            t.append(Entry(f"{s}.netMain.{i * 2}", (f"subpixel{lvl}", f"main{i}"), "conv"))
        t.append(Entry(f"{m}.netMain.6", (f"matching{lvl}", "head"), "conv"))
        t.append(Entry(f"{s}.netMain.6", (f"subpixel{lvl}", "head"), "conv"))
        if lvl < 5:
            t.append(Entry(f"{r}.netFeat.0", (f"regularization{lvl}", "feat"), "conv"))
        for i in range(6):
            t.append(Entry(f"{r}.netMain.{i * 2}", (f"regularization{lvl}", f"main{i}"), "conv"))
        if lvl >= 5:
            t.append(Entry(f"{r}.netDist.0", (f"regularization{lvl}", "dist"), "conv"))
        else:
            t.append(Entry(f"{r}.netDist.0", (f"regularization{lvl}", "dist_v"), "rawconv"))
            t.append(Entry(f"{r}.netDist.1", (f"regularization{lvl}", "dist_h"), "rawconv"))
        t.append(Entry(f"{r}.netScaleX", (f"regularization{lvl}", "scale_x"), "conv"))
        t.append(Entry(f"{r}.netScaleY", (f"regularization{lvl}", "scale_y"), "conv"))
    return t


def liteflownet3_table() -> list[Entry]:
    """ModuleList index i corresponds to level [3,4,5,6][i]."""
    t = _features_entries()
    for idx, lvl in enumerate((3, 4, 5, 6)):
        m, s, r = f"netMatching.{idx}", f"netSubpixel.{idx}", f"netRegularization.{idx}"
        if lvl <= 4:
            t.append(Entry(f"{m}.netUpconf", (f"matching{lvl}", "upconf"), "deconv"))
            for i in range(3):
                t.append(Entry(f"{m}.confFeat.{i * 2}", (f"matching{lvl}", f"conf{i}"), "conv"))
            t.append(Entry(f"{m}.confNet.0", (f"matching{lvl}", "conf_head"), "conv"))
            t.append(Entry(f"{m}.dispNet.0", (f"matching{lvl}", "disp_head"), "conv"))
            for i in range(2):
                t.append(Entry(f"{m}.corrFeat.{i * 2}", (f"matching{lvl}", f"corr{i}"), "conv"))
            t.append(Entry(f"{m}.corrScalar.0", (f"matching{lvl}", "corr_scalar0"), "conv"))
            t.append(Entry(f"{m}.corrScalar.2", (f"matching{lvl}", "corr_scalar1"), "conv"))
            t.append(Entry(f"{m}.corrOffset.0", (f"matching{lvl}", "corr_offset0"), "conv"))
            t.append(Entry(f"{m}.corrOffset.2", (f"matching{lvl}", "corr_offset1"), "conv"))
        if lvl != 6:
            t.append(Entry(f"{m}.netUpflow", (f"matching{lvl}", "upflow"), "deconv", 2))
        for i in range(5):
            t.append(Entry(f"{m}.netMain.{i * 2}", (f"matching{lvl}", f"main{i}"), "conv"))
            t.append(Entry(f"{s}.netMain.{i * 2}", (f"subpixel{lvl}", f"main{i}"), "conv"))
        t.append(Entry(f"{m}.netMain.10", (f"matching{lvl}", "head"), "conv"))
        t.append(Entry(f"{s}.netMain.10", (f"subpixel{lvl}", "head"), "conv"))
        if lvl <= 4:
            t.append(Entry(f"{r}.netFeat.0", (f"regularization{lvl}", "feat"), "conv"))
        for i in range(6):
            t.append(Entry(f"{r}.netMain.{i * 2}", (f"regularization{lvl}", f"main{i}"), "conv"))
        if lvl >= 5:
            t.append(Entry(f"{r}.netDist.0", (f"regularization{lvl}", "dist"), "conv"))
        else:
            t.append(Entry(f"{r}.netDist.0", (f"regularization{lvl}", "dist_v"), "rawconv"))
            t.append(Entry(f"{r}.netDist.1", (f"regularization{lvl}", "dist_h"), "rawconv"))
        if lvl in (4, 5):
            t.append(Entry(f"{r}.confNet.0", (f"regularization{lvl}", "conf_head"), "conv"))
        t.append(Entry(f"{r}.netScaleX", (f"regularization{lvl}", "scale_x"), "conv"))
        t.append(Entry(f"{r}.netScaleY", (f"regularization{lvl}", "scale_y"), "conv"))
    return t


# ---------------------------------------------------------------- driver

def raft_small_table() -> list[Entry]:
    """RAFT-small conv map.  Torch names follow this repo's module naming
    (mirrored by the parity oracle tests/_torch_raft.py); a torchvision
    ``raft_small`` checkpoint additionally needs its module prefixes renamed
    (feature_encoder->fnet, update_block.motion_encoder->motion, ...), which
    cannot be verified offline — torchvision is not installed here."""
    t: list[Entry] = []
    for enc in ("fnet", "cnet"):
        t.append(Entry(f"{enc}.stem", (enc, "stem"), "conv"))
        for i, (cin, ch, s) in enumerate(((32, 32, 1), (32, 64, 2), (64, 96, 2))):
            for blk, bcin, bs in ((f"block{i}a", cin, s), (f"block{i}b", ch, 1)):
                for c in ("conv1", "conv2", "conv3"):
                    t.append(Entry(f"{enc}.{blk}.{c}", (enc, blk, c), "conv"))
                if bs != 1 or bcin != ch:
                    t.append(Entry(f"{enc}.{blk}.down", (enc, blk, "down"), "conv"))
        t.append(Entry(f"{enc}.proj", (enc, "proj"), "conv"))
    for m in ("convc1", "convf1", "convf2", "conv"):
        t.append(Entry(f"motion.{m}", ("motion", m), "conv"))
    for g in ("convz", "convr", "convq"):
        t.append(Entry(f"gru.{g}", ("gru", g), "conv"))
    t.append(Entry("head.conv1", ("head", "conv1"), "conv"))
    t.append(Entry("head.conv2", ("head", "conv2"), "conv"))
    return t


def _set(tree: dict, path: tuple[str, ...], kernel, bias=None):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    leaf = node.setdefault(path[-1], {})
    leaf["kernel"] = np.ascontiguousarray(kernel, np.float32)
    if bias is not None:
        leaf["bias"] = np.ascontiguousarray(bias, np.float32)


def _rename(sd: Mapping) -> dict:
    # global replace on EVERY occurrence, matching the reference loaders
    # exactly (pwc_net/pwc_net.py:219, pwc_sub_node.py:94): real sniklaus
    # checkpoints nest module-prefixed names (moduleExtractor.moduleOne.0),
    # so a first-occurrence-only replace would miss the inner ones and the
    # table lookup (netExtractor.netOne.0) would KeyError
    return {k.replace("module", "net"): v for k, v in sd.items()}


def apply_table(sd: Mapping, table: list[Entry]) -> dict:
    sd = _rename(sd)
    p: dict = {}
    for e in table:
        w = np.asarray(sd[f"{e.torch_name}.weight"])
        b = sd.get(f"{e.torch_name}.bias")
        if e.kind == "deconv":
            k, b = convert_torch_deconv(w, b, e.groups)
            _set(p, e.flax_path, k, b)
        else:
            k, b = convert_torch_conv(w, b)
            path = e.flax_path + (("Conv_0",) if e.kind == "conv" else ())
            _set(p, path, k, b)
    return {"params": p}


def convert_pwcnet(sd: Mapping) -> dict:
    return apply_table(sd, pwcnet_table())


def convert_liteflownet(sd: Mapping) -> dict:
    return apply_table(sd, liteflownet_table())


def convert_liteflownet3(sd: Mapping) -> dict:
    return apply_table(sd, liteflownet3_table())


def convert_raft_small(sd: Mapping) -> dict:
    return apply_table(sd, raft_small_table())


def invert_entry(e: Entry, kernel: np.ndarray, bias: np.ndarray | None) -> dict:
    """Inverse transform (flax -> torch layout) — used by tests to fabricate
    shape-exact synthetic torch state dicts from ``model.init`` trees."""
    out = {}
    if e.kind == "deconv":
        kh, kw, cpg, cout_total = kernel.shape
        g = e.groups
        cog = cout_total // g
        w = kernel.reshape(kh, kw, cpg, g, cog).transpose(3, 2, 4, 0, 1)
        w = w.reshape(g * cpg, cog, kh, kw)[:, :, ::-1, ::-1]
    else:
        w = kernel.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    out[f"{e.torch_name}.weight"] = np.ascontiguousarray(w)
    if bias is not None:
        out[f"{e.torch_name}.bias"] = np.ascontiguousarray(bias)
    return out
