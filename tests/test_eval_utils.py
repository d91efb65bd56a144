"""Eval metrics / .flo IO / synthetic GT correctness tests."""
import numpy as np

from opticalflowcontainer_tpu.eval import epe, epe_stats, outlier_rate, synthetic_eval_pairs
from opticalflowcontainer_tpu.utils import read_flo, write_flo


def test_epe_metrics():
    gt = np.zeros((4, 4, 2), np.float32)
    flow = gt.copy()
    flow[..., 0] = 3.0
    assert abs(epe(flow, gt) - 3.0) < 1e-6
    stats = epe_stats(flow, gt)
    assert stats["3px"] == 0.0 and stats["5px"] == 1.0
    assert outlier_rate(flow, gt) == 0.0  # epe==3 not > 3


def test_epe_empty_valid_mask_is_nan_not_crash():
    """A frame whose valid mask selects zero pixels (all-zero KITTI flow_occ
    channel) must yield NaN stats, not an np.percentile IndexError; the
    run_eval aggregation uses nanmean so such frames drop out."""
    gt = np.zeros((4, 4, 2), np.float32)
    flow = np.ones_like(gt)
    valid = np.zeros((4, 4), bool)
    assert np.isnan(epe(flow, gt, valid))
    stats = epe_stats(flow, gt, valid)
    assert all(np.isnan(v) for v in stats.values())
    assert np.isnan(outlier_rate(flow, gt, valid))


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((7, 9, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(back, flow)


def test_synthetic_gt_consistent_with_farneback(rng):
    """The synthetic eval GT must agree with what a good estimator finds."""
    from opticalflowcontainer_tpu.classical import calc_optical_flow_farneback

    img1, img2, gt, _ = synthetic_eval_pairs(n=1, H=120, W=160, seed=3)[0]
    g1 = (img1[..., 0] * 255).astype(np.float32)
    g2 = (img2[..., 0] * 255).astype(np.float32)
    flow = np.asarray(calc_optical_flow_farneback(g1, g2))
    inner = (slice(16, -16), slice(16, -16))
    assert epe(flow[inner], gt[inner]) < 0.4


def test_eval_pairs_pad_covers_warp_border():
    """Eval generators must never leak warp-border pixels into img2 (the GT
    claims exact affine motion everywhere): with warpAffine's border forced
    to NaN, the hard fishnet suite at its real 640x480 operating point must
    contain no NaN.  The old fixed pad=48 needed ~92 px at extremal draws."""
    import cv2

    from opticalflowcontainer_tpu.eval.datasets import (
        fishnet_eval_pairs,
        synthetic_eval_pairs,
    )

    orig_wa = cv2.warpAffine

    def nan_wa(src, M, dsize, *a, **k):
        k.setdefault("borderValue",
                     (float("nan"),) * 4 if src.ndim == 3 else float("nan"))
        return orig_wa(src, M, dsize, *a, **k)

    cv2.warpAffine = nan_wa
    try:
        pairs = fishnet_eval_pairs(8, hard=True)
        pairs += synthetic_eval_pairs(4, H=128, W=160, hard=True)
    finally:
        cv2.warpAffine = orig_wa
    for img1, img2, gt, _ in pairs:
        assert not np.isnan(img2).any()
        assert not np.isnan(img1).any()
        assert not np.isnan(gt).any()


def test_npz_ckpt_roundtrip(tmp_path):
    """run_eval --ckpt candidate.npz must reproduce the train_flow flat-npz
    save format exactly (keys '/'-joined, values raw arrays)."""
    import numpy as np
    from flax.traverse_util import flatten_dict

    from opticalflowcontainer_tpu.eval.run_eval import _npz_params

    params = {"params": {"conv": {"kernel": np.arange(12.0).reshape(3, 4),
                                  "bias": np.zeros(4)},
                         "head": {"dense": {"kernel": np.ones((4, 2))}}}}
    flat = flatten_dict(params["params"])
    path = tmp_path / "cand.npz"
    np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})

    loaded = _npz_params(str(path))
    flat2 = flatten_dict(loaded["params"])
    assert set(flat2) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat2[k], flat[k])
