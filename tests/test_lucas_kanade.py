"""Pyramidal LK cv2-parity tests (BASELINE config 2: 500 corners, 3 levels)."""
import cv2
import numpy as np

from opticalflowcontainer_tpu.classical import calc_optical_flow_pyr_lk


def _pair(rng, H=240, W=320, shift=(-3.3, 2.6)):
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (H + 40, W + 40)).astype(np.float32), (0, 0), 1.5
    )
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    f1 = base[20 : 20 + H, 20 : 20 + W].astype(np.uint8)
    f2 = cv2.warpAffine(base, M, (W + 40, H + 40))[20 : 20 + H, 20 : 20 + W].astype(
        np.uint8
    )
    return f1, f2


def test_500_corners_parity(rng):
    f1, f2 = _pair(rng)
    pts = cv2.goodFeaturesToTrack(f1, 500, 0.01, 8).reshape(-1, 2)
    ref_pts, ref_st, _ = cv2.calcOpticalFlowPyrLK(
        f1, f2, pts.reshape(-1, 1, 2), None, winSize=(21, 21), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    ref_pts, ref_st = ref_pts.reshape(-1, 2), ref_st.ravel()
    res = calc_optical_flow_pyr_lk(
        f1.astype(np.float32), f2.astype(np.float32), pts
    )
    ours, st = np.asarray(res.pts), np.asarray(res.status)
    both = (ref_st == 1) & (st == 1)
    assert both.sum() >= 0.95 * (ref_st == 1).sum()
    d = np.linalg.norm(ours[both] - ref_pts[both], axis=-1)
    assert d.mean() < 0.05
    # EPE vs ground truth on par with cv2
    gt = pts + np.float32([-3.3, 2.6])
    ours_epe = np.linalg.norm(ours[both] - gt[both], axis=-1).mean()
    cv2_epe = np.linalg.norm(ref_pts[both] - gt[both], axis=-1).mean()
    assert ours_epe < cv2_epe + 0.05


def test_initial_flow_guess(rng):
    f1, f2 = _pair(rng, shift=(6.0, 0.0))
    pts = cv2.goodFeaturesToTrack(f1, 100, 0.01, 10).reshape(-1, 2)
    res = calc_optical_flow_pyr_lk(
        f1.astype(np.float32),
        f2.astype(np.float32),
        pts,
        next_pts=pts + np.float32([5.5, 0.0]),
        use_initial_flow=True,
    )
    ours, st = np.asarray(res.pts), np.asarray(res.status)
    ok = st == 1
    gt = pts + np.float32([6.0, 0.0])
    assert np.linalg.norm(ours[ok] - gt[ok], axis=-1).mean() < 0.2

    # cv2 parity: WITHOUT the flag, next_pts is an output buffer and must
    # not seed the search (cv2 flags=0 semantics) — garbage nextPts must not
    # change the result; cv2's 3-tuple criteria form must also be accepted
    res_garbage = calc_optical_flow_pyr_lk(
        f1.astype(np.float32), f2.astype(np.float32), pts,
        next_pts=pts + np.float32([500.0, -900.0]),
        criteria=(3, 30, 0.01),  # (TERM_CRITERIA type, count, eps)
    )
    base = calc_optical_flow_pyr_lk(
        f1.astype(np.float32), f2.astype(np.float32), pts)
    np.testing.assert_allclose(np.asarray(res_garbage.pts),
                               np.asarray(base.pts), atol=1e-5)


def test_status_kills_offimage_points(rng):
    f1, f2 = _pair(rng)
    pts = np.float32([[5000.0, 5000.0], [160.0, 120.0]])
    res = calc_optical_flow_pyr_lk(f1.astype(np.float32), f2.astype(np.float32), pts)
    st = np.asarray(res.status)
    assert st[0] == 0 and st[1] == 1


def test_packed_gather_matches_element_gather(rng, monkeypatch):
    """The TPU fat-row-unfold gather (one row gather per (point, window-row);
    border semantics baked into reflect101/zeros padding) must reproduce the
    per-tap element-gather path, including the cv2 parity bar."""
    import opticalflowcontainer_tpu.classical.lucas_kanade as lk

    f1, f2 = _pair(rng)
    pts = cv2.goodFeaturesToTrack(f1, 300, 0.01, 8).reshape(-1, 2)
    # a few deliberately near/over the edge
    pts = np.concatenate([pts, np.float32([[2.0, 2.0], [317.0, 3.0],
                                           [1.5, 237.0], [316.5, 238.0]])])
    base = calc_optical_flow_pyr_lk(
        f1.astype(np.float32), f2.astype(np.float32), pts)

    monkeypatch.setattr(lk, "_use_packed_gather", lambda: True)
    lk._pyr_lk_full.clear_cache()
    packed = calc_optical_flow_pyr_lk(
        f1.astype(np.float32), f2.astype(np.float32), pts)
    lk._pyr_lk_full.clear_cache()

    both = (np.asarray(base.status) == 1) & (np.asarray(packed.status) == 1)
    assert both.sum() >= 0.9 * len(pts)
    d = np.abs(np.asarray(base.pts)[both] - np.asarray(packed.pts)[both])
    assert d.max() < 0.05, d.max()
    # status agreement for all but border-clamp corner cases
    agree = (np.asarray(base.status) == np.asarray(packed.status)).mean()
    assert agree > 0.98, agree
