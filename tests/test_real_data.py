"""Real-SemanticKITTI validation hook (VERDICT r2 #9 / missing #3).

All shipped quality numbers come from the procedural synthetic world —
the reference's own fixture (minimal.zip, README.md:50-58) is a stripped
blob and no real scan exists in this image. When real data IS available,
point ``LT_REAL_KITTI`` at a SemanticKITTI-layout root
(``<root>/sequences/<seq>/{velodyne,labels,poses.txt,calib.txt}``) and
this module runs the differential parity suite on a real scan's point
distribution (ring structure, dropout, 1e5-point density gradients):

    LT_REAL_KITTI=/data/semantickitti python -m pytest tests/test_real_data.py

Optional: ``LT_REAL_KITTI_SEQ`` (default "00"), ``LT_REAL_KITTI_IDX``
(default 0). Without the env var every test SKIPS (not fails).
"""

import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_transfer_tpu.config import HDL64, TransferConfig
from lidar_transfer_tpu.datasets import kitti
from lidar_transfer_tpu.datasets.kitti import KittiSequence
from lidar_transfer_tpu.ops import projection as P

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def real_seq():
    root = os.environ.get("LT_REAL_KITTI")
    if not root:
        pytest.skip("set LT_REAL_KITTI=<semantickitti root> to run "
                    "real-data validation")
    seq_name = os.environ.get("LT_REAL_KITTI_SEQ", "00")
    try:
        return KittiSequence.open(root, sequence=seq_name)
    except (OSError, ValueError) as e:
        pytest.fail(f"LT_REAL_KITTI={root} is set but unreadable: {e}")


@pytest.fixture(scope="module")
def real_scan(real_seq):
    idx = int(os.environ.get("LT_REAL_KITTI_IDX", "0"))
    pts, rem, lbl = real_seq.read(idx)
    assert len(pts) > 10000, "suspiciously small real scan"
    return pts, rem, lbl


@pytest.fixture(scope="module")
def ref():
    """The reference's own modules (same shims as test_reference_parity)."""
    if not hasattr(np, "float"):
        np.float = float
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    for name in ("skimage", "skimage.measure"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "auxiliary.raytracer.RayTracerCython" not in sys.modules:
        pkg = types.ModuleType("auxiliary.raytracer")
        rtc = types.ModuleType("auxiliary.raytracer.RayTracerCython")
        rtc.C_Trace = None
        pkg.RayTracerCython = rtc
        sys.modules["auxiliary.raytracer"] = pkg
        sys.modules["auxiliary.raytracer.RayTracerCython"] = rtc
    import auxiliary.laserscan as ref_ls
    return types.SimpleNamespace(ls=ref_ls)


def _project(pts, rem, lbl, spec):
    cap = kitti.scan_capacity(len(pts))
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    return P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                           jnp.asarray(m), H=spec.H, W=spec.W,
                           fov_up_deg=spec.fov_up,
                           fov_down_deg=spec.fov_down)


def test_real_projection_matches_reference(ref, real_scan):
    """Winner selection bit-exact vs the reference's depth z-buffer loop
    (laserscan.py:372-391) on a real scan."""
    pts, rem, lbl = real_scan
    H, W = HDL64.H, HDL64.W
    s = ref.ls.SemLaserScan(H, W, nclasses=260, color_dict={0: [0, 0, 0]})
    s.points = np.asarray(pts, np.float32).copy()
    s.remissions = np.asarray(rem, np.float32).copy()
    s.label = np.asarray(lbl, np.uint32).copy()
    s.label_color = np.zeros((len(pts), 3), np.float32)
    s.do_range_projection_new(HDL64.fov_up, HDL64.fov_down, remove=True,
                              method="depth")

    ri = _project(pts, rem, lbl, HDL64)
    npix = H * W
    mask_mm = (np.asarray(ri.mask) != (s.index >= 0)).sum()
    assert mask_mm <= 0.001 * npix, f"{mask_mm} mask mismatches"
    both = (s.index >= 0) & np.asarray(ri.mask)
    idx_mm = both & (s.index != np.asarray(ri.index))
    # winner-index disagreements are legitimate ONLY at exact depth ties
    # (the loop breaks ties by arrival order, the sort by point id) or
    # pixel-boundary float flips; anything else is an engine bug
    depth_differs = idx_mm & (
        np.abs(s.range_image - np.asarray(ri.range)) > 1e-4)
    assert depth_differs.sum() <= 0.001 * npix, (
        f"{depth_differs.sum()} non-tie winner mismatches "
        f"({idx_mm.sum()} total incl. depth ties)")


def test_real_roundtrip_and_coverage(real_scan):
    """Projection invariants on real data: index validity, reverse
    projection error bounded by pixel quantization."""
    pts, rem, lbl = real_scan
    ri = _project(pts, rem, lbl, HDL64)
    mask = np.asarray(ri.mask)
    # a real 64-beam scan fills a substantial fraction of the image
    assert mask.mean() > 0.5, f"hit rate {mask.mean():.3f}"
    idx = np.asarray(ri.index)[mask]
    assert (idx >= 0).all() and (idx < kitti.scan_capacity(len(pts))).all()
    # winners' stored range equals the winning points' true range
    d = np.linalg.norm(pts, axis=1)
    cap_d = np.zeros(kitti.scan_capacity(len(pts)), np.float32)
    cap_d[:len(d)] = d
    np.testing.assert_allclose(np.asarray(ri.range)[mask], cap_d[idx],
                               rtol=1e-5)


def test_real_cp_identity_transfer(real_seq):
    """End-to-end cp identity transfer on real data: high IoU, near-exact
    range recovery (the cp path reconstructs winners exactly)."""
    from lidar_transfer_tpu.metrics.compare import compare_scans
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window

    idx = int(os.environ.get("LT_REAL_KITTI_IDX", "0"))
    cfg = TransferConfig(adaption="cp", number_of_scans=1,
                         preserve_float=True)
    cap = kitti.scan_capacity(
        max(len(real_seq.read(idx)[0]), 1))
    eng = TransferEngine(HDL64, HDL64, cfg, cap)
    window = load_window(real_seq, cfg, idx, cap)
    vs, ri = eng.transfer(window)
    res = compare_scans(
        ri.label, ri.mask, ri.range, jnp.maximum(ri.remission, 0.0),
        vs.label, vs.range, vs.remission)
    assert float(res.mean_iou) > 0.95
    assert float(res.mse) < 1.0
