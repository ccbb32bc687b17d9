"""Differential tests against the reference's OWN runnable numpy code.

Round-1 VERDICT item #3: every parity claim previously rested on
re-derived oracles. These tests import /root/reference's actual modules —
``auxiliary/laserscan.py`` (projection, ``compare()``),
``auxiliary/np_ioueval.py`` (iouEval), and ``auxiliary/fusion_lidar.py``'s
CPU path (TSDFVolume) — run them on the synthetic fixture, and assert our
ops reproduce them:

  - range/label projection: pixel-level agreement vs the reference's
    "depth" z-buffer loop (laserscan.py:372-391), mismatches bounded and
    attributable to float quantization at pixel boundaries;
  - TSDF volumes: equal on a small grid vs the reference CPU integrate
    (fusion_lidar.py:289-392). The CPU fallback implements the PLAIN
    (non-class-aware) rule, which our class-aware rule reduces to exactly
    when all labels are equal — so labels are held at 0;
  - iouEval / compare(): mIoU / Acc / MSE equal (laserscan.py:1181-1301,
    np_ioueval.py:27-70).

The reference imports deps this image doesn't ship (skimage — used only
by get_mesh; the compiled Cython raytracer — used only by
throw_rays_at_mesh) and the pre-numpy-2 ``np.float`` alias; those are
stubbed/shimmed below. The code under test never calls the stubs.
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_transfer_tpu.datasets import kitti
from lidar_transfer_tpu.datasets.kitti import KittiSequence
from lidar_transfer_tpu.metrics.compare import compare_scans
from lidar_transfer_tpu.metrics.ioueval import IoUEval
from lidar_transfer_tpu.ops import projection as P
from lidar_transfer_tpu.ops import tsdf as TS

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    if not hasattr(np, "float"):
        np.float = float    # pre-numpy-2 alias used at laserscan.py:568
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = sk.measure
    if "auxiliary.raytracer.RayTracerCython" not in sys.modules:
        pkg = types.ModuleType("auxiliary.raytracer")
        rtc = types.ModuleType("auxiliary.raytracer.RayTracerCython")
        rtc.C_Trace = None
        pkg.RayTracerCython = rtc
        sys.modules["auxiliary.raytracer"] = pkg
        sys.modules["auxiliary.raytracer.RayTracerCython"] = rtc

    import auxiliary.fusion_lidar as ref_fl
    import auxiliary.laserscan as ref_ls
    import auxiliary.np_ioueval as ref_iou

    assert ref_fl.FUSION_GPU_MODE == 0, "expected the reference CPU path"
    return types.SimpleNamespace(ls=ref_ls, iou=ref_iou, fl=ref_fl)


def test_ioueval_matches_reference(ref, rng):
    """Exact mIoU / per-class IoU / Acc parity incl. ignore handling."""
    n = 16
    pred = rng.integers(0, n, 8192)
    gt = rng.integers(0, n, 8192)
    # make some classes absent to exercise the epsilon path
    gt[gt == 7] = 3
    pred[pred == 7] = 3

    for ignore in ([], [0], [0, 5]):
        r = ref.iou.iouEval(n, ignore=np.asarray(ignore, np.int64))
        r.addBatch(pred, gt)
        o = IoUEval(n, ignore=ignore)
        o.addBatch(pred, gt)
        m_r, per_r = r.getIoU()
        m_o, per_o = o.getIoU()
        # our division runs in f32 on device (x64 disabled) -> ~1e-7 rel
        np.testing.assert_allclose(m_o, m_r, atol=1e-6)
        np.testing.assert_allclose(per_o, per_r, atol=1e-6)
        np.testing.assert_allclose(o.getacc(), r.getacc(), atol=1e-6)


def _ref_project(ref, pts, rem, lbl, H, W, fov_up, fov_down):
    """Run the reference's depth z-buffer projection on raw points."""
    s = ref.ls.SemLaserScan(H, W, nclasses=260, color_dict={0: [0, 0, 0]})
    s.points = np.asarray(pts, np.float32).copy()
    s.remissions = np.asarray(rem, np.float32).copy()
    s.label = np.asarray(lbl, np.uint32).copy()
    s.label_color = np.zeros((len(pts), 3), np.float32)
    s.do_range_projection_new(fov_up, fov_down, remove=True, method="depth")
    return s


def test_projection_matches_reference(ref, synthetic_dataset, small_spec):
    """Our sort-based z-buffer vs the reference's per-point Python loop
    (laserscan.py:372-391), same scan: pixel-level agreement.

    Mismatches can only come from float quantization flipping floor() at
    pixel boundaries (numpy evaluates the chain in a different order than
    XLA); they must be rare and every range mismatch must be either a
    boundary flip or a depth tie.
    """
    seq = KittiSequence.open(synthetic_dataset)
    pts, rem, lbl = seq.read(2)
    H, W = small_spec.H, small_spec.W

    s = _ref_project(ref, pts, rem, lbl, H, W,
                     small_spec.fov_up, small_spec.fov_down)
    ref_rng = s.range_image
    ref_lbl = s.label_image[..., 0].astype(np.int64)
    ref_mask = s.index >= 0

    cap = kitti.scan_capacity(len(pts))
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=H, W=W,
                         fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    our_rng = np.asarray(ri.range)
    our_lbl = np.asarray(ri.label, np.int64)
    our_mask = np.asarray(ri.mask)
    our_idx = np.asarray(ri.index)

    # Measured on the fixture: mask, winning index, and label are
    # BIT-EXACT (0/4096 mismatches); range agrees to the last bits (the
    # norm is computed in a different order). Thresholds below leave a
    # hair of headroom for fixture/backend drift, nothing more.
    npix = H * W
    mask_mismatch = (ref_mask != our_mask).sum()
    assert mask_mismatch <= 0.001 * npix, f"{mask_mismatch} mask mismatches"

    both = ref_mask & our_mask
    idx_mismatch = (both & (s.index != our_idx)).sum()
    assert idx_mismatch <= 0.001 * npix, f"{idx_mismatch} index mismatches"
    rng_mismatch = (both & (np.abs(ref_rng - our_rng) > 1e-4)).sum()
    assert rng_mismatch == 0, f"{rng_mismatch} range mismatches"
    lbl_mismatch = (both & (ref_lbl != our_lbl)).sum()
    assert lbl_mismatch <= 0.001 * npix, f"{lbl_mismatch} label mismatches"


def test_projection_pdist_matches_reference(ref, synthetic_dataset,
                                            small_spec):
    """winner="pdist" vs the reference's pdist loop (laserscan.py:393-418):
    per-pixel winner by distance of the float image coords to the pixel
    center, first-come ties. Winner index and range must agree pixel-wise
    (same quantization caveats as the depth variant)."""
    seq = KittiSequence.open(synthetic_dataset)
    pts, rem, lbl = seq.read(2)
    H, W = small_spec.H, small_spec.W

    s = ref.ls.SemLaserScan(H, W, nclasses=260, color_dict={0: [0, 0, 0]})
    s.points = np.asarray(pts, np.float32).copy()
    s.remissions = np.asarray(rem, np.float32).copy()
    s.label = np.asarray(lbl, np.uint32).copy()
    s.label_color = np.zeros((len(pts), 3), np.float32)
    s.do_range_projection_new(small_spec.fov_up, small_spec.fov_down,
                              remove=True, method="pdist")

    cap = kitti.scan_capacity(len(pts))
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=H, W=W,
                         fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down,
                         winner="pdist")
    our_idx = np.asarray(ri.index)
    our_rng = np.asarray(ri.range)
    our_lbl = np.asarray(ri.label, np.int64)

    npix = H * W
    ref_mask = s.index >= 0
    both = ref_mask & (our_idx >= 0)
    assert (ref_mask != (our_idx >= 0)).sum() <= 0.001 * npix
    idx_mismatch = (both & (s.index != our_idx)).sum()
    assert idx_mismatch <= 0.002 * npix, f"{idx_mismatch} index mismatches"
    agree = both & (s.index == our_idx)
    np.testing.assert_allclose(our_rng[agree], s.range_image[agree],
                               atol=1e-4)
    lbl_mismatch = (both
                    & (s.label_image[..., 0].astype(np.int64) != our_lbl)
                    ).sum()
    assert lbl_mismatch <= 0.002 * npix, f"{lbl_mismatch} label mismatches"
    # the two winner rules must actually differ when a farther point sits
    # closer to the pixel center (the sparse fixture rarely collides, so
    # build the collision explicitly): two points in one pixel — p0 nearer
    # in depth, p1 nearer to the pixel center
    fu, fd = 10.0, -10.0
    fov = np.deg2rad(fu) + np.deg2rad(fd) * -1

    def pt(depth, u_frac, v_frac, H=8, W=32):
        yaw = (u_frac / W * 2.0 - 1.0) * np.pi
        pitch = np.deg2rad(fu) - v_frac / H * fov
        return [depth * np.cos(pitch) * np.cos(-yaw),
                depth * np.cos(pitch) * np.sin(-yaw),
                depth * np.sin(pitch)]

    pts2 = np.asarray([pt(5.0, 16.05, 4.05),      # near depth, off-center
                       pt(9.0, 16.5, 4.5)],       # far depth, dead center
                      np.float32)
    args = (jnp.asarray(pts2), jnp.zeros(2), jnp.asarray([10, 20]),
            jnp.ones(2, bool))
    kw = dict(H=8, W=32, fov_up_deg=fu, fov_down_deg=fd)
    win_d = np.asarray(P.range_project(*args, **kw).index)
    win_p = np.asarray(P.range_project(*args, winner="pdist", **kw).index)
    assert win_d[4, 16] == 0 and win_p[4, 16] == 1


def test_projection_legacy_far_to_near_matches_depth(ref, synthetic_dataset,
                                                     small_spec):
    """The legacy ``do_range_projection`` (laserscan.py:202-292) scatters
    points in decreasing-depth order, so each pixel keeps its MINIMUM-depth
    point — the same winner set as our winner="depth" z-buffer, except at
    exact depth ties where numpy's unstable introsort makes the reference
    arbitrary. Asserted here: winning RANGE values agree everywhere both
    have data (value equality is tie-insensitive)."""
    seq = KittiSequence.open(synthetic_dataset)
    pts, rem, lbl = seq.read(2)
    H, W = small_spec.H, small_spec.W

    s = ref.ls.SemLaserScan(H, W, nclasses=260, color_dict={0: [0, 0, 0]})
    s.points = np.asarray(pts, np.float32).copy()
    s.remissions = np.asarray(rem, np.float32).copy()
    s.label = np.asarray(lbl, np.uint32).copy()
    s.label_color = np.zeros((len(pts), 3), np.float32)
    s.do_range_projection(small_spec.fov_up, small_spec.fov_down,
                          remove=True)
    ref_mask = s.proj_idx >= 0          # -1 init = never written
    ref_rng = s.proj_range

    cap = kitti.scan_capacity(len(pts))
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=H, W=W,
                         fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    our_rng = np.asarray(ri.range)
    our_mask = np.asarray(ri.mask)

    npix = H * W
    assert (ref_mask != our_mask).sum() <= 0.001 * npix
    both = ref_mask & our_mask
    rng_mismatch = (both & (np.abs(ref_rng - our_rng) > 1e-4)).sum()
    assert rng_mismatch <= 0.001 * npix, f"{rng_mismatch} range mismatches"


def test_tsdf_integrate_matches_reference_cpu(ref, rng):
    """Our integrate vs the reference's CPU TSDFVolume.integrate
    (fusion_lidar.py:289-392) on a small grid, 2 fusions deep.

    The reference CPU path is the PLAIN cumulative-average rule (no
    class-aware branch, no remission); with all labels equal our
    class-aware rule reduces to exactly that, so labels are held at 0 and
    tsdf + weight volumes must match elementwise.
    """
    # origins offset off the sensor so no voxel sits exactly at (0,0,0)
    # (the reference divides by depth there and produces NaN)
    vol_bnds = np.array([[-7.95, 8.05], [-8.05, 7.95], [-2.05, 1.95]])
    voxel = 0.5
    H, W = 16, 64
    fovu, fovd = 8.0, -22.0

    depth = (rng.random((H, W)) * 10 + 1).astype(np.float32)
    depth[rng.random((H, W)) < 0.2] = 0.0
    rem = rng.random((H, W)).astype(np.float32)
    color3 = np.zeros((H, W, 3), np.float32)
    label0 = jnp.zeros((H, W), jnp.int32)

    tv = ref.fl.TSDFVolume(vol_bnds.copy(), voxel, fovu, fovd)
    spec = TS.VolumeSpec.from_bounds(vol_bnds, voxel)
    assert spec.dims == tuple(tv._vol_dim)
    state = spec.init_state()

    for i in range(2):
        d = np.roll(depth, 7 * i, axis=1)
        tv.integrate(color3, d.astype(np.float32), rem, np.eye(4))
        state = TS.integrate(state, spec, jnp.asarray(d), label0,
                             jnp.asarray(rem), fov_up_deg=fovu,
                             fov_down_deg=fovd)

    np.testing.assert_allclose(np.asarray(state.weight),
                               tv._weight_vol_cpu, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.tsdf),
                               tv._tsdf_vol_cpu, atol=1e-5)


def test_compare_matches_reference(ref, synthetic_dataset, small_spec):
    """Our compare_scans vs the reference compare() (laserscan.py:1181-1301)
    on a projected scan vs a perturbed copy: IoU/Acc/MSE equal."""
    seq = KittiSequence.open(synthetic_dataset)
    pts, rem, lbl = seq.read(1)
    H, W = small_spec.H, small_spec.W
    cap = kitti.scan_capacity(len(pts))
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=H, W=W,
                         fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    src_lbl = np.asarray(ri.label, np.int64)
    src_rng = np.asarray(ri.range, np.float64)
    src_rem = np.maximum(np.asarray(ri.remission, np.float64), 0.0)
    src_mask = np.asarray(ri.mask)

    # perturbed target: shift columns + inject disagreements + dropouts
    rng2 = np.random.default_rng(3)
    tgt_lbl = np.roll(src_lbl, 2, axis=1)
    tgt_rng = np.roll(src_rng, 2, axis=1) + 0.05
    tgt_rem = np.roll(src_rem, 2, axis=1)
    drop = rng2.random((H, W)) < 0.1
    tgt_lbl[drop] = 0
    tgt_rng[drop] = 0.0
    tgt_rem[drop] = 0.0

    # reference scan objects: proj_color black where no data / label 0
    # (colors only matter for the black mask and diff images)
    nclasses = 260
    lut = np.zeros((nclasses, 3), np.float64)
    lut[1:] = rng2.uniform(0.1, 1.0, (nclasses - 1, 3))
    source = types.SimpleNamespace(
        proj_color=lut[src_lbl] * src_mask[..., None],
        proj_label=src_lbl.copy(),
        proj_range=src_rng.copy(),
        proj_remissions=src_rem.copy(),
        nclasses=nclasses)
    target = types.SimpleNamespace(
        adaption="mergemesh",
        proj_color=lut[tgt_lbl],
        label_image=tgt_lbl.copy(),
        proj_range=tgt_rng.copy(),
        proj_remissions=tgt_rem.copy())

    _, _, _, ref_miou, ref_acc, ref_mse = ref.ls.compare(source, target)

    res = compare_scans(
        jnp.asarray(src_lbl, jnp.int32), jnp.asarray(src_mask),
        jnp.asarray(src_rng, jnp.float32), jnp.asarray(src_rem, jnp.float32),
        jnp.asarray(tgt_lbl, jnp.int32),
        jnp.asarray(tgt_rng, jnp.float32), jnp.asarray(tgt_rem, jnp.float32),
        max_label=nclasses)

    np.testing.assert_allclose(float(res.mean_iou), ref_miou, atol=1e-6)
    np.testing.assert_allclose(float(res.mean_acc), ref_acc, atol=1e-6)
    np.testing.assert_allclose(float(res.mse), ref_mse, rtol=1e-5)
