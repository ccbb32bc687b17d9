"""The rich multi-scene synthetic world (VERDICT r4 #3).

``Scene.urban(seed)`` is the multi-scene quality-statistics world — the
analog of the reference's 11 KITTI sequences
(experiments/grid_search_nframes_voxelsize.py:52-58): >=12 SemanticKITTI
classes per seed (poles, fences, vegetation, varied building shapes,
a pedestrian mover 253), seeded so quality surfaces can be reported as
mean +- spread over scenes. This file pins

  * the sphere primitive against its analytic distance,
  * class richness + the ego-corridor clearance invariant per seed,
  * the de-ghosting gate re-validated on the richer world (BOTH mover
    classes 252 and 253),
  * the sensor-noise gate re-validated on the richer world.
"""

import numpy as np
import pytest

from lidar_transfer_tpu.config import SensorSpec, TransferConfig
from lidar_transfer_tpu.datasets import synthetic
from lidar_transfer_tpu.datasets.kitti import KittiSequence
from lidar_transfer_tpu.metrics.compare import compare_scans
from lidar_transfer_tpu.pipeline import TransferEngine, load_window

CAP = 32768
SPEC = SensorSpec(name="urb32", beams=32, fov_up=8.0, fov_down=-22.0,
                  angle_res_hor=360.0 / 512.0)
SEED = 1                      # both movers visible from the ego poses
PRIMARY = 2
NSCANS = 3


def _cfg(**kw):
    base = dict(adaption="mergemesh", number_of_scans=1, voxel_size=0.25,
                voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    base.update(kw)
    return TransferConfig(**base)


def test_sphere_raycast_analytic():
    sph = synthetic.Sphere(center=(5.0, 0.0, 0.0), radius=1.0, label=70)
    origins = np.zeros((3, 3))
    dirs = np.array([[1.0, 0.0, 0.0],       # through the center -> t=4
                     [0.0, 1.0, 0.0],       # perpendicular -> miss
                     [1.0, 0.19, 0.0]])     # grazing chord
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t = synthetic._ray_sphere(origins, dirs, sph)
    assert np.isclose(t[0], 4.0)
    assert np.isinf(t[1])
    assert 4.0 < t[2] < 5.1 and np.isfinite(t[2])
    # hit point is ON the sphere
    p = origins[2] + t[2] * dirs[2]
    assert np.isclose(np.linalg.norm(p - np.asarray(sph.center)), 1.0,
                      atol=1e-9)
    # origin inside -> exit surface, never inf (the oracle must not see
    # through solid geometry)
    t_in = synthetic._ray_sphere(np.asarray(sph.center)[None],
                                 np.array([[0.0, 0.0, 1.0]]), sph)
    assert np.isclose(t_in[0], 1.0)


def _aabbs(sc):
    for b in sc.boxes:
        c, h = np.asarray(b.center), np.asarray(b.size) / 2
        yield c - h, c + h, b.label
    for cy in sc.cylinders:
        yield (np.array([cy.center[0] - cy.radius,
                         cy.center[1] - cy.radius, cy.z_range[0]]),
               np.array([cy.center[0] + cy.radius,
                         cy.center[1] + cy.radius, cy.z_range[1]]),
               cy.label)
    for sp in sc.spheres:
        c = np.asarray(sp.center)
        yield c - sp.radius, c + sp.radius, sp.label


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_urban_scene_rich_and_corridor_clear(seed):
    """>=12 semantic classes visible per seed, and no static geometry
    (other than the flush ground slabs 48/72) intrudes into the ego
    corridor straight_line_poses drives through."""
    sc = synthetic.Scene.urban(seed)
    pts, rem, lbl = synthetic.simulate_scan(sc, SPEC, np.eye(4),
                                            frame=1.0)
    classes = set(np.unique(lbl).tolist())
    assert len(classes) >= 12, sorted(classes)
    # the required taxonomy groups are all present
    assert 40 in classes and 48 in classes          # road + sidewalk
    assert 50 in classes and 51 in classes          # building + fence
    assert 70 in classes and 71 in classes          # vegetation + trunk
    assert 10 in classes                            # car
    assert 252 in classes                           # moving car
    for lo, hi, lb in _aabbs(synthetic.Scene.urban(seed, dynamic=False)):
        if lb in (48, 72):
            continue
        intrudes = (hi[0] > -6.0 and lo[0] < 36.0
                    and hi[1] > -2.6 and lo[1] < 2.6 and hi[2] > -1.7)
        assert not intrudes, (lb, lo, hi)


def test_urban_movers_cover_both_classes():
    sc = synthetic.Scene.urban(SEED)
    assert sorted(m.box.label for m in sc.movers) == [252, 253]


@pytest.fixture(scope="module")
def urban_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("urban_kitti")
    synthetic.write_kitti_dataset(str(root), synthetic.Scene.urban(SEED),
                                  SPEC, n_scans=5)
    return str(root)


def _mover_box_world(mover, frame):
    box = mover.at_frame(frame)
    c, h = np.asarray(box.center), np.asarray(box.size) / 2.0
    return c - h, c + h


def _inside(pts, lo, hi, margin):
    return np.all((pts >= lo - margin) & (pts <= hi + margin), axis=1)


def _moving_endpoints_world(root, moving_classes, label):
    cfg = _cfg(number_of_scans=NSCANS, moving_classes=moving_classes)
    seq = KittiSequence.open(root)
    eng = TransferEngine(SPEC, SPEC, cfg, CAP, fixed_bounds=True)
    win = load_window(seq, cfg, PRIMARY, CAP)
    vs = eng.transfer_fast(win)
    lbl = np.asarray(vs.label)
    mask = np.asarray(vs.mask) & (lbl == label)
    ends = np.asarray(vs.points)[mask]
    pose = seq.poses[PRIMARY]
    return ends @ pose[:3, :3].T + pose[:3, 3]


@pytest.mark.parametrize("mover_idx,label", [(0, 252), (1, 253)])
def test_urban_deghosting_both_mover_classes(urban_dataset, mover_idx,
                                             label):
    """The de-ghosting gate re-validated on the richer world: with the
    default moving mask, every synthesized return of EACH mover class
    (car 252 AND pedestrian 253) lies on its primary-frame position."""
    sc = synthetic.Scene.urban(SEED)
    world = _moving_endpoints_world(
        urban_dataset, moving_classes=(252, 253, 254, 255, 256, 257,
                                       258, 259), label=label)
    assert world.shape[0] > 10, f"mover {label} lost from primary scan"
    lo, hi = _mover_box_world(sc.movers[mover_idx], PRIMARY)
    inside = _inside(world, lo, hi, margin=0.3)
    assert inside.all(), (
        f"{(~inside).sum()} ghost {label} returns: {world[~inside][:5]}")


def test_urban_ghosts_without_mask(urban_dataset):
    """Mask off: the fused window ghosts the car at stale positions on
    the richer world too."""
    sc = synthetic.Scene.urban(SEED)
    world = _moving_endpoints_world(urban_dataset, moving_classes=(),
                                    label=252)
    lo, hi = _mover_box_world(sc.movers[0], PRIMARY)
    ghosts = ~_inside(world, lo, hi, margin=0.3)
    assert ghosts.sum() > 20, (
        f"expected ghosting with mask off (got {ghosts.sum()} of "
        f"{world.shape[0]})")


def test_urban_identity_under_noise(tmp_path_factory):
    """The sensor-noise gate re-validated on the richer world: realistic
    noise must barely move identity-transfer quality."""
    roots = {}
    for name, noise, drop in (("clean", 0.0, 0.0), ("real", 0.03, 0.05)):
        root = str(tmp_path_factory.mktemp(f"urban_{name}"))
        synthetic.write_kitti_dataset(
            root, synthetic.Scene.urban(SEED), SPEC, n_scans=3,
            range_noise=noise, dropout=drop)
        roots[name] = root

    def metrics(root):
        cfg = _cfg()
        seq = KittiSequence.open(root)
        win = load_window(seq, cfg, 1, CAP)
        eng = TransferEngine(SPEC, SPEC, cfg, CAP, fixed_bounds=True)
        vs, ri = eng.transfer(win)
        res = compare_scans(ri.label, ri.mask, ri.range, ri.remission,
                            vs.label, vs.range, vs.remission)
        return float(res.mean_iou), float(np.asarray(vs.mask).mean())

    iou_c, hit_c = metrics(roots["clean"])
    iou_r, hit_r = metrics(roots["real"])
    print(f"urban clean iou {iou_c:.3f} hit {hit_c:.3f}; "
          f"real-noise iou {iou_r:.3f} hit {hit_r:.3f}")
    # measured honest value 0.405: the 15-class world averages IoU over
    # many thin sub-voxel structures (poles, bicycle, pedestrians) that
    # a 0.25 m voxel legitimately cannot carry — the gate here is the
    # noise DELTA, not absolute quality (that's the 5-class world's job)
    assert iou_c > 0.35
    assert iou_r > iou_c - 0.08
    assert hit_r > hit_c - 0.08
