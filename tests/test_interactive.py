"""Interactive-viewer core logic (vispy-free parts of interactive.py)."""

import subprocess
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_transfer_tpu.config import TransferConfig
from lidar_transfer_tpu.datasets import kitti
from lidar_transfer_tpu.datasets.kitti import KittiSequence
from lidar_transfer_tpu.interactive import FrameStepper, frame_payload
from lidar_transfer_tpu.ops import projection as P


def test_frame_stepper_actions():
    s = FrameStepper(5, start=0)
    assert s.get_action(0.0) == "no_action"
    assert s.key("N") == "next"     # case-insensitive ≡ reference keys
    assert s.key("b") == "back"
    assert s.key("x") is None       # unbound keys ignored
    assert s.get_action(0.0) == "next"
    assert s.get_action(0.0) == "back"

    assert s.apply("next") and s.index == 1
    assert s.apply("back") and s.index == 0
    assert not s.apply("back") and s.index == 0       # clamps at start
    s.index = 4
    assert not s.apply("next") and s.index == 4       # clamps at end
    assert not s.apply("view_2") and s.view_mode == 2
    assert s.key("q") == "quit"


def test_frame_payload_rows_and_metrics(synthetic_dataset, small_spec):
    cfg = TransferConfig()
    seq = KittiSequence.open(synthetic_dataset)
    pts, rem, lbl = seq.read(1)
    cap = kitti.scan_capacity(len(pts))
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=small_spec.H, W=small_spec.W,
                         fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)

    # source-only payload
    pay = frame_payload(ri, cfg, source_points=pts, source_labels=lbl)
    assert [n for n, _ in pay["rows"]] == ["src range", "src remission",
                                           "src labels"]
    for _, img in pay["rows"]:
        assert img.shape == (small_spec.H, small_spec.W, 3)
        assert img.dtype == np.uint8
    assert pay["points_3d"].shape == pts.shape
    assert pay["colors_3d"].shape == (len(pts), 3)
    assert pay["diff"] is None

    # identity "virtual" scan -> perfect metrics in the title, empty diff
    back = P.reverse_project(ri, fov_up_deg=small_spec.fov_up,
                             fov_down_deg=small_spec.fov_down)
    virtual = types.SimpleNamespace(range=ri.range, remission=ri.remission,
                                    label=ri.label, points=back,
                                    mask=ri.mask)
    pay = frame_payload(ri, cfg, virtual=virtual)
    assert len(pay["rows"]) == 6
    assert pay["diff"] is not None and not pay["diff"].any()
    assert pay["title"].startswith("IoU 1.0000")
    assert "MSE 0.00" in pay["title"]
    assert pay["virtual_points_3d"].shape[1] == 3


@pytest.mark.skipif("vispy" in sys.modules
                    or __import__("importlib.util", fromlist=["util"]
                                  ).find_spec("vispy") is not None,
                    reason="vispy present — the error path doesn't apply")
def test_interactive_flag_errors_without_vispy(synthetic_dataset):
    """--interactive must FAIL LOUDLY without vispy (round-1 dead flag)."""
    res = subprocess.run(
        [sys.executable, "-m", "lidar_transfer_tpu.visualize",
         "-d", synthetic_dataset, "--interactive"],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 2
    assert "vispy" in res.stderr


def _fake_vispy(record):
    """Minimal recording vispy stand-in (scene/app/visuals surface that
    InteractiveViewer touches). Unknown attribute access raises, so typos
    in the shell can't hide behind the real import gate (VERDICT r2 #4)."""
    vispy = types.ModuleType("vispy")
    scene_mod = types.ModuleType("vispy.scene")
    app_mod = types.ModuleType("vispy.app")

    class _Events:
        def __init__(self):
            self.key_press = self

        def connect(self, fn):
            record.setdefault("handlers", []).append(fn)

    class _View:
        def __init__(self):
            self.camera = None
            self.scene = object()

    class _Grid:
        def add_view(self, r, c):
            return _View()

    class _Widget:
        def add_grid(self):
            return _Grid()

    class SceneCanvas:
        def __init__(self, keys=None, show=False, title="", size=()):
            self.title = title
            self.central_widget = _Widget()
            self.events = _Events()
            record.setdefault("canvases", []).append(self)

        def update(self):
            record["updates"] = record.get("updates", 0) + 1

    class TurntableCamera:
        def __init__(self, fov=None, distance=None):
            self.linked = []

        def link(self, other):
            self.linked.append(other)

    class PanZoomCamera:
        def __init__(self, aspect=1):
            pass

        def set_range(self, margin=0):
            pass

    class Markers:
        def __init__(self, parent=None):
            self.data = None
            record.setdefault("markers", []).append(self)

        def set_data(self, pos, face_color=None, size=None,
                     edge_width=None):
            assert pos.ndim == 2 and pos.shape[1] == 3
            assert face_color.shape[0] == pos.shape[0]
            self.data = (pos, face_color)

    class Image:
        def __init__(self, parent=None, method=None):
            self.img = None
            record.setdefault("images", []).append(self)

        def set_data(self, img):
            assert img.ndim == 3 and img.dtype == np.uint8
            self.img = img

    scene_mod.SceneCanvas = SceneCanvas
    scene_mod.TurntableCamera = TurntableCamera
    scene_mod.PanZoomCamera = PanZoomCamera
    scene_mod.visuals = types.SimpleNamespace(Markers=Markers, Image=Image)
    app_mod.quit = lambda: record.__setitem__("quit", True)
    app_mod.run = lambda: record.__setitem__("ran", True)
    vispy.scene = scene_mod
    vispy.app = app_mod
    return {"vispy": vispy, "vispy.scene": scene_mod,
            "vispy.app": app_mod}


def test_interactive_shell_executes(monkeypatch, synthetic_dataset,
                                    small_spec):
    """Run InteractiveViewer (interactive.py:166-246) against a fake vispy:
    construction, key handling, frame stepping, drawing, quit."""
    from lidar_transfer_tpu.interactive import InteractiveViewer

    record = {}
    for name, mod in _fake_vispy(record).items():
        monkeypatch.setitem(sys.modules, name, mod)

    cfg = TransferConfig()
    seq = KittiSequence.open(synthetic_dataset)
    load_count = [0]

    def load_payload(idx):
        load_count[0] += 1
        pts, rem, lbl = seq.read(idx)
        cap = kitti.scan_capacity(len(pts))
        p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
        ri = P.range_project(
            jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
            jnp.asarray(m), H=small_spec.H, W=small_spec.W,
            fov_up_deg=small_spec.fov_up,
            fov_down_deg=small_spec.fov_down)
        virtual = types.SimpleNamespace(
            range=ri.range, remission=ri.remission, label=ri.label,
            points=P.reverse_project(ri, fov_up_deg=small_spec.fov_up,
                                     fov_down_deg=small_spec.fov_down),
            mask=ri.mask)
        return frame_payload(ri, cfg, virtual=virtual,
                             source_points=pts, source_labels=lbl)

    viewer = InteractiveViewer(3, load_payload, start=0)
    # construction drew frame 0: 2 canvases, both markers fed, one image
    # visual per row + diff, metrics title on the 2D canvas
    assert len(record["canvases"]) == 2
    assert all(m.data is not None for m in record["markers"])
    assert len(record["images"]) == 7          # 6 rows + diff
    assert all(im.img is not None for im in record["images"])
    assert viewer.canvas2d.title.startswith("IoU ")
    assert len(record["handlers"]) == 2        # key_press on both canvases
    upd0 = record["updates"]

    ev = types.SimpleNamespace
    viewer._on_key(ev(key="N"))                # next frame -> redraw
    assert viewer.stepper.index == 1
    assert record["updates"] > upd0
    viewer._on_key(ev(key="b"))                # back
    assert viewer.stepper.index == 0
    loads_before = load_count[0]
    viewer._on_key(ev(key="2"))                # view mode toggle
    assert viewer.stepper.view_mode == 2
    # view modes gate marker visibility (1=src, 2=virtual, 3=both) and
    # must NOT re-run the payload load (a full transfer per keypress)
    assert not viewer.mark_src.visible and viewer.mark_virt.visible
    viewer._on_key(ev(key="1"))
    assert viewer.mark_src.visible and not viewer.mark_virt.visible
    viewer._on_key(ev(key="3"))
    assert viewer.mark_src.visible and viewer.mark_virt.visible
    assert load_count[0] == loads_before
    viewer._on_key(ev(key=None))               # ignored
    viewer._on_key(ev(key="x"))                # unbound: ignored
    assert "quit" not in record
    viewer._on_key(ev(key="Q"))
    assert record["quit"] is True
    viewer.run()
    assert record["ran"] is True
