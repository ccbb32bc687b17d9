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
