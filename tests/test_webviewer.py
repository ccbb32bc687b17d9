"""Standalone HTML viewer export (webviewer.py) — the executable rebuild
of the reference's LaserScanVis (auxiliary/laserscanvis.py:11-373)."""

import base64
import io
import json
import os
import re
import types

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_transfer_tpu.config import TransferConfig
from lidar_transfer_tpu.datasets import kitti
from lidar_transfer_tpu.datasets.kitti import KittiSequence
from lidar_transfer_tpu.interactive import frame_payload
from lidar_transfer_tpu.ops import projection as P
from lidar_transfer_tpu import webviewer
from lidar_transfer_tpu.webviewer import (DEFAULT_CAM, export_html,
                                          png_bytes, reference_render)


def _payload(synthetic_dataset, small_spec, idx=1, with_virtual=True):
    cfg = TransferConfig()
    seq = KittiSequence.open(synthetic_dataset)
    pts, rem, lbl = seq.read(idx)
    cap = kitti.scan_capacity(len(pts))
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=small_spec.H, W=small_spec.W,
                         fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    virtual = None
    if with_virtual:
        back = P.reverse_project(ri, fov_up_deg=small_spec.fov_up,
                                 fov_down_deg=small_spec.fov_down)
        virtual = types.SimpleNamespace(
            range=ri.range, remission=ri.remission, label=ri.label,
            points=back, mask=ri.mask)
    return pts, frame_payload(ri, cfg, virtual=virtual, source_points=pts,
                              source_labels=lbl)


def _frames_json(path):
    with open(path) as f:
        doc = f.read()
    m = re.search(r"^const FRAMES = (.*);$", doc, re.M)
    assert m, "FRAMES payload not found in the HTML"
    return doc, json.loads(m.group(1))


def test_png_bytes_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (7, 13, 3), np.uint8)
    data = png_bytes(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    import matplotlib.image as mpimg

    back = mpimg.imread(io.BytesIO(data))       # float32 in [0, 1]
    assert back.shape[:2] == (7, 13)
    np.testing.assert_array_equal(
        np.round(back[..., :3] * 255).astype(np.uint8), img)


def test_png_bytes_rejects_bad_shape():
    with pytest.raises(ValueError):
        png_bytes(np.zeros((4, 4), np.uint8))


def test_export_html_structure(tmp_path, synthetic_dataset, small_spec):
    pts0, pay0 = _payload(synthetic_dataset, small_spec, idx=1)
    _, pay1 = _payload(synthetic_dataset, small_spec, idx=2)
    out = str(tmp_path / "viewer.html")
    export_html([("f1", pay0), ("f2", pay1)], out, title="t — test")

    doc, frames = _frames_json(out)
    assert doc.lstrip().startswith("<!doctype html")
    assert json.dumps("t — test") in doc
    assert "WebGL" in doc and "window.viewer" in doc
    assert len(frames) == 2
    rec = frames[0]
    assert rec["name"] == "f1"
    # identity virtual scan -> perfect metrics in the embedded title
    assert rec["title"].startswith("IoU 1.0000")
    # 6 rows + the diff row, each a PNG data URI
    assert [r["name"] for r in rec["rows"]] == [
        "src range", "src remission", "src labels",
        "virt range", "virt remission", "virt labels", "diff"]
    raw = base64.b64decode(rec["rows"][0]["png"].split(",", 1)[1])
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"

    # the embedded source cloud decodes back to the original points
    src = rec["src"]
    assert src["n"] == len(pts0)
    xyz = np.frombuffer(base64.b64decode(src["xyz"]), np.float32)
    np.testing.assert_allclose(xyz.reshape(-1, 3), pts0, rtol=1e-6)
    rgb = np.frombuffer(base64.b64decode(src["rgb"]), np.uint8)
    assert rgb.size == 3 * src["n"]
    assert rec["virt"] is not None and rec["virt"]["n"] > 0


def test_export_html_subsamples(tmp_path, synthetic_dataset, small_spec):
    pts, pay = _payload(synthetic_dataset, small_spec, with_virtual=False)
    assert len(pts) > 64
    out = export_html([("f", pay)], str(tmp_path / "v.html"),
                      max_points=64)
    _, frames = _frames_json(out)
    assert frames[0]["src"]["n"] == 64
    assert frames[0]["virt"] is None
    # source-only frames carry only the 3 source rows
    assert len(frames[0]["rows"]) == 3


def test_visualize_cli_html(tmp_path, synthetic_dataset):
    from lidar_transfer_tpu import visualize

    out = str(tmp_path / "seq.html")
    rc = visualize.main(["-d", synthetic_dataset, "--html", out,
                         "--frames", "2", "--offset", "1"])
    assert rc == 0
    _, frames = _frames_json(out)
    assert [f["name"] for f in frames] == ["00_000001", "00_000002"]
    assert frames[0]["src"]["n"] > 100


def _record_from(points, colors):
    """Hand-build one FRAMES record the way export_html packs clouds."""
    return {"src": webviewer._cloud(np.asarray(points, np.float32),
                                    np.asarray(colors), 10**6),
            "virt": None}


def test_reference_render_depth_test():
    """Two points on the view axis -> the NEARER one wins the pixel,
    regardless of draw order (≡ gl.enable(DEPTH_TEST) in the JS)."""
    c = DEFAULT_CAM
    eye = np.array([c["dist"] * np.cos(c["el"]) * np.cos(c["az"]),
                    c["dist"] * np.cos(c["el"]) * np.sin(c["az"]),
                    c["dist"] * np.sin(c["el"])])
    far_pt = np.zeros(3)                      # at the turntable center
    near_pt = 0.5 * eye                       # same ray, half the distance
    red, green = [255, 0, 0], [0, 255, 0]
    for order in ([far_pt, near_pt], [near_pt, far_pt]):
        cols = [red, green] if order[0] is far_pt else [green, red]
        img = reference_render(_record_from(order, np.array(cols, np.uint8)),
                               width=64, height=64)
        # both project to the screen center; near (green) must win
        hit = img[img.any(-1).nonzero()]
        assert len(hit) >= 1
        assert (hit == green).all(-1).any()
        assert not (hit == red).all(-1).any()


def test_reference_render_offscreen_culled():
    """Points behind the camera / outside the frustum never write."""
    c = DEFAULT_CAM
    eye = np.array([c["dist"] * np.cos(c["el"]) * np.cos(c["az"]),
                    c["dist"] * np.cos(c["el"]) * np.sin(c["az"]),
                    c["dist"] * np.sin(c["el"])])
    behind = 2.0 * eye                        # past the eye along the axis
    img = reference_render(
        _record_from([behind], np.array([[255, 255, 255]], np.uint8)),
        width=32, height=32, background=(0, 0, 0))
    assert not img.any()


def test_reference_render_exported_record(tmp_path, synthetic_dataset,
                                          small_spec):
    """Render the ACTUAL exported payload: decodes the same base64 the
    browser decodes; every lit pixel's color comes from the embedded
    palette and a real scan lights up a substantial area."""
    _, pay = _payload(synthetic_dataset, small_spec)
    out = export_html([("f", pay)], str(tmp_path / "v.html"))
    _, frames = _frames_json(out)
    rec = frames[0]
    bg = (9, 9, 9)
    for which in ("src", "virt"):
        img = reference_render(rec, width=320, height=200, which=which,
                               background=bg)
        lit = img[(img != bg).any(-1)]
        assert len(lit) > 500, f"{which}: only {len(lit)} lit pixels"
        palette = {tuple(c) for c in
                   np.frombuffer(base64.b64decode(rec[which]["rgb"]),
                                 np.uint8).reshape(-1, 3)}
        seen = {tuple(c) for c in lit}
        assert seen <= palette
    with pytest.raises(ValueError):
        reference_render({"src": rec["src"], "virt": None}, which="virt")


def test_template_camera_matches_default_cam():
    """DEFAULT_CAM (used by the python oracle) must equal the JS
    viewer's initial turntable camera in the template."""
    m = re.search(r"cam:\s*\{az:\s*([-\d.]+),\s*el:\s*([-\d.]+),"
                  r"\s*dist:\s*([-\d.]+),\s*cx:\s*([-\d.]+),"
                  r"\s*cy:\s*([-\d.]+),\s*cz:\s*([-\d.]+)\}",
                  webviewer._HTML_TEMPLATE)
    assert m, "viewer.cam initializer not found in template"
    az, el, dist, cx, cy, cz = map(float, m.groups())
    assert (az, el, dist) == (DEFAULT_CAM["az"], DEFAULT_CAM["el"],
                              DEFAULT_CAM["dist"])
    assert (cx, cy, cz) == tuple(DEFAULT_CAM["center"])
    # and the JS perspective/lookAt constants the oracle mirrors
    assert "perspective(45," in webviewer._HTML_TEMPLATE
    assert "0.1, 2000" in webviewer._HTML_TEMPLATE


def test_export_html_script_safe_title(tmp_path, synthetic_dataset,
                                       small_spec):
    """A title containing </script> must not break the inline script."""
    _, pay = _payload(synthetic_dataset, small_spec, with_virtual=False)
    out = export_html([("f", pay)], str(tmp_path / "v.html"),
                      title="evil </script><b>x")
    doc, frames = _frames_json(out)      # FRAMES line still parses
    assert doc.count("</script>") == 1   # only the real closing tag
    m = re.search(r"^const TITLE = (.*);$", doc, re.M)
    assert json.loads(m.group(1)) == "evil </script><b>x"
    assert frames[0]["name"] == "f"


def test_export_html_script_open_tag_in_title(tmp_path, synthetic_dataset,
                                              small_spec):
    """A literal ``<script>`` in a title/name must not crash the export
    (extract_script's exactly-one-block split) nor break the page."""
    _, pay = _payload(synthetic_dataset, small_spec, with_virtual=False)
    out = export_html([("a <script> b", pay)], str(tmp_path / "v.html"),
                      title="open <script> tag")
    doc, frames = _frames_json(out)
    assert doc.count("<script>") == 1    # only the real opening tag
    assert frames[0]["name"] == "a <script> b"
    m = re.search(r"^const TITLE = (.*);$", doc, re.M)
    assert json.loads(m.group(1)) == "open <script> tag"


def test_transfer_cli_html(tmp_path, synthetic_dataset):
    """lt-transfer --html: source vs TRANSFERRED virtual scan viewer."""
    from lidar_transfer_tpu import cli

    cfg = TransferConfig(
        adaption="mergemesh", number_of_scans=1, voxel_size=0.25,
        voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    cfg_path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(cfg_path)
    out = str(tmp_path / "transfer.html")
    rc = cli.main(["-d", synthetic_dataset, "-c", cfg_path, "-b",
                   "--one_scan", "--html", out, "--cpu",
                   "--fixed-bounds"])
    assert rc == 0
    _, frames = _frames_json(out)
    assert len(frames) == 1
    rec = frames[0]
    assert rec["virt"] is not None and rec["virt"]["n"] > 100
    # identity-dims transfer -> metrics title present (IoU from compare)
    assert rec["title"].startswith("IoU 0.") or \
        rec["title"].startswith("IoU 1.")
    assert any(r["name"] == "diff" for r in rec["rows"])
