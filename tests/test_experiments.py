"""Experiment harness: grid search, segmentation train/infer/eval, workflows."""

import json
import os

import numpy as np
import pytest

from lidar_transfer_tpu.config import TransferConfig
from lidar_transfer_tpu.experiments import (grid_search, segmentation)
from lidar_transfer_tpu.experiments.compare_datasets import compare_datasets
from lidar_transfer_tpu.models import RangeNetConfig


def small_cfg(**kw):
    base = dict(adaption="cp", number_of_scans=1, voxel_size=0.25,
                voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    base.update(kw)
    return TransferConfig(**base)


def test_grid_search_structured(tmp_path, synthetic_dataset):
    out = str(tmp_path / "grid")
    res = grid_search(
        synthetic_dataset, frames_list=[1, 2], voxel_sizes=[0.25],
        sequences=("00",), adaption="cp", base_cfg=small_cfg(),
        out_dir=out, verbose=False)
    assert len(res["cells"]) == 2
    for cell in res["cells"]:
        assert 0.0 <= cell["iou"] <= 1.0
        assert cell["scans_per_sec"] > 0
    # structured outputs on disk (no stdout scraping)
    with open(os.path.join(out, "grid_search.json")) as f:
        loaded = json.load(f)
    assert loaded["grid"]["frames_list"] == [1, 2]
    assert os.path.exists(os.path.join(out, "heatmap_iou.svg"))


def test_grid_search_device_parallel_matches_sequential(synthetic_dataset):
    """A device-parallel cell (one frame per device over the 8-CPU mesh)
    must reproduce the sequential cell's metrics: both run the fast
    frame body; program-fusion rounding between the shard_map and
    single-frame jits may flip a few boundary pixels."""
    from lidar_transfer_tpu.experiments.grid_search import evaluate_transfer
    from lidar_transfer_tpu.parallel.sharding import make_mesh

    cfg = small_cfg(adaption="mergemesh")
    seqkw = dict(sequence="00", frames=3, fixed_bounds=True)
    seq_res = evaluate_transfer(synthetic_dataset, cfg, **seqkw)
    mesh = make_mesh(8, devices=__import__("jax").devices("cpu"))
    par_res = evaluate_transfer(synthetic_dataset, cfg, mesh=mesh, **seqkw)
    assert par_res["frames"] == seq_res["frames"] == 3
    np.testing.assert_allclose(par_res["iou"], seq_res["iou"], atol=5e-3)
    np.testing.assert_allclose(par_res["acc"], seq_res["acc"], atol=5e-3)
    np.testing.assert_allclose(par_res["mse"], seq_res["mse"], rtol=0.2)


def test_label_mapper_roundtrip():
    mapper = segmentation.LabelMapper.from_labels(
        dict(TransferConfig().labels))
    # moving classes fold onto static ones
    assert mapper.to_index(np.asarray([252]))[0] == \
           mapper.to_index(np.asarray([10]))[0]
    # static ids round-trip
    raws = np.asarray(mapper.raw_ids)
    np.testing.assert_array_equal(mapper.to_raw(mapper.to_index(raws)),
                                  raws)
    assert 0 in [mapper.raw_ids[i] for i in mapper.ignore_indices]


@pytest.fixture(scope="module")
def trained_tiny(synthetic_dataset):
    mapper = segmentation.LabelMapper.from_labels(
        dict(TransferConfig().labels))
    model_cfg = RangeNetConfig.tiny(num_classes=mapper.num_classes)
    return segmentation.train_segmentation(
        synthetic_dataset, steps=3, batch_size=1, model_cfg=model_cfg,
        verbose=False, use_mesh=False)


def test_train_tiny(trained_tiny):
    model, params, mapper, spec = trained_tiny
    assert mapper.num_classes > 20
    assert spec.H == 16


def test_train_resume_matches_straight_run(tmp_path, synthetic_dataset):
    """Kill-and-resume reproduces the uninterrupted run exactly: the
    checkpoint carries params + opt_state + step and the sampling stream
    is replayed to the resume point (SURVEY.md §5 checkpoint/resume)."""
    mapper = segmentation.LabelMapper.from_labels(
        dict(TransferConfig().labels))
    model_cfg = RangeNetConfig.tiny(num_classes=mapper.num_classes)
    kw = dict(batch_size=1, model_cfg=model_cfg, verbose=False,
              use_mesh=False, seed=7)

    _, p_straight, _, _ = segmentation.train_segmentation(
        synthetic_dataset, steps=4, **kw)

    ckpt = str(tmp_path / "ckpt.pkl")
    segmentation.train_segmentation(
        synthetic_dataset, steps=2, checkpoint_path=ckpt,
        checkpoint_every=2, **kw)
    _, p_resumed, _, _ = segmentation.train_segmentation(
        synthetic_dataset, steps=4, checkpoint_path=ckpt,
        checkpoint_every=2, resume=True, **kw)

    import jax
    for a, b in zip(jax.tree_util.tree_leaves(p_straight),
                    jax.tree_util.tree_leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # a pre-resume (opt_state-less) checkpoint is rejected, not silently
    # restarted
    model, params, _, spec = segmentation.load_checkpoint(ckpt)
    legacy = str(tmp_path / "legacy.pkl")
    segmentation.save_checkpoint(legacy, model, params, mapper, spec)
    with pytest.raises(ValueError, match="opt_state"):
        segmentation.train_segmentation(
            synthetic_dataset, steps=4, checkpoint_path=legacy,
            resume=True, **kw)

    # mismatched sampling parameters are rejected too: the replay would
    # consume the rng stream differently and silently diverge
    kw_big = dict(kw, batch_size=2)
    with pytest.raises(ValueError, match="sampling"):
        segmentation.train_segmentation(
            synthetic_dataset, steps=4, checkpoint_path=ckpt,
            resume=True, **kw_big)
    kw_seed = dict(kw, seed=8)
    with pytest.raises(ValueError, match="sampling"):
        segmentation.train_segmentation(
            synthetic_dataset, steps=4, checkpoint_path=ckpt,
            resume=True, **kw_seed)


def test_periodic_checkpoints_fire_mid_run(tmp_path, synthetic_dataset,
                                           monkeypatch):
    """``checkpoint_every=N`` must save DURING the loop (that's what lets
    a killed run resume), not only once after it finishes — regression
    for the save block falling out of the training loop."""
    mapper = segmentation.LabelMapper.from_labels(
        dict(TransferConfig().labels))
    model_cfg = RangeNetConfig.tiny(num_classes=mapper.num_classes)
    saved_steps = []
    real_save = segmentation.save_checkpoint

    def spy(path, model, params, mapper, spec, *, opt_state=None,
            step=None, **kw):
        saved_steps.append(step)
        real_save(path, model, params, mapper, spec,
                  opt_state=opt_state, step=step, **kw)

    monkeypatch.setattr(segmentation, "save_checkpoint", spy)
    segmentation.train_segmentation(
        synthetic_dataset, steps=5, batch_size=1, model_cfg=model_cfg,
        verbose=False, use_mesh=False, seed=3,
        checkpoint_path=str(tmp_path / "c.pkl"), checkpoint_every=2)
    # periodic saves after steps 2 and 4, final save at 5
    assert saved_steps == [2, 4, 5]


def test_infer_eval_cycle(tmp_path, synthetic_dataset, trained_tiny):
    model, params, mapper, spec = trained_tiny
    pred_root = str(tmp_path / "preds")
    n = segmentation.write_predictions(
        synthetic_dataset, pred_root, model, params, mapper, spec,
        verbose=False)
    assert n == 5
    pred_file = os.path.join(pred_root, "sequences", "00", "predictions",
                             "000000.label")
    assert os.path.exists(pred_file)
    pred = np.fromfile(pred_file, np.uint32)
    assert set(np.unique(pred)) <= set(mapper.raw_ids)

    res = segmentation.evaluate_semantics(synthetic_dataset, pred_root)
    assert 0.0 <= res["miou"] <= 1.0
    assert 0.0 <= res["acc"] <= 1.0
    assert res["scans"] == 5
    assert 10 in res["iou_per_class"]          # car class reported


def test_infer_with_knn_cleanup(tmp_path, synthetic_dataset, trained_tiny):
    """--knn inference path (RangeNet++ KNN postproc) writes valid labels
    and only changes points relative to the plain pixel-lookup path."""
    model, params, mapper, spec = trained_tiny
    plain_root = str(tmp_path / "plain")
    knn_root = str(tmp_path / "knn")
    segmentation.write_predictions(
        synthetic_dataset, plain_root, model, params, mapper, spec,
        sequences=("00",), verbose=False)
    n = segmentation.write_predictions(
        synthetic_dataset, knn_root, model, params, mapper, spec,
        sequences=("00",), verbose=False, knn=True)
    assert n == 5
    f = os.path.join("sequences", "00", "predictions", "000000.label")
    plain = np.fromfile(os.path.join(plain_root, f), np.uint32)
    knn = np.fromfile(os.path.join(knn_root, f), np.uint32)
    assert knn.shape == plain.shape
    assert set(np.unique(knn)) <= set(mapper.raw_ids)
    # the vote is a cleanup, not a rewrite: most points keep their label
    assert (knn == plain).mean() > 0.5


def test_evaluate_perfect_predictions(tmp_path, synthetic_dataset):
    """Ground truth copied as predictions -> mIoU == 1 on present classes."""
    from lidar_transfer_tpu.datasets import kitti

    mapper = segmentation.LabelMapper.from_labels(
        dict(TransferConfig().labels))
    pred_root = str(tmp_path / "gt_preds")
    seq = kitti.KittiSequence.open(synthetic_dataset)
    pdir = os.path.join(pred_root, "sequences", "00", "predictions")
    os.makedirs(pdir)
    for i in range(len(seq)):
        _, _, lbl = seq.read(i)
        # round-trip through the mapper like a real prediction would
        raw = mapper.to_raw(mapper.to_index(lbl)).astype(np.uint32)
        raw.tofile(os.path.join(pdir, f"{i:06d}.label"))
    res = segmentation.evaluate_semantics(synthetic_dataset, pred_root)
    assert res["acc"] > 0.999
    present = [c for c, v in res["iou_per_class"].items() if v > 0]
    for c in present:
        assert res["iou_per_class"][c] > 0.999
    # the synthetic scene exercises only a few classes: the all-classes
    # mean is dragged down by absent ones (semantic-kitti-api behavior)
    # while miou_present must be ~1 for perfect predictions
    assert res["miou_present"] > 0.999
    assert res["miou"] < res["miou_present"]


def test_compare_datasets(tmp_path, synthetic_dataset):
    out = str(tmp_path / "cmp")
    res = compare_datasets({"a": synthetic_dataset, "b": synthetic_dataset},
                           out_dir=out)
    assert res["a"] == res["b"]
    assert sum(res["a"].values()) > 1000
    assert os.path.exists(os.path.join(out, "class_histograms.json"))
    assert os.path.exists(os.path.join(out, "class_histograms.svg"))


def test_workflow_real_on_real(tmp_path, synthetic_dataset):
    from lidar_transfer_tpu.experiments.workflows import run_workflow

    mapper = segmentation.LabelMapper.from_labels(
        dict(TransferConfig().labels))
    res = run_workflow(
        "real_on_real", synthetic_dataset, str(tmp_path / "wf"),
        small_cfg(), steps=2, knn=True,
        model_cfg=RangeNetConfig.tiny(num_classes=mapper.num_classes),
        verbose=False)
    assert res["kind"] == "real_on_real"
    assert res["knn"] is True        # --knn plumbs to write_predictions
    assert 0.0 <= res["miou"] <= 1.0


def test_generate_fake_dataset(tmp_path, synthetic_dataset):
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.experiments.workflows import (
        generate_fake_dataset)

    root = generate_fake_dataset(
        synthetic_dataset, str(tmp_path / "fake"), small_cfg(),
        frames=2, verbose=False)
    seq = KittiSequence.open(root, "00")
    assert len(seq) == 2
    pts, rem, lbl = seq.read(0)
    assert pts.shape[0] > 100
    assert os.path.exists(os.path.join(root, "config.yaml"))
