"""RangeNet segmentation harness: train / infer / eval on KITTI datasets.

Replaces the reference's external-tool chain (SURVEY.md §2.1 C15): its
``experiments/train.sh`` shells out to lidar-bonnetal's train.py/infer.py
and ``run_fake_on_fake.sh:30-35`` to semantic-kitti-api's
evaluate_semantics.py. Here the whole loop is in-framework and on-device:

  train_segmentation  range-project scans -> 5-channel features -> RangeNet
                      (flax, bf16 convs on the MXU) with masked CE; data-
                      parallel over the device mesh when >1 device.
  write_predictions   per-scan argmax -> back-mapped raw ids -> .label files
                      in semantic-kitti predictions layout (readable by
                      lt-visualize -p and by evaluate_semantics).
  evaluate_semantics  point-wise confusion over (prediction, ground-truth)
                      label files -> mIoU / acc (≡ semantic-kitti-api
                      evaluate_semantics.py semantics with our IoUEval).

Label handling: raw SemanticKITTI ids are mapped to dense train indices
via ``LabelMapper`` (built from the config's ``labels`` block). Moving
classes are folded onto their static counterparts (id-252 -> 10 etc. —
the same merge bonnetal's learning_map performs), ignore classes get
weight 0 in the loss and are excluded from the IoU mean.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

# moving -> static folds (SemanticKITTI convention)
MOVING_TO_STATIC = {252: 10, 253: 31, 254: 30, 255: 32, 256: 16, 257: 13,
                    258: 18, 259: 20}


@dataclasses.dataclass(frozen=True)
class LabelMapper:
    """Bijective-ish map raw label ids <-> dense train indices."""

    raw_ids: tuple[int, ...]          # index -> raw id (train classes)
    raw_to_index: np.ndarray          # (max_raw+1,) raw id -> index
    ignore_indices: tuple[int, ...]   # train indices excluded from loss/IoU

    @classmethod
    def from_labels(cls, labels: dict[int, str],
                    ignore_classes=(0, 1)) -> "LabelMapper":
        static_ids = sorted(k for k in labels
                            if k not in MOVING_TO_STATIC)
        max_raw = max(labels) + 1
        raw_to_index = np.zeros((max_raw,), np.int32)
        for idx, raw in enumerate(static_ids):
            raw_to_index[raw] = idx
        for moving, static in MOVING_TO_STATIC.items():
            if moving < max_raw and static in static_ids:
                raw_to_index[moving] = static_ids.index(static)
        ignore_idx = tuple(static_ids.index(c) for c in ignore_classes
                           if c in static_ids)
        return cls(raw_ids=tuple(static_ids), raw_to_index=raw_to_index,
                   ignore_indices=ignore_idx)

    @property
    def num_classes(self) -> int:
        return len(self.raw_ids)

    def to_index(self, raw: np.ndarray) -> np.ndarray:
        raw = np.clip(raw, 0, self.raw_to_index.shape[0] - 1)
        return self.raw_to_index[raw]

    def to_raw(self, index: np.ndarray) -> np.ndarray:
        lut = np.asarray(self.raw_ids, np.int32)
        return lut[np.clip(index, 0, self.num_classes - 1)]


def _frame_tensors(seq, idx, spec, capacity, mapper, cfg):
    """One scan -> (features (H,W,5), labels (H,W) idx, weights (H,W)).

    All three stay ON DEVICE: the one-time upload is the raw points; the
    projected image never round-trips to host (the original
    numpy-returning version downloaded ~2.6 MB of features per frame
    through this environment's ~42 MB/s tunnel only for the train loop
    to re-upload them — the dominant cost of a training step)."""
    import jax.numpy as jnp

    from lidar_transfer_tpu.datasets import kitti
    from lidar_transfer_tpu.models.rangenet import range_image_features
    from lidar_transfer_tpu.ops import projection as P

    pts, rem, lbl = seq.read(idx)
    p, r, l, m = kitti.pad_points(pts, rem, lbl, capacity)
    # one device_put per array: a second jnp.asarray(p) for the xyz
    # gather would re-upload ~1.7 MB/frame through the ~42 MB/s tunnel
    pj = jnp.asarray(p)
    ri = P.range_project(pj, jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=spec.H, W=spec.W,
                         fov_up_deg=spec.fov_up, fov_down_deg=spec.fov_down)
    xyz = jnp.where(ri.mask[..., None],
                    pj[jnp.maximum(ri.index, 0)], 0.0)
    feats = range_image_features(ri.range, xyz, ri.remission, ri.mask)
    lut = jnp.asarray(mapper.raw_to_index)      # tiny (<=260 entries)
    lbl_idx = lut[jnp.clip(ri.label, 0, lut.shape[0] - 1)].astype(
        jnp.int32)
    weights = ri.mask.astype(jnp.float32)
    for ig in mapper.ignore_indices:
        weights = jnp.where(lbl_idx == ig, 0.0, weights)
    return feats, lbl_idx, weights


def save_checkpoint(path: str, model, params, mapper, spec, *,
                    opt_state=None, step: int | None = None,
                    sampling: dict | None = None) -> None:
    """Serialize a trained model bundle (readable by ``load_checkpoint``
    and the lt-seg infer CLI). ``opt_state``/``step``, when given, make
    the checkpoint resumable mid-training (train_segmentation
    ``resume=True``); older checkpoints without them still load."""
    import pickle

    import jax

    # fetch to host NUMPY in one batched device_get before pickling:
    # pickle's per-jax.Array reduction fetched leaf-by-leaf through the
    # tunnel at ~1/30 line rate (measured 64 s per darknet21+adam save
    # vs ~2 s for device_get of the same tree); numpy blobs also load
    # without any device initialized
    blob = {"params": jax.device_get(params), "mapper": mapper,
            "spec": spec, "model_cfg": model.cfg}
    if opt_state is not None:
        blob["opt_state"] = jax.device_get(opt_state)
        blob["step"] = step
        if sampling is not None:
            blob["sampling"] = sampling
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """-> (model, params, mapper, spec)."""
    import pickle

    from lidar_transfer_tpu.models import RangeNet

    with open(path, "rb") as f:
        blob = pickle.load(f)
    return (RangeNet(blob["model_cfg"]), blob["params"], blob["mapper"],
            blob["spec"])


def train_segmentation(dataset: str, *, sequences=("00",), steps: int = 100,
                       batch_size: int = 1, learning_rate: float = 1e-3,
                       model_cfg=None, cfg=None, seed: int = 0,
                       width: int | None = None, verbose: bool = True,
                       use_mesh: bool = True, checkpoint_path=None,
                       checkpoint_every: int = 0, resume: bool = False):
    """Train RangeNet on a KITTI-format dataset. Returns (model, params,
    mapper, spec). ``checkpoint_every`` > 0 writes ``checkpoint_path``
    every N steps; ``resume=True`` continues a killed run from that
    checkpoint (params + opt_state + step, exact sampling sequence — the
    reference had no checkpointing at all, SURVEY.md §5)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P_

    from lidar_transfer_tpu.config import SensorSpec, TransferConfig
    from lidar_transfer_tpu.datasets import kitti
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.models import RangeNet, RangeNetConfig
    from lidar_transfer_tpu.models.rangenet import make_train_state
    from lidar_transfer_tpu.parallel import (make_mesh, sharded_train_step)

    cfg = cfg or TransferConfig()
    spec = SensorSpec.from_yaml(os.path.join(dataset, "config.yaml"))
    if width is not None:
        # fov_hor/width can float-round DOWN through SensorSpec.W's
        # reference-parity int() (344 of the first 8192 widths landed at
        # width-1); aiming the ratio at width+0.5 makes the truncation
        # yield exactly `width` for any integer width
        spec = dataclasses.replace(
            spec, angle_res_hor=spec.fov_hor / (width + 0.5))
    mapper = LabelMapper.from_labels(dict(cfg.labels),
                                     ignore_classes=cfg.ignore_classes)
    model_cfg = model_cfg or RangeNetConfig.darknet21(
        num_classes=mapper.num_classes)
    model = RangeNet(model_cfg)

    seqs = [KittiSequence.open(dataset, s) for s in sequences]
    capacity = kitti.scan_capacity(max(
        os.path.getsize(f) // 16 for sq in seqs for f in sq.scan_files))

    params, opt_state, tx = make_train_state(
        model, jax.random.PRNGKey(seed),
        (1, spec.H, spec.W, model_cfg.input_channels), learning_rate)

    start_step = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        import pickle

        with open(checkpoint_path, "rb") as f:
            blob = pickle.load(f)
        if "opt_state" not in blob:
            raise ValueError(
                f"{checkpoint_path} has no opt_state — it predates "
                "resumable checkpoints (re-save with checkpoint_every>0)")
        if blob["model_cfg"] != model_cfg:
            raise ValueError(
                f"{checkpoint_path} was trained with a different model "
                f"config ({blob['model_cfg']} != {model_cfg})")
        # "exact sampling replay" is only exact when the rng stream is
        # consumed identically: seed, batch_size, and the frame list
        # must all match the killed run (a silent mismatch would resume
        # on a divergent sample stream with no error)
        want = {"seed": seed, "batch_size": batch_size,
                "sequences": tuple(sequences), "dataset": dataset}
        have = blob.get("sampling")
        if have is not None and have != want:
            raise ValueError(
                f"{checkpoint_path} was trained with different sampling "
                f"parameters ({have} != {want}) — resuming would replay "
                "a divergent batch stream")
        params, opt_state = blob["params"], blob["opt_state"]
        start_step = int(blob["step"])
        if verbose:
            print(f"resuming from {checkpoint_path} at step {start_step}")

    n_dev = len(jax.devices())
    mesh = None
    # model=1: this trainer shards only the batch (params replicated —
    # no shard_params_tp here), so a model axis would idle half the
    # devices AND reject batch sizes not divisible by n_dev/2
    candidate = (make_mesh(model=1) if (use_mesh and n_dev > 1)
                 else None)
    if candidate is not None and batch_size % candidate.shape["data"] == 0:
        mesh = candidate
        step_fn = sharded_train_step(model, tx, mesh)
    else:
        from lidar_transfer_tpu.models.rangenet import train_step

        def step_fn(params, opt_state, batch):
            return train_step(model, tx, params, opt_state, batch)

    _sampling = {"seed": seed, "batch_size": batch_size,
                 "sequences": tuple(sequences), "dataset": dataset}
    rng = np.random.default_rng(seed)
    all_frames = [(si, fi) for si, sq in enumerate(seqs)
                  for fi in range(len(sq))]
    # replay the sampling stream up to start_step so a resumed run draws
    # the exact batches the uninterrupted run would have; then draw ALL
    # remaining picks up front so batch assembly can be prefetched
    for _ in range(start_step):
        rng.choice(len(all_frames), size=batch_size, replace=True)
    step_picks = [rng.choice(len(all_frames), size=batch_size,
                             replace=True)
                  for _ in range(start_step, steps)]

    def _load_batch(step):
        fs, ls, ws = [], [], []
        for k in step_picks[step - start_step]:
            si, fi = all_frames[k]
            f, l, w = _frame_tensors(seqs[si], fi, spec, capacity, mapper,
                                     cfg)
            fs.append(f)
            ls.append(l)
            ws.append(w)
        # device-side stack: the per-frame tensors never visit the host
        batch = dict(features=jnp.stack(fs), labels=jnp.stack(ls),
                     weights=jnp.stack(ws))
        if mesh is not None:
            batch = {k: jax.device_put(v, NamedSharding(mesh, P_("data")))
                     for k, v in batch.items()}
        return batch

    from lidar_transfer_tpu.utils.prefetch import Prefetcher

    loss = None
    with Prefetcher(_load_batch, range(start_step, steps)) as batches:
        for step, batch in batches:
            params, opt_state, loss = step_fn(params, opt_state, batch)
            # loss stays a device scalar: a per-step float() would cost a
            # full host round-trip AND serialize the async dispatch
            # stream (CLAUDE.md hot-path rule); fetch only when printing
            if verbose and (step % 10 == 0 or step == steps - 1):
                print(f"step {step}: loss {float(loss):.4f}")
            if (checkpoint_path and checkpoint_every
                    and (step + 1) % checkpoint_every == 0):
                save_checkpoint(checkpoint_path, model, params, mapper,
                                spec, opt_state=opt_state, step=step + 1,
                                sampling=_sampling)
    if checkpoint_path:
        # final state, resumable: a finished run can be extended with a
        # larger ``steps`` + ``resume=True`` (the periodic saves above
        # may lag the last step when steps % checkpoint_every != 0)
        save_checkpoint(checkpoint_path, model, params, mapper, spec,
                        opt_state=opt_state, step=max(steps, start_step),
                        sampling=_sampling)
    return model, params, mapper, spec


def write_predictions(dataset: str, out_root: str, model, params, mapper,
                      spec, *, sequences=("00",), cfg=None,
                      verbose: bool = True, batch: int = 8,
                      knn: bool = False, knn_k: int = 5,
                      knn_ksize: int = 5, knn_cutoff: float = 1.0) -> int:
    """Run inference over sequences; write semantic-kitti predictions tree.

    Per-POINT labels: each point gets the class of its range-image pixel;
    with ``knn=True`` the RangeNet++ KNN cleanup refines it (each point
    votes over the k range-nearest window neighbors — the reference's
    bonnetal infer.py post-processor; ``models/postproc.py``).
    Returns the number of scans written.

    The per-point lookup and index->raw-id mapping run on device; scan
    reads are prefetched and results are fetched as ONE stacked array
    per ``batch`` frames (each device->host read pays the full tunnel
    round trip here even when the value is ready — same batching rule
    as the CLI's --stream loop).
    """
    import jax.numpy as jnp

    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets import kitti
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.models.rangenet import (infer,
                                                    range_image_features)
    from lidar_transfer_tpu.ops import projection as P
    from lidar_transfer_tpu.utils.prefetch import Prefetcher

    cfg = cfg or TransferConfig()
    raw_lut = jnp.asarray(np.asarray(mapper.raw_ids, np.int32))
    n = 0
    for s in sequences:
        seq = KittiSequence.open(dataset, s, require_labels=False)
        capacity = kitti.scan_capacity(max(
            os.path.getsize(f) // 16 for f in seq.scan_files))
        pred_dir = os.path.join(out_root, "sequences", s, "predictions")
        os.makedirs(pred_dir, exist_ok=True)

        def _dispatch(idx):
            """-> (device (capacity,) raw-id predictions, n real points)."""
            pts, rem = kitti.read_scan_file(seq.scan_files[idx])
            p, r, l, m = kitti.pad_points(
                pts, rem, np.zeros(pts.shape[0], np.int32), capacity)
            pj = jnp.asarray(p)      # one upload (reused by the gather)
            ri = P.range_project(pj, jnp.asarray(r),
                                 jnp.asarray(l), jnp.asarray(m),
                                 H=spec.H, W=spec.W,
                                 fov_up_deg=spec.fov_up,
                                 fov_down_deg=spec.fov_down)
            xyz = jnp.where(ri.mask[..., None],
                            pj[jnp.maximum(ri.index, 0)], 0.0)
            feats = range_image_features(ri.range, xyz, ri.remission,
                                         ri.mask)
            pred_img = infer(model, params, feats[None])[0]
            if knn:
                from lidar_transfer_tpu.models.postproc import knn_cleanup

                pred_pts = knn_cleanup(
                    ri.range, pred_img, ri.mask, ri.point_depth,
                    ri.point_u, ri.point_v, ri.point_valid,
                    num_classes=mapper.num_classes, k=knn_k,
                    ksize=knn_ksize, cutoff=knn_cutoff)
            else:
                # per-point lookup through each point's pixel (flat 1-D
                # take; padded entries clip to 0, sliced off at write time)
                flat = jnp.clip(ri.point_v, 0, spec.H - 1) * spec.W \
                    + jnp.clip(ri.point_u, 0, spec.W - 1)
                pred_pts = jnp.take(pred_img.reshape(-1), flat)
            raw = raw_lut[jnp.clip(pred_pts, 0,
                                   mapper.num_classes - 1)]
            return raw, pts.shape[0]

        def _flush(pending):
            # ONE stacked device->host read for the whole batch
            raws = np.asarray(jnp.stack([r for r, _, _ in pending]))
            for (_, npts, idx), row in zip(pending, raws):
                row[:npts].astype(np.uint32).tofile(
                    os.path.join(pred_dir, f"{idx:06d}.label"))

        pending = []
        with Prefetcher(_dispatch, range(len(seq))) as frames:
            for idx, (raw, npts) in frames:
                pending.append((raw, npts, idx))
                n += 1
                if len(pending) >= batch:
                    _flush(pending)
                    pending = []
        if pending:
            _flush(pending)
        if verbose:
            print(f"sequence {s}: {len(seq)} predictions written")
    return n


def evaluate_semantics(dataset: str, predictions: str, *,
                       sequences=("00",), cfg=None) -> dict:
    """Point-wise mIoU/acc of predictions vs ground truth labels.

    ≡ semantic-kitti-api evaluate_semantics.py (driven by the reference's
    run_*.sh): confusion over all points of all scans, ignore classes
    masked from the mean.
    """
    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets import kitti
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.metrics.ioueval import IoUEval

    cfg = cfg or TransferConfig()
    mapper = LabelMapper.from_labels(dict(cfg.labels),
                                     ignore_classes=cfg.ignore_classes)
    ev = IoUEval(mapper.num_classes, ignore=list(mapper.ignore_indices))
    n_scans = 0
    for s in sequences:
        seq = KittiSequence.open(dataset, s)
        pred_dir = os.path.join(predictions, "sequences", s, "predictions")
        for idx in range(len(seq)):
            _, _, gt = seq.read(idx)
            pred = kitti.read_label_file(
                os.path.join(pred_dir, f"{idx:06d}.label"), gt.shape[0])
            ev.add_batch(mapper.to_index(pred), mapper.to_index(gt))
            n_scans += 1
    miou, per_class = ev.get_iou()
    acc = ev.get_acc()
    per = {mapper.raw_ids[i]: float(per_class[i])
           for i in range(mapper.num_classes)
           if i not in mapper.ignore_indices}
    # classes with zero ground-truth points drag ``miou`` toward 0 on
    # datasets that only exercise a subset of the label space (the
    # semantic-kitti-api mean behaves the same way); ``miou_present``
    # averages only classes that actually occur in the ground truth —
    # the scan-level compare() applies the same empty-class ignoring
    # (laserscan.py:1222-1228)
    gt_counts = np.asarray(ev.conf).sum(axis=0)
    present = [i for i in range(mapper.num_classes)
               if i not in mapper.ignore_indices and gt_counts[i] > 0]
    miou_present = (float(np.mean([float(per_class[i]) for i in present]))
                    if present else 0.0)
    return {"miou": float(miou), "miou_present": miou_present,
            "acc": float(acc), "scans": n_scans, "iou_per_class": per}


def main(argv=None) -> int:
    import argparse
    import json
    import pickle

    p = argparse.ArgumentParser("lt-seg")
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train")
    pt.add_argument("--dataset", "-d", required=True)
    pt.add_argument("--sequences", "-s", nargs="+", default=["00"])
    pt.add_argument("--steps", type=int, default=100)
    pt.add_argument("--batch-size", type=int, default=1)
    pt.add_argument("--lr", type=float, default=1e-3)
    pt.add_argument("--arch", default="darknet21",
                    choices=["darknet53", "darknet21", "tiny"],
                    help="Backbone (darknet53 = bonnetal's published "
                         "shape; darknet21 default; tiny = smoke).")
    pt.add_argument("--tiny", action="store_true",
                    help="Alias for --arch tiny (tests/smoke).")
    pt.add_argument("--remat", action="store_true",
                    help="Rematerialize encoder blocks in the backward "
                         "(less activation HBM traffic, more recompute; "
                         "checkpoint-compatible either way — "
                         "scripts/probe_train_remat.py for the A/B).")
    pt.add_argument("--out", default="seg_model.pkl")
    pt.add_argument("--save-every", type=int, default=0,
                    help="Checkpoint --out every N steps (resumable).")
    pt.add_argument("--resume", action="store_true",
                    help="Continue a killed run from --out's checkpoint.")
    pt.add_argument("--cpu", action="store_true")

    pi = sub.add_parser("infer")
    pi.add_argument("--dataset", "-d", required=True)
    pi.add_argument("--sequences", "-s", nargs="+", default=["00"])
    pi.add_argument("--model", "-m", required=True)
    pi.add_argument("--out", "-p", required=True)
    pi.add_argument("--knn", action="store_true",
                    help="RangeNet++ KNN label cleanup per point.")
    pi.add_argument("--knn-k", type=int, default=5)
    pi.add_argument("--knn-ksize", type=int, default=5)
    pi.add_argument("--knn-cutoff", type=float, default=1.0)
    pi.add_argument("--cpu", action="store_true")

    pe = sub.add_parser("eval")
    pe.add_argument("--dataset", "-d", required=True)
    pe.add_argument("--sequences", "-s", nargs="+", default=["00"])
    pe.add_argument("--predictions", "-p", required=True)
    pe.add_argument("--json", default=None)

    args = p.parse_args(argv)
    if getattr(args, "cpu", False):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.cmd == "train":
        from lidar_transfer_tpu.models import RangeNetConfig

        from lidar_transfer_tpu.config import TransferConfig

        arch = "tiny" if args.tiny else args.arch
        mapper = LabelMapper.from_labels(dict(TransferConfig().labels))
        model_cfg = getattr(RangeNetConfig, arch)(
            num_classes=mapper.num_classes)
        if args.remat:
            model_cfg = dataclasses.replace(model_cfg, remat=True)
        model, params, mapper, spec = train_segmentation(
            args.dataset, sequences=tuple(args.sequences),
            steps=args.steps, batch_size=args.batch_size,
            learning_rate=args.lr, model_cfg=model_cfg,
            checkpoint_path=args.out, checkpoint_every=args.save_every,
            resume=args.resume)
        print(f"model written to {args.out}")
    elif args.cmd == "infer":
        model, params, mapper, spec = load_checkpoint(args.model)
        n = write_predictions(args.dataset, args.out, model,
                              params, mapper, spec,
                              sequences=tuple(args.sequences),
                              knn=args.knn, knn_k=args.knn_k,
                              knn_ksize=args.knn_ksize,
                              knn_cutoff=args.knn_cutoff)
        print(f"{n} scans inferred")
    else:
        res = evaluate_semantics(args.dataset, args.predictions,
                                 sequences=tuple(args.sequences))
        print(f"mIoU: {res['miou']:.4f}  Acc: {res['acc']:.4f} "
              f"({res['scans']} scans)")
        if args.json:
            with open(args.json, "w") as f:
                json.dump(res, f, indent=2)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
