"""Grid search: number_of_scans x voxel_size (x sequences), in-process.

Rebuild of ``experiments/grid_search_nframes_voxelsize.py`` (reference
:41-113). The reference mutated the YAML config on disk (`change_config`,
:9-15), subprocessed ``lidar_deform.py --one_scan -b`` per cell (:73-80),
and parsed IoU/Acc/MSE from stdout by line offset (:83-89, with the offset
depending on the adaption — a fragile, load-bearing print-order contract).
Here each cell calls the TransferEngine directly and metrics come back as
values; results are written as JSON and rendered as SVG heat maps like the
reference's plots (:102-111).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _compare_one(seq, eng, cfg, capacity, idx, vs_range, vs_label, vs_rem):
    """IoU/Acc/MSE of one virtual scan vs its source scan."""
    import jax.numpy as jnp

    from lidar_transfer_tpu.datasets import kitti
    from lidar_transfer_tpu.metrics import compare_scans
    from lidar_transfer_tpu.ops import projection as P

    pts, rem, lbl = seq.read(idx)
    p, r, l, m = kitti.pad_points(pts, rem, lbl, capacity)
    m = P.mask_classes(jnp.asarray(l), jnp.asarray(m), cfg.ignore_classes)
    src = P.range_project(
        jnp.asarray(p), jnp.asarray(r), jnp.asarray(l), m,
        H=eng.source.H, W=eng.source.W, fov_up_deg=eng.source.fov_up,
        fov_down_deg=eng.source.fov_down, beam_angles=eng.s_beam_angles)
    res = compare_scans(src.label, src.mask, src.range,
                        jnp.maximum(src.remission, 0.0),
                        vs_label, vs_range, vs_rem)
    return float(res.mean_iou), float(res.mean_acc), float(res.mse)


def evaluate_transfer(dataset: str, cfg, sequence: str = "00",
                      offset: int = 0, frames: int = 1,
                      target_yaml: str | None = None,
                      fixed_bounds: bool = False,
                      mesh=None, mesh_attrs: str = "fold") -> dict:
    """Run the transfer on `frames` scans and return mean IoU/Acc/MSE.

    One in-process equivalent of a reference grid-search cell
    (grid_search_nframes_voxelsize.py:73-89).

    ``mesh``: optional jax.sharding.Mesh — the cell's frames run
    device-parallel (one frame per device via
    ``parallel.frame_parallel_transfer``; implies fixed_bounds) instead of
    sequentially. The reference's only batch parallelism was 11 sequential
    shell processes (experiments/run_lidar_deform.sh).
    """
    import jax
    import jax.numpy as jnp

    from lidar_transfer_tpu.config import SensorSpec
    from lidar_transfer_tpu.datasets import kitti
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window
    from lidar_transfer_tpu.pipeline.multiscan import (max_end_index,
        min_start_index)

    source = SensorSpec.from_yaml(os.path.join(dataset, "config.yaml"))
    target = (SensorSpec.from_yaml(target_yaml) if target_yaml else source)
    seq = KittiSequence.open(dataset, sequence)
    capacity = kitti.scan_capacity(
        max(os.path.getsize(f) // 16 for f in seq.scan_files))
    eng = TransferEngine(source, target, cfg, capacity,
                         fixed_bounds=fixed_bounds or mesh is not None,
                         mesh_attrs=mesh_attrs)

    idx0 = max(offset, min_start_index(cfg.number_of_scans))
    end = max_end_index(cfg.number_of_scans, len(seq))
    indices = [idx0 + k for k in range(frames) if idx0 + k < end]
    same_dims = (source.H, source.W) == (target.H, target.W)
    ious, accs, mses = [], [], []
    t0 = time.time()

    if mesh is not None and indices:
        if cfg.adaption != "mergemesh":
            raise ValueError("device-parallel cells support mergemesh only")
        from lidar_transfer_tpu.parallel.sharding import (
            frame_parallel_transfer, stack_windows)

        n_dev = mesh.shape["data"]
        wins = [load_window(seq, cfg, i, capacity) for i in indices]
        # pad the batch up to a device multiple; padded frames are dropped
        pad = (-len(wins)) % n_dev
        batch = stack_windows(wins + [wins[-1]] * pad)
        rng_b, lbl_b, rem_b, _, _ = frame_parallel_transfer(
            eng, batch, mesh=mesh)
        jax.block_until_ready(rng_b)
        n_done = len(indices)
        if same_dims:
            for k, idx in enumerate(indices):
                i, a, m_ = _compare_one(seq, eng, cfg, capacity, idx,
                                        rng_b[k], lbl_b[k], rem_b[k])
                ious.append(i)
                accs.append(a)
                mses.append(m_)
    else:
        n_done = 0
        for idx in indices:
            window = load_window(seq, cfg, idx, capacity)
            if cfg.adaption == "cp":
                # exact per-frame cp path (matches the CLI): the fused
                # _cp_core_fast body re-rounds FMAs and flips ~1.7% of
                # boundary pixels, silently shifting the quality surface
                vs, _ = eng.transfer(window)
            else:
                # production throughput path (body frame_parallel runs)
                vs = eng.transfer_fast(window)
            if same_dims:
                i, a, m_ = _compare_one(seq, eng, cfg, capacity, idx,
                                        vs.range, vs.label, vs.remission)
                ious.append(i)
                accs.append(a)
                mses.append(m_)
            # fetch-sync, not just block_until_ready: before a process's
            # first device->host transfer the barrier is an async ACK on
            # this runtime (CLAUDE.md) — a cross-dims cell (no metric
            # fetches) would record dispatch rate
            np.asarray(jax.device_get(vs.range[:1, :1]))
            n_done += 1
    dt = time.time() - t0
    # NOTE: grid cells are QUALITY measurements; scans_per_sec here
    # includes per-frame metric fetches (~30 ms round trips when
    # same_dims) and is informational only — bench.py owns throughput
    out = {"frames": n_done, "seconds": dt,
           "scans_per_sec": n_done / max(dt, 1e-9)}
    if ious:
        out.update(iou=float(np.mean(ious)), acc=float(np.mean(accs)),
                   mse=float(np.mean(mses)))
    return out


def grid_search(dataset: str, *, frames_list=(1, 2, 3),
                voxel_sizes=(0.25, 0.1, 0.05), sequences=("00",),
                offset: int = 0, frames_per_cell: int = 1,
                adaption: str = "mergemesh", base_cfg=None,
                target_yaml: str | None = None,
                out_dir: str | None = None, verbose: bool = True,
                mesh=None, mesh_attrs: str = "fold") -> dict:
    """Sweep number_of_scans x voxel_size over sequences.

    Returns {"cells": [...], "grid": {...}} and, with ``out_dir``, writes
    ``grid_search.json`` + ``heatmap_{iou,acc,mse}.svg``
    (≡ reference plots, grid_search_nframes_voxelsize.py:96-111).

    ``mesh``: optional device mesh — each cell's frames run one-per-device
    (see ``evaluate_transfer``).
    """
    import dataclasses

    from lidar_transfer_tpu.config import TransferConfig

    base = base_cfg or TransferConfig()
    cells = []
    for nscans in frames_list:
        for voxel in voxel_sizes:
            cfg = dataclasses.replace(base, adaption=adaption,
                                      number_of_scans=int(nscans),
                                      voxel_size=float(voxel))
            per_seq = []
            for seq in sequences:
                r = evaluate_transfer(dataset, cfg, sequence=seq,
                                      offset=offset,
                                      frames=frames_per_cell,
                                      target_yaml=target_yaml,
                                      mesh=mesh, mesh_attrs=mesh_attrs)
                per_seq.append(r)
            cell = {"number_of_scans": int(nscans),
                    "voxel_size": float(voxel),
                    "sequences": {s: r for s, r in zip(sequences, per_seq)}}
            for key in ("iou", "acc", "mse", "scans_per_sec"):
                vals = [r[key] for r in per_seq if key in r]
                if vals:
                    cell[key] = float(np.mean(vals))
                    if len(vals) > 1:
                        # scene-variance columns (VERDICT r4 #3): the
                        # analog of the reference's 11-sequence mean —
                        # quality claims carry a spread, not a point
                        cell[key + "_std"] = float(np.std(vals))
                        cell[key + "_min"] = float(np.min(vals))
                        cell[key + "_max"] = float(np.max(vals))
            cells.append(cell)
            if verbose:
                msg = ", ".join(f"{k}={cell[k]:.4f}"
                                for k in ("iou", "acc", "mse") if k in cell)
                print(f"nscans={nscans} voxel={voxel}: {msg}")

    result = {"grid": {"frames_list": list(frames_list),
                       "voxel_sizes": list(voxel_sizes),
                       "sequences": list(sequences),
                       "adaption": adaption,
                       # device-parallel cells imply fixed config-bounds
                       # volumes (no per-frame cloud clipping) — quality
                       # surfaces are only comparable within one mode
                       "device_parallel": mesh is not None,
                       "fixed_bounds": mesh is not None,
                       # cp cells run the exact per-frame transfer();
                       # everything else runs the fused fast body
                       "transfer_path": ("exact" if adaption == "cp"
                                         else "fast"),
                       "mesh_attrs": mesh_attrs},
              "cells": cells}
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "grid_search.json"), "w") as f:
            json.dump(result, f, indent=2)
        for metric in ("iou", "acc", "mse"):
            if any(metric in c for c in cells):
                _heatmap(result, metric,
                         os.path.join(out_dir, f"heatmap_{metric}.svg"))
    return result


def _heatmap(result: dict, metric: str, out_file: str) -> None:
    """Render a frames x voxel heat map (≡ reference `plot`, :18-38)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print(f"matplotlib unavailable - skipping plot {out_file}")
        return

    frames = result["grid"]["frames_list"]
    voxels = result["grid"]["voxel_sizes"]
    data = np.full((len(frames), len(voxels)), np.nan)
    for c in result["cells"]:
        if metric in c:
            i = frames.index(c["number_of_scans"])
            j = voxels.index(c["voxel_size"])
            data[i, j] = c[metric]
    fig, ax = plt.subplots(figsize=(1.2 * len(voxels) + 2,
                                    0.8 * len(frames) + 2))
    im = ax.imshow(data, cmap="viridis", aspect="auto")
    ax.set_xticks(range(len(voxels)), [str(v) for v in voxels])
    ax.set_yticks(range(len(frames)), [str(f) for f in frames])
    ax.set_xlabel("voxel size [m]")
    ax.set_ylabel("number of scans")
    ax.set_title(metric)
    for i in range(len(frames)):
        for j in range(len(voxels)):
            if np.isfinite(data[i, j]):
                ax.text(j, i, f"{data[i, j]:.3f}", ha="center",
                        va="center", color="white", fontsize=8)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(out_file)
    plt.close(fig)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser("lt-grid-search")
    p.add_argument("--dataset", "-d", required=True)
    p.add_argument("--sequences", "-s", nargs="+", default=["00"])
    p.add_argument("--frames-list", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--voxel-sizes", type=float, nargs="+",
                   default=[0.25, 0.1, 0.05])
    p.add_argument("--frames-per-cell", type=int, default=1)
    p.add_argument("--offset", "-o", type=int, default=0)
    p.add_argument("--adaption", default="mergemesh")
    p.add_argument("--mesh-attrs", default="fold",
                   choices=["fold", "volume"],
                   help="mesh-adaption band attributes: pixel-wise fold "
                        "(volume-free) or the materialized volume probe")
    p.add_argument("--target", "-t", default=None)
    p.add_argument("--out", default="grid_out/")
    p.add_argument("--config", "-c", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--device-parallel", action="store_true",
                   help="run each cell's frames one-per-device over the "
                        "available mesh (mergemesh only)")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()

    mesh = None
    if args.device_parallel:
        from lidar_transfer_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(model=1)       # all devices on the frame axis

    base = (TransferConfig.from_yaml(args.config) if args.config
            else None)
    grid_search(args.dataset, frames_list=args.frames_list,
                voxel_sizes=args.voxel_sizes, sequences=args.sequences,
                offset=args.offset, frames_per_cell=args.frames_per_cell,
                adaption=args.adaption, base_cfg=base,
                target_yaml=args.target, out_dir=args.out, mesh=mesh,
                mesh_attrs=args.mesh_attrs)
    print(f"results in {args.out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
