"""Multi-host (DCN) input pipeline for frame-parallel transfer.

SURVEY.md §5: the reference scales batch jobs by launching 11 sequential
shell processes (experiments/run_lidar_deform.sh) with no IPC beyond
stdout. The TPU-native equivalent: every host process joins one
``jax.distributed`` job, loads ONLY the frames whose global shard lives on
its own devices (the DCN-side input pipeline — disk IO never crosses
hosts), assembles a globally-sharded ScanWindow batch with
``jax.make_array_from_process_local_data``, and runs the SAME
frame-parallel transfer as single-host (parallel/sharding.py) — the frame
axis is embarrassingly parallel, so only metric reductions (psum'd
confusion matrices) ever ride DCN.

Dryrun: ``python -m lidar_transfer_tpu.parallel.multihost --process-id I
--num-processes N ...`` runs one process of an N-process CPU job
(gloo collectives); tests/test_multihost.py launches two and checks the
globally-assembled outputs against a single-process run.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, *, cpu_devices_per_process: int | None = None):
    """Join a jax.distributed job. MUST run before any jax backend use.

    cpu_devices_per_process: force N virtual CPU devices on this process
    (test/dryrun mode; uses gloo for cross-process CPU collectives).
    """
    import os

    if cpu_devices_per_process is not None:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{cpu_devices_per_process}").strip()
    import jax

    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        # AUTHORITATIVE count: an inherited XLA_FLAGS that already
        # carries xla_force_host_platform_device_count (e.g. the test
        # conftest's 8) would otherwise win silently and double every
        # process's share of the global mesh
        jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    if cpu_devices_per_process is not None:
        local = jax.local_devices()
        if len(local) != cpu_devices_per_process:
            raise RuntimeError(
                f"requested {cpu_devices_per_process} CPU devices per "
                f"process but this process has {len(local)} — check "
                "XLA_FLAGS / backend-initialization order")
    return jax


def global_data_mesh():
    """(n_global_devices, 1) mesh with ("data", "model") axes — the layout
    frame_parallel_transfer expects — over ALL devices of the job."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    return Mesh(devs.reshape(len(devs), 1), ("data", "model"))


def joint_mesh(model: int = 2):
    """Global mesh over ALL devices of the job with a nontrivial model
    axis — the layout the sharded-volume path (integrate_sharded /
    splat_synthesize_sharded) shards its X slabs over. In a multi-process
    job the mesh spans hosts, so slab collectives ride DCN."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    if len(devs) % model:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"model={model}")
    return Mesh(devs.reshape(len(devs) // model, model),
                ("data", "model"))


def sharded_volume_parity(mesh, *, slab_x: int = 8, seed: int = 7):
    """X-sharded fusion + sharded synthesis on ``mesh`` — which may span
    multiple PROCESSES — asserted bit-identical to a single-device
    reference computed locally (VERDICT r4 #6: multihost × sharded-volume
    composition; the scale-out TODO at
    /root/reference/auxiliary/fusion_lidar.py:45).

    Builds the volume state as a GLOBAL array via jit out_shardings
    (``device_put`` cannot target non-addressable devices of a
    multi-process job) and replicates the scan inputs with
    ``make_array_from_process_local_data``; every process then executes
    the same SPMD fusion + band-probe/pmin/psum synthesis, and each
    process independently checks the replicated outputs against its own
    local single-device run. Returns a stats dict.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lidar_transfer_tpu.ops import raycast as RC
    from lidar_transfer_tpu.ops import tsdf as TS
    from lidar_transfer_tpu.ops.splat import splat_synthesize
    from lidar_transfer_tpu.parallel.sharding import (
        integrate_sharded, splat_synthesize_sharded)

    n_shards = mesh.shape["data"] * mesh.shape["model"]
    # voxel 0.25 is exact in f32; the slab-boundary ownership class of
    # bug is separately pinned at non-dyadic 0.05 in tests/test_parallel
    spec = TS.VolumeSpec(origin=(-8.0, -8.0, -2.0), voxel_size=0.25,
                         dims=(slab_x * n_shards, 64, 16))
    H, W = 16, 64
    rng = np.random.default_rng(seed)
    depth = (rng.random((H, W)) * 6 + 0.5).astype(np.float32)
    label = rng.choice(np.array([10, 40, 50], np.int32), size=(H, W))
    rem = rng.random((H, W)).astype(np.float32)

    vol_sh = NamedSharding(mesh, P(("data", "model"), None, None))
    state = jax.jit(
        spec.init_state,
        out_shardings=TS.TSDFState(vol_sh, vol_sh, vol_sh, vol_sh))()

    rep = NamedSharding(mesh, P())

    def replicate(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(rep, x, x.shape)

    state = integrate_sharded(state, spec, mesh, replicate(depth),
                              replicate(label), replicate(rem),
                              fov_up_deg=30.0, fov_down_deg=-30.0)

    rays = np.asarray(RC.generate_rays(H, W, 30.0, -30.0), np.float32)
    d_flat = depth.reshape(-1)
    pts = rays * d_flat[:, None]
    out_s = splat_synthesize_sharded(
        state, spec, mesh,
        [(replicate(d_flat), replicate(pts), replicate(d_flat > 0))],
        target_H=H, target_W=W, fov_up_deg=30.0, fov_down_deg=-30.0)

    # local single-device oracle — every process checks independently
    state1 = TS.integrate(spec.init_state(), spec, jnp.asarray(depth),
                          jnp.asarray(label), jnp.asarray(rem),
                          fov_up_deg=30.0, fov_down_deg=-30.0)
    out_1 = splat_synthesize(
        state1, spec,
        [(d_flat, pts, d_flat > 0, np.zeros_like(d_flat),
          np.zeros_like(d_flat))],
        target_H=H, target_W=W, fov_up_deg=30.0, fov_down_deg=-30.0,
        vol_origin=spec.origin, attrs="volume", label_probe=False)

    names = ("range", "label", "remission", "endpoints", "mask")
    for name, a, b in zip(names, out_s, out_1):
        ga = np.asarray(a.addressable_shards[0].data)
        if not np.array_equal(ga, np.asarray(b)):
            raise AssertionError(
                f"sharded-volume {name} differs from single-device "
                f"(mesh {dict(mesh.shape)}, {n_shards} X-slabs)")
    hit = float(np.asarray(out_s[4].addressable_shards[0].data).mean())
    if hit <= 0.0:
        raise AssertionError("sharded synthesis produced no hits")
    return {"hit": hit, "n_shards": n_shards, "dims": spec.dims}


def local_frame_indices(frame_indices, mesh) -> list[int]:
    """The subset of the global frame batch THIS process must load.

    The batch axis is sharded over the mesh's "data" axis in device order;
    a frame is local iff its device belongs to this process.
    """
    import jax

    n_dev = mesh.shape["data"]
    if len(frame_indices) % n_dev:
        raise ValueError(f"batch {len(frame_indices)} not divisible by "
                         f"{n_dev} devices")
    per_dev = len(frame_indices) // n_dev
    pid = jax.process_index()
    # a P("data") shard is replicated over the model axis: a process
    # owning ANY device of data-row d must back shard d (checking only
    # column 0 skipped processes that own other model columns)
    return [frame_indices[d * per_dev + k]
            for d in range(mesh.devices.shape[0])
            if any(dev.process_index == pid for dev in mesh.devices[d])
            for k in range(per_dev)]


def load_global_windows(seq, cfg, frame_indices, capacity: int, mesh):
    """Per-host loading -> one globally-sharded batched ScanWindow.

    Each process reads only ``local_frame_indices(frame_indices, mesh)``
    from disk; the returned ScanWindow's arrays are global jax.Arrays
    sharded P("data") over the mesh (addressable shards backed by the
    local reads — nothing is gathered).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lidar_transfer_tpu.pipeline.multiscan import ScanWindow, load_window

    local = [load_window(seq, cfg, i, capacity)
             for i in local_frame_indices(frame_indices, mesh)]
    if not local:
        raise ValueError("this process owns no frames — shrink the mesh "
                         "or grow the batch")
    B = len(frame_indices)

    def assemble(name):
        stacked = np.stack([np.asarray(getattr(w, name)) for w in local])
        sharding = NamedSharding(mesh, P("data"))
        return jax.make_array_from_process_local_data(
            sharding, stacked, (B,) + stacked.shape[1:])

    return ScanWindow(
        points=assemble("points"),
        remissions=assemble("remissions"),
        labels=assemble("labels"),
        valid=assemble("valid"),
        rel_pose=assemble("rel_pose"),
        primary_index=0)


def _dryrun_main(argv=None) -> int:
    """One process of an N-process CPU dryrun: DCN-side loading + global
    frame-parallel transfer + cross-host psum'd confusion matrix."""
    import argparse

    p = argparse.ArgumentParser("lt-multihost-dryrun")
    p.add_argument("--coordinator", default="localhost:12788")
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--devices-per-process", type=int, default=4)
    p.add_argument("--dataset", default=None,
                   help="KITTI-layout tree (required unless "
                        "--sharded-volume, which generates its own "
                        "synthetic inputs)")
    p.add_argument("--out", default=None,
                   help="process 0 writes assembled outputs here (.npz)")
    p.add_argument("--sharded-volume", action="store_true",
                   help="run the multihost x sharded-volume composition "
                        "instead of frame-parallel transfer: X-sharded "
                        "fusion + sharded synthesis across the joint "
                        "(data, model=2) mesh spanning all hosts, "
                        "asserted bit-identical to single-device")
    args = p.parse_args(argv)
    if not args.sharded_volume and args.dataset is None:
        p.error("--dataset is required for the frame-parallel dryrun")

    jax = initialize(args.coordinator, args.num_processes, args.process_id,
                     cpu_devices_per_process=args.devices_per_process)
    import jax.numpy as jnp

    if args.sharded_volume:
        mesh = joint_mesh(model=2)
        stats = sharded_volume_parity(mesh)
        print(f"process {jax.process_index()}: SHARDED-VOLUME OK "
              f"mesh data={mesh.shape['data']} model={mesh.shape['model']} "
              f"({stats['n_shards']} X-slabs over {args.num_processes} "
              f"hosts), hit {stats['hit']:.3f}, bit-identical to "
              "single-device", flush=True)
        if args.out and jax.process_index() == 0:
            np.savez(args.out, hit=stats["hit"],
                     n_shards=stats["n_shards"])
        print(f"process {jax.process_index()}: OK", flush=True)
        return 0

    from lidar_transfer_tpu.config import SensorSpec, TransferConfig
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.parallel.sharding import (
        frame_parallel_transfer, sharded_confusion)
    from lidar_transfer_tpu.pipeline import TransferEngine

    seq = KittiSequence.open(args.dataset)
    source = SensorSpec.from_yaml(f"{args.dataset}/config.yaml")
    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.25,
                         voxel_bounds=((-16.0, 16.0), (-16.0, 16.0),
                                       (-4.0, 4.0)))
    mesh = global_data_mesh()
    n_frames = mesh.shape["data"]
    frame_indices = [i % len(seq) for i in range(n_frames)]
    capacity = 8192

    windows = load_global_windows(seq, cfg, frame_indices, capacity, mesh)
    eng = TransferEngine(source, source, cfg, capacity, fixed_bounds=True)
    rng, lbl, rem, ends, mask = frame_parallel_transfer(eng, windows,
                                                        mesh=mesh)

    # cross-host DCN psum: global confusion of virtual labels vs a shifted
    # copy (content is irrelevant — the reduction crossing hosts is the
    # point)
    conf_fn = sharded_confusion(mesh, n_classes=32)
    flat = jnp.clip(lbl.reshape(n_frames, -1), 0, 31)
    conf = conf_fn(flat, jnp.roll(flat, 1, axis=1))
    total = int(jax.device_get(conf).sum())
    hit = float(jax.device_get(
        jax.jit(lambda m: m.mean(),
                out_shardings=jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))(mask)))
    print(f"process {jax.process_index()}: {n_frames} frames over "
          f"{len(jax.devices())} devices on {args.num_processes} hosts, "
          f"hit rate {hit:.3f}, confusion total {total}", flush=True)
    assert total == flat.size, "psum'd confusion lost pixels"
    assert hit > 0.05, "frame-parallel transfer produced nothing"

    if args.out and jax.process_index() == 0:
        np.savez(args.out, hit=hit, conf_total=total,
                 range0=np.asarray(
                     jax.device_get(rng.addressable_shards[0].data)))
    print(f"process {jax.process_index()}: OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(_dryrun_main())
