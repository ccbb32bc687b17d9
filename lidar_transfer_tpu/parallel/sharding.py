"""Multi-chip scale-out: device meshes, dp+tp training, sharded TSDF.

The reference has *no* distributed parallelism at all (SURVEY.md §2.3 — one
pycuda GPU, OpenMP threads, shell-level batch fan-out). This module is the
TPU-native replacement:

  - **data parallel** scan/sequence batches via sharding the batch axis of
    the training step (the analog of `run_lidar_deform.sh`'s 11 sequential
    processes, but on one mesh with psum'd gradients handled by GSPMD);
  - **tensor parallel** conv channels for the RangeNet model (wide conv
    kernels sharded over the "model" axis);
  - **spatially sharded TSDF fusion** over the volume's X axis via
    ``shard_map`` — the exact scaling limit the reference flags at
    fusion_lidar.py:45 ("TODO Use larger voxel volume ... by spliting");
    integrate needs NO collectives (pure per-voxel gather), each shard gets
    the replicated ~0.5MB range image;
  - **psum'd confusion matrices** for evaluation across chips
    (np_ioueval's addBatch distributed over the batch axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidar_transfer_tpu.metrics.ioueval import confusion_matrix
from lidar_transfer_tpu.ops.tsdf import TSDFState, VolumeSpec, integrate


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, str] = ("data", "model"),
              devices=None, model: int | None = None) -> Mesh:
    """Mesh over available devices: model axis gets the largest factor <= 2
    unless n is a perfect split; rest is data.

    ``model``: explicit model-axis size (e.g. 1 for purely data-parallel
    consumers like frame_parallel_transfer); None = the auto policy.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            # driver dry-runs request N virtual host devices; fall back to
            # the cpu backend when the default backend is a single chip
            devices = jax.devices("cpu")
    if n_devices is not None:
        if len(devices) < n_devices:
            # a silently smaller mesh would let "validated N-way
            # scale-out" runs execute effectively unsharded
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices exist (set "
                "xla_force_host_platform_device_count for virtual CPU "
                "meshes)")
        devices = devices[:n_devices]
    n = len(devices)
    if model is None:
        model = 2 if n % 2 == 0 and n >= 2 else 1
    elif n % model:
        raise ValueError(f"{n} devices not divisible by model={model}")
    data = n // model
    dev_array = np.asarray(devices)[: data * model].reshape(data, model)
    return Mesh(dev_array, axis_names)


def shard_params_tp(params, mesh: Mesh, min_features: int = 256):
    """Tensor-parallel placement: conv kernels with a wide output-channel
    axis are sharded over the "model" axis; everything else replicated."""
    def place(x):
        if (hasattr(x, "ndim") and x.ndim == 4
                and x.shape[-1] >= min_features
                and x.shape[-1] % mesh.shape["model"] == 0):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, place(x)), params)


def sharded_train_step(model, tx, mesh: Mesh):
    """Build a jitted dp+tp training step bound to a mesh.

    Batch is sharded over "data"; params keep their (possibly tp) placement;
    GSPMD inserts the gradient psum over "data" and the activation
    collectives for the tp'd channels.
    """
    batch_sharding = dict(
        features=NamedSharding(mesh, P("data")),
        labels=NamedSharding(mesh, P("data")),
        weights=NamedSharding(mesh, P("data")),
    )

    from lidar_transfer_tpu.models.rangenet import train_step_body

    def step(params, opt_state, batch):
        return train_step_body(model, tx, params, opt_state, batch)

    return jax.jit(step, in_shardings=(None, None, batch_sharding))


def sharded_confusion(mesh: Mesh, n_classes: int):
    """shard_map'd confusion-matrix accumulation with an explicit psum over
    the data axis (SURVEY.md §2.3: ICI psum for metric reductions)."""
    from jax import shard_map

    def local(pred, target):
        cm = confusion_matrix(pred, target, n_classes)
        return jax.lax.psum(cm, axis_name="data")

    return shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P())


def shard_volume(state: TSDFState, mesh: Mesh) -> TSDFState:
    """Place the volume's X axis across ALL devices of the mesh.

    Sharding over ("data", "model") jointly: leaving the model axis
    unmentioned would REPLICATE every slab across it — on the default
    model=2 mesh that doubles per-chip HBM (2.15 GB vs 1.07 GB at the
    reference-scale 8.6 GB volume), halving the max volume this
    scale-out path exists to enable."""
    sh = NamedSharding(mesh, P(("data", "model"), None, None))
    return TSDFState(*(jax.device_put(a, sh) for a in state))


def integrate_sharded(state: TSDFState, spec: VolumeSpec, mesh: Mesh,
                      depth_im, label_im, rem_im, *,
                      fov_up_deg, fov_down_deg, obs_weight=1.0):
    """TSDF fusion with the volume X-sharded across devices.

    Each device owns an X-slab; the voxel update is purely local (gather
    from the replicated range image), so no collectives are needed — GSPMD
    keeps the sharding through the elementwise ops. The slab origin shift is
    handled inside ``integrate`` via the dynamic origin operand per shard.
    """
    from jax import shard_map

    # X is sharded over BOTH mesh axes (row-major device rank), matching
    # shard_volume — data-axis-only sharding would replicate slabs
    # across "model" and halve the achievable volume size per chip
    n_model = mesh.shape["model"]
    n_shards = mesh.shape["data"] * n_model
    X = spec.dims[0]
    if X % n_shards:
        raise ValueError(f"volume X dim {X} not divisible by {n_shards}")
    slab = X // n_shards
    slab_spec = VolumeSpec(origin=spec.origin, voxel_size=spec.voxel_size,
                           dims=(slab,) + spec.dims[1:])

    def local(st: TSDFState, d, l, r):
        shard_idx = (jax.lax.axis_index("data") * n_model
                     + jax.lax.axis_index("model"))
        # GLOBAL origin + integer x_offset, NOT a per-shard f32-shifted
        # origin: the shifted add re-rounds, so voxel world positions —
        # and through them tsdf values and band membership — would drift
        # ulps from the single-device volume at voxel sizes inexact in
        # f32 (0.05, the headline point), breaking bit-identical parity
        # (see ops.tsdf.integrate's x_offset note)
        return integrate(st, slab_spec, d, l, r,
                         fov_up_deg=fov_up_deg, fov_down_deg=fov_down_deg,
                         obs_weight=obs_weight,
                         origin=jnp.asarray(spec.origin, jnp.float32),
                         active_dims=jnp.asarray(spec.dims, jnp.int32),
                         x_offset=shard_idx * slab)

    vol_spec_x = P(("data", "model"), None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(TSDFState(vol_spec_x, vol_spec_x, vol_spec_x,
                            vol_spec_x),
                  P(), P(), P()),
        out_specs=TSDFState(vol_spec_x, vol_spec_x, vol_spec_x,
                            vol_spec_x))
    return fn(state, depth_im, label_im.astype(jnp.int32), rem_im)


@functools.lru_cache(maxsize=32)
def _band_probe_jit(mesh: Mesh, origin: tuple, voxel_size: float,
                    dims: tuple, samples_per_ray: int, label_probe: bool):
    """Jitted shard_map body for ``sharded_band_probe``, cached per
    (mesh, volume geometry) so repeated calls — one per fused source per
    frame — replay a compiled program instead of re-tracing a fresh
    closure each time.

    Cache-lifetime note (ADVICE r4): the lru_cache key holds the LIVE
    ``Mesh`` object, pinning its device references and the compiled
    executable for the process lifetime; maxsize=32 distinct
    (mesh, geometry) pairs before silent eviction+recompile. Fine at
    current usage (one mesh, a handful of geometries per run); if
    per-frame geometry ever varies, key on ``(mesh.shape, axis names)``
    instead of the Mesh instance."""
    from jax import shard_map

    from lidar_transfer_tpu.ops.splat import _band_samples

    n_model = mesh.shape["model"]
    n_shards = mesh.shape["data"] * n_model
    slab = dims[0] // n_shards
    slab_dims = (slab,) + tuple(dims[1:])

    def local(st: TSDFState, rng_flat, pts_flat, valid_flat):
        shard_idx = (jax.lax.axis_index("data") * n_model
                     + jax.lax.axis_index("model"))
        # GLOBAL origin + integer slab offset: every shard evaluates the
        # identical f32 index expression (bit-equal), so the integer
        # inside-test partitions ownership exactly — a per-shard f32
        # origin would let slab-boundary samples be claimed twice (psum
        # doubles their attributes) or dropped (see _band_samples)
        pos, t, tsdf_v, lbl, rem, found = _band_samples(
            st.tsdf, st.label, st.rem, rng_flat, pts_flat, valid_flat,
            jnp.asarray(origin, jnp.float32),
            jnp.asarray(slab_dims, jnp.float32),
            dims=slab_dims, voxel_size=voxel_size,
            samples_per_ray=samples_per_ray, label_probe=label_probe,
            x_offset=shard_idx * slab)
        tkey = jnp.where(found, t, jnp.inf)
        tmin = jax.lax.pmin(jax.lax.pmin(tkey, "model"), "data")
        win = found & (tkey == tmin)

        def merge(a):
            m = win[:, None] if a.ndim == 2 else win
            z = jnp.where(m, a, jnp.zeros((), a.dtype))
            return jax.lax.psum(jax.lax.psum(z, "model"), "data")

        found_g = merge(win.astype(jnp.int32)) > 0
        return (merge(pos), merge(t), merge(tsdf_v), merge(lbl),
                merge(rem), found_g)

    vol_spec_x = P(("data", "model"), None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(TSDFState(vol_spec_x, vol_spec_x, vol_spec_x,
                            vol_spec_x), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P()))
    return jax.jit(fn)


def sharded_band_probe(state: TSDFState, spec: VolumeSpec, mesh: Mesh,
                       rng_flat, pts_flat, valid_flat, *,
                       samples_per_ray: int = 8,
                       label_probe: bool = False):
    """Truncation-band candidates from an X-SHARDED volume (the sharded-
    volume CONSUMER, round 4 — VERDICT r3 #4).

    ``integrate_sharded`` proved the reference's scale-out TODO
    (fusion_lidar.py:45) for WRITES; this is the read side: each device
    probes band samples only where they fall inside its own X-slab
    (``ops.splat._band_samples`` on the local shard, ownership decided
    by the GLOBAL voxel index + an exact integer slab offset — see
    ``_band_samples``'s ``x_offset`` note), then the per-ray winner —
    the globally smallest in-band sample depth — is merged with one
    ``pmin`` and the winner's attributes with one ``psum`` over the mesh
    (a sample's global index lives in exactly one slab, so the masked
    sum is exact selection, no ties).
    Collective traffic is O(candidates) — a few MB — never O(voxels):
    compute rides where the volume lives; only candidate rows cross ICI.

    Args are ``_band_samples``'s flat per-source arrays (replicated).
    Returns the replicated merged candidate tuple
    (pos (N,3), t (N,), tsdf (N,), label i32 (N,), rem (N,), found (N,)).
    """
    n_shards = mesh.shape["data"] * mesh.shape["model"]
    X = spec.dims[0]
    if X % n_shards:
        raise ValueError(f"volume X dim {X} not divisible by {n_shards}")
    fn = _band_probe_jit(
        mesh, tuple(float(x) for x in np.asarray(spec.origin).reshape(-1)),
        float(spec.voxel_size), tuple(int(d) for d in spec.dims),
        int(samples_per_ray), bool(label_probe))
    return fn(state, rng_flat, pts_flat, valid_flat)


def splat_synthesize_sharded(state: TSDFState, spec: VolumeSpec,
                             mesh: Mesh, sources, *,
                             target_H: int, target_W: int,
                             fov_up_deg: float, fov_down_deg: float,
                             beam_angles=None, samples_per_ray: int = 8,
                             label_probe: bool = False):
    """Full virtual-scan synthesis from an X-sharded fused volume.

    The distributed twin of ``ops.splat.splat_synthesize(attrs="volume")``
    for volumes too large for one chip: band attributes come from
    ``sharded_band_probe`` (slab-local gathers + one pmin/psum merge);
    the target z-buffer then assembles the replicated candidate rows
    exactly like the single-device path (``_target_assemble``) — outputs
    are bit-identical to the single-device volume probe
    (tests/test_parallel.py::test_sharded_synthesis_matches_single).

    ``sources``: list of (range_flat, points_flat (N,3), valid_flat) per
    fused source image (labels/rems come from the volume).
    """
    from lidar_transfer_tpu.ops.splat import assemble_candidate_parts

    parts = [sharded_band_probe(state, spec, mesh, r, p, v,
                                samples_per_ray=samples_per_ray,
                                label_probe=label_probe)
             for (r, p, v) in sources]
    # the SAME tail as ops.splat.splat_synthesize — shared so a change
    # to the candidate columns cannot silently break the bit-identical
    # parity between the sharded and single-device paths
    return assemble_candidate_parts(
        parts, fov_up_deg=fov_up_deg, fov_down_deg=fov_down_deg,
        beam_angles=beam_angles, target_H=target_H, target_W=target_W,
        trunc=float(spec.trunc_margin))


def frame_parallel_transfer(engine, windows, mesh: Mesh | None = None):
    """Data-parallel transfer: one frame per device, each with its own
    volume.

    The reference scales batch jobs by launching 11 sequential shell
    processes (experiments/run_lidar_deform.sh); here the batch axis of
    frames is sharded over the mesh's devices and every device runs the
    full single-frame pipeline (projection -> fusion -> synthesis) on its
    shard — embarrassingly parallel, no collectives, linear scaling.

    Args:
      engine: a TransferEngine with fixed_bounds=True (the frame body must
        be pure; see pipeline/deform.py).
      windows: a ScanWindow whose arrays carry a leading batch axis of
        size n_devices * k (stack single-frame windows with
        ``stack_windows``).
      mesh: optional; defaults to all devices on one "data" axis.

    Returns (range, label, remission, points, mask) stacked over frames.
    """
    from jax.sharding import Mesh as _Mesh

    if not engine.fixed_bounds:
        raise ValueError("frame_parallel_transfer needs fixed_bounds=True")
    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = _Mesh(devs.reshape(len(devs), 1), ("data", "model"))
    n_dev = mesh.shape["data"]
    batch = windows.points.shape[0]
    if batch % n_dev:
        raise ValueError(f"batch {batch} not divisible by {n_dev} devices")

    from jax import shard_map

    from lidar_transfer_tpu.pipeline.multiscan import ScanWindow

    # static, so it can be closed over (stack_windows carries it through)
    primary_index = int(getattr(windows, "primary_index", 0) or 0)

    # the gather-free fast body needs NO volume state — at reference
    # scale the classic body allocates a 7-8.6 GB volume PER FRAME,
    # which made frame-parallel infeasible on real chips; splat engines
    # take the volume-free path (mergemesh fast body / mesh fold body),
    # others keep the materialized body
    adaption = engine.cfg.adaption
    use_fast = engine.synthesis == "splat"
    # upsampling targets default to the equally volume-free classic
    # deferred body (measured faster than the round-4 interpolating
    # fast body — engine._interp_body_fast has the evidence; the env
    # knob flips it here too) — NOT the materialized body (a volume
    # per frame)
    interp_deferred = (use_fast and adaption == "mergemesh"
                       and engine._interp_active
                       and not engine._interp_body_fast)
    mesh_fold = (adaption == "mesh" and use_fast
                 and engine.mesh_attrs == "fold")
    if adaption not in ("mergemesh", "mesh"):
        raise ValueError(
            f"frame_parallel_transfer supports mergemesh/mesh, "
            f"got {adaption!r}")
    if adaption == "mesh" and not mesh_fold:
        raise ValueError(
            "frame-parallel mesh needs the volume-free fold body "
            "(synthesis='splat', mesh_attrs='fold') — a materialized "
            "volume per frame does not fit")

    def one_frame(points, remissions, labels, valid, rel_pose):
        w = ScanWindow(points=points, remissions=remissions, labels=labels,
                       valid=valid, rel_pose=rel_pose,
                       primary_index=primary_index)
        if mesh_fold:
            (rng, lbl, rem, ends, mask), _ = engine._mesh_fast_body(w)
            return rng, lbl, rem, ends, mask
        if interp_deferred:
            return engine._mergemesh_core_deferred(w)[:5]
        if use_fast:
            rng, lbl, rem, ends, mask, _ = engine._mergemesh_core_fast(w)
            return rng, lbl, rem, ends, mask
        state = (engine.vol_spec.init_state_compact()
                 if engine.compact_volume else engine.vol_spec.init_state())
        rng, lbl, rem, ends, mask, _, _, _ = engine._mergemesh_core(w, state)
        return rng, lbl, rem, ends, mask

    def local(points, remissions, labels, valid, rel_pose):
        # each device maps over its local sub-batch of frames
        return jax.lax.map(lambda a: one_frame(*a),
                           (points, remissions, labels, valid, rel_pose))

    spec = P("data")
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, spec, spec, spec, spec),
                   out_specs=(spec, spec, spec, spec, spec))
    return fn(windows.points, windows.remissions, windows.labels,
              windows.valid, windows.rel_pose)


# batched-window construction lives with the ScanWindow definition;
# re-exported here for frame_parallel_transfer callers
from lidar_transfer_tpu.pipeline.multiscan import stack_windows  # noqa: E402,F401,E501
