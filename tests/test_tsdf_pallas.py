"""Pallas integrate kernels vs the XLA integrate (interpret mode, CPU).

Covers: plain kernel, reset mode, the precomputed v-table variant, and
the packed label+remission columns — all must reproduce ops.tsdf.integrate
exactly (labels bit-exact; tsdf/rem within the 14-bit rem quantization).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_transfer_tpu.ops import tsdf as TS
from lidar_transfer_tpu.ops.tsdf_pallas import (integrate_pallas,
                                                precompute_geometry,
                                                supports)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    H, W = 16, 256
    spec = TS.VolumeSpec(origin=(-10.0, -12.0, -3.0), voxel_size=0.3,
                         dims=(8, 128, 30))
    depth = (rng.uniform(2.0, 14.0, (H, W))
             * (rng.random((H, W)) > 0.2)).astype(np.float32)
    label = rng.integers(0, 30, (H, W)).astype(np.int32)
    rem = rng.uniform(0, 1, (H, W)).astype(np.float32)
    return rng, spec, depth, label, rem


def _rand_state(rng, spec):
    return TS.TSDFState(
        tsdf=jnp.asarray(rng.uniform(-1, 1, spec.dims), jnp.float32),
        weight=jnp.asarray(rng.integers(0, 3, spec.dims), jnp.float32),
        label=jnp.asarray(rng.integers(0, 30, spec.dims), jnp.int32),
        rem=jnp.asarray(rng.uniform(0, 1, spec.dims), jnp.float32))


def _check(ref, out, rem_tol=1e-4):
    np.testing.assert_array_equal(np.asarray(out.label, np.int32),
                                  np.asarray(ref.label, np.int32))
    np.testing.assert_allclose(np.asarray(out.tsdf, np.float32),
                               np.asarray(ref.tsdf, np.float32), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weight, np.float32),
                               np.asarray(ref.weight, np.float32),
                               atol=1e-5)
    # remission rides a 14-bit packed channel
    np.testing.assert_allclose(np.asarray(out.rem, np.float32),
                               np.asarray(ref.rem, np.float32),
                               atol=rem_tol)


@pytest.mark.parametrize("reset", [True, False])
def test_pallas_matches_xla(setup, reset):
    rng, spec, depth, label, rem = setup
    assert supports(spec, depth.shape[0])
    s0 = _rand_state(rng, spec)
    ref_in = (TS.TSDFState(jnp.ones(spec.dims), jnp.zeros(spec.dims),
                           jnp.zeros(spec.dims, jnp.int32),
                           jnp.zeros(spec.dims))
              if reset else s0)
    kw = dict(fov_up_deg=8.0, fov_down_deg=-22.0)
    ref = TS.integrate(
        TS.TSDFState(*(jnp.array(a) for a in ref_in)), spec,
        jnp.asarray(depth), jnp.asarray(label), jnp.asarray(rem), **kw)
    out = integrate_pallas(
        TS.TSDFState(*(jnp.array(a) for a in s0)), spec,
        jnp.asarray(depth), jnp.asarray(label), jnp.asarray(rem),
        reset=reset, interpret=True, **kw)
    _check(ref, out)


def test_pallas_geom_table_matches(setup):
    rng, spec, depth, label, rem = setup
    geom = precompute_geometry(spec, 8.0, -22.0, depth.shape[0],
                               interpret=True)
    assert geom.dtype == jnp.int8
    kw = dict(fov_up_deg=8.0, fov_down_deg=-22.0, reset=True)
    a = integrate_pallas(
        TS.TSDFState(jnp.ones(spec.dims), jnp.zeros(spec.dims),
                     jnp.zeros(spec.dims, jnp.int32),
                     jnp.zeros(spec.dims)), spec,
        jnp.asarray(depth), jnp.asarray(label), jnp.asarray(rem),
        interpret=True, **kw)
    b = integrate_pallas(
        TS.TSDFState(jnp.ones(spec.dims), jnp.zeros(spec.dims),
                     jnp.zeros(spec.dims, jnp.int32),
                     jnp.zeros(spec.dims)), spec,
        jnp.asarray(depth), jnp.asarray(label), jnp.asarray(rem),
        geom=geom, interpret=True, **kw)
    _check(a, b)


def test_pallas_compact_state(setup):
    rng, spec, depth, label, rem = setup
    ref = TS.integrate(
        spec.init_state_compact(), spec, jnp.asarray(depth),
        jnp.asarray(label), jnp.asarray(rem),
        fov_up_deg=8.0, fov_down_deg=-22.0)
    out = integrate_pallas(
        spec.init_state_compact(), spec, jnp.asarray(depth),
        jnp.asarray(label), jnp.asarray(rem),
        fov_up_deg=8.0, fov_down_deg=-22.0, reset=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.label, np.int32),
                                  np.asarray(ref.label, np.int32))
    np.testing.assert_allclose(np.asarray(out.tsdf, np.float32),
                               np.asarray(ref.tsdf, np.float32), atol=0.01)


def test_unsupported_shapes_raise(setup):
    rng, spec, depth, label, rem = setup
    big_h = np.zeros((200, 64), np.float32)
    with pytest.raises(ValueError):
        integrate_pallas(
            spec.init_state(), spec, jnp.asarray(big_h),
            jnp.zeros((200, 64), jnp.int32), jnp.zeros((200, 64)),
            fov_up_deg=8.0, fov_down_deg=-22.0, interpret=True)


@pytest.mark.parametrize("reset", [True, False])
def test_pallas_write_weight_false(setup, reset):
    """write_weight=False: tsdf/label/rem identical to the full write; the
    weight buffer passes through untouched."""
    rng, spec, depth, label, rem = setup
    s0 = _rand_state(rng, spec)
    kw = dict(fov_up_deg=8.0, fov_down_deg=-22.0, reset=reset,
              interpret=True)
    full = integrate_pallas(
        TS.TSDFState(*(jnp.array(a) for a in s0)), spec,
        jnp.asarray(depth), jnp.asarray(label), jnp.asarray(rem), **kw)
    slim = integrate_pallas(
        TS.TSDFState(*(jnp.array(a) for a in s0)), spec,
        jnp.asarray(depth), jnp.asarray(label), jnp.asarray(rem),
        write_weight=False, **kw)
    np.testing.assert_array_equal(np.asarray(slim.label),
                                  np.asarray(full.label))
    np.testing.assert_allclose(np.asarray(slim.tsdf),
                               np.asarray(full.tsdf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(slim.rem),
                               np.asarray(full.rem), atol=1e-6)
    # weight buffer is the unmodified input
    np.testing.assert_array_equal(np.asarray(slim.weight),
                                  np.asarray(s0.weight))


def test_pallas_twotable_branch_h_over_64(setup):
    """H in (64,128] takes the NON-fused two-table column branch
    (fused_cols=False, CW=128, separate depth and packed lr take_alongs)
    — previously only the fused CW=64 branch had coverage."""
    rng, spec, _, _, _ = setup
    H, W = 100, 256
    depth = (rng.uniform(2.0, 14.0, (H, W))
             * (rng.random((H, W)) > 0.2)).astype(np.float32)
    label = rng.integers(0, 30, (H, W)).astype(np.int32)
    rem = rng.uniform(0, 1, (H, W)).astype(np.float32)
    kw = dict(fov_up_deg=8.0, fov_down_deg=-22.0)
    s0 = _rand_state(rng, spec)
    ref = TS.integrate(
        TS.TSDFState(*(jnp.array(a) for a in s0)), spec,
        jnp.asarray(depth), jnp.asarray(label), jnp.asarray(rem), **kw)
    out = integrate_pallas(
        TS.TSDFState(*(jnp.array(a) for a in s0)), spec,
        jnp.asarray(depth), jnp.asarray(label), jnp.asarray(rem),
        reset=False, interpret=True, **kw)
    # the in-kernel atan polynomial (~1e-5 rad) may flip in_fov / the row
    # index for voxels within that band of an FOV or row boundary (module
    # docstring); with 100 rows a handful of voxels sit in the band —
    # everything else must match exactly
    lbl_mism = (np.asarray(out.label) != np.asarray(ref.label)).sum()
    assert lbl_mism <= 5e-4 * np.prod(spec.dims), f"{lbl_mism} labels"
    close = np.isclose(np.asarray(out.tsdf), np.asarray(ref.tsdf),
                       atol=1e-5)
    assert (~close).sum() <= 5e-4 * np.prod(spec.dims)


def test_label_overflow_guard_raises():
    """Label ids >= 512 cannot ride the packed f32 column; the async
    guard must raise within a couple of calls (not silently corrupt)."""
    spec = TS.VolumeSpec(origin=(-5.0, -5.0, -2.0), voxel_size=0.5,
                         dims=(8, 128, 16))
    depth = jnp.full((16, 256), 4.0, jnp.float32)
    label = jnp.full((16, 256), 700, jnp.int32)
    rem = jnp.zeros((16, 256), jnp.float32)
    st = spec.init_state()
    with pytest.raises(ValueError, match="label ids must be < 512"):
        for _ in range(4):      # guard is asynchronous: allow a few calls
            st = integrate_pallas(st, spec, depth, label, rem,
                                  fov_up_deg=8.0, fov_down_deg=-22.0,
                                  interpret=True)


def test_pallas_chain_matches_sequential(setup):
    """integrate_pallas_chain == S sequential integrate_pallas calls
    (reset on the first) — the mesh adaption's fused per-scan loop."""
    from lidar_transfer_tpu.ops.tsdf_pallas import integrate_pallas_chain

    rng, spec, depth, label, rem = setup
    S = 3
    depths = np.stack([
        (rng.uniform(2.0, 14.0, depth.shape)
         * (rng.random(depth.shape) > 0.2)).astype(np.float32)
        for _ in range(S)])
    labels = np.stack([rng.integers(0, 30, depth.shape).astype(np.int32)
                       for _ in range(S)])
    rems = np.stack([rng.uniform(0, 1, depth.shape).astype(np.float32)
                     for _ in range(S)])
    kw = dict(fov_up_deg=8.0, fov_down_deg=-22.0)

    def fresh():
        return TS.TSDFState(jnp.ones(spec.dims), jnp.zeros(spec.dims),
                            jnp.zeros(spec.dims, jnp.int32),
                            jnp.zeros(spec.dims))

    ref = fresh()
    for s in range(S):
        ref = integrate_pallas(
            ref, spec, jnp.asarray(depths[s]), jnp.asarray(labels[s]),
            jnp.asarray(rems[s]), reset=(s == 0), interpret=True, **kw)

    out = integrate_pallas_chain(
        fresh(), spec, jnp.asarray(depths), jnp.asarray(labels),
        jnp.asarray(rems), interpret=True, **kw)
    _check(ref, out)

    # geom-table variant agrees too
    geom = precompute_geometry(spec, 8.0, -22.0, depth.shape[0],
                               interpret=True)
    out_g = integrate_pallas_chain(
        fresh(), spec, jnp.asarray(depths), jnp.asarray(labels),
        jnp.asarray(rems), geom=geom, interpret=True, **kw)
    _check(ref, out_g)

    # write_weight=False drops only the weight write
    slim = integrate_pallas_chain(
        fresh(), spec, jnp.asarray(depths), jnp.asarray(labels),
        jnp.asarray(rems), write_weight=False, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(slim.label),
                                  np.asarray(ref.label))
    np.testing.assert_allclose(np.asarray(slim.tsdf),
                               np.asarray(ref.tsdf), atol=1e-5)


def test_pallas_chain_compact_tolerance(setup):
    """Compact (bf16) states: the fused chain keeps f32 registers across
    scans, so it agrees with the XLA f32 chain within bf16 rounding."""
    from lidar_transfer_tpu.ops.tsdf_pallas import integrate_pallas_chain

    rng, spec, depth, label, rem = setup
    S = 2
    depths = np.stack([depth, np.roll(depth, 3, axis=1)])
    labels = np.stack([label, np.roll(label, 3, axis=1)])
    rems = np.stack([rem, np.roll(rem, 3, axis=1)])
    kw = dict(fov_up_deg=8.0, fov_down_deg=-22.0)

    ref = TS.TSDFState(jnp.ones(spec.dims), jnp.zeros(spec.dims),
                       jnp.zeros(spec.dims, jnp.int32),
                       jnp.zeros(spec.dims))
    for s in range(S):
        ref = TS.integrate(ref, spec, jnp.asarray(depths[s]),
                           jnp.asarray(labels[s]), jnp.asarray(rems[s]),
                           reset=(s == 0), **kw)
    out = integrate_pallas_chain(
        spec.init_state_compact(), spec, jnp.asarray(depths),
        jnp.asarray(labels), jnp.asarray(rems), interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(out.label, np.int32),
                                  np.asarray(ref.label, np.int32))
    np.testing.assert_allclose(np.asarray(out.tsdf, np.float32),
                               np.asarray(ref.tsdf, np.float32),
                               atol=5e-3)


def test_input_guard_catches_bad_labels_and_remissions():
    """enqueue_input_guard + drain: labels >= 512 raise (silent packing
    corruption otherwise); remissions outside [0, 1] warn (winners are
    clipped by the kernel; non-winners never pack)."""
    import jax.numpy as jnp
    import pytest

    from lidar_transfer_tpu.ops import tsdf_pallas as TP

    valid = jnp.asarray([True, True, False])
    # ok values pass
    TP.enqueue_input_guard(jnp.asarray([3, 500, 9999]),
                           jnp.asarray([0.0, 1.0, 77.0]), valid)
    TP.drain_label_checks()
    # bad label (only VALID entries count — the 9999 above was masked)
    TP.enqueue_input_guard(jnp.asarray([3, 600, 0]),
                           jnp.asarray([0.0, 0.5, 0.0]), valid)
    with pytest.raises(ValueError, match="label ids"):
        TP.drain_label_checks()
    TP.drain_label_checks()   # queue must be clean afterwards
    # out-of-range remission WARNS (once) rather than aborts: only each
    # pixel's winner is packed (and the kernel clips it), so stray values
    # on occluded points are harmless — but the user should normalize
    TP._verify_check._rem_warned = False
    TP.enqueue_input_guard(jnp.asarray([3, 4, 0]),
                           jnp.asarray([0.0, 2.5, 0.0]), valid)
    TP.drain_label_checks()
    assert getattr(TP._verify_check, "_rem_warned", False)


def test_materialized_mergemesh_guards_traced_integrate(synthetic_dataset,
                                                        monkeypatch):
    """The fixed-bounds materialized mergemesh body jits its integrate,
    where the per-image guard is inert (tracer inputs) — the engine must
    guard the concrete window at the eager boundary instead."""
    import jax.numpy as jnp

    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets import KittiSequence
    from lidar_transfer_tpu.ops import tsdf_pallas as TP
    from lidar_transfer_tpu.ops import tsdf as TS
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window
    from lidar_transfer_tpu.config import SensorSpec

    spec = SensorSpec(name="t16", beams=16, fov_up=5.0, fov_down=-20.0,
                      angle_res_hor=360.0 / 128.0)
    cfg = TransferConfig(
        adaption="mergemesh", number_of_scans=1, voxel_size=0.25,
        voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    seq = KittiSequence.open(synthetic_dataset)

    calls = []
    real_guard = TP.enqueue_input_guard
    monkeypatch.setattr(
        TP, "enqueue_input_guard",
        lambda l, r, v: calls.append(1) or real_guard(l, r, v))
    # force the pallas-eligible branch; shim the in-jit integrate to the
    # XLA path so the test runs on CPU
    monkeypatch.setattr(TP, "precompute_geometry",
                        lambda *a, **k: None)
    monkeypatch.setattr(TP, "integrate_pallas",
                        lambda state, spec_, d, l, r, *, fov_up_deg,
                        fov_down_deg, obs_weight=1.0, origin=None,
                        active_dims=None, reset=False, geom=None,
                        write_weight=True: TS.integrate(
                            state, spec_, d, l, r,
                            fov_up_deg=fov_up_deg,
                            fov_down_deg=fov_down_deg, origin=origin,
                            active_dims=active_dims, reset=reset,
                            write_weight=write_weight))
    eng = TransferEngine(spec, spec, cfg, 8192, fixed_bounds=True,
                         defer_volume=False, use_pallas_integrate=True)
    window = load_window(seq, cfg, 1, 8192)
    vs, _ = eng.transfer(window)
    assert calls, "materialized mergemesh did not guard the window"
    assert bool(jnp.any(vs.mask))
    TP.drain_label_checks()
