"""Adaption strategies: cp / mesh / mergemesh (pipeline orchestration).

Rebuild of ``MultiSemLaserScan.deform`` (auxiliary/laserscan.py:819-1021):

  cp         — pure projection resampling: merge scans, project at the
               *target* spec, back-project (laserscan.py:827-861).
  mesh       — per-scan range images at the *source* spec, fused one-by-one
               into the TSDF, then target rays cast (laserscan.py:863-918).
  mergemesh  — THE main path: merged cloud projected once (source image
               dims, target FOV — reference's chosen variant "(1)+(2)",
               laserscan.py:929-953), fused in a single integrate, then
               target rays cast (laserscan.py:921-1012).
  catmesh    — per-CATEGORY surface semantics; implemented here where the
               reference stubs it ("TODO Category Mesh",
               laserscan.py:1014-1019). Device engine (default) = the
               splat body, which never bleeds labels across category
               seams by construction; "oracle" = literal per-category
               iso-surfaces, concatenated and raycast nearest-hit (host).

Instead of the reference's mesh extraction + C++ BVH, rays march the TSDF
directly (ops/raycast.py). A mesh path (marching cubes + triangle cast)
exists separately for parity/PLY export (ops/marching_cubes.py,
ops/triangles.py).

Known reference quirks handled here:
  - target beam_angles were mistakenly read from the *source* config
    (laserscan.py:743-747); we use the target's (documented deviation).
  - per-frame volume bounds are clipped to the merged cloud
    (laserscan.py:957-962); we bucket the static volume shape upward and
    crop dynamically (ops/tsdf.py ``active_dims``) so XLA compiles once.
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_transfer_tpu.config import SensorSpec, TransferConfig
from lidar_transfer_tpu.ops import projection as P
from lidar_transfer_tpu.ops import raycast as RC
from lidar_transfer_tpu.ops import tsdf as TS
from lidar_transfer_tpu.pipeline.multiscan import ScanWindow, merge_window


class VirtualScan(NamedTuple):
    """A synthesized target-sensor scan (all target-image-shaped)."""

    range: jax.Array        # (tH,tW) f32; 0 = no data
    label: jax.Array        # (tH,tW) i32; 0 = no data
    remission: jax.Array    # (tH,tW) f32
    points: jax.Array       # (tH,tW,3) f32 back-projected / hit points
    mask: jax.Array         # (tH,tW) bool
    adaption: str           # strategy that produced it


def bucket_dims(dims: np.ndarray, multiple: tuple[int, int, int] = (64, 64, 16)
                ) -> tuple[int, int, int]:
    """Round volume dims up to bucket multiples (bounded recompile count)."""
    out = []
    for d, m in zip(dims, multiple):
        out.append(int(-(-int(d) // m) * m))
    return tuple(out)


@dataclasses.dataclass
class TransferEngine:
    """Holds specs/config and the jit-stable constants (rays, volume shape).

    One engine instance per (source_spec, target_spec, config); per-frame
    state (TSDF volume) is functional and created per call.
    """

    source: SensorSpec
    target: SensorSpec
    cfg: TransferConfig
    capacity: int
    # True: always use the full config-bounds volume (no per-frame cloud
    # clipping). Skips one device->host sync per frame — the right choice on
    # TPU where the bucketed volume easily fits HBM; False reproduces the
    # reference's per-frame clipped bounds (laserscan.py:957-962).
    fixed_bounds: bool = False
    # 8 B/voxel storage (bf16 tsdf/weight/rem, int16 labels) — required for
    # reference-scale volumes (±50 m @ 0.05 m = 800M voxels) on one chip;
    # see VolumeSpec.init_state_compact
    compact_volume: bool = False
    # "splat" (default): truncation-band splatting (ops/splat.py) — fixed,
    # tiny gather count, robust against XLA:TPU's compile-nondeterministic
    # gather lowering. "raymarch": the lockstep TSDF marcher
    # (ops/raycast.py), kept for validation and sensor origins other than
    # the volume-frame origin.
    synthesis: str = "splat"
    # None = auto: the Pallas integrate kernel (ops/tsdf_pallas.py) on TPU
    # when the volume shape supports it, XLA integrate elsewhere
    use_pallas_integrate: bool | None = None
    # Lazy volume materialization. The splat engine's single-fused-image
    # path derives every band sample's attributes from the image itself
    # (ops/splat.py _band_samples_image — zero volume reads), so for
    # mergemesh the fused volume is write-only during the transfer: the
    # virtual scan is bit-identical whether or not integrate runs
    # (tests/test_splat.py::test_image_vs_volume_attrs). Deferring the
    # integrate drops the full-volume state write — the measured ~76 ms
    # Pallas write floor at reference scale (ops/tsdf_pallas.py) — from
    # the hot path, and the volume (plus its geometry table) is only
    # integrated on first demand via ``fused_state()`` (export_mesh,
    # rolling-shutter resynthesis, or any attrs="volume" consumer).
    defer_volume: bool = True
    # Volume-attrs splat band membership (mesh adaption / attrs="volume"):
    # True = every K band sample must also carry label > 0 (one extra
    # K*HW lane_pick per source — ~39 ms/frame over 3 sources at
    # reference scale); False (default) = the raymarcher's semantics —
    # band membership is tsdf <= 0 alone and the label is read once at
    # the chosen sample (label-0 surfaces occlude and report label 0,
    # matching both ops/raycast.py and the reference's mesh path, which
    # keeps unlabeled surfaces in the mesh, laserscan.py:1001-1004).
    band_label_probe: bool = False
    # Multi-source band attributes for the mesh adaption: "fold"
    # (default) computes the class-aware collision fold from the S
    # aligned images elementwise (ops/splat._band_samples_fold — zero
    # volume reads, so the per-scan integrates DEFER off the hot path
    # exactly like mergemesh's); "volume" materializes the chain and
    # probes it (voxel-quantized semantics, ~6 K*HW gathers/frame).
    mesh_attrs: str = "fold"
    # Catmesh engine. "splat" (default): the production band-splat body.
    # The splat already HAS catmesh's defining property — every candidate
    # carries its own source pixel's exact label, so labels never bleed
    # across category boundaries (the defect per-category meshing exists
    # to fix in a mesh+raycast pipeline: a shared marching-cubes surface
    # assigns seam triangles to one side, RayTracer.cpp:75 vertex-0
    # color). Per-category iso-surfaces differ from the global surface
    # only sub-voxel at category SEAMS (extra faces where the masked
    # field +1/-1 jumps between adjacent voxels of different classes),
    # which the splat's per-pixel bands never cross by construction —
    # so the splat output IS the catmesh output up to the same seam-
    # epsilon the two host casters already disagree on (engine note
    # below). "oracle": the literal construction — one marched iso-
    # surface per category, concatenated, raycast (host; the
    # parity/PLY engine; 0.42 scans/s at clipped bounds).
    catmesh_engine: str = "splat"
    # Upsampling coverage ≡ the reference's mesh interpolation: its
    # raycast hits triangle INTERIORS between adjacent source beams
    # (RayTracer.cpp:62-92), so a target grid denser than the source
    # still fills interior pixels. "auto" (default) detects a denser
    # target (vertically or horizontally) and adds chord-interpolated
    # candidates between adjacent connected source returns
    # (ops/splat._interp_candidates); False disables (pre-round-3
    # behavior: interior target rows/columns stay empty); True forces
    # the auto-computed counts (still 0 for non-upsampling targets).
    # Applies to splat synthesis on every mergemesh body — the
    # z-buffer-ordered fast body densifies its winners into raster
    # order with one row scatter and interpolates there (round 4).
    # cp is NOT interpolated — the reference's cp has no mesh either
    # (laserscan.py:827-861).
    upsample_interp: bool | str = "auto"
    # Connectivity angle (degrees) for the upsampling interpolation: two
    # adjacent returns are chord-connected when the classic range-image
    # angle beta = atan2(r_near sin dt, r_far - r_near cos dt) exceeds
    # this (grazing continuous surfaces pass, depth discontinuities
    # fail) or when |dr| <= trunc_margin (band overlap). See
    # ops/splat._interp_candidates.
    interp_angle_deg: float = 3.0

    def __post_init__(self):
        if self.mesh_attrs not in ("fold", "volume"):
            # a typo (e.g. 'Fold') would silently disable the deferral
            # AND fall into volume-probe band semantics downstream
            raise ValueError(
                f"mesh_attrs must be 'fold' or 'volume': "
                f"{self.mesh_attrs!r}")
        if self.catmesh_engine not in ("splat", "oracle"):
            raise ValueError(
                f"catmesh_engine must be 'splat' or 'oracle': "
                f"{self.catmesh_engine!r}")
        t = self.target
        # SensorSpec.beam_angles are already radians (config.py)
        ba = (np.asarray(t.beam_angles)
              if t.beam_angles is not None else None)
        # NOTE: unlike the reference (laserscan.py:743-747 reads the
        # *source* beam_angles for the target), we use the target's.
        self.rays = jnp.asarray(RC.generate_rays(
            t.H, t.W, t.fov_up, t.fov_down, beam_angles=ba))
        self.t_beam_angles = (jnp.asarray(ba, jnp.float32)
                              if ba is not None else None)
        sba = (np.asarray(self.source.beam_angles)
               if self.source.beam_angles is not None else None)
        self.s_beam_angles = (jnp.asarray(sba, jnp.float32)
                              if sba is not None else None)
        # static bucketed volume shape from config bounds (upper bound of
        # any per-frame clipped volume). Z buckets to 128 when the Pallas
        # integrate is eligible (its in-place aliasing needs a 128-multiple
        # minor dim — tiled layouts with padded minors can't alias the
        # kernel's dense buffers).
        vb = self.cfg.voxel_bounds_array
        full_dims = np.ceil((vb[:, 1] - vb[:, 0]) /
                            self.cfg.voxel_size).astype(int)
        self._tpu = jax.default_backend() == "tpu"
        zmult = 128 if (self._tpu and
                        self.use_pallas_integrate is not False) else 16
        self.vol_dims = bucket_dims(full_dims, multiple=(64, 64, zmult))
        self.vol_spec = TS.VolumeSpec(
            origin=tuple(float(v) for v in vb[:, 0]),
            voxel_size=float(self.cfg.voxel_size),
            dims=self.vol_dims)

        # upsampling-interpolation counts (see the upsample_interp field):
        # how many interior target rows/columns fall between adjacent
        # source pixels. Vertical pitch is the source IMAGE's actual row
        # height — the span it is projected with depends on the
        # adaption (mergemesh/catmesh project the merged cloud at
        # TARGET fov over source.H rows, laserscan.py:929+952; mesh
        # projects per-scan at source fov), and explicit source beam
        # angles override the span entirely (row = nearest beam).
        if self.upsample_interp:
            if sba is not None and len(sba) > 1:
                sd = np.degrees(np.sort(sba))
                src_pitch = float(sd[-1] - sd[0]) / (len(sd) - 1)
            else:
                span_s = (self.source.fov_up - self.source.fov_down
                          if self.cfg.adaption == "mesh"
                          else t.fov_up - t.fov_down)
                # CONSERVATIVE row spacing span/(H-1), not span/H: a
                # sensor whose beams span the fov inclusively (the
                # synthetic fixture; many real specs) has the larger
                # spacing, and the worst adjacent source-row gap in
                # target rows is ceil of the ratio — m_v one short
                # leaves a SYSTEMATIC empty target row every few gaps
                # (16->64 skipped one row in every 5-row gap before
                # this; identity pairs still gate off, H/(H-1) is
                # within the 0.15 slack)
                src_pitch = span_s / max(self.source.H - 1, 1)
            if ba is not None and len(ba) > 1:
                # MEAN gap, not min: non-uniform identity targets have
                # min gap < span/H and would spuriously activate
                bd = np.degrees(np.sort(ba))
                tgt_pitch = float(bd[-1] - bd[0]) / (len(bd) - 1)
            else:
                tgt_pitch = (t.fov_up - t.fov_down) / t.H
            # 0.15 slack: activation needs a genuinely denser target
            # (ratio > ~1.15), not the H/(H-1) convention mismatch of
            # an identity pair
            self._interp_mv = min(8, max(
                0, int(np.ceil(src_pitch / max(tgt_pitch, 1e-9)
                               - 0.15)) - 1))
            self._interp_mu = min(8, max(
                0, int(np.ceil(t.W / self.source.W - 0.15)) - 1))
        else:
            self._interp_mv = 0
            self._interp_mu = 0
        # Vertical chord SPAN: with an explicit source beam table the
        # projection SNAPS pitch to beams and maps the snapped angle
        # linearly to rows — consecutive beams can land >1 row apart
        # (empty interleaved rows), and chords between strictly adjacent
        # rows would never find two valid endpoints there. Compute the
        # occupied rows statically and bridge up to the max gap, CAPPED
        # at 4 rows: each span level adds a full candidate set (device
        # memory + splat cost scale linearly in vspan) and a >4-row gap
        # means the target asks for >4x the source's local beam density
        # — chord interpolation is no longer meaningful there. The cap
        # is loud (warning below), not silent (ADVICE r4).
        self._interp_vspan = 1
        if self._interp_mv > 0 and sba is not None and len(sba) > 1:
            fu, fd = ((self.source.fov_up, self.source.fov_down)
                      if self.cfg.adaption == "mesh"
                      else (t.fov_up, t.fov_down))
            fov = abs(np.radians(fu)) + abs(np.radians(fd))
            v = 1.0 - (np.sort(sba) + abs(np.radians(fd))) / fov
            occ = np.unique(np.clip(np.floor(v * self.source.H), 0,
                                    self.source.H - 1).astype(int))
            if len(occ) > 1:
                max_gap = int(np.diff(occ).max())
                self._interp_vspan = min(4, max_gap)
                if max_gap > 4:
                    warnings.warn(
                        f"source beam table leaves occupied-row gaps up "
                        f"to {max_gap} rows but chord interpolation "
                        f"bridges at most 4 — target rows inside wider "
                        f"gaps will stay empty (raise source H or thin "
                        f"the target density)", stacklevel=2)

    @property
    def _interp_active(self) -> bool:
        return (self.synthesis == "splat"
                and (self._interp_mv > 0 or self._interp_mu > 0))

    @property
    def _interp_body_fast(self) -> bool:
        """Round-4 A/B: use the z-buffer fast body for UPSAMPLING targets.

        The fast body CAN interpolate (winners densified to raster order
        via one int32 index scatter + one row gather) but measures
        ~95-99 scans/s at 64×2048→128×2048 vs the classic deferred
        body's ~123: the target-assemble's win_idx scatter (~1.6 ms) and
        per-pixel attribute row gather (~4.5 ms at 262k pixels,
        scripts/probe_assemble_variants.py — every gather formulation
        measures the same) are a SHARED structural floor, and the fast
        body adds a duplicative densify stage on top (xplane trace,
        BASELINE.md round 4). Default is therefore the classic body;
        set LT_INTERP_STREAM_BODY=fast to flip (re-probe each round —
        the remote compiler's lowering regimes move). Read at first
        transfer (the body choice is baked into the engine's jit
        caches, so the value is LATCHED on first read — flipping the env
        var mid-session must not desynchronize the routing predicates
        from an already-compiled body).
        """
        latched = getattr(self, "_interp_body_fast_latched", None)
        if latched is None:
            latched = os.environ.get("LT_INTERP_STREAM_BODY") == "fast"
            self._interp_body_fast_latched = latched
        return latched

    @property
    def _mm_family_fast(self) -> bool:
        """Adaptions served by the mergemesh fast/stream bodies:
        mergemesh itself, and catmesh on its splat engine (the splat IS
        the device catmesh — see the catmesh_engine field note)."""
        return (self.cfg.adaption == "mergemesh"
                or (self.cfg.adaption == "catmesh"
                    and self.catmesh_engine == "splat"))

    # ------------------------------------------------------------------ cp
    def _cp_core(self, window: ScanWindow):
        pts, rem, lbl, valid = merge_window(window)
        ri = P.range_project(
            pts, rem, lbl, valid, H=self.target.H, W=self.target.W,
            fov_up_deg=self.target.fov_up, fov_down_deg=self.target.fov_down,
            beam_angles=self.t_beam_angles)
        back = P.reverse_project(
            ri, fov_up_deg=self.target.fov_up,
            fov_down_deg=self.target.fov_down,
            preserve_float=self.cfg.preserve_float)
        return ri, back

    def cp(self, window: ScanWindow) -> tuple[VirtualScan, P.RangeImage]:
        """Closest-point adaption ≡ laserscan.py:827-861.

        NOT wrapped in an outer whole-frame jit: fusing merge+projection
        into one program lets XLA's excess-precision FMA re-round the
        pixel coordinates, flipping ~1.7% of boundary pixels — which
        breaks cp's exact-identity contract (identity transfer must
        reproduce the source image bit-for-bit). Two dispatches is cheap.
        """
        ri, back = self._cp_core(window)
        vs = VirtualScan(
            range=ri.range, label=ri.label,
            remission=jnp.maximum(ri.remission, 0.0),
            points=back.reshape(self.target.H, self.target.W, 3),
            mask=ri.mask, adaption="cp")
        return vs, ri

    def _cp_core_fast(self, window: ScanWindow):
        """Whole-frame cp body for the throughput path.

        One fused program — XLA's excess-precision FMA may re-round
        pixel coords and flip ~1.7% of boundary pixels vs the
        dispatch-split ``cp()`` (which stays the exact-identity parity
        path); in exchange the frame is a single launch.
        """
        ri, back = self._cp_core(window)
        return (ri.range, ri.label, jnp.maximum(ri.remission, 0.0),
                back.reshape(self.target.H, self.target.W, 3), ri.mask)

    # ------------------------------------------------- shared mesh helpers
    def _take_state(self):
        """Resident volume buffers, recycled across frames.

        Allocating a fresh reference-scale volume (7 GB compact) every
        frame churns the allocator (measured: seconds/frame through the
        axon runtime once memory pressure builds). Instead the engine owns
        ONE set of buffers; each frame's first integrate runs with
        ``reset=True`` (state read replaced by the init constants, so the
        donated buffers are only written) and the result is handed back
        via ``_keep_state`` after the raycast.
        """
        state = getattr(self, "_vol_state", None)
        if state is None:
            state = (self.vol_spec.init_state_compact()
                     if self.compact_volume else self.vol_spec.init_state())
        self._vol_state = None          # consumed (donated) until returned
        return state

    def _keep_state(self, state):
        self._vol_state = state

    def _frame_volume(self, pts, valid):
        """Per-frame clipped+bucketed volume placement (host sync for the
        cloud bounding box only — 6 floats)."""
        if self.fixed_bounds:
            return (jnp.asarray(self.vol_spec.origin, jnp.float32),
                    jnp.asarray(self.vol_spec.dims, jnp.int32))
        big = 1e9
        lo = jnp.where(valid[:, None], pts, big).min(axis=0)
        hi = jnp.where(valid[:, None], pts, -big).max(axis=0)
        # ONE batched device->host fetch (each read pays the full ~30 ms
        # tunnel round trip even when ready — CLAUDE.md)
        cloud = np.rint(np.asarray(jnp.stack([lo, hi], axis=1)))
        cfgb = self.cfg.voxel_bounds_array.astype(np.float64)
        clip = cfgb.copy()
        clip[:, 0] = np.maximum(cfgb[:, 0], cloud[:, 0])
        clip[:, 1] = np.minimum(cfgb[:, 1], cloud[:, 1])
        clip[:, 1] = np.maximum(clip[:, 1], clip[:, 0] + self.cfg.voxel_size)
        exact_dims = np.ceil((clip[:, 1] - clip[:, 0]) /
                             self.cfg.voxel_size).astype(int)
        exact_dims = np.minimum(exact_dims, np.asarray(self.vol_dims))
        origin = jnp.asarray(clip[:, 0], jnp.float32)
        active = jnp.asarray(exact_dims, jnp.int32)
        return origin, active

    def _pallas_eligible(self, H):
        if self.use_pallas_integrate is not None:
            return self.use_pallas_integrate
        from lidar_transfer_tpu.ops import tsdf_pallas as TP

        # supports() owns ALL eligibility now, incl. the TPU Z%128
        # aliasing constraint
        return self._tpu and TP.supports(self.vol_spec, H)

    def _ensure_geom(self, fov_up, fov_down, H):
        """Frame-invariant (v, depth) tables for the pallas integrate.

        Built EAGERLY (outside the frame jit) once per (fov, H) and passed
        into the jitted frame as arguments — valid because fixed_bounds
        pins the volume origin. ~3 B/voxel of HBM."""
        if not (self.fixed_bounds and self._pallas_eligible(H)):
            return None
        key = (float(fov_up), float(fov_down), int(H))
        geoms = getattr(self, "_geoms", None)
        if geoms is None:
            geoms = {}
            self._geoms = geoms
        if key not in geoms:
            from lidar_transfer_tpu.ops.tsdf_pallas import (
                precompute_geometry)

            geoms[key] = precompute_geometry(
                self.vol_spec, fov_up, fov_down, H)
        return geoms[key]

    def _integrate(self, state, ri, fov_up, fov_down, origin, active,
                   reset, geom=None, write_weight=True):
        if self._pallas_eligible(ri.range.shape[0]):
            from lidar_transfer_tpu.ops.tsdf_pallas import integrate_pallas

            return integrate_pallas(
                state, self.vol_spec, ri.range, ri.label, ri.remission,
                fov_up_deg=fov_up, fov_down_deg=fov_down,
                origin=origin, active_dims=active, reset=reset, geom=geom,
                write_weight=write_weight)
        return TS.integrate(
            state, self.vol_spec, ri.range, ri.label, ri.remission,
            fov_up_deg=fov_up, fov_down_deg=fov_down,
            origin=origin, active_dims=active, reset=reset,
            write_weight=write_weight)

    def _integrate_chain(self, state, ris, fov_up, fov_down, origin,
                         active, geom):
        """S chained per-scan integrates (reset on the first), fused into
        ONE kernel pass when the pallas path is eligible: the S
        observations apply in registers with a single state read/write —
        ~1/S the state HBM traffic of the sequential loop
        (≡ laserscan.py:863-918 semantics either way)."""
        H = ris[0].range.shape[0]
        if len(ris) > 1 and self._pallas_eligible(H):
            from lidar_transfer_tpu.ops.tsdf_pallas import (
                integrate_pallas_chain)

            return integrate_pallas_chain(
                state, self.vol_spec,
                jnp.stack([ri.range for ri in ris]),
                jnp.stack([ri.label for ri in ris]),
                jnp.stack([ri.remission for ri in ris]),
                fov_up_deg=fov_up, fov_down_deg=fov_down,
                origin=origin, active_dims=active, geom=geom)
        for s, ri in enumerate(ris):
            state = self._integrate(state, ri, fov_up, fov_down, origin,
                                    active, reset=(s == 0), geom=geom)
        return state

    def _synthesize(self, state, origin_vol, active, sources,
                    pts, valid) -> VirtualScan:
        """Dispatch to band splatting or the TSDF raymarcher.

        sources: list of (range_image, fov_up, fov_down) that were fused.
        """
        if self.synthesis == "splat":
            from lidar_transfer_tpu.ops.splat import splat_synthesize

            srcs = []
            for ri, fu, fd in sources:
                back = P.reverse_project(ri, fov_up_deg=fu,
                                         fov_down_deg=fd,
                                         preserve_float=True)
                srcs.append((ri.range.reshape(-1), back,
                             ri.mask.reshape(-1), ri.label.reshape(-1),
                             jnp.maximum(ri.remission, 0.0).reshape(-1)))
            attrs = "auto" if len(sources) == 1 else self.mesh_attrs
            interp = None
            if self._interp_active:
                sH, sW = sources[0][0].range.shape
                interp = (sH, sW, self._interp_mv, self._interp_mu,
                          float(np.tan(np.radians(self.interp_angle_deg))),
                          self._interp_vspan)
            rng, lbl, rem, ends, mask = splat_synthesize(
                state, self.vol_spec, srcs,
                target_H=self.target.H, target_W=self.target.W,
                fov_up_deg=self.target.fov_up,
                fov_down_deg=self.target.fov_down,
                vol_origin=origin_vol, active_dims=active,
                beam_angles=self.t_beam_angles, attrs=attrs,
                label_probe=self.band_label_probe, interp=interp)
            return VirtualScan(range=rng, label=lbl, remission=rem,
                               points=ends, mask=mask, adaption="mesh")
        return self._raycast(state, origin_vol, pts, valid)

    # --------------------------------------------- lazy volume consumers
    def _defer_active(self) -> bool:
        """Deferral applies only where the volume is provably unread:
        splat synthesis with a single fused image (mergemesh)."""
        return self.defer_volume and self.synthesis == "splat"

    def _defer_mesh_active(self) -> bool:
        """Mesh-adaption deferral: the fold synthesis computes the
        class-aware collision semantics from the aligned images, so the
        chained integrates are provably unread too."""
        return (self.defer_volume and self.synthesis == "splat"
                and self.mesh_attrs == "fold")

    def _invalidate_stream(self) -> None:
        """Forget any prior ``transfer_stream`` batch.

        EVERY single-frame transfer entry calls this: the frame-indexed
        lazy consumers (``fused_state(frame=…)``,
        ``resynthesize_rolling_shutter(…, frame=…)``) must never resolve
        into a SUPERSEDED stream's windows, and the no-frame ambiguity
        guard must not fire after an unambiguous single-frame transfer
        (round-4 review: the mesh fold path cleared only one of the two
        markers and classic paths cleared neither — fused_state(frame=0)
        could silently materialize a stale stream's volume).
        """
        self._stream_stash = None
        self._stream_windows = None

    def _select_stream_frame(self, frame: int) -> None:
        """Point the lazy volume consumers at streamed frame ``frame``.

        ``transfer_stream`` keeps the whole batched window (device
        arrays already resident — no copies); selecting a frame slices
        it into the single-frame stash the lazy paths consume, exactly
        as if ``transfer_fast`` had run on that frame.
        """
        sw = getattr(self, "_stream_windows", None)
        if sw is None:
            raise ValueError(
                "frame= indexing requires a preceding transfer_stream "
                "(single-frame transfers have exactly one frame)")
        n = int(sw.points.shape[0])
        if not -n <= frame < n:
            raise IndexError(f"frame {frame} out of range for the "
                             f"{n}-frame stream")
        self._pending_window = jax.tree.map(
            lambda x, f=frame: x[f], sw)
        self._pending_fusion = None
        self._fused = False
        # _pending_mode/_pending_origin stay as the stream set them
        self._stream_stash = None      # an explicit frame is now selected

    def fused_state(self, frame: int | None = None) -> TS.TSDFState:
        """The fused TSDF volume of the last transferred frame.

        With ``defer_volume`` the mergemesh transfer itself never writes
        the volume (its splat output provably doesn't read it); this
        integrates the stashed frame inputs on first demand. The weight
        volume is NOT written on this single-integrate path (nothing
        downstream of a lone integrate reads it; it only matters when
        integrates chain, as in the mesh adaption) — its buffer contents
        are unspecified.

        After ``transfer_stream`` pass ``frame=i`` (negative OK) to pick
        which streamed frame's volume to materialize; omitting it raises
        (the implicit last-frame default was an API trap, VERDICT r3
        weak #4).
        """
        if frame is not None:
            self._select_stream_frame(frame)
        if (getattr(self, "_fused", False)
                and getattr(self, "_vol_state", None) is not None):
            return self._vol_state
        pend = getattr(self, "_pending_fusion", None)
        if pend is None:
            nstream = getattr(self, "_stream_stash", None)
            if nstream is not None:
                raise ValueError(
                    f"fused_state() after transfer_stream is ambiguous — "
                    f"pass frame=i to select one of the {nstream} "
                    "streamed frames (e.g. fused_state(frame=-1) for "
                    "the last)")
            w = getattr(self, "_pending_window", None)
            if w is None:
                raise RuntimeError("no fused volume yet — run a "
                                   "mesh/mergemesh transfer first")
            if getattr(self, "_pending_mode", "mergemesh") == "mesh":
                # per-scan chain, ≡ the eager mesh path's integrates
                proj_jit, _ = self._mesh_stage_jits()
                flat_pts, ris = proj_jit(w)
                origin, active = getattr(
                    self, "_pending_origin", None) or self._frame_volume(
                        flat_pts, w.valid.reshape(-1))
                geom = self._ensure_geom(self.source.fov_up,
                                         self.source.fov_down,
                                         self.source.H)
                state = self._integrate_chain(
                    self._take_state(), ris, self.source.fov_up,
                    self.source.fov_down, origin, active, geom)
                self._keep_state(state)
                self._fused = True
                self._last_origin = origin
                self._last_sources = tuple(
                    (ri, self.source.fov_up, self.source.fov_down)
                    for ri in ris)
                from lidar_transfer_tpu.ops.tsdf_pallas import (
                    drain_label_checks)
                drain_label_checks()
                return state
            # transfer_fast stashed only the window (its frame program
            # never builds the RangeImage); project it now, off the hot
            # path, exactly as _mergemesh_core_deferred would have
            pts, rem, lbl, valid = merge_window(w)
            ri = P.range_project(
                pts, rem, lbl, valid, H=self.source.H, W=self.source.W,
                fov_up_deg=self.target.fov_up,
                fov_down_deg=self.target.fov_down,
                beam_angles=self.s_beam_angles)
            origin, active = self._frame_volume(pts, valid)
            pend = (ri, self.target.fov_up, self.target.fov_down,
                    origin, active)
            # keep the materialized record visible (bench --fusion and
            # other consumers read _pending_fusion after fused_state)
            self._pending_fusion = pend
            self._last_sources = ((ri, self.target.fov_up,
                                   self.target.fov_down),)
        ri, fov_up, fov_down, origin, active = pend
        geom = self._ensure_geom(fov_up, fov_down, ri.range.shape[0])
        state = self._integrate(self._take_state(), ri, fov_up, fov_down,
                                origin, active, reset=True, geom=geom,
                                write_weight=False)
        self._keep_state(state)
        self._fused = True
        # natural sync point: block-verify any pending async label-range
        # guards from integrate_pallas (labels >= 512 would have silently
        # corrupted the packed label+remission column)
        from lidar_transfer_tpu.ops.tsdf_pallas import drain_label_checks
        drain_label_checks()
        return state

    def _rolling_splat_core(self, pts, rem, lbl, valid, R_table, tau_table):
        """Jittable splat-path rolling-shutter body.

        Same physical model as the raymarcher path (pixel (h,w) looks
        along R_w·d from origin τ_w, generate_rays_moving): a surface
        point p lands at the column w whose sensor-frame direction
        R_w^T (p − τ_w) maps back to w — a fixed point in w solved by two
        iterations (ego motion over one frame moves u by ≪ 1 column per
        iteration). The single-fused-image splat knows every surface
        point EXACTLY (the winner points), so no band/zero-crossing is
        needed: candidates carry tsdf_v = 0 and their sensor-frame range
        is exact. ~2 ms/frame vs the raymarcher's ~1.5 s at reference
        scale (its lockstep while_loop pays hundreds of sequential
        volume gathers).
        """
        t = self.target
        si, is_first, depth = P.project_winner_order(
            pts, valid, H=self.source.H, W=self.source.W,
            fov_up_deg=t.fov_up, fov_down_deg=t.fov_down,
            beam_angles=self.s_beam_angles)
        stacked = jnp.concatenate(
            [pts, rem[:, None], lbl.astype(jnp.float32)[:, None]], axis=1)
        rows = stacked[si]
        p = rows[:, 0:3]
        c_rem = rows[:, 3]
        c_lbl = jnp.rint(rows[:, 4]).astype(jnp.int32)
        # winners only — NO label filter: label-0 (unlabeled) surfaces
        # stay opaque, matching the static fast body (is_first
        # unfiltered) and the raymarcher rolling fallback
        valid_c = is_first
        # the volume cast only ever hits content inside the configured
        # box — match that (config bounds; the per-frame clipped box of
        # non-fixed engines is a subset, documented deviation)
        lo = jnp.asarray(self.vol_spec.origin, jnp.float32)
        hi = lo + (jnp.asarray(self.vol_spec.dims, jnp.float32)
                   * jnp.float32(self.vol_spec.voxel_size))
        valid_c = valid_c & jnp.all((p >= lo) & (p < hi), axis=1)

        return self._rolling_reproject_core(p, c_lbl, c_rem, valid_c,
                                            R_table, tau_table)

    def _rolling_reproject_core(self, p, c_lbl, c_rem, valid_c,
                                R_table, tau_table):
        """Shared rolling-shutter tail: EXACT surface points ``p`` (in
        the primary frame) re-projected against the per-column moving
        origins (fixed point on firing time), then z-buffered into the
        target grid. Used by both the splat-window path (winner points)
        and the volume-band path (band samples corrected to the surface
        first)."""
        t = self.target
        W = t.W
        Rt = R_table.reshape(W, 9)
        def column_of(pos):
            yaw = -jnp.arctan2(pos[:, 1], pos[:, 0])
            u = 0.5 * (yaw / jnp.pi + 1.0) * W
            return jnp.clip(jnp.floor(u), 0, W - 1).astype(jnp.int32)

        w = column_of(p)                       # static first guess
        pos_s = p
        for _ in range(2):                     # fixed point on firing time
            Rw = Rt[w].reshape(-1, 3, 3)       # row gather, (N,3,3)
            tw = tau_table[w]
            q = p - tw
            # sensor-frame position: R_w^T q
            pos_s = jnp.einsum("nji,nj->ni", Rw, q)
            w = column_of(pos_s)

        from lidar_transfer_tpu.ops.splat import _target_assemble

        rng, lbl_o, rem_o, ends_s, mask = _target_assemble(
            pos_s, jnp.zeros_like(c_rem), c_lbl, c_rem, valid_c,
            jnp.asarray(t.fov_up, jnp.float32),
            jnp.asarray(t.fov_down, jnp.float32),
            self.t_beam_angles, H=t.H, W=t.W,
            beam_rows=self.t_beam_angles is not None,
            trunc=float(self.vol_spec.trunc_margin))
        # endpoints back to the primary frame: with tsdf_v = 0 the
        # assembled endpoint is exactly the winner's sensor-frame
        # position; pixel (h,w) re-enters the frame via (R_w, τ_w)
        ends = jnp.einsum("wij,hwj->hwi", R_table, ends_s)
        ends = jnp.where(mask[..., None], ends + tau_table[None], 0.0)
        return rng, lbl_o, rem_o, ends, mask

    def _rolling_volume_core(self, state, vol_origin, R_table, tau_table):
        """Rolling shutter for MATERIALIZED engines: volume-band surface
        points, moving-origin reprojection — the working equivalent of
        the reference's disabled create_rays_moving for every engine
        that fused a volume (round 4, VERDICT r3 #9; replaces the
        ~1.5 s/frame per-ray-origin raymarcher fallback with one band
        probe + reprojection, <100 ms at reference scale).

        Exactness: each band sample of a fused source ray lies ON that
        ray from the STATIC origin, so the zero-crossing correction
        ``t_surf = t + tsdf*trunc`` applies along the sample's own
        direction BEFORE reprojection — the corrected point is the same
        surface point the static splat would output; the moving-origin
        tail then re-projects it exactly (tsdf 0 downstream).
        """
        from lidar_transfer_tpu.ops.splat import _band_samples

        active_f = jnp.asarray(self.vol_spec.dims, jnp.float32)
        trunc = jnp.float32(self.vol_spec.trunc_margin)
        pos_l, lbl_l, rem_l, val_l = [], [], [], []
        for ri, fu, fd in self._last_sources:
            back = P.reverse_project(ri, fov_up_deg=fu, fov_down_deg=fd,
                                     preserve_float=True)
            pos, tc, tsdf_c, lbl_c, rem_c, found = _band_samples(
                state.tsdf, state.label, state.rem,
                ri.range.reshape(-1), back, ri.mask.reshape(-1),
                jnp.asarray(vol_origin, jnp.float32), active_f,
                dims=self.vol_spec.dims,
                voxel_size=self.vol_spec.voxel_size,
                samples_per_ray=8, label_probe=self.band_label_probe)
            # surface correction along the sample's own (static) ray
            ts = jnp.maximum(tc + tsdf_c * trunc, 0.0)
            scale = jnp.where(tc > 0, ts / jnp.maximum(tc, 1e-6), 0.0)
            pos_l.append(pos * scale[:, None])
            lbl_l.append(lbl_c)
            rem_l.append(rem_c)
            val_l.append(found)
        return self._rolling_reproject_core(
            jnp.concatenate(pos_l), jnp.concatenate(lbl_l),
            jnp.concatenate(rem_l).astype(jnp.float32),
            jnp.concatenate(val_l), R_table, tau_table)

    def resynthesize_rolling_shutter(self, pose_next: np.ndarray,
                                     frame: int | None = None,
                                     engine: str = "auto"
                                     ) -> VirtualScan:
        """Re-cast the last transferred frame with rolling-shutter rays.

        ``pose_next`` is the relative pose over one frame period
        (inv(pose[i]) @ pose[i+1]); each target column's rays originate at
        the interpolated sensor pose at its firing time
        (ops/raycast.generate_rays_moving — the working version of the
        reference's disabled create_rays_moving, laserscan.py:1035-1090).

        After ``transfer_stream`` pass ``frame=i`` (negative OK) to pick
        which streamed frame to re-cast; omitting it raises.

        Engine selection (``engine="auto"``): on the single-fused-image
        splat path the surface points are known exactly, so rolling
        shutter is a moving-origin reprojection (``_rolling_splat_core``,
        ~20 ms measured); materialized engines probe the volume band for
        the same exact surface points and reproject
        (``_rolling_volume_core``, 115 ms measured at reference scale —
        round 4, 17x the ~1.9 s raymarcher fallback it replaces; median
        range diff vs the splat oracle 0.008 m,
        scripts/probe_rolling_shutter.py). ``engine="raymarch"`` forces
        the per-ray-origin TSDF marcher (the general validation engine).
        """
        if engine not in ("auto", "raymarch"):
            raise ValueError(f"engine must be 'auto' or 'raymarch': "
                             f"{engine!r}")
        if frame is not None:
            self._select_stream_frame(frame)
        nstream = getattr(self, "_stream_stash", None)
        if nstream is not None:
            raise ValueError(
                f"resynthesize_rolling_shutter after transfer_stream is "
                f"ambiguous — pass frame=i to select one of the "
                f"{nstream} streamed frames")
        w = getattr(self, "_pending_window", None)
        t_frac = np.linspace(0.0, 1.0, self.target.W, endpoint=False)
        from lidar_transfer_tpu.ops.transforms import interpolate_pose
        poses_tbl = interpolate_pose(np.eye(4),
                                     np.asarray(pose_next, np.float64),
                                     t_frac)
        R_table = jnp.asarray(poses_tbl[:, :3, :3], jnp.float32)
        tau_table = jnp.asarray(poses_tbl[:, :3, 3], jnp.float32)
        if engine == "auto" and w is not None and self.synthesis == "splat":
            fn = getattr(self, "_rolling_jit", None)
            if fn is None:
                fn = jax.jit(
                    lambda win, R, tau: self._rolling_splat_core(
                        *merge_window(win), R, tau))
                self._rolling_jit = fn
            rng, lbl, rem, ends, mask = fn(w, R_table, tau_table)
            return VirtualScan(range=rng, label=lbl, remission=rem,
                               points=ends, mask=mask,
                               adaption="mergemesh-rolling")
        if engine == "auto":
            # materialized engines: band probe + moving-origin
            # reprojection (two eager jits — the gather stage must not
            # feed a kernel inside one program, CLAUDE.md probe 8)
            state = self.fused_state()
            vol_origin = jnp.asarray(
                getattr(self, "_last_origin", self.vol_spec.origin),
                jnp.float32)
            rng, lbl, rem, ends, mask = self._rolling_volume_core(
                state, vol_origin, R_table, tau_table)
            return VirtualScan(range=rng, label=lbl, remission=rem,
                               points=ends, mask=mask,
                               adaption="mergemesh-rolling")
        state = self.fused_state()
        t = self.target
        # SensorSpec.beam_angles are already radians (config.py)
        ba = (np.asarray(t.beam_angles)
              if t.beam_angles is not None else None)
        rays, origins = RC.generate_rays_moving(
            t.H, t.W, t.fov_up, t.fov_down, pose_next, beam_angles=ba)
        # the fused volume's ACTUAL placement: with per-frame clipped
        # bounds this differs from vol_spec.origin by meters
        vol_origin = jnp.asarray(
            getattr(self, "_last_origin", self.vol_spec.origin),
            jnp.float32)
        # Occupancy from the fused sources' surface endpoints (O(points)):
        # the class-aware integrate only touches voxels within trunc of a
        # range-image endpoint, so the reverse-projected winners cover the
        # whole written band. Without this, raycast_tsdf scans the full
        # volume (occupancy_grid) — at 1.07G voxels that transient OOMs
        # next to the live 8.6 GB state.
        occ = None
        for ri, fu, fd in getattr(self, "_last_sources", ()):
            # preserve_float: the winner's float coords reproduce its true
            # angles exactly (beam tables included)
            back = P.reverse_project(ri, fov_up_deg=fu, fov_down_deg=fd,
                                     preserve_float=True)
            o = RC.occupancy_from_points(
                back, ri.range.reshape(-1) > 0, vol_origin, self.vol_spec,
                pixel_angle_rad=self._src_pixel_angle(
                    fu, fd, ri.range.shape[0]))
            occ = o if occ is None else jnp.logical_or(occ, o)
        res = RC.raycast_tsdf(
            state, self.vol_spec, jnp.asarray(rays), jnp.asarray(origins),
            t.H, t.W, occ=occ, fine_step=2.0, vol_origin=vol_origin)
        return VirtualScan(range=res.range, label=res.label,
                           remission=res.remission, points=res.endpoints,
                           mask=res.hit, adaption="mergemesh-rolling")

    # volumes at or above this size use the device-side surface-cell
    # compaction instead of fetching the full state host-side (at the
    # reference operating point the full fetch is 8.6 GB; the compacted
    # candidate cells are ~1% of it)
    _CELLS_EXTRACT_MIN_VOX = 1 << 24

    def _use_cells_extract(self, extract: str) -> bool:
        if extract not in ("auto", "cells", "host"):
            raise ValueError(f"extract must be auto|cells|host: {extract!r}")
        if extract != "auto":
            return extract == "cells"
        return int(np.prod(self.vol_dims)) >= self._CELLS_EXTRACT_MIN_VOX

    def export_mesh(self, path: str, colorize=None,
                    extract: str = "auto") -> int:
        """Extract and write the fused volume's surface mesh as PLY.

        ≡ the reference's per-frame ``fl.meshwrite("test.ply", ...)``
        (laserscan.py:1010 + fusion_lidar.py:403-424) but opt-in (SURVEY.md
        flags the unconditional write as a slow side effect). Uses the last
        transferred frame's volume; returns the triangle count.

        Args:
          colorize: optional (max_label, 3) uint8 LUT applied to the
            nearest-voxel label of each vertex.
          extract: "host" fetches the full volume and marches host-side
            (the classic path); "cells" compacts candidate surface cells
            on device (ops/surface.py — same geometry, trilinear-gradient
            winding, ~1% of the device->host bytes); "auto" picks
            "cells" for volumes >= 2^24 voxels.
        """
        from lidar_transfer_tpu.utils.plyio import write_ply

        state = self.fused_state()
        origin = np.asarray(getattr(self, "_last_origin",
                                    self.vol_spec.origin), np.float32)
        if self._use_cells_extract(extract):
            from lidar_transfer_tpu.ops.marching import (
                marching_tetrahedra_cells)
            from lidar_transfer_tpu.ops.surface import extract_surface_cells

            want_labels = colorize is not None
            cells = extract_surface_cells(
                state.tsdf, state.label if want_labels else None,
                want_labels=want_labels)
            tris, tcell = marching_tetrahedra_cells(
                cells.idx, cells.vals, 0.0, return_cells=True)
            colors = None
            if want_labels and tris.shape[0]:
                g = np.rint(tris.reshape(-1, 3)).astype(np.int64)
                # a rounded vertex is always a corner of its OWN cell
                local = np.clip(
                    g - cells.idx[np.repeat(tcell, 3)], 0, 1)
                corner = local[:, 0] + 2 * local[:, 1] + 4 * local[:, 2]
                lbl = cells.labels[np.repeat(tcell, 3), corner]
                colors = colorize[np.clip(lbl, 0, colorize.shape[0] - 1)]
        else:
            from lidar_transfer_tpu.ops.marching import marching_tetrahedra

            tsdf = np.asarray(state.tsdf, np.float32)
            tris = marching_tetrahedra(tsdf, 0.0)
            colors = None
            if colorize is not None and tris.shape[0]:
                g = np.clip(np.rint(tris.reshape(-1, 3)).astype(int), 0,
                            np.asarray(self.vol_dims) - 1)
                lbl = np.asarray(state.label, np.int32)[
                    g[:, 0], g[:, 1], g[:, 2]]
                colors = colorize[np.clip(lbl, 0, colorize.shape[0] - 1)]
        world = tris * self.vol_spec.voxel_size + origin
        verts = world.reshape(-1, 3)
        faces = np.arange(verts.shape[0], dtype=np.int32).reshape(-1, 3)
        write_ply(path, verts, faces, colors=colors)
        return faces.shape[0]

    def _src_pixel_angle(self, fov_up=None, fov_down=None, H=None):
        """Max per-pixel angular extent of the fused source images —
        occupancy_from_points' lateral-footprint bound. fov/H for uniform
        rows, at least the max adjacent-beam gap when a beam table rules
        row assignment (rows span to the midpoint of each neighbor).

        The beam-gap term is frame-invariant and cached at first use:
        np.asarray of the device beam table is a blocking device->host
        read (~30 ms tunnel round trip) that must not recur per frame
        (this is called on the per-frame raymarch/rolling-shutter paths).
        """
        fu = self.source.fov_up if fov_up is None else fov_up
        fd = self.source.fov_down if fov_down is None else fov_down
        h = self.source.H if H is None else H
        ang = float(np.deg2rad(abs(fu - fd))) / max(int(h), 1)
        gap = getattr(self, "_s_beam_gap", None)
        if gap is None:
            gap = 0.0
            if self.s_beam_angles is not None:
                gaps = np.abs(np.diff(np.sort(
                    np.asarray(self.s_beam_angles))))
                if gaps.size:
                    gap = float(gaps.max())
            self._s_beam_gap = gap
        return max(ang, gap)

    def _raycast(self, state: TS.TSDFState, origin_vol, pts, valid
                 ) -> VirtualScan:
        # occupancy from the scan points (O(points)) — the volume-scan
        # variant costs ~76 ms/frame at reference-scale volumes; the
        # 2-voxel fine step is safe because the carve-only TSDF's negative
        # band is >= trunc (5 voxels) thick along any ray, and the
        # trilinear bisection refinement recovers sub-voxel range accuracy
        occ = RC.occupancy_from_points(
            pts, valid, origin_vol, self.vol_spec,
            pixel_angle_rad=self._src_pixel_angle())
        res = RC.raycast_tsdf(
            state, self.vol_spec, self.rays, jnp.zeros(3, jnp.float32),
            self.target.H, self.target.W, occ=occ, fine_step=2.0,
            vol_origin=origin_vol)
        return VirtualScan(
            range=res.range, label=res.label, remission=res.remission,
            points=res.endpoints, mask=res.hit, adaption="mesh")

    # ----------------------------------------------------------- mergemesh
    def _mergemesh_core(self, window: ScanWindow, state: TS.TSDFState,
                        geom=None):
        """Pure whole-frame body (jittable when fixed_bounds)."""
        pts, rem, lbl, valid = merge_window(window)
        ri = P.range_project(
            pts, rem, lbl, valid, H=self.source.H, W=self.source.W,
            fov_up_deg=self.target.fov_up, fov_down_deg=self.target.fov_down,
            beam_angles=self.s_beam_angles)
        origin, active = self._frame_volume(pts, valid)
        state = self._integrate(state, ri,
                                self.target.fov_up, self.target.fov_down,
                                origin, active, reset=True, geom=geom)
        vs = self._synthesize(
            state, origin, active,
            [(ri, self.target.fov_up, self.target.fov_down)], pts, valid)
        return (vs.range, vs.label, vs.remission, vs.points, vs.mask,
                ri, state, origin)

    def _mergemesh_core_deferred(self, window: ScanWindow):
        """Volume-free whole-frame body: projection + splat only.

        Identical output to ``_mergemesh_core`` when synthesis is "splat"
        (the single-source splat never reads the volume); the integrate
        runs lazily via ``fused_state()``.
        """
        pts, rem, lbl, valid = merge_window(window)
        ri = P.range_project(
            pts, rem, lbl, valid, H=self.source.H, W=self.source.W,
            fov_up_deg=self.target.fov_up, fov_down_deg=self.target.fov_down,
            beam_angles=self.s_beam_angles)
        origin, active = self._frame_volume(pts, valid)
        vs = self._synthesize(
            None, origin, active,
            [(ri, self.target.fov_up, self.target.fov_down)], pts, valid)
        return (vs.range, vs.label, vs.remission, vs.points, vs.mask,
                ri, origin, active)

    def mergemesh(self, window: ScanWindow
                  ) -> tuple[VirtualScan, P.RangeImage]:
        """Merged-cloud TSDF adaption ≡ laserscan.py:921-1012.

        Projection uses SOURCE image dims with TARGET FOV (the reference's
        chosen combination, laserscan.py:929+952) and the volume/raycast use
        target FOV (laserscan.py:968-969).

        With fixed_bounds the whole frame runs as ONE jitted program —
        per-call dispatch through the axon tunnel costs ~7 ms, so the
        previous ~7-call frame paid ~50 ms of pure dispatch.
        """
        if self._defer_active():
            if self.fixed_bounds:
                fn = getattr(self, "_mm_jit_deferred", None)
                if fn is None:
                    fn = jax.jit(self._mergemesh_core_deferred)
                    self._mm_jit_deferred = fn
                out = fn(window)
            else:
                out = self._mergemesh_core_deferred(window)
            rng, lbl, rem, ends, mask, ri, origin, active = out
            self._pending_fusion = (ri, self.target.fov_up,
                                    self.target.fov_down, origin, active)
            self._pending_window = None
            self._invalidate_stream()
            self._fused = False
            self._last_origin = origin
            self._last_sources = ((ri, self.target.fov_up,
                                   self.target.fov_down),)
            vs = VirtualScan(range=rng, label=lbl, remission=rem,
                             points=ends, mask=mask, adaption="mergemesh")
            return vs, ri

        geom = self._ensure_geom(self.target.fov_up, self.target.fov_down,
                                 self.source.H)
        if self._pallas_eligible(self.source.H):
            # the integrate below runs inside the whole-frame jit, where
            # the per-image packed-column guard is inert (tracer inputs);
            # guard the concrete window here instead
            from lidar_transfer_tpu.ops.tsdf_pallas import (
                enqueue_input_guard)

            enqueue_input_guard(window.labels, window.remissions,
                                window.valid)
        if self.fixed_bounds:
            fn = getattr(self, "_mm_jit", None)
            if fn is None:
                fn = jax.jit(self._mergemesh_core, donate_argnums=(1,))
                self._mm_jit = fn
            out = fn(window, self._take_state(), geom)
        else:
            out = self._mergemesh_core(window, self._take_state(), geom)
        rng, lbl, rem, ends, mask, ri, state, origin = out
        self._keep_state(state)
        self._fused = True
        self._pending_fusion = None
        self._pending_window = None
        self._invalidate_stream()
        self._last_origin = origin      # actual fused-volume placement
        self._last_sources = ((ri, self.target.fov_up,
                               self.target.fov_down),)
        vs = VirtualScan(range=rng, label=lbl, remission=rem, points=ends,
                         mask=mask, adaption="mergemesh")
        return vs, ri

    def _mergemesh_core_fast(self, window: ScanWindow):
        """Gather-free whole-frame body: winner flags + per-point splat.

        The deferred body still assembles the source RangeImage, whose
        five winner-attribute gathers (``attr[win_idx]`` at H*W indices)
        dominate the frame under the remote compiler's scalar-gather
        lowering (~5 ms of a 9 ms frame at 64x2048 — docs/PERF.md). This
        body skips image assembly entirely: ``project_winners`` marks the
        winning POINTS (one sort + one permutation scatter) and the splat
        consumes the ORIGINAL point arrays as its candidate source — the
        image path's ``reverse_project(preserve_float=True)`` reconstructs
        exactly these points from the winner images, so the candidate set
        is the same up to float round-trip ulps. Tie-break detail: target
        ties at exactly equal candidate depth resolve by original POINT
        order here vs source-pixel order on the image path (both
        deterministic; real LiDAR never ties exactly).
        """
        pts, rem, lbl, valid = merge_window(window)
        sp, si, is_first, depth = P.project_winner_order(
            pts, valid, H=self.source.H, W=self.source.W,
            fov_up_deg=self.target.fov_up,
            fov_down_deg=self.target.fov_down,
            beam_angles=self.s_beam_angles, return_pixels=True)
        # ONE row gather puts all candidate attributes in z-buffer order
        # (vectorized 2-D gather path) — no scatter back to point order
        # labels as float VALUES (exact below 2^24), never a bitcast —
        # small ints reinterpreted as f32 are subnormals and the TPU
        # float path flushes them to zero (ops/splat._target_assemble)
        stacked = jnp.concatenate(
            [pts, depth[:, None], rem[:, None],
             lbl.astype(jnp.float32)[:, None]], axis=1)
        rows = stacked[si]
        c_pts = rows[:, 0:3]
        c_depth = rows[:, 3]
        c_rem = rows[:, 4]
        c_lbl = jnp.rint(rows[:, 5]).astype(jnp.int32)
        origin, active = self._frame_volume(pts, valid)
        interp = interp_sources = None
        if self._interp_active:
            # UPSAMPLING targets: the chord interpolation needs an
            # image-gridded view of the winners. The sorted rows carry
            # every winner tagged with its pixel (sp) — densify them
            # into raster order with ONE int32 index scatter + ONE
            # (HW, 6) row gather (exactly _target_assemble's win_idx
            # pattern: int scatters and row gathers are the two classes
            # this compiler lowers well; scattering the 6 float columns
            # + a bool directly measured ~7x the bytes and put the
            # round-4 first cut at 76-96 scans/s, BELOW the classic
            # body it replaced), instead of running the classic
            # RangeImage-assembling body whose larger gather surface
            # drew a slow remote lowering 1-in-5 (BASELINE.md round-3
            # upsampling floor campaign: 91 vs 123 scans/s).
            # Chord endpoints are the winners' ORIGINAL points — the
            # classic body's reverse_project(preserve_float=True)
            # reconstructs exactly these up to float ulps (same accepted
            # deviation as the fast body's own candidates).
            sH, sW = self.source.H, self.source.W
            npix = sH * sW
            imax = jnp.int32(2**31 - 1)
            tgt = jnp.where(is_first, sp, npix)
            win = jnp.full((npix + 1,), imax, jnp.int32).at[tgt].set(
                jnp.where(is_first,
                          jnp.arange(rows.shape[0], dtype=jnp.int32),
                          imax),
                mode="drop")[:npix]
            img_valid = win != imax
            img = rows[jnp.where(img_valid, win, 0)]   # ONE row gather
            interp_sources = [(
                img[:, 3], img[:, 0:3], img_valid,
                jnp.rint(img[:, 5]).astype(jnp.int32), img[:, 4])]
            interp = (sH, sW, self._interp_mv, self._interp_mu,
                      float(np.tan(np.radians(self.interp_angle_deg))),
                      self._interp_vspan)
        from lidar_transfer_tpu.ops.splat import splat_synthesize

        rng, lbl_o, rem_o, ends, mask = splat_synthesize(
            None, self.vol_spec, [(c_depth, c_pts, is_first, c_lbl,
                                   c_rem)],
            target_H=self.target.H, target_W=self.target.W,
            fov_up_deg=self.target.fov_up,
            fov_down_deg=self.target.fov_down,
            vol_origin=origin, active_dims=active,
            beam_angles=self.t_beam_angles, attrs="image",
            interp=interp, interp_sources=interp_sources)
        return rng, lbl_o, rem_o, ends, mask, origin

    def transfer_fast(self, window: ScanWindow) -> VirtualScan:
        """Throughput-path transfer: VirtualScan only, no RangeImage.

        The production streaming entry (bench.py, CLI): identical
        synthesis semantics to ``transfer()`` up to float round-trip ulps
        (see ``_mergemesh_core_fast``), but the per-frame program contains
        no winner-attribute gathers. ``fused_state()`` still works — the
        window is stashed and the RangeImage + integrate run lazily on
        first demand (PLY export, rolling shutter, attrs="volume").

        Falls back to ``transfer()`` where the fast body doesn't apply
        (non-mergemesh adaption or raymarch synthesis).
        """
        if self.cfg.adaption == "cp":
            fn = getattr(self, "_cp_jit_fast", None)
            if fn is None:
                fn = jax.jit(self._cp_core_fast)
                self._cp_jit_fast = fn
            rng, lbl, rem, ends, mask = fn(window)
            self._invalidate_stream()
            return VirtualScan(range=rng, label=lbl, remission=rem,
                               points=ends, mask=mask, adaption="cp")
        if not (self._mm_family_fast and self.synthesis == "splat"
                # upsampling default-routes to the classic deferred body
                # (equally volume-free; measured faster — see
                # _interp_body_fast)
                and (not self._interp_active or self._interp_body_fast)):
            return self.transfer(window)[0]
        if self.fixed_bounds:
            fn = getattr(self, "_mm_jit_fast", None)
            if fn is None:
                fn = jax.jit(self._mergemesh_core_fast)
                self._mm_jit_fast = fn
            out = fn(window)
        else:
            out = self._mergemesh_core_fast(window)
        rng, lbl, rem, ends, mask, origin = out
        self._pending_fusion = None
        self._pending_window = window
        self._pending_mode = "mergemesh"
        self._invalidate_stream()
        self._fused = False
        self._last_origin = origin
        return VirtualScan(range=rng, label=lbl, remission=rem,
                           points=ends, mask=mask,
                           adaption=self.cfg.adaption)

    def transfer_stream(self, windows: ScanWindow) -> VirtualScan:
        """Mini-batched throughput entry: F frames, ONE device program.

        ``windows`` carries a leading FRAME axis on every array field
        (stack F independent ``ScanWindow``s); the gather-free fast body
        runs under ``lax.scan`` so the whole batch is a single launch.
        After the gather-free rewrite the single-frame path is dominated
        by per-program launch overhead (~1.8 ms through the remote
        runtime vs a 2.6 ms device frame); batching amortizes it, and
        the gain keeps climbing with F (fetch-synced 6-batch loops:
        333/389/417/443 scans/s at F=16/32/64/128 — within 5% of the
        2.17 ms/frame device floor at F=128; bench.py --stream,
        docs/PERF.md round-3 close-out).

        Returns a VirtualScan whose fields have the leading frame axis.
        The lazy consumers afterwards need an explicit frame:
        ``fused_state(frame=i)`` / ``resynthesize_rolling_shutter(...,
        frame=i)`` select a streamed frame; omitting ``frame=`` raises
        (the implicit last-frame default was an API trap, VERDICT r3
        weak #4). Falls back to a python loop over ``transfer_fast``
        when the scan body does not apply (non-mergemesh adaption,
        raymarch synthesis, or per-frame clipped bounds) — same
        frame-indexed semantics on deferred paths.
        """
        if self.cfg.adaption == "cp":
            fn = getattr(self, "_cp_jit_stream", None)
            if fn is None:
                def cp_stream(ws):
                    def step(carry, w):
                        return carry, self._cp_core_fast(w)
                    _, outs = jax.lax.scan(step, 0, ws)
                    return outs
                fn = jax.jit(cp_stream)
                self._cp_jit_stream = fn
            rng, lbl, rem, ends, mask = fn(windows)
            self._pending_fusion = None
            self._pending_window = None
            self._invalidate_stream()   # cp has no volume to select into
            self._fused = False
            return VirtualScan(range=rng, label=lbl, remission=rem,
                               points=ends, mask=mask, adaption="cp")
        if (self.cfg.adaption == "mesh" and self.fixed_bounds
                and self._defer_mesh_active()):
            fn = getattr(self, "_mesh_jit_stream", None)
            if fn is None:
                def mesh_stream(ws):
                    def step(carry, w):
                        return carry, self._mesh_fast_body(w)[0]
                    _, outs = jax.lax.scan(step, 0, ws)
                    return outs
                fn = jax.jit(mesh_stream)
                self._mesh_jit_stream = fn
            rng, lbl, rem, ends, mask = fn(windows)
            self._pending_fusion = None
            self._pending_window = None      # select with frame=i
            self._pending_mode = "mesh"
            self._pending_origin = None      # fixed bounds: recomputed
            self._fused = False
            self._stream_stash = windows.points.shape[0]
            self._stream_windows = windows
            self._last_origin = jnp.asarray(self.vol_spec.origin,
                                            jnp.float32)
            return VirtualScan(range=rng, label=lbl, remission=rem,
                               points=ends, mask=mask, adaption="mesh")
        if not (self._mm_family_fast and self.synthesis == "splat"
                and self.fixed_bounds):
            outs = [self.transfer_fast(
                jax.tree.map(lambda x, i=i: x[i], windows))
                for i in range(windows.points.shape[0])]
            # the loop's last transfer_fast stashed only the FINAL
            # frame; when the per-frame path is deferred (it left a
            # window stash) re-arm the stream markers so the lazy
            # consumers behave exactly as after the scanned stream —
            # frame=i selects, omitting frame= raises the ambiguity
            # guard instead of silently meaning "last frame".
            # _pending_origin is cleared so a clipped-bounds mesh
            # selection recomputes the SELECTED frame's own volume
            # placement (the stash held the last frame's). Eager paths
            # (_pending_window None) materialized their volume
            # sequentially and keep the documented last-state behavior.
            if getattr(self, "_pending_window", None) is not None:
                self._pending_window = None
                self._pending_origin = None
                self._stream_stash = windows.points.shape[0]
                self._stream_windows = windows
            return VirtualScan(
                range=jnp.stack([o.range for o in outs]),
                label=jnp.stack([o.label for o in outs]),
                remission=jnp.stack([o.remission for o in outs]),
                points=jnp.stack([o.points for o in outs]),
                mask=jnp.stack([o.mask for o in outs]),
                adaption=outs[0].adaption)
        fn = getattr(self, "_mm_jit_stream", None)
        if fn is None:
            # upsampling targets stream the classic deferred body by
            # default; LT_INTERP_STREAM_BODY=fast streams the round-4
            # interpolating fast body instead (measured slower — the
            # _interp_body_fast note has the trace/probe evidence)
            body = (self._mergemesh_core_fast
                    if not self._interp_active or self._interp_body_fast
                    else self._mergemesh_core_deferred)

            def stream(ws):
                def step(carry, w):
                    out = body(w)
                    return carry, out[:5]
                _, outs = jax.lax.scan(step, 0, ws)
                return outs
            fn = jax.jit(stream)
            self._mm_jit_stream = fn
        rng, lbl, rem, ends, mask = fn(windows)
        self._pending_fusion = None
        self._pending_window = None          # select with frame=i
        self._pending_mode = "mergemesh"
        self._fused = False
        self._stream_stash = windows.points.shape[0]
        self._stream_windows = windows
        self._last_origin = jnp.asarray(self.vol_spec.origin, jnp.float32)
        return VirtualScan(range=rng, label=lbl, remission=rem,
                           points=ends, mask=mask,
                           adaption=self.cfg.adaption)

    def _project_window_scans(self, w: ScanWindow):
        """Shared per-scan projection stage of the mesh adaption
        (transform to the primary frame + one source-spec range image
        per scan). Used by the staged jits, the whole-frame fold body,
        and _mesh_core so the three paths cannot drift."""
        from lidar_transfer_tpu.ops.transforms import transform_points

        pts_all = transform_points(w.points, w.rel_pose)
        ris = tuple(
            P.range_project(
                pts_all[s], w.remissions[s], w.labels[s], w.valid[s],
                H=self.source.H, W=self.source.W,
                fov_up_deg=self.source.fov_up,
                fov_down_deg=self.source.fov_down,
                beam_angles=self.s_beam_angles)
            for s in range(w.points.shape[0]))
        return pts_all, ris

    # ---------------------------------------------------------------- mesh
    def _mesh_core(self, window: ScanWindow, state: TS.TSDFState,
                   geom=None):
        pts_all, ris = self._project_window_scans(window)
        flat_pts = pts_all.reshape(-1, 3)
        flat_valid = window.valid.reshape(-1)
        origin, active = self._frame_volume(flat_pts, flat_valid)

        fused = []
        for s, ri in enumerate(ris):
            fused.append((ri, self.source.fov_up, self.source.fov_down))
            state = self._integrate(state, ri, self.source.fov_up,
                                    self.source.fov_down, origin, active,
                                    reset=(s == 0), geom=geom)
        vs = self._synthesize(state, origin, active, fused,
                              flat_pts, flat_valid)
        return (vs.range, vs.label, vs.remission, vs.points, vs.mask,
                tuple(ri for ri, _, _ in fused), state, origin)

    def _mesh_fast_body(self, w: ScanWindow):
        """Jittable volume-free mesh frame (fold synthesis; fixed_bounds
        — the volume placement must be static). Returns
        ((range, label, rem, endpoints, mask), primary RangeImage)."""
        pts_all, ris = self._project_window_scans(w)
        flat_pts = pts_all.reshape(-1, 3)
        flat_valid = w.valid.reshape(-1)
        origin = jnp.asarray(self.vol_spec.origin, jnp.float32)
        active = jnp.asarray(self.vol_spec.dims, jnp.int32)
        fused = [(ri, self.source.fov_up, self.source.fov_down)
                 for ri in ris]
        vs = self._synthesize(None, origin, active, fused, flat_pts,
                              flat_valid)
        return ((vs.range, vs.label, vs.remission, vs.points, vs.mask),
                ris[0])

    def _mesh_stage_jits(self):
        """Cached per-stage jits for the staged mesh pipeline."""
        jits = getattr(self, "_mesh_jits", None)
        if jits is None:
            from lidar_transfer_tpu.ops.transforms import transform_points

            def proj(window: ScanWindow):
                pts_all, ris = self._project_window_scans(window)
                return pts_all.reshape(-1, 3), ris

            def synth(state, origin, active, ris, flat_pts, flat_valid):
                fused = [(ri, self.source.fov_up, self.source.fov_down)
                         for ri in ris]
                vs = self._synthesize(state, origin, active, fused,
                                      flat_pts, flat_valid)
                return vs.range, vs.label, vs.remission, vs.points, vs.mask

            jits = (jax.jit(proj), jax.jit(synth))
            self._mesh_jits = jits
        return jits

    def mesh(self, window: ScanWindow) -> tuple[VirtualScan, P.RangeImage]:
        """Per-scan TSDF adaption ≡ laserscan.py:863-918: each scan gets
        its own range image at the SOURCE spec, integrated sequentially.

        With ``mesh_attrs="fold"`` (default) the integrates DEFER off the
        hot path entirely — the fold synthesis reproduces the class-aware
        collision semantics from the aligned images
        (ops/splat._band_samples_fold), and ``fused_state()``
        materializes the chained volume on demand
        (ops/tsdf_pallas.integrate_pallas_chain).

        Otherwise: staged dispatch, not one whole-frame jit — the remote
        compiler lowers the integrate's column gather ~5x slower when it
        shares a program with the pallas kernel (ops/tsdf_pallas.py
        docstring), so the frame runs as [projection jit] -> nscans x
        [eager 2-stage integrate] -> [synthesis jit]. The dispatches
        pipeline; device work is serialized either way.
        """
        if self._defer_mesh_active():
            if self.fixed_bounds:
                # whole-frame jit: the fold path has no pallas_call and
                # no big gathers, so the staged-dispatch split (below)
                # isn't needed — one launch per frame
                fn = getattr(self, "_mesh_fast_jit", None)
                if fn is None:
                    fn = jax.jit(self._mesh_fast_body)
                    self._mesh_fast_jit = fn
                (rng, lbl, rem, ends, mask), ri0 = fn(window)
                origin = jnp.asarray(self.vol_spec.origin, jnp.float32)
                active = jnp.asarray(self.vol_spec.dims, jnp.int32)
            else:
                proj_jit, synth_jit = self._mesh_stage_jits()
                flat_pts, ris = proj_jit(window)
                flat_valid = window.valid.reshape(-1)
                origin, active = self._frame_volume(flat_pts, flat_valid)
                rng, lbl, rem, ends, mask = synth_jit(
                    None, origin, active, ris, flat_pts, flat_valid)
                ri0 = ris[0]
            self._pending_fusion = None
            self._pending_window = window
            self._pending_mode = "mesh"
            self._pending_origin = (origin, active)
            self._invalidate_stream()
            self._fused = False
            self._last_origin = origin
            vs = VirtualScan(range=rng, label=lbl, remission=rem,
                             points=ends, mask=mask, adaption="mesh")
            return vs, ri0

        geom = self._ensure_geom(self.source.fov_up, self.source.fov_down,
                                 self.source.H)
        if not self.fixed_bounds:
            out = self._mesh_core(window, self._take_state(), geom)
            rng, lbl, rem, ends, mask, ris, state, origin = out
            self._keep_state(state)
            self._fused = True
            self._pending_fusion = None
            self._pending_window = None
            self._invalidate_stream()
            self._last_origin = origin
            self._last_sources = tuple(
                (ri, self.source.fov_up, self.source.fov_down)
                for ri in ris)
            vs = VirtualScan(range=rng, label=lbl, remission=rem,
                             points=ends, mask=mask, adaption="mesh")
            return vs, ris[0]

        proj_jit, synth_jit = self._mesh_stage_jits()
        flat_pts, ris = proj_jit(window)
        origin = jnp.asarray(self.vol_spec.origin, jnp.float32)
        active = jnp.asarray(self.vol_spec.dims, jnp.int32)
        state = self._integrate_chain(
            self._take_state(), ris, self.source.fov_up,
            self.source.fov_down, origin, active, geom)
        flat_valid = window.valid.reshape(-1)
        rng, lbl, rem, ends, mask = synth_jit(state, origin, active, ris,
                                              flat_pts, flat_valid)
        self._keep_state(state)
        self._fused = True
        self._pending_fusion = None
        self._pending_window = None
        self._invalidate_stream()
        self._last_origin = origin
        self._last_sources = tuple(
            (ri, self.source.fov_up, self.source.fov_down) for ri in ris)
        vs = VirtualScan(range=rng, label=lbl, remission=rem, points=ends,
                         mask=mask, adaption="mesh")
        return vs, ris[0]

    # ------------------------------------------------------------- catmesh
    def catmesh(self, window: ScanWindow
                ) -> tuple[VirtualScan, P.RangeImage]:
        """Category-mesh adaption — implemented where the reference only
        stubs it ("TODO Category Mesh", laserscan.py:1014-1019).

        Working interpretation of the reference's intent: extract one
        iso-surface PER semantic category instead of one global surface,
        so adjacent categories never share mesh triangles — a hit's label
        is exact by construction (no label bleed across category
        boundaries, which the plain mesh path resolves per-pixel).

        Pipeline: the merged cloud is projected and fused exactly like
        mergemesh (one class-aware integrate — the label volume already
        assigns every band voxel to one category); then for each category
        ``c`` present, the masked field ``tsdf where label==c else +1``
        yields that category's surface via marching tetrahedra; the
        concatenated per-category meshes are raycast nearest-hit with the
        target ray grid (native BVH when available, dense JAX
        Möller–Trumbore sweep otherwise).

        Engines (``catmesh_engine``): "splat" (default) runs the
        production band-splat body — it already has catmesh's defining
        property (every candidate carries its own source pixel's exact
        label, so labels never bleed across category seams; see the
        ``catmesh_engine`` field note for the sub-voxel seam argument)
        and streams at the mergemesh headline rate (BASELINE.md; the
        ≥10 scans/s round-4 target is exceeded ~40x). "oracle" is the
        literal per-category construction below — host marching + mesh
        raycast, cost scaling with surface area x rays (0.42 scans/s at
        clipped bounds); it remains the parity/PLY engine, differentially
        tested against the splat in tests/test_surface.py.

        Engine note: the native BVH caster and the dense JAX
        Möller–Trumbore fallback may disagree at a small number of
        category-SEAM pixels (adjacent categories emit coincident
        triangles whose ray hits tie at machine epsilon; ~0.7% of hit
        pixels on the synthetic fixture). Both resolve to a valid nearest
        surface; which category wins the seam is engine-dependent.
        """
        if self.catmesh_engine == "splat":
            vs, ri = self.mergemesh(window)
            return vs._replace(adaption="catmesh"), ri

        from lidar_transfer_tpu.ops.marching import (dedupe_mesh,
                                                     marching_tetrahedra)

        pts, rem, lbl, valid = merge_window(window)
        ri = P.range_project(
            pts, rem, lbl, valid, H=self.source.H, W=self.source.W,
            fov_up_deg=self.target.fov_up, fov_down_deg=self.target.fov_down,
            beam_angles=self.s_beam_angles)
        origin, active = self._frame_volume(pts, valid)
        geom = self._ensure_geom(self.target.fov_up, self.target.fov_down,
                                 self.source.H)
        state = self._integrate(self._take_state(), ri,
                                self.target.fov_up, self.target.fov_down,
                                origin, active, reset=True, geom=geom,
                                write_weight=False)
        self._keep_state(state)
        self._fused = True
        self._pending_fusion = None
        self._pending_window = None
        self._invalidate_stream()
        self._last_origin = origin
        self._last_sources = ((ri, self.target.fov_up,
                               self.target.fov_down),)

        origin_np = np.asarray(origin, np.float32)

        verts_l, faces_l, lbl_l, rem_l = [], [], [], []
        v_off = 0
        if self._use_cells_extract("auto"):
            # device-side candidate compaction (ops/surface.py): the
            # seam-aware candidate set is a superset of every
            # per-category field's crossing cells, so each category's
            # field is re-derivable from the K compacted cells' corner
            # labels alone — no full-volume fetch, no per-category
            # full-volume passes
            from lidar_transfer_tpu.ops.marching import (
                marching_tetrahedra_cells)
            from lidar_transfer_tpu.ops.surface import (
                extract_surface_cells)

            cells = extract_surface_cells(
                state.tsdf, state.label, state.rem, seams=True,
                want_labels=True, want_rems=True)
            cats = np.unique(cells.labels[cells.vals < 0]) \
                if cells.idx.shape[0] else np.zeros((0,), np.int32)
            for c in cats[cats > 0]:
                fv = np.where(cells.labels == int(c), cells.vals,
                              np.float32(1.0))
                sub = np.flatnonzero((fv.min(axis=1) < 0)
                                     & (fv.max(axis=1) >= 0))
                tri, tcell = marching_tetrahedra_cells(
                    cells.idx[sub], fv[sub], 0.0, return_cells=True)
                if tri.shape[0] == 0:
                    continue
                verts, faces, vsoup = dedupe_mesh(tri, return_index=True)
                # rounded vertex -> a corner of its OWN cell
                g = np.round(verts).astype(np.int64)
                rows = sub[tcell[vsoup // 3]]
                local = np.clip(g - cells.idx[rows], 0, 1)
                corner = (local[:, 0] + 2 * local[:, 1]
                          + 4 * local[:, 2])
                verts_l.append(verts * self.vol_spec.voxel_size
                               + origin_np)
                faces_l.append(faces + v_off)
                lbl_l.append(np.full(verts.shape[0], int(c), np.int32))
                rem_l.append(cells.rems[rows, corner])
                v_off += verts.shape[0]
        else:
            tsdf = np.asarray(state.tsdf, np.float32)
            label_vol = np.asarray(state.label, np.int32)
            rem_vol = np.asarray(state.rem, np.float32)
            for c in np.unique(label_vol[label_vol > 0]):
                # the category's own signed field: other categories'
                # voxels read as +1 (outside), so the zero crossing
                # wraps ONLY this category's band
                field = np.where(label_vol == int(c), tsdf,
                                 np.float32(1.0))
                tri = marching_tetrahedra(field, 0.0)
                if tri.shape[0] == 0:
                    continue
                verts, faces = dedupe_mesh(tri)
                gi = np.clip(np.round(verts).astype(np.int64), 0,
                             np.asarray(tsdf.shape) - 1)
                verts_l.append(verts * self.vol_spec.voxel_size
                               + origin_np)
                faces_l.append(faces + v_off)
                lbl_l.append(np.full(verts.shape[0], int(c), np.int32))
                rem_l.append(rem_vol[gi[:, 0], gi[:, 1], gi[:, 2]])
                v_off += verts.shape[0]

        tH, tW = self.target.H, self.target.W
        if not verts_l:
            zero = jnp.zeros((tH, tW), jnp.float32)
            vs = VirtualScan(range=zero, label=zero.astype(jnp.int32),
                             remission=zero,
                             points=jnp.zeros((tH, tW, 3), jnp.float32),
                             mask=zero.astype(bool), adaption="catmesh")
            return vs, ri
        verts = np.concatenate(verts_l)
        faces = np.concatenate(faces_l)
        v_lbl = np.concatenate(lbl_l)
        v_rem = np.concatenate(rem_l).astype(np.float32)
        rays = np.asarray(self.rays, np.float32)

        from lidar_transfer_tpu import native

        if native.available():
            res = native.trace_mesh(rays, np.zeros(3, np.float32), verts,
                                    faces, v_lbl, v_rem)
            rng_i = res.range.reshape(tH, tW)
            lbl_i = res.labels.reshape(tH, tW)
            rem_i = res.remissions.reshape(tH, tW)
            ends = res.endpoints.reshape(tH, tW, 3)
            mask = (res.tri >= 0).reshape(tH, tW)
        else:
            from lidar_transfer_tpu.ops.triangles import (
                mesh_hit_attributes, raycast_mesh)

            tris = verts[faces]                       # (T,3,3)
            hits = raycast_mesh(jnp.zeros((rays.shape[0], 3), jnp.float32),
                                jnp.asarray(rays), jnp.asarray(tris))
            lbl_f, rem_f = mesh_hit_attributes(hits, faces, v_lbl, v_rem)
            mask = np.asarray(hits.hit).reshape(tH, tW)
            rng_i = np.where(mask, np.asarray(hits.t).reshape(tH, tW), 0.0)
            lbl_i = np.where(mask, np.asarray(lbl_f).reshape(tH, tW), 0)
            rem_i = np.where(mask, np.asarray(rem_f).reshape(tH, tW), 0.0)
            ends = rays.reshape(tH, tW, 3) * rng_i[..., None]
        vs = VirtualScan(
            range=jnp.asarray(rng_i), label=jnp.asarray(lbl_i, jnp.int32),
            remission=jnp.asarray(rem_i), points=jnp.asarray(ends),
            mask=jnp.asarray(mask), adaption="catmesh")
        return vs, ri

    # ------------------------------------------------------------ dispatch
    def transfer(self, window: ScanWindow
                 ) -> tuple[VirtualScan, P.RangeImage]:
        adaption = self.cfg.adaption
        if adaption == "cp":
            return self.cp(window)
        if adaption == "mergemesh":
            return self.mergemesh(window)
        if adaption == "mesh":
            return self.mesh(window)
        if adaption == "catmesh":
            return self.catmesh(window)
        raise ValueError(f"Adaption method not recognized: {adaption!r}")
