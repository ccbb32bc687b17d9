"""Device-side surface-cell extraction from TSDF volumes.

The mesh/PLY consumers (``TransferEngine.export_mesh``, the ``catmesh``
adaption — ≡ the reference's ``TSDFVolume.get_mesh`` path,
fusion_lidar.py:395-424, which calls ``get_volume`` to fetch the FULL
volume device→host before skimage's marching cubes) only ever need the
~1% of cells whose corners straddle the iso level. At the reference
operating point the full fetch is 8.6 GB of volume state; this module
compacts the candidate cells ON DEVICE and ships only them:

  pass 1 — per X-slab, a jitted elementwise sweep marks candidate cells
           (corner min < level <= corner max; optionally label-seam
           cells for catmesh) and packs the mask to BITS (uint8 ``dot``
           with power-of-two weights — 1/32 the bytes of a bool fetch);
           the host unpacks and ``flatnonzero``s each slab.
  pass 2 — per slab, the candidate coordinates go back up and a jitted
           gather fetches the 8 corner values (and, on request, corner
           labels/remissions) in the volumes' native compact dtypes.

Everything uses ops this stack lowers reliably (elementwise sweeps,
small gathers); there is no scatter, sort, or device-side compaction —
the irregular part (flatnonzero) runs on the host over packed bits.
Output feeds ``ops.marching.marching_tetrahedra_cells``: same geometry
as the classic full-volume path, never materializing it host-side.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np


class SurfaceCells(NamedTuple):
    """Compacted candidate cells (host numpy).

    idx:    (K, 3) int32 cell coordinates (cells span [idx, idx+1])
    vals:   (K, 8) float32 corner field values, _CORNERS bit order
            (corner = x + 2y + 4z)
    labels: (K, 8) int32 corner labels, or None
    rems:   (K, 8) float32 corner remissions, or None
    """

    idx: np.ndarray
    vals: np.ndarray
    labels: np.ndarray | None
    rems: np.ndarray | None


def _corner_slabs(slab):
    """All 8 corner-shifted views of a (C+1, Y, Z) slab: (C, Y-1, Z-1)."""
    C1, Y, Z = slab.shape
    return [slab[dx:C1 - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
            for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


@functools.lru_cache(maxsize=None)
def _cand_bits_sized(seams: bool, level: float, C: int):
    """Jitted: full volume(s) + traced x0 -> packed uint8 candidate bits
    for the C x-rows of cells starting at x0. One compile per C."""
    jax, jnp = _jax()

    @jax.jit
    def run(tsdf, label, x0):
        slab = jax.lax.dynamic_slice_in_dim(tsdf, x0, C + 1, axis=0)
        slab = slab.astype(jnp.float32)
        corners = _corner_slabs(slab)
        mn = mx = corners[0]
        for c in corners[1:]:
            mn = jnp.minimum(mn, c)
            mx = jnp.maximum(mx, c)
        if seams:
            lslab = jax.lax.dynamic_slice_in_dim(label, x0, C + 1, axis=0)
            lcs = _corner_slabs(lslab)
            same = None
            for lc in lcs[1:]:
                eq = lc == lcs[0]
                same = eq if same is None else (same & eq)
            # any corner inside AND (any corner outside OR a label seam
            # among the corners): superset of every per-category
            # candidate set (see pipeline.deform.catmesh)
            cand = (mn < level) & ((mx >= level) | ~same)
        else:
            cand = (mn < level) & (mx >= level)
        flat = cand.reshape(-1)
        pad = (-flat.shape[0]) % 8
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad,), flat.dtype)])
        w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
        packed = (flat.reshape(-1, 8).astype(jnp.int32) * w).sum(axis=1)
        return packed.astype(jnp.uint8)

    return run


@functools.lru_cache(maxsize=None)
def _gather_cells_sized(K: int, want_labels: bool, want_rems: bool):
    """Jitted: full volumes + (K, 3) cell coords -> corner values in the
    volumes' native dtypes (bf16/i16 fetch = half the bytes of f32/i32).
    One compile per K bucket."""
    jax, jnp = _jax()

    @jax.jit
    def run(tsdf, label, rem, flat):
        # flat = (x*Y + y)*Z + z cell index, i32 — uploaded flat instead
        # of (K, 3) to cut the host->device bytes by 3 (the upload rides
        # the same ~42 MB/s tunnel as the fetches)
        X, Y, Z = tsdf.shape
        tf = tsdf.reshape(-1)
        lf = label.reshape(-1) if want_labels else None
        rf = rem.reshape(-1) if want_rems else None
        vals, labs, rems = [], [], []
        # _CORNERS bit order: corner = x + 2y + 4z (z outer, x inner)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    off = flat + ((dx * Y + dy) * Z + dz)
                    vals.append(jnp.take(tf, off))
                    if want_labels:
                        labs.append(jnp.take(lf, off))
                    if want_rems:
                        rems.append(jnp.take(rf, off))
        out = [jnp.stack(vals, axis=1)]
        out.append(jnp.stack(labs, axis=1) if want_labels else None)
        out.append(jnp.stack(rems, axis=1) if want_rems else None)
        return tuple(o for o in out if o is not None)

    return run


def _bucket(n: int, lo: int = 4096) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def extract_surface_cells(tsdf, label=None, rem=None, *,
                          level: float = 0.0, seams: bool = False,
                          want_labels: bool = False,
                          want_rems: bool = False,
                          x_chunk: int = 256) -> SurfaceCells:
    """Compact the volume's candidate surface cells on device.

    Args:
      tsdf:   (X, Y, Z) device array (any float dtype; bf16 ships as-is)
      label:  (X, Y, Z) labels — required when ``seams`` or
              ``want_labels``
      rem:    (X, Y, Z) remissions — required when ``want_rems``
      level:  iso level
      seams:  also mark cells whose corners are all inside but carry
              MIXED labels (category-seam cells — the per-category
              fields of ``catmesh`` cross there)
      x_chunk: cells per slab; bounds device temporaries and host
              unpack chunks

    Returns SurfaceCells (host numpy, f32/i32). Candidate order is the
    volume C order — identical to ``np.argwhere`` on the full mask, so
    downstream triangle emission matches the classic path exactly.
    """
    jax, jnp = _jax()

    X, Y, Z = tsdf.shape
    if (seams or want_labels) and label is None:
        raise ValueError("label volume required for seams/want_labels")
    if want_rems and rem is None:
        raise ValueError("rem volume required for want_rems")
    label_dev = label if label is not None else tsdf
    rem_dev = rem if rem is not None else tsdf

    cells_x = X - 1
    ncell_slab = {}
    # pass 1: packed candidate bits per slab (pipelined dispatches; each
    # fetch is bits/8 bytes)
    packed_per_slab = []
    slab_starts = list(range(0, cells_x, x_chunk))
    for x0 in slab_starts:
        C = min(x_chunk, cells_x - x0)
        fn = _cand_bits_sized(bool(seams), float(level), C)
        packed_per_slab.append(
            fn(tsdf, label_dev, jnp.int32(x0)))
        ncell_slab[x0] = C
    # host: unpack + flatnonzero each slab (C order within and across)
    idx_parts = []
    for x0, packed in zip(slab_starts, packed_per_slab):
        C = ncell_slab[x0]
        bits = np.unpackbits(np.asarray(packed), bitorder="little")
        n = C * (Y - 1) * (Z - 1)
        flat = np.flatnonzero(bits[:n])
        if flat.size == 0:
            continue
        lx, r = np.divmod(flat, (Y - 1) * (Z - 1))
        ly, lz = np.divmod(r, Z - 1)
        idx_parts.append(np.stack(
            [lx + x0, ly, lz], axis=1).astype(np.int32))
    if not idx_parts:
        e32 = np.zeros((0, 8), np.float32)
        return SurfaceCells(
            np.zeros((0, 3), np.int32), e32,
            np.zeros((0, 8), np.int32) if want_labels else None,
            e32.copy() if want_rems else None)
    idx = np.concatenate(idx_parts, axis=0)

    # pass 2: corner gathers, K bucketed to bound compile count
    K = idx.shape[0]
    KB = _bucket(K)
    flat_idx = np.zeros((KB,), np.int32)
    flat_idx[:K] = ((idx[:, 0].astype(np.int64) * Y + idx[:, 1]) * Z
                    + idx[:, 2]).astype(np.int32)
    fn = _gather_cells_sized(KB, bool(want_labels), bool(want_rems))
    outs = fn(tsdf, label_dev, rem_dev, jnp.asarray(flat_idx))
    outs = [np.asarray(o)[:K] for o in outs]
    vals = outs[0].astype(np.float32)
    pos = 1
    labels = None
    if want_labels:
        labels = outs[pos].astype(np.int32)
        pos += 1
    rems = outs[pos].astype(np.float32) if want_rems else None
    return SurfaceCells(idx, vals, labels, rems)
