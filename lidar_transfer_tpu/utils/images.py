"""Offline image export + display helpers.

Replaces the reference's viz-support tools (auxiliary/tools.py:7-27
``get_mpl_colormap``/``convert_range``) and the PNG side of the writer
(laserscan.py:1121-1129 — which referenced an undefined ``viridis_colors``;
we render the range image properly).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from lidar_transfer_tpu.config import TransferConfig, make_color_lut


@functools.lru_cache(maxsize=8)
def get_mpl_colormap(cmap_name: str = "viridis") -> np.ndarray:
    """256x3 uint8 LUT from a matplotlib colormap (≡ tools.py:7-16).

    Cached: the CLI's --png export calls this per frame."""
    import matplotlib

    cmap = matplotlib.colormaps[cmap_name].resampled(256)
    return (cmap(np.arange(256))[:, :3] * 255).astype(np.uint8)


def convert_range(data: np.ndarray, power: float = 16.0) -> np.ndarray:
    """Power-law range normalization for display (≡ tools.py:19-27):
    emphasizes close structure."""
    data = np.asarray(data, np.float64)
    lo, hi = data.min(), data.max()
    if hi <= lo:
        return np.zeros_like(data)
    norm = (data - lo) / (hi - lo)
    return np.power(norm, 1.0 / power)


def label_image_rgb(label: np.ndarray, cfg: TransferConfig) -> np.ndarray:
    """(H,W) raw label ids -> (H,W,3) uint8 RGB via the (BGR) color map.

    The LUT build (a Python loop over the color map) is cached per
    config object — the CLI's --png export calls this per frame."""
    # cache holds (cfg, lut) so the cfg object stays alive while its
    # LUT is cached — an id()-keyed cache could silently serve a stale
    # LUT when a garbage-collected config's address is reused
    entry = getattr(label_image_rgb, "_lut_cache", None)
    if entry is None or entry[0] is not cfg:
        entry = (cfg, make_color_lut(cfg.color_map_bgr))
        label_image_rgb._lut_cache = entry    # at most one config's LUT
    lut = entry[1]
    bgr = lut[np.clip(label, 0, lut.shape[0] - 1)]
    rgb = bgr[..., ::-1]
    return (rgb * 255).astype(np.uint8)


def range_image_rgb(rng: np.ndarray) -> np.ndarray:
    """(H,W) range -> (H,W,3) uint8 viridis rendering."""
    lut = get_mpl_colormap("viridis")
    idx = (convert_range(rng) * 255).astype(np.uint8)
    return lut[idx]


def save_virtual_scan_pngs(out_path: str, idx: int, vs,
                           cfg: TransferConfig) -> None:
    """Write labels_png/velodyne_png renders of a VirtualScan."""
    from PIL import Image

    lbl = np.asarray(vs.label)
    rng = np.asarray(vs.range)
    os.makedirs(os.path.join(out_path, "labels_png"), exist_ok=True)
    os.makedirs(os.path.join(out_path, "velodyne_png"), exist_ok=True)
    Image.fromarray(label_image_rgb(lbl, cfg)).save(
        os.path.join(out_path, "labels_png", f"{idx:06d}.png"))
    Image.fromarray(range_image_rgb(rng)).save(
        os.path.join(out_path, "velodyne_png", f"{idx:06d}.png"))
