"""Miss-decomposition diagnostics (metrics/diagnostics.py)."""

import jax.numpy as jnp
import numpy as np

from lidar_transfer_tpu.metrics.diagnostics import miss_decomposition


def test_decomposition_exhaustive_and_attributed():
    """Hand-built scene: each miss cause is planted and must be counted in
    its own bucket; buckets + hits partition the image."""
    H, W = 8, 16
    # target FOV 8..-22 deg; source FOV narrower: 4..-18 deg
    t_fu, t_fd = 8.0, -22.0
    s_fu, s_fd = 4.0, -18.0

    # source points: one return per target pixel center for rows 2..5,
    # columns 0..7; rows 0 and 7 are outside the source FOV band; rows
    # 1/6 and columns 8..15 get no points (empty directions)
    fov = np.deg2rad(abs(t_fu) + abs(t_fd))
    pts = []
    for r in range(2, 6):
        pitch = np.deg2rad(t_fu) - (r + 0.5) / H * fov
        for c in range(8):
            # image u = 0.5*(yaw_img/pi + 1)*W with yaw_img = -atan2(y,x)
            yaw_g = -((c + 0.5) / W * 2.0 - 1.0) * np.pi
            d = 5.0 if c < 4 else 30.0      # far half: outside volume
            pts.append([d * np.cos(pitch) * np.cos(yaw_g),
                        d * np.cos(pitch) * np.sin(yaw_g),
                        d * np.sin(pitch)])
    pts = np.asarray(pts, np.float32)
    valid = np.ones(len(pts), bool)
    vol_bounds = np.array([[-16.0, 16.0], [-16.0, 16.0], [-4.0, 4.0]])

    # the virtual scan hit exactly the near in-volume pixels of rows 2..4;
    # row 5's near pixels missed -> synthesis misses
    vs_mask = np.zeros((H, W), bool)
    vs_mask[2:5, 0:4] = True

    dec = miss_decomposition(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(vs_mask),
        target_H=H, target_W=W, t_fov_up=t_fu, t_fov_down=t_fd,
        s_fov_up=s_fu, s_fov_down=s_fd, vol_bounds=vol_bounds)
    d = dec.as_dict()

    assert sum(d.values()) == H * W                  # exhaustive partition
    assert d["hit"] == 12
    # row centers are 8 - (r+0.5)*3.75 deg: only rows 0 (6.1 deg) and 7
    # (-20.1 deg) fall outside the 4..-18 deg source band
    assert d["out_of_source_fov"] == 2 * W
    # rows 2..5 far half (cols 4..7) = 4*4 outside the volume
    assert d["outside_volume"] == 16
    # row 5 near pixels had fusable in-volume returns but no output
    assert d["synthesis_miss"] == 4
    # rows 1,6 (in-band, no points) + rows 2..5 cols 8..15
    assert d["empty_direction"] == 2 * W + 4 * 8
