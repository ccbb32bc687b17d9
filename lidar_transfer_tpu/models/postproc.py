"""kNN range-image post-processing for per-point label cleanup.

The reference's inference chain (experiments/run_*.sh driving
lidar-bonnetal's infer.py) refines the CNN's per-pixel predictions when
mapping them back to 3D points with a kNN vote over the range image
(RangeNet++'s KNN post-processor): every point looks at a small window
around its projected pixel, keeps the k neighbors whose *range* is
closest to its own (spatially penalized by an inverse-gaussian kernel),
and takes the majority vote of their predicted labels. Points that share
a pixel with a nearer surface thereby recover the label of their own
depth instead of the foreground winner's.

TPU-first formulation (the torch original unfolds + gathers per point):

  1. the ksize x ksize neighborhood stack is built with STATIC pad+slice
     shifts of the (H, W) images — no gather, XLA fuses the stack;
  2. each point fetches its neighborhood with ONE 2-D row gather of the
     flattened (H*W, S) stack (row gathers vectorize on this compiler —
     CLAUDE.md; 1-D scalar gathers do not);
  3. top-k selection is a sort along the tiny S axis (sorts are cheap
     here, data-dependent gathers are not): the kth-smallest scaled
     distance becomes a per-point threshold mask;
  4. the vote is a lax.scan of one-hot accumulations into an (N, C)
     histogram — scatter-free, MXU/VPU friendly.

Deviations from bonnetal's exact numerics (documented, deliberate):
  - neighbors tied exactly at the kth distance all vote (measure-zero
    event for float ranges);
  - points whose every neighbor fails the range cutoff keep their own
    pixel's prediction instead of voting "unlabeled" — no holes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _window_stack(img: jax.Array, ksize: int, fill) -> jax.Array:
    """(H, W) -> (H, W, S) static shifted-window stack, S = ksize**2."""
    p = ksize // 2
    padded = jnp.pad(img, ((p, p), (p, p)), constant_values=fill)
    H, W = img.shape
    views = [padded[dv:dv + H, du:du + W]
             for dv in range(ksize) for du in range(ksize)]
    return jnp.stack(views, axis=-1)


def _inv_gauss_weights(ksize: int, sigma: float) -> np.ndarray:
    """(S,) spatial penalty: 1/gaussian, center = 1 (no penalty)."""
    p = ksize // 2
    d2 = np.asarray([(dv - p) ** 2 + (du - p) ** 2
                     for dv in range(ksize) for du in range(ksize)],
                    np.float32)
    return np.exp(d2 / (2.0 * sigma ** 2))


@functools.partial(jax.jit, static_argnames=("num_classes", "k", "ksize",
                                             "sigma", "cutoff"))
def knn_cleanup(proj_range: jax.Array, pred_img: jax.Array,
                mask_img: jax.Array, point_range: jax.Array,
                point_u: jax.Array, point_v: jax.Array,
                point_valid: jax.Array, *, num_classes: int,
                k: int = 5, ksize: int = 5, sigma: float = 1.0,
                cutoff: float = 1.0) -> jax.Array:
    """Per-point kNN-voted class indices.

    Args:
      proj_range:  (H, W) f32 range image (winner depth per pixel).
      pred_img:    (H, W) i32 per-pixel predicted class indices.
      mask_img:    (H, W) bool pixel-has-data mask.
      point_range: (N,) f32 range of every (padded) point.
      point_u/v:   (N,) i32 clamped pixel coords per point.
      point_valid: (N,) bool point survived projection filters.
      num_classes: C — vote histogram width.
      k:           neighbors that vote (<= ksize**2).
      ksize:       odd window side length.
      sigma:       gaussian sigma of the spatial penalty.
      cutoff:      max |range difference| (meters) for a vote to count.

    Returns (N,) i32: voted class where >=1 neighbor passes the cutoff,
    else the point's own pixel prediction.
    """
    H, W = proj_range.shape
    S = ksize * ksize
    k = min(k, S)

    nbr_range = _window_stack(proj_range, ksize, jnp.inf)
    nbr_pred = _window_stack(pred_img, ksize, 0)
    nbr_ok = _window_stack(mask_img, ksize, False)

    flat = (jnp.clip(point_v, 0, H - 1) * W
            + jnp.clip(point_u, 0, W - 1))
    # one vectorized row gather per attribute: (H*W, S) rows -> (N, S)
    rng_n = jnp.take(nbr_range.reshape(H * W, S), flat, axis=0)
    pred_n = jnp.take(nbr_pred.reshape(H * W, S), flat, axis=0)
    ok_n = jnp.take(nbr_ok.reshape(H * W, S), flat, axis=0)

    dist = jnp.abs(rng_n - point_range[:, None])
    scaled = jnp.where(ok_n,
                       dist * jnp.asarray(_inv_gauss_weights(ksize, sigma)),
                       jnp.inf)
    kth = jnp.sort(scaled, axis=-1)[:, k - 1]
    votes_on = (scaled <= kth[:, None]) & (dist <= cutoff) & ok_n

    def _accum(hist, sl):
        v, lab = sl
        return hist + v[:, None] * jax.nn.one_hot(lab, num_classes), None

    hist0 = jnp.zeros((point_range.shape[0], num_classes), jnp.float32)
    hist, _ = jax.lax.scan(
        _accum, hist0,
        (jnp.moveaxis(votes_on.astype(jnp.float32), -1, 0),
         jnp.moveaxis(pred_n, -1, 0)))

    voted = jnp.argmax(hist, axis=-1).astype(jnp.int32)
    center = jnp.take(pred_img.reshape(-1), flat)
    has_vote = hist.sum(axis=-1) > 0
    out = jnp.where(has_vote, voted, center)
    return jnp.where(point_valid, out, center).astype(jnp.int32)


def knn_cleanup_oracle(proj_range, pred_img, mask_img, point_range,
                       point_u, point_v, point_valid, *, num_classes,
                       k=5, ksize=5, sigma=1.0, cutoff=1.0):
    """Pure-numpy per-point loop with identical semantics (test oracle)."""
    H, W = proj_range.shape
    p = ksize // 2
    wts = _inv_gauss_weights(ksize, sigma).reshape(ksize, ksize)
    out = np.zeros(point_range.shape[0], np.int32)
    for i in range(point_range.shape[0]):
        v = int(np.clip(point_v[i], 0, H - 1))
        u = int(np.clip(point_u[i], 0, W - 1))
        center = int(pred_img[v, u])
        if not point_valid[i]:
            out[i] = center
            continue
        cand = []
        for dv in range(-p, p + 1):
            for du in range(-p, p + 1):
                vv, uu = v + dv, u + du
                if not (0 <= vv < H and 0 <= uu < W):
                    continue
                if not mask_img[vv, uu]:
                    continue
                d = abs(float(proj_range[vv, uu]) - float(point_range[i]))
                cand.append((d * wts[dv + p, du + p], d,
                             int(pred_img[vv, uu])))
        cand.sort(key=lambda t: t[0])
        if cand:
            kth = cand[min(k, len(cand)) - 1][0]
            hist = np.zeros(num_classes, np.int64)
            for sd, d, lab in cand:
                if sd <= kth and d <= cutoff:
                    hist[lab] += 1
            out[i] = int(hist.argmax()) if hist.sum() > 0 else center
        else:
            out[i] = center
    return out
