"""RangeNet-style range-image semantic segmentation (flax).

The reference drives an *external* darknet53 range-image CNN
(lidar-bonnetal) from shell scripts (reference experiments/train.sh,
run_fake_on_fake.sh — SURVEY.md §2 C15) to evaluate transferred datasets.
This module brings that capability in-framework, TPU-first:

  - darknet-style residual encoder that downsamples width only (range
    images are 64 x 2048: H is small, W carries the angular resolution) —
    the standard RangeNet backbone layout;
  - GroupNorm instead of the original's BatchNorm (documented deviation):
    batch-independent statistics need no mutable state threaded through
    the jitted/sharded train step and no cross-device stat syncing, and
    they actually NORMALIZE during training (round 1 shipped BatchNorm
    frozen at init statistics); group_size=16 divides every channel
    width used here;
  - bf16 compute / f32 params, convs sized for the MXU;
  - a skip-connected upsampling decoder to per-pixel class logits;
  - masked cross-entropy (no-data pixels carry label 0 = unlabeled);
  - train/infer steps ready for dp+tp sharding (see parallel/sharding.py).

Input features per pixel: (range, x, y, z, remission) — the classic
RangeNet 5-channel encoding, built from our RangeImage op outputs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class RangeNetConfig:
    num_classes: int = 34
    # residual blocks per stage (darknet53 uses (1,2,8,8,4))
    stage_blocks: tuple[int, ...] = (1, 2, 8, 8, 4)
    stage_features: tuple[int, ...] = (64, 128, 256, 512, 1024)
    stem_features: int = 32
    compute_dtype: Any = jnp.bfloat16
    input_channels: int = 5
    # Rematerialize encoder residual blocks in the backward pass
    # (jax.checkpoint via nn.remat): trades MXU recompute FLOPs for
    # saved-activation HBM traffic. The train step sits AT the memory
    # roofline (docs/PERF.md round 5: AI ~40 flops/byte vs the ~240
    # v5e ridge), so this is the direction with headroom; measured
    # on-chip before flipping any default (scripts/probe_train_remat.py).
    remat: bool = False

    @classmethod
    def darknet53(cls, num_classes: int = 34) -> "RangeNetConfig":
        """The default config, named: lidar-bonnetal's published
        darknet53 backbone shape (1,2,8,8,4 residual stages)."""
        return cls(num_classes=num_classes)

    @classmethod
    def darknet21(cls, num_classes: int = 34) -> "RangeNetConfig":
        return cls(num_classes=num_classes, stage_blocks=(1, 1, 2, 2, 1))

    @classmethod
    def tiny(cls, num_classes: int = 34) -> "RangeNetConfig":
        """For tests/dryruns."""
        return cls(num_classes=num_classes, stage_blocks=(1, 1),
                   stage_features=(32, 64), stem_features=16)


class ResBlock(nn.Module):
    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features // 2, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        h = nn.GroupNorm(num_groups=None, group_size=16, dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Conv(self.features, (3, 3), use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=None, group_size=16, dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.1)
        return x + h


class RangeNet(nn.Module):
    """Width-downsampling darknet encoder + skip decoder."""

    cfg: RangeNetConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = c.compute_dtype
        x = x.astype(dt)

        # pad the width to a multiple of 2^n_stages (the stride-(1,2)
        # SAME convs ceil-divide odd widths, so the decoder's x2 resize
        # would overshoot its skip and concatenate would fail for any
        # W not divisible by the total stride — e.g. a 1800-wide VLP16
        # config); logits are cropped back below. Edge padding keeps
        # the horizontal wrap-around statistics reasonable.
        W_in = x.shape[2]
        stride = 2 ** len(c.stage_blocks)
        pad_w = (-W_in) % stride
        if pad_w:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_w), (0, 0)),
                        mode="edge")

        h = nn.Conv(c.stem_features, (3, 3), use_bias=False, dtype=dt)(x)
        h = nn.GroupNorm(num_groups=None, group_size=16, dtype=dt)(h)
        h = nn.leaky_relu(h, 0.1)

        # nn.remat would rename blocks to CheckpointResBlock_N, breaking
        # checkpoint compatibility across the remat flag — pin explicit
        # names matching the non-remat auto-naming so the param tree is
        # identical either way (a checkpoint loads under both).
        block_cls = nn.remat(ResBlock) if c.remat else ResBlock
        blk_i = 0
        skips = []
        for blocks, feats in zip(c.stage_blocks, c.stage_features):
            skips.append(h)
            # downsample width only (stride (1,2)) — RangeNet convention
            h = nn.Conv(feats, (3, 3), strides=(1, 2), use_bias=False,
                        dtype=dt)(h)
            h = nn.GroupNorm(num_groups=None, group_size=16, dtype=dt)(h)
            h = nn.leaky_relu(h, 0.1)
            for _ in range(blocks):
                h = block_cls(feats, dt, name=f"ResBlock_{blk_i}")(h)
                blk_i += 1

        for skip in reversed(skips):
            feats = skip.shape[-1]
            b, hh, ww, cc = h.shape
            h = jax.image.resize(h, (b, hh, ww * 2, cc), "nearest")
            h = nn.Conv(max(feats, 32), (3, 3), use_bias=False, dtype=dt)(h)
            h = nn.GroupNorm(num_groups=None, group_size=16, dtype=dt)(h)
            h = nn.leaky_relu(h, 0.1)
            h = jnp.concatenate([h, skip.astype(dt)], axis=-1)

        logits = nn.Conv(c.num_classes, (1, 1), dtype=jnp.float32)(h)
        if pad_w:
            logits = logits[:, :, :W_in, :]
        return logits.astype(jnp.float32)


def range_image_features(rng, xyz, remission, mask):
    """Stack the 5-channel RangeNet input from projection outputs.

    Args: rng (H,W), xyz (H,W,3), remission (H,W), mask (H,W) bool.
    """
    feats = jnp.concatenate([
        rng[..., None], xyz, jnp.maximum(remission, 0.0)[..., None]],
        axis=-1)
    return jnp.where(mask[..., None], feats, 0.0)


def masked_cross_entropy(logits, labels, weights):
    """Mean CE over pixels with weight>0; labels are class INDICES (dense),
    not raw SemanticKITTI ids — map via a label LUT upstream."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = weights.astype(jnp.float32)
    return -(ll * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_train_state(model: RangeNet, rng_key, sample_shape,
                     learning_rate: float = 1e-3):
    """-> (params, opt_state, tx). Functional (no flax TrainState dep)."""
    params = model.init(rng_key, jnp.zeros(sample_shape, jnp.float32))
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    return params, opt_state, tx


def loss_fn(model: RangeNet, params, batch):
    logits = model.apply(params, batch["features"])
    loss = masked_cross_entropy(logits, batch["labels"], batch["weights"])
    return loss, logits


def train_step_body(model: RangeNet, tx, params, opt_state, batch):
    """The ONE training recipe (grad -> optax update). Both the jitted
    single-host ``train_step`` and the mesh-sharded step
    (parallel/sharding.sharded_train_step) wrap exactly this function —
    a change here (loss weighting, grad clipping, ...) reaches both."""
    (loss, _), grads = jax.value_and_grad(
        lambda p: loss_fn(model, p, batch), has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnames=("model", "tx"))
def train_step(model: RangeNet, tx, params, opt_state, batch):
    """One SGD step. jit-able and shardable (see parallel/sharding.py)."""
    return train_step_body(model, tx, params, opt_state, batch)


@functools.partial(jax.jit, static_argnames=("model",))
def infer(model: RangeNet, params, features):
    """-> per-pixel argmax class indices."""
    logits = model.apply(params, features)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
