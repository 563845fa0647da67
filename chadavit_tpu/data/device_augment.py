"""On-device batched augmentation — the TPU-native answer to the reference's
NVIDIA DALI GPU pipeline (reference ``src/data/dali_dataloader.py:38-178,453-591``).

The host decodes raw images once (C++ loader); everything else — random
resized crop, per-channel color jitter, grayscale, gaussian blur, solarization,
equalization, flip, normalize — runs as ONE jitted function over the dense
``(B, C_max, H, W)`` batch, fused by XLA on the accelerator. Multi-crop SSL
views come from a single call returning ``(num_crops, B, C_max, S, S)``.

All ops are channel-count-agnostic and safe under padding: padded channel
planes are zero and every op maps zero planes to (near-)zero planes, so the
analytic channel mask stays valid.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _rand_resized_crop_params(rng: Array, b: int, h: int, w: int,
                              scale: Tuple[float, float], ratio: Tuple[float, float]):
    """Sample per-image crop boxes (y0, x0, ch, cw) in float, RRC-style."""
    r_area, r_ratio, r_y, r_x = jax.random.split(rng, 4)
    area = jax.random.uniform(r_area, (b,), minval=scale[0], maxval=scale[1]) * (h * w)
    log_r = jax.random.uniform(r_ratio, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    ar = jnp.exp(log_r)
    cw = jnp.sqrt(area * ar)
    ch = jnp.sqrt(area / ar)
    cw = jnp.clip(cw, 8.0, w)
    ch = jnp.clip(ch, 8.0, h)
    y0 = jax.random.uniform(r_y, (b,)) * (h - ch)
    x0 = jax.random.uniform(r_x, (b,)) * (w - cw)
    return y0, x0, ch, cw


def _lerp_matrix(src_pos: Array, in_size: int) -> Array:
    """Bilinear interpolation weights as a dense matrix.

    ``src_pos``: (B, out) fractional source coordinates. Returns
    ``(B, out, in_size)`` with rows summing to 1 (edge-clamped) — turning the
    per-image resample into ONE batched MXU matmul instead of a
    ``vmap(scale_and_translate)`` gather soup (measured ~100ms/step slower)."""
    src = jnp.clip(src_pos, 0.0, in_size - 1.0)
    grid = jnp.arange(in_size, dtype=src.dtype)
    return jnp.maximum(1.0 - jnp.abs(src[..., None] - grid[None, None, :]), 0.0)


def _batched_resample(images: Array, wy: Array, wx: Array) -> Array:
    """(B, C, H, W) x (B, oh, H) x (B, ow, W) -> (B, C, oh, ow), f32 accumulate."""
    dt = images.dtype
    tmp = jnp.einsum("boi,bcij->bcoj", wy.astype(dt), images,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("bcoj,bpj->bcop", tmp.astype(dt), wx.astype(dt),
                     preferred_element_type=jnp.float32)
    return out.astype(dt)


def random_resized_crop(rng: Array, images: Array, size: int,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                        method: str = "linear") -> Array:
    """Per-image random resized crop, (B, C, H, W) -> (B, C, size, size).

    Crop + bilinear resize expressed as two interpolation-matrix matmuls
    (separable), so the whole batch rides the MXU."""
    del method  # bilinear only
    b, c, h, w = images.shape
    y0, x0, ch, cw = _rand_resized_crop_params(rng, b, h, w, scale, ratio)
    i = jnp.arange(size, dtype=jnp.float32)[None, :]  # (1, out)
    src_y = y0[:, None] + (i + 0.5) * (ch[:, None] / size) - 0.5
    src_x = x0[:, None] + (i + 0.5) * (cw[:, None] / size) - 0.5
    return _batched_resample(images, _lerp_matrix(src_y, h), _lerp_matrix(src_x, w))


def resize(images: Array, size: int, method: str = "linear") -> Array:
    b, c, h, w = images.shape
    if h == size and w == size:
        return images
    return jax.image.resize(images, (b, c, size, size), method=method)


def horizontal_flip(rng: Array, images: Array, p: float = 0.5) -> Array:
    flip = jax.random.bernoulli(rng, p, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[..., ::-1], images)


def color_jitter(rng: Array, images: Array, p: float = 0.8,
                 int_shift=(-0.3, 0.3), gamma=(0.5, 1.5),
                 channel_counts: Optional[Array] = None) -> Array:
    """Per-channel intensity shift + brightness blend toward zero, clamped to
    [0,1] (the paper's microscopy jitter, reference ``custom_transforms.py:313-351``).
    Padding-aware: planes beyond ``channel_counts`` stay exactly zero."""
    b, c = images.shape[:2]
    r_apply, r_shift, r_gamma = jax.random.split(rng, 3)
    apply = jax.random.bernoulli(r_apply, p, (b, 1, 1, 1))
    shifts = jax.random.uniform(r_shift, (b, c, 1, 1), minval=int_shift[0], maxval=int_shift[1])
    gammas = jax.random.uniform(r_gamma, (b, c, 1, 1), minval=gamma[0], maxval=gamma[1])
    jittered = jnp.clip((images + shifts) * gammas, 0.0, 1.0)
    out = jnp.where(apply, jittered, images)
    if channel_counts is not None:
        chan_idx = jnp.arange(c)[None, :, None, None]
        valid = chan_idx < channel_counts[:, None, None, None]
        out = jnp.where(valid, out, 0.0)
    return out


def to_gray(rng: Array, images: Array, channel_counts: Array, p: float = 0.2) -> Array:
    """Mean over *real* channels broadcast back (padding-aware)."""
    b, c = images.shape[:2]
    apply = jax.random.bernoulli(rng, p, (b, 1, 1, 1))
    counts = jnp.maximum(channel_counts.astype(images.dtype), 1)[:, None, None, None]
    mean = jnp.sum(images, axis=1, keepdims=True) / counts
    chan_idx = jnp.arange(c)[None, :, None, None]
    valid = chan_idx < channel_counts[:, None, None, None]
    gray = jnp.where(valid, mean, 0.0)
    return jnp.where(apply, gray, images)


def gaussian_blur(rng: Array, images: Array, p: float = 0.5,
                  sigma=(0.1, 2.0), radius: int = 4) -> Array:
    """Separable gaussian blur with per-image sigma (fixed kernel support so
    shapes stay static; sigma is traced).

    The per-image 1-D kernels are expanded into banded (S, S) matrices so the
    blur is two batched MXU matmuls (a vmapped per-image conv was measured
    dispatch-bound). Zero padding at the borders, kernel normalized — same
    semantics as the conv formulation."""
    b, c, h, w = images.shape
    r_apply, r_sigma = jax.random.split(rng)
    apply = jax.random.bernoulli(r_apply, p, (b, 1, 1, 1))
    s = jax.random.uniform(r_sigma, (b,), minval=sigma[0], maxval=sigma[1])
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x[None, :] / s[:, None]) ** 2)  # (B, K)
    k = k / jnp.sum(k, axis=1, keepdims=True)

    def band(size):
        diff = jnp.arange(size)[None, :] - jnp.arange(size)[:, None]  # j - i
        idx = diff + radius
        valid = (idx >= 0) & (idx < 2 * radius + 1)
        w_band = k[:, jnp.clip(idx, 0, 2 * radius)]  # (B, S, S)
        return jnp.where(valid[None], w_band, 0.0)

    blurred = _batched_resample(images, band(h), band(w))
    return jnp.where(apply, blurred, images)


def solarize(rng: Array, images: Array, p: float = 0.0, threshold: float = 0.5) -> Array:
    apply = jax.random.bernoulli(rng, p, (images.shape[0], 1, 1, 1))
    sol = jnp.where(images >= threshold, 1.0 - images, images)
    return jnp.where(apply, sol, images)


def equalize(rng: Array, images: Array, channel_counts: Array, p: float = 0.0,
             bins: int = 256) -> Array:
    """Per-channel histogram equalization on [0,1] (device port of the host
    :class:`chadavit_tpu.data.transforms.Equalization`; reference
    ``pretrain_dataloader.py:128-131`` / A.Equalize).

    Replicates the host op's two indexings exactly: histogram bins are
    ``floor(clip(v)*bins)`` capped at ``bins-1`` (np.histogram semantics) while
    the CDF lookup uses ``floor(v*(bins-1))`` clipped. Padded channel planes
    would equalize to all-ones (their mass sits in bin 0), so they are
    re-zeroed from ``channel_counts`` to keep the analytic mask valid."""
    b, c, h, w = images.shape
    apply = jax.random.bernoulli(rng, p, (b, 1, 1, 1))
    clipped = jnp.clip(images, 0.0, 1.0)
    hist_idx = jnp.minimum((clipped * bins).astype(jnp.int32), bins - 1)
    flat_hist = hist_idx.reshape(b * c, h * w)
    seg = flat_hist + (jnp.arange(b * c, dtype=jnp.int32) * bins)[:, None]
    hist = jax.ops.segment_sum(
        jnp.ones((b * c * h * w,), jnp.float32), seg.ravel(),
        num_segments=b * c * bins).reshape(b * c, bins)
    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]  # total mass = H*W, always > 0
    look_idx = jnp.clip((images * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    out = jnp.take_along_axis(cdf, look_idx.reshape(b * c, h * w), axis=1)
    out = out.reshape(b, c, h, w).astype(images.dtype)
    valid = (jnp.arange(c) < channel_counts[:, None])[:, :, None, None]
    out = jnp.where(valid, out, 0.0)
    return jnp.where(apply, out, images)


def normalize(images: Array, mean: Sequence[float], std: Sequence[float]) -> Array:
    c = images.shape[1]
    m = jnp.resize(jnp.asarray(mean, images.dtype), (c,))[None, :, None, None]
    s = jnp.resize(jnp.asarray(std, images.dtype), (c,))[None, :, None, None]
    return (images - m) / s


class DeviceAugmentPipeline:
    """Compile one augmentation-config node (the reference YAML schema) into a
    jitted ``(rng, images, channel_counts) -> (B, C, S, S)`` view function."""

    def __init__(self, cfg: Dict[str, Any]):
        g = lambda k, d=None: cfg.get(k, d) if isinstance(cfg, dict) else getattr(cfg, k, d)  # noqa: E731
        self.size = g("crop_size", 224)
        rrc = g("rrc", {}) or {}
        self.rrc_enabled = rrc.get("enabled", False)
        self.rrc_scale = (rrc.get("crop_min_scale", 0.08), rrc.get("crop_max_scale", 1.0))
        self.cj = (g("color_jitter", {}) or {}).get("prob", 0)
        self.gray = (g("grayscale", {}) or {}).get("prob", 0)
        self.blur = (g("gaussian_blur", {}) or {}).get("prob", 0)
        self.sol = (g("solarization", {}) or {}).get("prob", 0)
        self.eq = (g("equalization", {}) or {}).get("prob", 0)
        self.flip = (g("horizontal_flip", {}) or {}).get("prob", 0)
        norm = g("normalize", None)
        self.norm = (norm.get("mean", [0.0]), norm.get("std", [1.0])) if norm else None

    def __call__(self, rng: Array, images: Array, channel_counts: Array) -> Array:
        keys = jax.random.split(rng, 7)
        if self.rrc_enabled:
            x = random_resized_crop(keys[0], images, self.size, scale=self.rrc_scale)
        else:
            x = resize(images, self.size)
        if self.cj:
            x = color_jitter(keys[1], x, p=self.cj, channel_counts=channel_counts)
        if self.gray:
            x = to_gray(keys[2], x, channel_counts, p=self.gray)
        if self.blur:
            x = gaussian_blur(keys[3], x, p=self.blur)
        if self.sol:
            x = solarize(keys[4], x, p=self.sol)
        if self.eq:
            x = equalize(keys[6], x, channel_counts, p=self.eq)
        if self.flip:
            x = horizontal_flip(keys[5], x, p=self.flip)
        if self.norm:
            x = normalize(x, *self.norm)
        return x


def make_multicrop_fn(aug_cfgs: Sequence[Dict[str, Any]], dtype: Any = jnp.float32):
    """Jitted multi-crop: raw batch -> stacked views per the config list
    (2 large + N small in the reference recipes). Returns
    ``fn(rng, images, counts) -> {"crops": (n_large, B, C, S, S), ...}``.

    Raw integer batches (uint8/uint16 planes straight off the decoder) are
    accepted and normalized to [0,1] float ON DEVICE — the host transfers
    1-2 bytes/pixel instead of 4 (the production transfer layout)."""
    pipelines = []
    for cfg in aug_cfgs:
        n = cfg.get("num_crops", 1) if isinstance(cfg, dict) else getattr(cfg, "num_crops", 1)
        pipelines.extend([DeviceAugmentPipeline(cfg)] * n)
    big = pipelines[0].size

    @jax.jit
    def fn(rng: Array, images: Array, channel_counts: Array):
        if images.dtype == jnp.uint8:
            images = images.astype(dtype) * (1.0 / 255.0)
        elif images.dtype == jnp.uint16:
            images = images.astype(dtype) * (1.0 / 65535.0)
        else:
            images = images.astype(dtype)
        keys = jax.random.split(rng, len(pipelines))
        large, small = [], []
        for key, pipe in zip(keys, pipelines):
            # some ops (resize/blur) compute in f32; pin the output dtype
            view = pipe(key, images, channel_counts).astype(dtype)
            (large if pipe.size == big else small).append(view)
        out = {"crops": jnp.stack(large, 0), "channel_counts": channel_counts}
        if small:
            out["small_crops"] = jnp.stack(small, 0)
        return out

    return fn
