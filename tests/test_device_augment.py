"""On-device augmentation pipeline: shapes, padding safety, determinism, jit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chadavit_tpu.data.device_augment import (
    DeviceAugmentPipeline,
    color_jitter,
    gaussian_blur,
    horizontal_flip,
    make_multicrop_fn,
    random_resized_crop,
    to_gray,
)

AUG = {
    "crop_size": 16,
    "num_crops": 1,
    "rrc": {"enabled": True, "crop_min_scale": 0.3, "crop_max_scale": 1.0},
    "color_jitter": {"prob": 0.8},
    "grayscale": {"prob": 0.2},
    "gaussian_blur": {"prob": 0.5},
    "horizontal_flip": {"prob": 0.5},
}


def _batch(rng, b=4, c=5, h=32, w=32, counts=(1, 3, 5, 2)):
    imgs = rng.random((b, c, h, w)).astype(np.float32)
    counts = np.asarray(counts, np.int32)
    for i, k in enumerate(counts):
        imgs[i, k:] = 0.0
    return jnp.asarray(imgs), jnp.asarray(counts)


def test_rrc_shape_and_determinism(rng):
    imgs, cc = _batch(rng)
    out1 = random_resized_crop(jax.random.PRNGKey(1), imgs, 16)
    out2 = random_resized_crop(jax.random.PRNGKey(1), imgs, 16)
    out3 = random_resized_crop(jax.random.PRNGKey(2), imgs, 16)
    assert out1.shape == (4, 5, 16, 16)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_padding_stays_zero(rng):
    """Every op must keep padded channel planes (near-)zero so the analytic
    mask remains valid."""
    imgs, cc = _batch(rng)
    pipe = DeviceAugmentPipeline(AUG)
    out = np.asarray(pipe(jax.random.PRNGKey(0), imgs, cc))
    for i, k in enumerate(np.asarray(cc)):
        if k < out.shape[1]:
            assert np.abs(out[i, k:]).max() < 1e-5, f"padding leaked for sample {i}"


def test_flip_exact(rng):
    imgs, _ = _batch(rng)
    out = horizontal_flip(jax.random.PRNGKey(0), imgs, p=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs)[..., ::-1])


def test_color_jitter_range(rng):
    imgs, _ = _batch(rng)
    out = np.asarray(color_jitter(jax.random.PRNGKey(0), imgs, p=1.0))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_to_gray_padding_aware(rng):
    imgs, cc = _batch(rng)
    out = np.asarray(to_gray(jax.random.PRNGKey(0), imgs, cc, p=1.0))
    # real channels of each sample all equal the mean over real channels
    i = 1  # 3 real channels
    want = np.asarray(imgs)[i, :3].mean(0)
    for c in range(3):
        np.testing.assert_allclose(out[i, c], want, rtol=1e-5)
    assert np.abs(out[i, 3:]).max() == 0.0


def test_blur_smooths(rng):
    imgs, _ = _batch(rng)
    out = np.asarray(gaussian_blur(jax.random.PRNGKey(3), imgs, p=1.0, sigma=(1.9, 2.0)))
    # blur reduces high-frequency energy
    tv = lambda x: np.abs(np.diff(x, axis=-1)).mean()  # noqa: E731
    assert tv(out) < tv(np.asarray(imgs)) * 0.7


def test_multicrop_fn(rng):
    imgs, cc = _batch(rng)
    small = dict(AUG, crop_size=8, num_crops=2)
    fn = make_multicrop_fn([AUG, dict(AUG), small])
    out = fn(jax.random.PRNGKey(0), imgs, cc)
    assert out["crops"].shape == (2, 4, 5, 16, 16)
    assert out["small_crops"].shape == (2, 4, 5, 8, 8)
    # two large views differ (independent rngs)
    assert not np.allclose(np.asarray(out["crops"][0]), np.asarray(out["crops"][1]))
