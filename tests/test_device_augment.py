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


def test_rrc_identity_crop_is_identity():
    """scale=(1,1), ratio=(1,1) crops the full image: the matmul resampler
    must reproduce the input (bilinear identity resample)."""
    from chadavit_tpu.data.device_augment import random_resized_crop

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((3, 4, 32, 32), dtype=np.float32))
    out = random_resized_crop(jax.random.PRNGKey(0), imgs, 32,
                              scale=(1.0, 1.0), ratio=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_rrc_matches_scale_and_translate():
    """The interpolation-matrix resample equals jax.image.scale_and_translate
    for a known crop box (same half-pixel bilinear convention)."""
    from chadavit_tpu.data.device_augment import _batched_resample, _lerp_matrix

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((1, 2, 40, 40), dtype=np.float32))
    y0, x0, ch, cw, size = 5.0, 8.0, 20.0, 30.0, 16
    i = jnp.arange(size, dtype=jnp.float32)[None, :]
    src_y = y0 + (i + 0.5) * (ch / size) - 0.5
    src_x = x0 + (i + 0.5) * (cw / size) - 0.5
    got = _batched_resample(img, _lerp_matrix(src_y, 40), _lerp_matrix(src_x, 40))

    want = jax.image.scale_and_translate(
        img[0], (2, size, size), (1, 2),
        jnp.asarray([size / ch, size / cw]),
        jnp.asarray([-y0 * size / ch, -x0 * size / cw]),
        method="linear", antialias=False)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want), atol=1e-5)


def test_gaussian_blur_matches_conv():
    """Banded-matrix blur == separable conv with zero padding."""
    from chadavit_tpu.data.device_augment import gaussian_blur

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.random((2, 3, 24, 24), dtype=np.float32))
    out = gaussian_blur(jax.random.PRNGKey(7), imgs, p=1.0, sigma=(1.0, 1.0), radius=4)

    x = np.arange(-4, 5, dtype=np.float32)
    k = np.exp(-0.5 * x ** 2)
    k /= k.sum()
    want = np.zeros_like(np.asarray(imgs))
    arr = np.asarray(imgs)
    pad = np.pad(arr, ((0, 0), (0, 0), (4, 4), (0, 0)))
    tmp = sum(k[t] * pad[:, :, t:t + 24] for t in range(9))
    pad = np.pad(tmp, ((0, 0), (0, 0), (0, 0), (4, 4)))
    want = sum(k[t] * pad[:, :, :, t:t + 24] for t in range(9))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_equalize_matches_host(rng):
    """Device equalization == host transforms.Equalization on real channels,
    zero on padded planes."""
    from chadavit_tpu.data.device_augment import equalize
    from chadavit_tpu.data.transforms import Equalization

    imgs, cc = _batch(rng)
    out = np.asarray(equalize(jax.random.PRNGKey(0), imgs, cc, p=1.0))

    class _Always:
        def random(self):
            return 0.0

    host = Equalization(p=1.0)
    np_imgs = np.asarray(imgs)
    for i, k in enumerate(np.asarray(cc)):
        # host op takes HWC on real channels only
        hwc = np.moveaxis(np_imgs[i, :k], 0, -1)
        want = np.moveaxis(host(hwc, _Always()), -1, 0)
        np.testing.assert_allclose(out[i, :k], want, atol=1e-6)
        if k < out.shape[1]:
            assert np.abs(out[i, k:]).max() == 0.0


def test_equalize_in_pipeline_padding_safe(rng):
    imgs, cc = _batch(rng)
    pipe = DeviceAugmentPipeline(dict(AUG, equalization={"prob": 1.0}))
    out = np.asarray(pipe(jax.random.PRNGKey(0), imgs, cc))
    for i, k in enumerate(np.asarray(cc)):
        if k < out.shape[1]:
            assert np.abs(out[i, k:]).max() < 1e-5
