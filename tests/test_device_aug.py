"""On-device fused augmentation: shape/semantics checks vs the transform
contract (distribution-level parity with the PIL path; see device_aug.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from s2r_tpu.data.device_aug import augment_batch, augment_paired_batch
from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _batch(n=2, sh=60, sw=80):
    rng = np.random.RandomState(0)
    return {
        "src_image": jnp.asarray(rng.randint(0, 255, (n, sh, sw, 3)),
                                 jnp.uint8),
        "tgt_image": jnp.asarray(rng.randint(0, 255, (n, sh, sw, 3)),
                                 jnp.uint8),
        "src_label": jnp.asarray(rng.randint(0, 19, (n, sh, sw)), jnp.uint8),
    }


def test_shapes_dtypes_and_ranges():
    out = augment_paired_batch(_batch(), jax.random.PRNGKey(0), 32, 32)
    assert out["src_image"].shape == (2, 32, 32, 3)
    assert out["src_image"].dtype == jnp.float32
    assert out["tgt_image"].shape == (2, 32, 32, 3)
    assert out["src_label"].shape == (2, 32, 32)
    assert out["src_label"].dtype == jnp.int32
    lbl = np.asarray(out["src_label"])
    assert set(np.unique(lbl)) <= set(range(19)) | {255}
    # normalized images stay in a plausible ImageNet-normalized range
    img = np.asarray(out["src_image"])
    assert img.min() > -3.0 and img.max() < 3.5


def test_deterministic_per_key_and_varying_across_keys():
    b = _batch()
    a1 = augment_paired_batch(b, jax.random.PRNGKey(7), 32, 32)
    a2 = augment_paired_batch(b, jax.random.PRNGKey(7), 32, 32)
    np.testing.assert_array_equal(np.asarray(a1["src_image"]),
                                  np.asarray(a2["src_image"]))
    a3 = augment_paired_batch(b, jax.random.PRNGKey(8), 32, 32)
    assert not np.array_equal(np.asarray(a1["src_image"]),
                              np.asarray(a3["src_image"]))


def test_padding_appears_when_scale_below_crop():
    # base_size 8 -> short edge in [4, 16]; crop 32 -> padding guaranteed
    out = augment_paired_batch(_batch(), jax.random.PRNGKey(1), 8, 32,
                               False)
    lbl = np.asarray(out["src_label"])
    assert (lbl == 255).any()
    img = np.asarray(out["src_image"])
    # padded image pixels carry the reference's fill-0 THROUGH Normalize
    # (RandomScaleCrop fill=0 -> Normalize), i.e. (0 - mean)/std per channel
    pad_fill = (0.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    pad_mask = lbl == 255
    assert np.allclose(img[pad_mask], pad_fill, atol=1e-5)


def test_gaussian_blur_kernel_matches_direct_convolution():
    """_gaussian_blur == dense separable Gaussian with edge extension."""
    from s2r_tpu.data.device_aug import _BLUR_TAPS, _gaussian_blur

    rng = np.random.RandomState(3)
    x = rng.rand(12, 17, 3).astype(np.float32) * 255.0
    sigma = 0.8
    offs = np.arange(-_BLUR_TAPS, _BLUR_TAPS + 1, dtype=np.float64)
    w = np.exp(-0.5 * (offs / sigma) ** 2)
    w /= w.sum()
    xp = np.pad(x, ((_BLUR_TAPS, _BLUR_TAPS), (0, 0), (0, 0)), mode="edge")
    ref = sum(w[k] * xp[k:k + 12] for k in range(len(w)))
    xp = np.pad(ref, ((0, 0), (_BLUR_TAPS, _BLUR_TAPS), (0, 0)), mode="edge")
    ref = sum(w[k] * xp[:, k:k + 17] for k in range(len(w)))
    got = np.asarray(_gaussian_blur(jnp.asarray(x), jnp.float32(sigma)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_blur_gate_fires_and_smooths():
    """With blur on, roughly half the samples are smoother than their
    blur-off counterpart, and the rest are bit-identical (gate off)."""
    b = _batch(n=16, sh=40, sw=40)
    key = jax.random.PRNGKey(5)
    on = np.asarray(augment_paired_batch(b, key, 40, 32, True)["src_image"])
    off = np.asarray(augment_paired_batch(b, key, 40, 32, False)["src_image"])

    def tv(x):  # total variation as a smoothness proxy
        return np.abs(np.diff(x, axis=1)).mean() + \
            np.abs(np.diff(x, axis=2)).mean()

    same = np.array([np.array_equal(on[i], off[i]) for i in range(16)])
    assert 2 <= same.sum() <= 14  # the p=0.5 gate fires for some, not all
    for i in np.flatnonzero(~same):
        assert tv(on[i:i + 1]) < tv(off[i:i + 1]), i


def test_flip_and_geometry_joint_between_src_and_label():
    # constant-color halves let us verify src image and label transform with
    # the same geometry: left half class 0 / dark, right half class 1 /
    # bright.
    sh, sw = 64, 64
    img = np.zeros((1, sh, sw, 3), np.uint8)
    img[:, :, sw // 2:, :] = 255
    lbl = np.zeros((1, sh, sw), np.uint8)
    lbl[:, :, sw // 2:] = 1
    batch = {"src_image": jnp.asarray(img), "tgt_image": jnp.asarray(img),
             "src_label": jnp.asarray(lbl)}
    for seed in range(6):
        out = augment_paired_batch(batch, jax.random.PRNGKey(seed), 64, 32,
                                   False)
        oimg = np.asarray(out["src_image"][0])
        olbl = np.asarray(out["src_label"][0])
        valid = olbl != 255
        bright = oimg.mean(-1) > 0.0  # normalized: bright > 0 > dark
        # wherever the label says class 1, the image must be bright
        interior = valid & ((olbl == 0) | (olbl == 1))
        agree = (bright[interior] == (olbl[interior] == 1)).mean()
        # bilinear image blending vs nearest label sampling disagree on the
        # 1-px class boundary
        assert agree > 0.95, (seed, agree)


def test_single_domain_variant():
    rng = np.random.RandomState(2)
    batch = {"image": jnp.asarray(rng.randint(0, 255, (2, 50, 70, 3)),
                                  jnp.uint8),
             "label": jnp.asarray(rng.randint(0, 19, (2, 50, 70)), jnp.uint8)}
    out = augment_batch(batch, jax.random.PRNGKey(0), 32, 32)
    assert out["image"].shape == (2, 32, 32, 3)
    assert out["label"].shape == (2, 32, 32)
