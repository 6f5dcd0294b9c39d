"""Convolution primitive vs scipy direct convolution (the reference's
pf_dbl_matrix_convolution semantics: flipped kernel, zero padding)."""

import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from libpillowfight_tpu.ops import conv


def test_conv2d_matches_scipy(rng):
    x = rng.standard_normal((2, 17, 23)).astype(np.float32)
    k = rng.standard_normal((3, 5)).astype(np.float32)
    got = np.asarray(conv.conv2d(jnp.asarray(x), jnp.asarray(k)))
    for b in range(2):
        want = scipy.ndimage.convolve(
            x[b].astype(np.float64), k.astype(np.float64),
            mode="constant", cval=0.0,
        )
        np.testing.assert_allclose(got[b], want, atol=1e-3)


def test_sep_conv_equals_full(rng):
    x = rng.standard_normal((1, 16, 16)).astype(np.float32)
    k1 = conv.gaussian_kernel_1d(1.5, 3)
    full = np.outer(k1, k1)
    got_sep = np.asarray(conv.sep_conv2d(jnp.asarray(x), jnp.asarray(k1)))
    got_full = np.asarray(conv.conv2d(jnp.asarray(x), jnp.asarray(full)))
    np.testing.assert_allclose(got_sep, got_full, atol=1e-4)


def test_gaussian_kernel_properties():
    k = conv.gaussian_kernel_1d(2.0, 5)
    assert k.shape == (2 * 10 + 1,)
    assert abs(k.sum() - 1.0) < 1e-6
    assert np.argmax(k) == 10  # peak at center
    np.testing.assert_allclose(k, k[::-1], atol=1e-7)  # symmetric
