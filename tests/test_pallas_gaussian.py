"""Pallas fused Gaussian vs the XLA separable path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from libpillowfight_tpu.ops.conv import gaussian_kernel_1d, sep_conv2d
from libpillowfight_tpu.ops.pallas.gaussian_kernel import (
    gaussian_sep_pallas,
    gaussian_taps,
)


def test_pallas_gaussian_matches_xla(rng):
    x = rng.standard_normal((2, 150, 170)).astype(np.float32) * 100
    taps = gaussian_taps(2.0, 5)
    got = np.asarray(gaussian_sep_pallas(jnp.asarray(x), taps, interpret=True))
    want = np.asarray(sep_conv2d(jnp.asarray(x), gaussian_kernel_1d(2.0, 5)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_pallas_gaussian_small_sigma(rng):
    x = rng.standard_normal((1, 64, 130)).astype(np.float32)
    taps = gaussian_taps(0.8, 3)
    got = np.asarray(gaussian_sep_pallas(jnp.asarray(x), taps, interpret=True))
    want = np.asarray(sep_conv2d(jnp.asarray(x), gaussian_kernel_1d(0.8, 3)))
    np.testing.assert_allclose(got, want, atol=2e-4)
