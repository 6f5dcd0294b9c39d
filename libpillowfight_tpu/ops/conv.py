"""Shared convolution primitives for the stencil kernels.

TPU-native replacement for the reference's direct 2-D convolution
(ref: src/pillowfight/util.c pf_dbl_matrix_convolution / _transpose —
SURVEY.md §2.1). Boundary semantics are pinned to the oracle: zero padding,
true convolution (kernel flipped), output same size as input.

Gray planes are f32 [B, H, W]; we lower to XLA convs as NCHW with C=1 so
the page width stays the minor (lane) dimension. NHWC with C=1 is a trap
here: layout assignment can pad the size-1 trailing channel dim to the
128-lane tile — a 128x memory blowup (observed: a 278 MB sobel plane
assigned a 35.6 GB buffer at A4 x 8). Separable filters run as two
rank-1 convs (row then column) — the same factorization the reference
uses (conv, transpose, conv), minus the materialized transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NCHW", "OIHW", "NCHW")


def _conv(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """f32 [B,H,W] (*) kernel [kh,kw] -> f32 [B,H,W], zero-padded SAME conv.

    True convolution: the kernel is flipped to match the reference's
    pf_dbl_matrix_convolution semantics.
    """
    kh, kw = kernel.shape
    k = jnp.flip(kernel, (0, 1)).reshape(1, 1, kh, kw).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x[:, None], k, window_strides=(1, 1),
        padding=((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2)),
        dimension_numbers=_DN,
    )
    return y[:, 0]


def conv2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return _conv(x, jnp.asarray(kernel))


def correlate2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Cross-correlation (no kernel flip): out[p] = sum_k x[p+k]*kernel[k].

    Used by sobel so the gradient points from dark to light (standard
    convention; for the antisymmetric Sobel taps, true convolution would
    flip the sign)."""
    return _conv(x, jnp.flip(jnp.asarray(kernel), (0, 1)))


def sep_conv2d(x: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable filter: rows then columns with the same 1-D kernel."""
    k = jnp.asarray(k1d)
    y = _conv(x, k[None, :])   # along W
    return _conv(y, k[:, None])  # along H


def gaussian_kernel_1d(sigma: float, nb_stddev: int) -> np.ndarray:
    """1-D Gaussian taps, half-width ceil(sigma*nb_stddev), sum-normalized."""
    hw = int(np.ceil(float(sigma) * int(nb_stddev)))
    xs = np.arange(-hw, hw + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2.0 * float(sigma) ** 2))
    return (k / k.sum()).astype(np.float32)


SOBEL_GX = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], np.float32)
SOBEL_GY = SOBEL_GX.T.copy()
