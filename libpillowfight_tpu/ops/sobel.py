"""Sobel edge detector (ref: src/pillowfight/sobel.c pf_sobel — SURVEY.md §2.2).

grayscale -> 3x3 Gx/Gy convolution -> intensity hypot(gx,gy) +
direction atan2(gy,gx). The public op returns the intensity clamped to
[0,255] as a grayscale RGBA bitmap; `sobel_on_matrix` exposes the raw
gradient pair for canny/swt (ref: sobel.c pf_sobel_on_matrix and
`struct pf_gradient_matrixes`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.bitmap import ensure_batched, gray_to_rgba, maybe_unbatch, rgba_to_gray
from .conv import SOBEL_GX, SOBEL_GY, correlate2d


class GradientMatrixes(NamedTuple):
    intensity: jax.Array  # f32 [B,H,W]
    direction: jax.Array  # f32 [B,H,W], atan2(gy, gx) in [-pi, pi]


def sobel_gradients(gray: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Raw (gx, gy) gradient pair. Canny consumes this directly — its
    4-bin NMS direction falls out of sign/ratio compares on (gx, gy), so
    the atan2 direction plane (a full-page transcendental intermediate)
    is only materialized for SWT, which needs the unit vector."""
    # correlation: gradient points from dark toward light
    return correlate2d(gray, SOBEL_GX), correlate2d(gray, SOBEL_GY)


def sobel_on_matrix(gray: jax.Array) -> GradientMatrixes:
    gx, gy = sobel_gradients(gray)
    return GradientMatrixes(jnp.hypot(gx, gy), jnp.arctan2(gy, gx))


@jax.jit
def sobel(pages: jax.Array) -> jax.Array:
    """uint8 RGBA [B,H,W,4] -> edge-intensity grayscale RGBA [B,H,W,4]."""
    pages, unb = ensure_batched(pages)
    grad = sobel_on_matrix(rgba_to_gray(pages))
    return maybe_unbatch(gray_to_rgba(jnp.clip(grad.intensity, 0.0, 255.0)), unb)
