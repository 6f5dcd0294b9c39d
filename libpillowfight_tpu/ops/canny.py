"""Canny edge detector (ref: src/pillowfight/canny.c pf_canny — SURVEY.md §3.2).

Stages: gray -> gaussian(sigma=2, 5 stddev) -> sobel gradients ->
non-maximum suppression (direction quantized to 4 bins) ->
double threshold (fractions of per-page max intensity) ->
hysteresis (weak pixels kept iff 8-connected to a strong pixel).

The reference's sequential BFS edge-linking becomes the exact
fixed-point reachability of morph.flood_reach. Everything up to the
thresholds is straight-line math that XLA fuses into the conv loops.
Output: edges white (255) on black, grayscale RGBA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.bitmap import (
    ensure_batched,
    gray_to_rgba,
    maybe_unbatch,
    normalize,
    rgba_to_gray,
)
from .gaussian import gaussian_on_matrix
from .morph import flood_reach
from .sobel import sobel_on_matrix


def _nms(intensity: jax.Array, direction: jax.Array) -> jax.Array:
    """Non-maximum suppression. intensity/direction f32 [B,H,W]."""
    # Quantize gradient direction into 4 bins over [0, pi):
    #   bin 0 ->  0 deg (gradient along x: compare W/E neighbors)
    #   bin 1 -> 45 deg (compare NE/SW)   bin 2 -> 90 deg (compare N/S)
    #   bin 3 -> 135 deg (compare NW/SE)
    theta = jnp.mod(direction, jnp.pi)
    bins = jnp.mod(jnp.round(theta / (jnp.pi / 4.0)).astype(jnp.int32), 4)

    z = jnp.pad(intensity, ((0, 0), (1, 1), (1, 1)))

    def shift(dy, dx):  # neighbor intensity, zero outside
        return z[:, 1 + dy : z.shape[1] - 1 + dy, 1 + dx : z.shape[2] - 1 + dx]

    nbr_a = jnp.stack([shift(0, 1), shift(-1, 1), shift(-1, 0), shift(-1, -1)])
    nbr_b = jnp.stack([shift(0, -1), shift(1, -1), shift(1, 0), shift(1, 1)])
    sel = bins[None] == jnp.arange(4, dtype=jnp.int32)[:, None, None, None]
    a = jnp.sum(jnp.where(sel, nbr_a, 0.0), axis=0)
    b = jnp.sum(jnp.where(sel, nbr_b, 0.0), axis=0)
    keep = (intensity >= a) & (intensity >= b)
    return jnp.where(keep, intensity, 0.0)


def canny_edge_mask(gray: jax.Array) -> jax.Array:
    """f32 gray [B,H,W] -> bool edge mask [B,H,W]. Shared with SWT.

    NMS compares the intensity NORMALIZED to [0,255] and rounded to the
    integer grid (ref: the C library runs canny on normalized u8-scale
    matrices, SURVEY.md §2.2). Shared spec with the oracle: integer
    compares behave identically in f32 and f64, so ridge ties break the
    same way on both sides — without this the smooth gaussian gradient
    produces f32 false ties and systematically double-width TPU ridges.
    """
    smoothed = gaussian_on_matrix(
        gray, C.CANNY_GAUSSIAN_SIGMA, C.CANNY_GAUSSIAN_NB_STDDEV
    )
    grad = sobel_on_matrix(smoothed)
    inten_q = jnp.round(normalize(grad.intensity))
    nms = _nms(inten_q, grad.direction)
    peak = jnp.max(nms, axis=(-2, -1), keepdims=True)
    # strict > 0 guard: a flat page (peak == 0) has no edges at all
    strong = (nms >= peak * C.CANNY_HIGH_THRESHOLD_FRACTION) & (nms > 0.0)
    weak = (nms >= peak * C.CANNY_LOW_THRESHOLD_FRACTION) & (nms > 0.0)
    return flood_reach(strong, weak, connectivity=8)


@jax.jit
def canny(pages: jax.Array) -> jax.Array:
    """uint8 RGBA [B,H,W,4] -> edge bitmap (white edges on black)."""
    pages, unb = ensure_batched(pages)
    edges = canny_edge_mask(rgba_to_gray(pages))
    return maybe_unbatch(gray_to_rgba(edges.astype(jnp.float32) * 255.0), unb)
