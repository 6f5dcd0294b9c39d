"""unpaper grayfilter (ref: src/pillowfight/grayfilter.c — SURVEY.md §2.2).

Removes gray shading / bleed-through: a scan block containing NO truly
black pixel whose mean gray is lighter than mid-threshold is wiped to
pure white.

Spec pinned for the oracle: blocks `size` x `size` at stride `step`;
wipe block iff (count of pixels with gray < 0.33*255) == 0 AND
mean(gray) > 255 * (1 - threshold).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import constants as C
from .common import (apply_wipe, block_counts, block_sums_u16,
                     coverage_from_blocks, dark_mask)


def grayfilter_wipe_planes_s3(
    dark: jax.Array,
    s3: jax.Array,
    size: int = C.GRAYFILTER_SIZE,
    step: int = C.GRAYFILTER_STEP,
    threshold: float = C.GRAYFILTER_THRESHOLD,
) -> jax.Array:
    """Decision core on a precomputed dark plane (bool) + s3 = r+g+b
    uint16 values (may be a lazy where(acc, 765, s3_0) expression — XLA
    fuses it into the block reduction, so no threaded plane
    materializes).

    The mean test runs on EXACT integer block sums of s3 (= 3*gray):
    mean_gray > 255*(1-t)  <=>  sum(s3) > 765*(1-t)*size^2 — no f32
    page plane, half the traffic, and bit-stable decisions."""
    dark_counts = block_counts(dark, size, step)
    s3_sums = block_sums_u16(s3, size, step)
    wipe_blocks = (dark_counts == 0) & (
        s3_sums > 765.0 * (1.0 - threshold) * float(size * size))

    return coverage_from_blocks(wipe_blocks, dark.shape, size, step)


def grayfilter_wipe_planes(
    dark: jax.Array,
    gray: jax.Array,
    size: int = C.GRAYFILTER_SIZE,
    step: int = C.GRAYFILTER_STEP,
    threshold: float = C.GRAYFILTER_THRESHOLD,
) -> jax.Array:
    """Compat shim over the s3 core for f32 gray planes (gray = k/3, so
    round(3*gray) recovers the exact integer s3)."""
    s3 = jnp.round(gray * 3.0).astype(jnp.uint16)
    return grayfilter_wipe_planes_s3(dark, s3, size, step, threshold)


def grayfilter_wipe(
    gray: jax.Array,
    size: int = C.GRAYFILTER_SIZE,
    step: int = C.GRAYFILTER_STEP,
    threshold: float = C.GRAYFILTER_THRESHOLD,
) -> jax.Array:
    """Wipe mask from a gray plane f32 [B,H,W] (decision core)."""
    return grayfilter_wipe_planes(dark_mask(gray), gray, size, step, threshold)


def unpaper_grayfilter(pages: jax.Array, **kwargs) -> jax.Array:
    return apply_wipe(pages, grayfilter_wipe, **kwargs)
