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

from ...core import constants as C
from .common import (apply_wipe, block_sums, coverage_from_blocks,
                     dark_mask)


def grayfilter_wipe_planes(
    dark: jax.Array,
    gray: jax.Array,
    size: int = C.GRAYFILTER_SIZE,
    step: int = C.GRAYFILTER_STEP,
    threshold: float = C.GRAYFILTER_THRESHOLD,
) -> jax.Array:
    """Decision core on a precomputed dark plane (bool) + gray values
    (f32; may be a lazy where(acc, 255, gray0) expression — XLA fuses it
    into the block reduction, so no threaded gray plane materializes)."""
    dark_counts = block_sums(dark, size, step)
    mean_gray = block_sums(gray, size, step) / float(size * size)
    wipe_blocks = (dark_counts == 0) & (mean_gray > 255.0 * (1.0 - threshold))

    return coverage_from_blocks(wipe_blocks, gray.shape, size, step)


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
