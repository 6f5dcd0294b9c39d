"""unpaper blurfilter (ref: src/pillowfight/blurfilter.c — SURVEY.md §2.2).

Removes 'lonely clusters' (isolated smudges): a scan block is wiped to
white when every surrounding block is virtually free of dark pixels —
the speck itself has no supporting content around it.

Spec pinned for the oracle: blocks of `size` x `size` at stride `step`;
block (i,j) is wiped iff 0 < its own dark ratio <= intensity AND the max
dark ratio over its 8 neighbors at grid offset d = size//step (the
nearest non-overlapping blocks) is <= intensity. Dark = non-white
(unpaper white threshold 0.9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import constants as C
from .common import (apply_wipe, block_counts, coverage_from_blocks,
                     nonwhite_mask)


def blurfilter_wipe_nonwhite(
    mask: jax.Array,
    size: int = C.BLURFILTER_SIZE,
    step: int = C.BLURFILTER_STEP,
    intensity: float = C.BLURFILTER_INTENSITY,
) -> jax.Array:
    """Decision core on a precomputed non-white plane (bool [B,H,W])."""
    ratios = block_counts(mask, size, step) / float(size * size)
    d = max(size // step, 1)
    # max over the 8 neighbor cells at offset d (edge cells: missing
    # neighbors count as clean, matching unpaper's border behavior)
    p = jnp.pad(ratios, ((0, 0), (d, d), (d, d)))
    nby, nbx = ratios.shape[1], ratios.shape[2]
    neigh = []
    for dy in (-d, 0, d):
        for dx in (-d, 0, d):
            if dy == 0 and dx == 0:
                continue
            neigh.append(p[:, d + dy : d + dy + nby, d + dx : d + dx + nbx])
    neighbor_max = jnp.max(jnp.stack(neigh), axis=0)

    # a smudge block: contains few-but-some dark pixels, and every
    # surrounding block is also virtually clean
    lonely = (ratios > 0) & (ratios <= intensity) & (neighbor_max <= intensity)
    return coverage_from_blocks(lonely, mask.shape, size, step) & mask


def blurfilter_wipe(
    gray: jax.Array,
    size: int = C.BLURFILTER_SIZE,
    step: int = C.BLURFILTER_STEP,
    intensity: float = C.BLURFILTER_INTENSITY,
) -> jax.Array:
    """Wipe mask from a gray plane f32 [B,H,W] (decision core)."""
    return blurfilter_wipe_nonwhite(nonwhite_mask(gray), size, step, intensity)


def unpaper_blurfilter(pages: jax.Array, **kwargs) -> jax.Array:
    return apply_wipe(pages, blurfilter_wipe, **kwargs)
