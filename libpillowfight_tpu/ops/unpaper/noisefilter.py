"""unpaper noisefilter (ref: src/pillowfight/noisefilter.c — SURVEY.md §2.2).

Erases speckle noise: every 8-connected cluster of non-white pixels with
at most `intensity` members is wiped to white.

TPU re-design: the reference's per-pixel bounded flood count becomes one
global connected-component labeling (morph.label_components) followed by
a scatter-add histogram of component sizes — every cluster on the page is
measured in a single data-parallel pass instead of millions of tiny BFS
walks.
"""

from __future__ import annotations

import jax

from ...core import constants as C
from ...core.bitmap import ensure_batched, maybe_unbatch, rgba_to_gray
from ..morph import label_components, small_component_mask
from .common import nonwhite_mask, wipe_white


def unpaper_noisefilter(
    pages: jax.Array, intensity: int = C.NOISEFILTER_INTENSITY
) -> jax.Array:
    pages, unb = ensure_batched(pages)
    mask = nonwhite_mask(rgba_to_gray(pages))
    labels = label_components(mask, connectivity=8)
    wipe = small_component_mask(labels, mask, intensity)
    return maybe_unbatch(wipe_white(pages, wipe), unb)
