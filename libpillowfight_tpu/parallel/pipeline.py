"""Filter pipelines: whole-page filter graphs fused under one jit.

SURVEY.md §2.4 (PP row): the reference runs filters sequentially with a
full-image barrier and a materialized bitmap between each pair. Here a
pipeline is a *spec* (tuple of (filter_name, frozen-kwargs) — hashable,
so it is the jit static-argument key, SURVEY.md §5 config item) compiled
into ONE XLA program: intermediates stay in HBM/VMEM, elementwise stages
fuse into the convs, and uint8<->f32 conversions between stages collapse.

The default `DOCUMENT_CLEANUP` chain mirrors the reference README's
intended unpaper usage: blackfilter -> noisefilter -> blurfilter ->
masks -> grayfilter -> border.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Iterable

import jax

import jax.numpy as jnp

from ..core.bitmap import ensure_batched, maybe_unbatch, rgba_to_gray
from ..ops import (
    ace,
    canny,
    gaussian,
    sobel,
    unpaper_blackfilter,
    unpaper_blurfilter,
    unpaper_border,
    unpaper_grayfilter,
    unpaper_masks,
    unpaper_noisefilter,
)
from ..ops.swt import swt
from ..ops.unpaper.blackfilter import blackfilter_wipe
from ..ops.unpaper.blurfilter import blurfilter_wipe
from ..ops.unpaper.border import border_wipe
from ..ops.unpaper.common import wipe_white
from ..ops.unpaper.grayfilter import grayfilter_wipe
from ..ops.unpaper.masks import masks_wipe
from ..ops.unpaper.noisefilter import noisefilter_wipe

_FILTERS = {
    "ace": ace,
    "canny": canny,
    "gaussian": gaussian,
    "sobel": sobel,
    "swt": swt,
    "unpaper_blackfilter": unpaper_blackfilter,
    "unpaper_blurfilter": unpaper_blurfilter,
    "unpaper_border": unpaper_border,
    "unpaper_grayfilter": unpaper_grayfilter,
    "unpaper_masks": unpaper_masks,
    "unpaper_noisefilter": unpaper_noisefilter,
}

DOCUMENT_CLEANUP = (
    ("unpaper_blackfilter", ()),
    ("unpaper_noisefilter", ()),
    ("unpaper_blurfilter", ()),
    ("unpaper_masks", ()),
    ("unpaper_grayfilter", ()),
    ("unpaper_border", ()),
)

EDGE_STACK = (("canny", ()),)


def normalize_spec(spec: Iterable) -> tuple:
    """Canonicalize a pipeline spec to a hashable tuple of
    (name, ((kwarg, value), ...)) pairs."""
    out = []
    for item in spec:
        if isinstance(item, str):
            name, kwargs = item, ()
        else:
            name, kwargs = item
            if isinstance(kwargs, dict):
                kwargs = tuple(sorted(kwargs.items()))
            else:
                kwargs = tuple(kwargs)
        if name not in _FILTERS:
            raise ValueError(f"unknown filter {name!r}; have {sorted(_FILTERS)}")
        out.append((name, kwargs))
    return tuple(out)


# unpaper decision cores: wipe mask from a gray plane. A wiped pixel
# becomes exactly white, so threading `gray = where(wipe, 255, gray)`
# between stages is bit-identical to re-deriving gray from the wiped RGBA
# — the fused chain reads the RGBA batch once and writes it once (the
# reference materializes a full bitmap between every filter pair;
# SURVEY.md §2.4 PP row).
_WIPES = {
    "unpaper_blackfilter": blackfilter_wipe,
    "unpaper_noisefilter": noisefilter_wipe,
    "unpaper_blurfilter": blurfilter_wipe,
    "unpaper_grayfilter": grayfilter_wipe,
    "unpaper_masks": masks_wipe,
    "unpaper_border": border_wipe,
}


def _run_unpaper_group(pages: jax.Array, group) -> jax.Array:
    """Apply a run of consecutive unpaper filters via gray-plane threading."""
    gray = rgba_to_gray(pages)
    acc = None
    for name, kwargs in group:
        wipe = _WIPES[name](gray, **dict(kwargs))
        gray = jnp.where(wipe, jnp.float32(255.0), gray)
        acc = wipe if acc is None else (acc | wipe)
    return wipe_white(pages, acc)


@partial(jax.jit, static_argnames=("spec",))
def run_pipeline(pages: jax.Array, spec: tuple) -> jax.Array:
    """Apply a normalized spec to uint8 RGBA [B,H,W,4] in one XLA program.

    Consecutive unpaper filters run as one gray-threaded group (single
    RGBA read + write for the whole group); other filters run in order.
    """
    pages, unb = ensure_batched(pages)
    i, n = 0, len(spec)
    while i < n:
        name, kwargs = spec[i]
        if name in _WIPES:
            j = i
            while j < n and spec[j][0] in _WIPES:
                j += 1
            pages = _run_unpaper_group(pages, spec[i:j])
            i = j
        else:
            pages = _FILTERS[name](pages, **dict(kwargs))
            i += 1
    return maybe_unbatch(pages, unb)


def compile_pipeline(spec: Iterable):
    """Return a jitted fn(pages) for the given pipeline spec."""
    spec = normalize_spec(spec)
    return lambda pages: run_pipeline(pages, spec)
