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


@partial(jax.jit, static_argnames=("spec",))
def run_pipeline(pages: jax.Array, spec: tuple) -> jax.Array:
    """Apply a normalized spec to uint8 RGBA [B,H,W,4] in one XLA program."""
    for name, kwargs in spec:
        pages = _FILTERS[name](pages, **dict(kwargs))
    return pages


def compile_pipeline(spec: Iterable):
    """Return a jitted fn(pages) for the given pipeline spec."""
    spec = normalize_spec(spec)
    return lambda pages: run_pipeline(pages, spec)
