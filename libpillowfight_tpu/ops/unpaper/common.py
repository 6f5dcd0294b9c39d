"""Shared helpers for the unpaper filter family (SURVEY.md §2.2, §3.4).

The six unpaper filters all follow one pattern: block-wise darkness
statistics over sliding windows, followed by a conditional wipe (and for
black/noise filters, a flood fill). The statistics are strided
`reduce_window` sums — dense, regular, perfectly tiled by XLA — and the
wipes are elementwise selects, so the whole chain stays fused on-chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import constants as C


def dark_mask(gray: jax.Array, threshold: float = C.UNPAPER_BLACK_THRESHOLD) -> jax.Array:
    """Pixels considered 'black': gray < threshold * 255 (unpaper semantics)."""
    return gray < (threshold * 255.0)


def nonwhite_mask(gray: jax.Array) -> jax.Array:
    """Pixels considered 'non-white': gray < 0.9 * 255 (unpaper white threshold)."""
    return gray < (C.UNPAPER_WHITE_THRESHOLD * 255.0)


def block_sums(x: jax.Array, size: int, step: int) -> jax.Array:
    """Strided window sums. x f32/bool [B,H,W] -> f32 [B,nby,nbx] where
    grid cell (i,j) covers pixels [i*step, i*step+size) x [j*step, j*step+size)
    (VALID windows only)."""
    y = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, size, 1), (1, step, 1), "VALID",
    )
    return jax.lax.reduce_window(
        y, 0.0, jax.lax.add, (1, 1, size), (1, 1, step), "VALID",
    )


def _trailing_or(x: jax.Array, size: int, axis: int) -> jax.Array:
    """out[i] = any(x[i-size+1 : i+1]) along axis. OR is idempotent, so
    doubling shifts give O(log size) passes — stride-1 reduce_window
    lowers to `size` taps per pixel on TPU (10^2 for blurfilter blocks),
    this is ~7."""
    ax = axis % x.ndim
    covered = 1
    while covered < size:
        s = min(covered, size - covered)
        pad = [(0, 0)] * x.ndim
        pad[ax] = (s, 0)
        idx = [slice(None)] * x.ndim
        idx[ax] = slice(0, x.shape[ax])
        x = x | jnp.pad(x, pad)[tuple(idx)]
        covered += s
    return x


def coverage_from_blocks(blocks: jax.Array, shape: tuple[int, int, int],
                         size: int, step: int) -> jax.Array:
    """Inverse of block_sums' footprint: bool grid [B,nby,nbx] -> bool pixel
    mask [B,H,W] true where the pixel is covered by any selected block."""
    b, h, w = shape
    _, nby, nbx = blocks.shape
    sparse = jnp.zeros((b, h, w), bool)
    sparse = sparse.at[:, : nby * step : step, : nbx * step : step].set(blocks)
    # pixel p covered iff a selected block starts in [p-size+1, p]; OR is
    # separable AND idempotent: two 1-D doubling chains (~2 log size
    # passes) replace the size^2-tap 2-D window
    return _trailing_or(_trailing_or(sparse, size, 1), size, 2)


def wipe_white(pages: jax.Array, wipe: jax.Array) -> jax.Array:
    """Set RGB of wiped pixels to white, preserving alpha.
    pages uint8 [B,H,W,4], wipe bool [B,H,W]."""
    rgb = jnp.where(wipe[..., None], jnp.uint8(C.PF_WHITE), pages[..., :3])
    return jnp.concatenate([rgb, pages[..., 3:]], axis=-1)
