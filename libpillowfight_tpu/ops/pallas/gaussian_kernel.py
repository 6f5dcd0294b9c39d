"""Pallas TPU kernel: fused separable Gaussian blur.

Ref: src/pillowfight/gaussian.c (conv → transpose → conv, SURVEY.md §2.2).
The XLA path lowers to two full-array convs with an HBM round trip
between them; this kernel keeps a row-band of the plane resident in VMEM
and applies BOTH 1-D passes before writing back — one HBM sweep total.

Halo handling: each grid step receives its own row band plus the
previous/next bands via three BlockSpecs over the same input with
clamped index maps (the boundary bands zero their out-of-image halo in
the kernel, preserving the reference's zero-padding contract).

VMEM discipline (v5e scoped limit is 16 MB): the vertical pass runs
FIRST as unrolled multiply-adds over static row slices of the band —
slices are views, so nothing is materialized beyond one accumulator —
and the horizontal pass is a fori_loop with a *dynamic* lane rotate
(pltpu.roll supports dynamic shifts on the lane axis), so Mosaic keeps
exactly one rotated temp alive instead of one per tap. The taps live in
SMEM and are read per iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64


def _blur_kernel(taps_ref, prev_ref, cur_ref, next_ref, out_ref, *, n_taps,
                 hw, tile_h, n_tiles, true_w):
    i = pl.program_id(1)

    top = prev_ref[0, tile_h - hw :, :]
    mid = cur_ref[0]
    bot = next_ref[0, :hw, :]
    # zero out-of-image halos (boundary bands get clamped neighbor blocks)
    top = jnp.where(i == 0, 0.0, top)
    bot = jnp.where(i == n_tiles - 1, 0.0, bot)
    band = jnp.concatenate([top, mid, bot], axis=0)  # [tile_h + 2*hw, W]

    # vertical pass first: static row slices are views — one accumulator,
    # no rotated copies
    acc_v = taps_ref[0] * band[0:tile_h, :]
    for k in range(1, n_taps):
        acc_v = acc_v + taps_ref[k] * band[k : k + tile_h, :]

    # horizontal pass: dynamic lane rotate inside fori_loop (single live
    # temp), with zero padding beyond the true image width
    w = acc_v.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, acc_v.shape, 1)
    acc_v = jnp.where(cols < true_w, acc_v, 0.0)

    def body(k, acc):
        off = k - hw  # sample column = col + off
        shifted = pltpu.roll(acc_v, (-off) % w, axis=1)
        valid = (cols + off >= 0) & (cols + off < true_w)
        return acc + taps_ref[k] * jnp.where(valid, shifted, 0.0)

    out_ref[0] = jax.lax.fori_loop(
        0, n_taps, body, jnp.zeros_like(acc_v), unroll=False
    )


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def gaussian_sep_pallas(planes: jax.Array, taps: tuple,
                        interpret: bool = False) -> jax.Array:
    """Fused separable blur. planes f32 [N, H, W]; taps: tuple of floats
    (odd length). Zero padding outside the image (reference contract)."""
    n, h, w = planes.shape
    hw = (len(taps) - 1) // 2
    tile_h = TILE_H
    assert tile_h >= hw, "tile must cover the halo"
    ph = -h % tile_h
    pw = -w % 128
    x = jnp.pad(planes, ((0, 0), (0, ph), (0, pw)))
    hp, wp = h + ph, w + pw
    n_tiles = hp // tile_h

    kernel = functools.partial(
        _blur_kernel, n_taps=len(taps), hw=hw,
        tile_h=tile_h, n_tiles=n_tiles, true_w=w,
    )
    band = lambda fn: pl.BlockSpec(
        (1, tile_h, wp), fn, memory_space=pltpu.VMEM)
    taps_arr = jnp.asarray(taps, jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            band(lambda b, i: (b, jnp.maximum(i - 1, 0), 0)),
            band(lambda b, i: (b, i, 0)),
            band(lambda b, i: (b, jnp.minimum(i + 1, n_tiles - 1), 0)),
        ],
        out_specs=band(lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
        interpret=interpret,
    )(taps_arr, x, x, x)
    return out[:, :h, :w]


def gaussian_taps(sigma: float, nb_stddev: int) -> tuple:
    hwid = int(np.ceil(float(sigma) * int(nb_stddev)))
    xs = np.arange(-hwid, hwid + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2.0 * float(sigma) ** 2))
    k = k / k.sum()
    return tuple(float(t) for t in k)
