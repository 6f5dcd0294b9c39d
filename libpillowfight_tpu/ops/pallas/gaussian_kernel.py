"""Pallas TPU kernel: fused separable Gaussian blur.

Ref: src/pillowfight/gaussian.c (conv → transpose → conv, SURVEY.md §2.2).
The XLA path lowers to two full-array convs with an HBM round trip
between them; this kernel keeps a row-band of the plane resident in VMEM
and applies BOTH 1-D passes before writing back — one HBM sweep total.

Halo handling: each grid step receives its own row band plus the
previous/next bands via three BlockSpecs over the same input with
clamped index maps (the boundary bands zero their out-of-image halo in
the kernel, preserving the reference's zero-padding contract). The
horizontal pass runs on band+halo rows, the vertical pass consumes the
halo, and only the interior band is written.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 128


def _blur_kernel(prev_ref, cur_ref, next_ref, out_ref, *, taps, hw, tile_h,
                 n_tiles, width, true_w):
    i = pl.program_id(1)

    top = prev_ref[0, tile_h - hw :, :]
    mid = cur_ref[0]
    bot = next_ref[0, :hw, :]
    # zero out-of-image halos (boundary bands get clamped neighbor blocks)
    top = jnp.where(i == 0, 0.0, top)
    bot = jnp.where(i == n_tiles - 1, 0.0, bot)
    band = jnp.concatenate([top, mid, bot], axis=0)  # [tile_h + 2*hw, W]

    # horizontal pass: shifted multiply-adds, zero beyond true_w and col 0
    cols = jax.lax.broadcasted_iota(jnp.int32, band.shape, 1)
    band = jnp.where(cols < true_w, band, 0.0)
    acc_h = jnp.zeros_like(band)
    for k, t in enumerate(taps):
        off = k - hw
        # pltpu.roll: jnp.roll's zero-size slice decomposition fails Mosaic
        shifted = band if off == 0 else pltpu.roll(
            band, (-off) % band.shape[1], axis=1)  # pltpu.roll needs shift>=0
        valid = (cols + off >= 0) & (cols + off < true_w)
        acc_h = acc_h + t * jnp.where(valid, shifted, 0.0)

    # vertical pass onto the interior rows only
    acc_v = jnp.zeros((tile_h, band.shape[1]), band.dtype)
    for k, t in enumerate(taps):
        acc_v = acc_v + t * acc_h[k : k + tile_h, :]
    out_ref[0] = acc_v


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
        _blur_kernel, taps=tuple(float(t) for t in taps), hw=hw,
        tile_h=tile_h, n_tiles=n_tiles, width=wp, true_w=w,
    )
    band = lambda fn: pl.BlockSpec(
        (1, tile_h, wp), fn, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[
            band(lambda b, i: (b, jnp.maximum(i - 1, 0), 0)),
            band(lambda b, i: (b, i, 0)),
            band(lambda b, i: (b, jnp.minimum(i + 1, n_tiles - 1), 0)),
        ],
        out_specs=band(lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
        interpret=interpret,
    )(x, x, x)
    return out[:, :h, :w]


def gaussian_taps(sigma: float, nb_stddev: int) -> tuple:
    hwid = int(np.ceil(float(sigma) * int(nb_stddev)))
    xs = np.arange(-hwid, hwid + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2.0 * float(sigma) ** 2))
    k = k / k.sum()
    return tuple(float(t) for t in k)
