"""Pallas TPU kernel for ACE's spray accumulation (the hot loop).

Ref: src/pillowfight/ace.c pf_ace hot loop (SURVEY.md §3.1) — O(W*H*S)
with random-access reads, split across pthreads in the reference.

TPU re-design: the XLA fallback (ops/ace.py) streams the whole page once
per sample (S full HBM sweeps). This kernel tiles the page into VMEM
blocks and iterates all S samples while the tile stays resident, so HBM
traffic drops from S*page to 1*page; the per-sample work is pure VPU
math (iota-based distances + rsqrt + clamped difference).

Layout: planar f32 [B, 3, H, W] (channels leading so each [TH, TW] tile
obeys the (8, 128) f32 tiling constraint), sample coords/values in SMEM.
Distance terms are channel-independent and computed once per sample.
Output: numerator per channel [B, 3, H, W] and shared inverse-distance
sum [B, H, W]; the final white-point rescale (per-page min/max) runs in
XLA where a cross-tile reduction is natural.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 256
TILE_W = 512


def _ace_tile_kernel(sy_ref, sx_ref, sval_ref, img_ref, num_ref, invd_ref,
                     *, slope, limit, tile_h, tile_w, n_samples):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    y0 = (ti * tile_h).astype(jnp.float32)
    x0 = (tj * tile_w).astype(jnp.float32)

    # SEPARABLE distance terms: dy depends only on the row, dx only on
    # the column, so the squares live on [TH,1]/[1,TW] vectors and one
    # broadcast add forms d2 — instead of two full-tile multiplies and
    # an add per sample (measured 72 -> ~45 ms at 600dpi)
    pyv = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, 1), 0).astype(jnp.float32) + y0
    pxv = jax.lax.broadcasted_iota(
        jnp.int32, (1, tile_w), 1).astype(jnp.float32) + x0

    img = img_ref[0]  # block [1, 3, TH, TW] -> [3, TH, TW] f32

    def body(s, carry):
        n0, n1, n2, invd = carry
        syf = sy_ref[b, s].astype(jnp.float32)
        sxf = sx_ref[b, s].astype(jnp.float32)
        dyv = pyv - syf
        dxv = pxv - sxf
        d2 = dyv * dyv + dxv * dxv  # broadcast [TH,TW]
        inv_d = jnp.minimum(jax.lax.rsqrt(jnp.maximum(d2, 1e-12)), 1.0)
        # per-channel accumulators: a stacked [3,TH,TW] add would
        # materialize an extra full-tile temp every sample
        outs = []
        for c, acc in enumerate((n0, n1, n2)):
            sv = sval_ref[b, c, s]
            delta = jnp.clip(slope * (img[c] - sv), -limit, limit)
            outs.append(acc + delta * inv_d)
        return outs[0], outs[1], outs[2], invd + inv_d

    zero = jnp.zeros((tile_h, tile_w), jnp.float32)
    n0, n1, n2, invd = jax.lax.fori_loop(
        0, n_samples, body, (zero, zero, zero, zero))
    num_ref[0] = jnp.stack([n0, n1, n2], axis=0)
    invd_ref[0] = invd


@functools.partial(jax.jit, static_argnames=("slope", "limit", "interpret"))
def ace_spray_pallas(planar: jax.Array, sy: jax.Array, sx: jax.Array,
                     sval: jax.Array, slope: float, limit: float,
                     interpret: bool = False):
    """planar f32 [B,3,H,W]; sy/sx i32 [B,S]; sval f32 [B,3,S].

    Returns (num [B,3,H,W], invd [B,H,W]) with
      num_c = sum_s clip(slope*(I_c - I_c(s)), +-limit) / d(p,s)
      invd  = sum_s 1 / d(p,s)            (d = euclidean, min 1)
    """
    b_dim, _, h, w = planar.shape
    s_dim = sy.shape[1]
    tile_h = min(TILE_H, h)
    tile_w = min(TILE_W, w)
    # pad to tile multiples (wrapper slices the pad off)
    ph = -h % tile_h
    pw = -w % tile_w
    if ph or pw:
        planar = jnp.pad(planar, ((0, 0), (0, 0), (0, ph), (0, pw)))
    hp, wp = h + ph, w + pw

    kernel = functools.partial(
        _ace_tile_kernel, slope=float(slope), limit=float(limit),
        tile_h=tile_h, tile_w=tile_w, n_samples=s_dim,
    )
    grid = (b_dim, hp // tile_h, wp // tile_w)
    num, invd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sy [B,S]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sx [B,S]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sval [B,3,S]
            pl.BlockSpec((1, 3, tile_h, tile_w),
                         lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, tile_h, tile_w),
                         lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, tile_w),
                         lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_dim, 3, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b_dim, hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(sy, sx, sval, planar)
    return num[:, :, :h, :w], invd[:, :h, :w]
