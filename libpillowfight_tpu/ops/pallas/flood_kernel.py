"""Pallas TPU kernel: flood-fill / hysteresis propagation rounds.

Ref: the reference's BFS flood fills (canny.c hysteresis, blackfilter.c,
SURVEY.md §3.2/§3.4). The XLA path (ops/morph.py) runs two
associative_scans + a dilation per round — ~44 materialized HBM sweeps
per round at page scale. This kernel performs one full round (segmented
OR along rows AND columns by log-shift doubling, plus the 8-neighbor
gated dilation) on a VMEM-resident row band: one HBM sweep per round.

Doubling scheme (per direction): A_k[i] = "cells (i-2^k, i] are all
mask"; R[i] |= A_k[i] & R[i-2^k]. A_{k+1}[i] = A_k[i] & A_k[i-2^k].
Wrap-around from pltpu.roll is killed by zeroing the wrapped-in strip
each step. Columns use the same scheme across the band plus halo rows;
cross-band propagation is completed by the outer fixed-point loop.

dtype: int8 in HBM (4x less traffic than int32), widened to int32 in
VMEM — Mosaic's dynamic_rotate only supports 32-bit element vectors.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 128


# NOTE: propagation state is int32 (0/1) inside the kernel — Mosaic's
# tpu.dynamic_rotate supports only 32-bit element vectors (i1 and i8
# rejected), so HBM buffers stay int8 for bandwidth and widen on load;
# &,| are bitwise on 0/1 values.


def _roll_fwd(x, s, axis):
    """value at index i-s (shift forward); wrapped-in strip zeroed.
    s may be traced (tpu.dynamic_rotate)."""
    r = pltpu.roll(x, s, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx >= s, r, jnp.zeros_like(r))


def _roll_bwd(x, s, axis):
    """value at index i+s (shift backward); wrapped-in strip zeroed."""
    n = x.shape[axis]
    r = pltpu.roll(x, (n - s) % n, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx < n - s, r, jnp.zeros_like(r))


def _shift_down(x, s):
    """value at row i-s (rows move down); zero filled. Static s —
    tpu.dynamic_rotate cannot rotate the sublane axis."""
    return jnp.concatenate([jnp.zeros((s,) + x.shape[1:], x.dtype), x[:-s]], 0)


def _shift_up(x, s):
    """value at row i+s; zero filled. Static s."""
    return jnp.concatenate([x[s:], jnp.zeros((s,) + x.shape[1:], x.dtype)], 0)


def _seg_or_doubling(r, m, axis, n):
    """Segmented OR along `axis` (length n): r[i] |= any r within i's
    contiguous mask run. log2(n) doubling steps, both directions.
    r/m int32 0/1.

    axis 1 (lanes): fori_loop with dynamic rotates — a handful of live
    VMEM buffers instead of an unrolled 12-step chain (VMEM stack OOM).
    axis 0 (sublanes): unrolled static concat-shifts — Mosaic's
    dynamic_rotate only supports the lane dimension."""
    n_steps = max(1, int(np.ceil(np.log2(n))))
    if axis == 1:
        def step(k, carry):
            r, a_f, a_b = carry
            s = jnp.int32(1) << k
            r = r | (a_f & _roll_fwd(r, s, axis)) | (a_b & _roll_bwd(r, s, axis))
            a_f = a_f & _roll_fwd(a_f, s, axis)
            a_b = a_b & _roll_bwd(a_b, s, axis)
            return r, a_f, a_b

        r, _, _ = jax.lax.fori_loop(0, n_steps, step, (r, m, m))
        return r & m

    a_f = m
    a_b = m
    s = 1
    while s < n:
        r = r | (a_f & _shift_down(r, s)) | (a_b & _shift_up(r, s))
        a_f = a_f & _shift_down(a_f, s)
        a_b = a_b & _shift_up(a_b, s)
        s *= 2
    return r & m


def _dilate8(r):
    """3x3 OR via shifts (zero padded). int32 0/1."""
    h = r | _roll_fwd(r, 1, 1) | _roll_bwd(r, 1, 1)
    return h | _shift_down(h, 1) | _shift_up(h, 1)


def _round_kernel(mp_ref, mc_ref, mn_ref, rp_ref, rc_ref, rn_ref, out_ref,
                  *, tile_h, width, n_tiles, inner_rounds):
    i = pl.program_id(1)
    zero_row = jnp.zeros((1, width), jnp.int32)

    def band(prev, cur, nxt):
        top = jnp.where(i == 0, zero_row,
                        prev[0, tile_h - 1 :, :].astype(jnp.int32))
        bot = jnp.where(i == n_tiles - 1, zero_row,
                        nxt[0, :1, :].astype(jnp.int32))
        mid = cur[0].astype(jnp.int32)
        return jnp.concatenate([top, mid, bot], axis=0)  # [tile_h+2, W]

    m = band(mp_ref, mc_ref, mn_ref)
    r = band(rp_ref, rc_ref, rn_ref) & m

    for _ in range(inner_rounds):
        r = _seg_or_doubling(r, m, 1, width)
        r = _seg_or_doubling(r, m, 0, tile_h + 2)
        r = _dilate8(r) & m

    out_ref[0] = r[1 : 1 + tile_h, :].astype(jnp.int8)


@functools.partial(jax.jit,
                   static_argnames=("inner_rounds", "interpret"))
def flood_round_pallas(reach: jax.Array, mask: jax.Array,
                       inner_rounds: int = 2,
                       interpret: bool = False) -> jax.Array:
    """One global flood round. reach/mask int8 [B, H, W] (0/1).

    Performs `inner_rounds` (scanW + scanH + dilate8) iterations on each
    VMEM band; cross-band column propagation advances one band per call
    via the 1-row halos, so the caller iterates to a fixed point.
    """
    b, h, w = reach.shape
    tile_h = min(TILE_H, h)
    ph = -h % tile_h
    pw = -w % 128
    if ph or pw:
        reach = jnp.pad(reach, ((0, 0), (0, ph), (0, pw)))
        mask = jnp.pad(mask, ((0, 0), (0, ph), (0, pw)))
    hp, wp = h + ph, w + pw
    n_tiles = hp // tile_h

    kernel = functools.partial(
        _round_kernel, tile_h=tile_h, width=wp, n_tiles=n_tiles,
        inner_rounds=inner_rounds,
    )
    band = lambda fn: pl.BlockSpec((1, tile_h, wp), fn,
                                   memory_space=pltpu.VMEM)
    prev = band(lambda bb, i: (bb, jnp.maximum(i - 1, 0), 0))
    cur = band(lambda bb, i: (bb, i, 0))
    nxt = band(lambda bb, i: (bb, jnp.minimum(i + 1, n_tiles - 1), 0))
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[prev, cur, nxt, prev, cur, nxt],
        out_specs=cur,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.int8),
        interpret=interpret,
    )(mask, mask, mask, reach, reach, reach)
    return out[:, :h, :w]


# ---------------------------------------------------------------- labels

def _roll_fwd_i(x, s, axis, fill):
    r = pltpu.roll(x, s, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx >= s, r, fill)


def _roll_bwd_i(x, s, axis, fill):
    n = x.shape[axis]
    r = pltpu.roll(x, (n - s) % n, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx < n - s, r, fill)


def _shift_down_i(x, s, fill):
    return jnp.concatenate(
        [jnp.full((s,) + x.shape[1:], fill, x.dtype), x[:-s]], 0)


def _shift_up_i(x, s, fill):
    return jnp.concatenate(
        [x[s:], jnp.full((s,) + x.shape[1:], fill, x.dtype)], 0)


def _seg_min_doubling(lab, m, axis, n, big):
    """Segmented MIN along axis: lab[i] = min label over i's mask run.
    lab int32, m int32 0/1. Lane axis: fori_loop + dynamic rotate;
    sublane axis: unrolled static concat-shifts (see _seg_or)."""
    n_steps = max(1, int(np.ceil(np.log2(n))))
    if axis == 1:
        def step(k, carry):
            lab, a_f, a_b = carry
            s = jnp.int32(1) << k
            cand_f = jnp.where(a_f != 0, _roll_fwd_i(lab, s, axis, big), big)
            cand_b = jnp.where(a_b != 0, _roll_bwd_i(lab, s, axis, big), big)
            lab = jnp.minimum(lab, jnp.minimum(cand_f, cand_b))
            a_f = a_f & _roll_fwd(a_f, s, axis)
            a_b = a_b & _roll_bwd(a_b, s, axis)
            return lab, a_f, a_b

        lab, _, _ = jax.lax.fori_loop(0, n_steps, step, (lab, m, m))
        return jnp.where(m != 0, lab, big)

    a_f = m
    a_b = m
    s = 1
    while s < n:
        cand_f = jnp.where(a_f != 0, _shift_down_i(lab, s, big), big)
        cand_b = jnp.where(a_b != 0, _shift_up_i(lab, s, big), big)
        lab = jnp.minimum(lab, jnp.minimum(cand_f, cand_b))
        a_f = a_f & _shift_down(a_f, s)
        a_b = a_b & _shift_up(a_b, s)
        s *= 2
    return jnp.where(m != 0, lab, big)


def _neighbor_min8(lab, big):
    h = jnp.minimum(lab, jnp.minimum(_roll_fwd_i(lab, 1, 1, big),
                                     _roll_bwd_i(lab, 1, 1, big)))
    return jnp.minimum(h, jnp.minimum(_shift_down_i(h, 1, big),
                                      _shift_up_i(h, 1, big)))


def _label_round_kernel(mp_ref, mc_ref, mn_ref, lp_ref, lc_ref, ln_ref,
                        out_ref, *, tile_h, width, n_tiles, inner_rounds,
                        big):
    i = pl.program_id(1)

    def band(prev, cur, nxt, fill):
        frow = jnp.full((1, width), fill, jnp.int32)
        top = jnp.where(i == 0, frow,
                        prev[0, tile_h - 1 :, :].astype(jnp.int32))
        bot = jnp.where(i == n_tiles - 1, frow,
                        nxt[0, :1, :].astype(jnp.int32))
        return jnp.concatenate([top, cur[0].astype(jnp.int32), bot], axis=0)

    m = band(mp_ref, mc_ref, mn_ref, 0)
    lab = jnp.where(m != 0, band(lp_ref, lc_ref, ln_ref, big), big)

    for _ in range(inner_rounds):
        lab = _seg_min_doubling(lab, m, 1, width, big)
        lab = _seg_min_doubling(lab, m, 0, tile_h + 2, big)
        lab = jnp.where(m != 0, _neighbor_min8(lab, big), big)

    out_ref[0] = lab[1 : 1 + tile_h, :]


@functools.partial(jax.jit, static_argnames=("inner_rounds", "interpret"))
def label_round_pallas(labels: jax.Array, mask: jax.Array,
                       inner_rounds: int = 2,
                       interpret: bool = False) -> jax.Array:
    """One global min-label propagation round. labels int32 [B,H,W]
    (background = big), mask int8 [B,H,W]."""
    b, h, w = labels.shape
    big = h * w  # python int: becomes a kernel compile-time constant
    tile_h = min(TILE_H, h)
    ph = -h % tile_h
    pw = -w % 128
    if ph or pw:
        labels = jnp.pad(labels, ((0, 0), (0, ph), (0, pw)),
                         constant_values=h * w)
        mask = jnp.pad(mask, ((0, 0), (0, ph), (0, pw)))
    hp, wp = h + ph, w + pw
    n_tiles = hp // tile_h

    kernel = functools.partial(
        _label_round_kernel, tile_h=tile_h, width=wp, n_tiles=n_tiles,
        inner_rounds=inner_rounds, big=big,
    )
    band = lambda fn: pl.BlockSpec((1, tile_h, wp), fn,
                                   memory_space=pltpu.VMEM)
    prev = band(lambda bb, i: (bb, jnp.maximum(i - 1, 0), 0))
    cur = band(lambda bb, i: (bb, i, 0))
    nxt = band(lambda bb, i: (bb, jnp.minimum(i + 1, n_tiles - 1), 0))
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[prev, cur, nxt, prev, cur, nxt],
        out_specs=cur,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.int32),
        interpret=interpret,
    )(mask, mask, mask, labels, labels, labels)
    return out[:, :h, :w]


def label_components_pallas(mask: jax.Array, max_iters: int = 256,
                            interpret: bool = False) -> jax.Array:
    """Exact CC labels (8-conn, min flat index, background = H*W) via the
    Pallas round kernel."""
    mask_b = mask.astype(bool)
    b, h, w = mask_b.shape
    big = h * w
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1) * w
        + jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    )
    lab0 = jnp.where(mask_b, idx, big)
    m8 = mask_b.astype(jnp.int8)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        lab2 = label_round_pallas(lab, m8, interpret=interpret)
        return lab2, jnp.any(lab2 != lab), it + 1

    l1 = label_round_pallas(lab0, m8, interpret=interpret)
    lab, _, _ = jax.lax.while_loop(cond, body, (l1, jnp.bool_(True), 1))
    return lab


def flood_reach_pallas(seeds: jax.Array, mask: jax.Array,
                       max_iters: int = 256, interpret: bool = False
                       ) -> jax.Array:
    """Exact fixed-point flood (8-connectivity) via the Pallas round
    kernel. seeds/mask bool [B,H,W] -> bool [B,H,W]."""
    m8 = mask.astype(jnp.int8)
    r0 = (seeds.astype(bool) & mask.astype(bool)).astype(jnp.int8)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        r, _, it = state
        r2 = flood_round_pallas(r, m8, interpret=interpret)
        return r2, jnp.any(r2 != r), it + 1

    r1 = flood_round_pallas(r0, m8, interpret=interpret)
    r, _, _ = jax.lax.while_loop(cond, body, (r1, jnp.bool_(True), 1))
    return r.astype(bool)
