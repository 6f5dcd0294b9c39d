"""Pallas TPU kernels: flood-fill / hysteresis / CC-label propagation.

Ref: the reference's BFS flood fills (canny.c hysteresis, blackfilter.c,
noisefilter.c) and swt.c's component merge (SURVEY.md §3.2-§3.4). The XLA
path (ops/morph.py) runs two segmented associative scans + a dilation per
round — ~44 materialized HBM sweeps per round at page scale. These
kernels do one full round (segmented OR/MIN along rows AND columns by
log-shift doubling, plus the gated 8-neighbor dilation) on a VMEM band:
one HBM sweep per band pass.

Cross-band propagation rides the TPU's *sequential grid*: a sweep walks
the bands top-to-bottom carrying the previous band's last result row in a
VMEM scratch ("arbitrary" grid dims execute in order on TPU), then a
second sweep walks bottom-to-top. Information therefore crosses the WHOLE
page in one down+up pair — the number of fixed-point rounds is set by the
number of snake turns in the most winding connected path (1-2 for scanned
documents), not by page height / band count. Stale opposite-side halos
are also consumed; that is sound because both recurrences are monotone
(reach only grows, labels only shrink), so a stale value can only
under-propagate, never corrupt, and the outer while_loop runs to the
exact fixed point.

dtype: reach is int8 in HBM (4x less traffic than int32), widened to
int32 in VMEM — Mosaic's dynamic_rotate only supports 32-bit lanes.
Band height adapts to page width so the kernel's scoped-VMEM stack stays
under the 16 MiB limit (64 rows x 2560 lanes measured to fit).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_CELLS = 64 * 2560  # rows*lanes per band that fit the VMEM stack


def _tile_h(h: int, wp: int) -> int:
    """Band height for a padded width wp: as tall as the scoped-VMEM
    stack allows, multiple of 32 (int8 sublane tile), min 32."""
    return max(32, min(((_TILE_CELLS // wp) // 32) * 32, ((h + 31) // 32) * 32))


# NOTE: propagation state is int32 (0/1 for flood) inside the kernel —
# Mosaic's tpu.dynamic_rotate supports only 32-bit element vectors (i1
# and i8 rejected); &,| are bitwise on 0/1 values.


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


def _seg_or_doubling(r, m, axis, n, unroll_lanes=False):
    """Segmented OR along `axis` (length n): r[i] |= any r within i's
    contiguous mask run. log2(n) doubling steps, both directions.
    r/m int32 0/1.

    axis 1 (lanes): fori_loop with dynamic rotates by default — a
    handful of live VMEM buffers instead of an unrolled 12-step chain
    (VMEM stack OOM on some shapes); unroll_lanes=True emits static
    rotates instead (faster when the stack fits).
    axis 0 (sublanes): unrolled static concat-shifts — Mosaic's
    dynamic_rotate only supports the lane dimension."""
    n_steps = max(1, int(np.ceil(np.log2(n))))
    if axis == 1:
        if unroll_lanes:
            a_f = m
            a_b = m
            s = 1
            while s < n:
                r = r | (a_f & _roll_fwd(r, s, axis)) | (a_b & _roll_bwd(r, s, axis))
                a_f = a_f & _roll_fwd(a_f, s, axis)
                a_b = a_b & _roll_bwd(a_b, s, axis)
                s *= 2
            return r & m

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


def _dilate_cheb(r, k):
    """Chebyshev-ball OR-dilation of radius k via separable doubling
    (zero padded). int32 0/1. k=1 is the plain 3x3 dilation; the union
    of [-c..c] with its +/-s shifts covers [-(c+s)..c+s], so each axis
    needs O(log k) static shifts."""
    for axis_shift in ((lambda x, s: _roll_fwd(x, s, 1),
                        lambda x, s: _roll_bwd(x, s, 1)),
                       (_shift_down, _shift_up)):
        fwd, bwd = axis_shift
        c = 0
        while c < k:
            s = min(c + 1, k - c)
            r = r | fwd(r, s) | bwd(r, s)
            c += s
    return r


def _flood_sweep_kernel(mp_ref, mc_ref, mn_ref, rp_ref, rc_ref, rn_ref,
                        out_ref, carry_ref, *, tile_h, width, n_tiles,
                        inner_rounds, down, leap):
    i = pl.program_id(1)
    j = i if down else n_tiles - 1 - i  # actual band index
    hr = leap  # halo rows: the dilation reaches `leap` rows across bands
    zero_rows = jnp.zeros((hr, width), jnp.int32)

    def band(prev, cur, nxt):
        top = jnp.where(j == 0, zero_rows,
                        prev[0, tile_h - hr :, :].astype(jnp.int32))
        bot = jnp.where(j == n_tiles - 1, zero_rows,
                        nxt[0, :hr, :].astype(jnp.int32))
        mid = cur[0].astype(jnp.int32)
        return jnp.concatenate([top, mid, bot], axis=0)  # [tile_h+2hr, W]

    m = band(mp_ref, mc_ref, mn_ref)
    r = band(rp_ref, rc_ref, rn_ref) & m

    # fresh halo rows carried from the band processed just before this one
    carry = carry_ref[...].astype(jnp.int32)
    if down:
        fresh_top = jnp.where(j == 0, zero_rows, carry) & m[:hr]
        r = jnp.concatenate([r[:hr] | fresh_top, r[hr:]], axis=0)
    else:
        fresh_bot = jnp.where(j == n_tiles - 1, zero_rows, carry) & m[-hr:]
        r = jnp.concatenate([r[:-hr], r[-hr:] | fresh_bot], axis=0)

    for _ in range(inner_rounds):
        r = _seg_or_doubling(r, m, 1, width)
        r = _seg_or_doubling(r, m, 0, tile_h + 2 * hr)
        r = _dilate_cheb(r, leap) & m

    out_ref[0] = r[hr : hr + tile_h, :].astype(jnp.int8)
    carry_ref[...] = (r[tile_h : tile_h + hr, :] if down
                      else r[hr : 2 * hr, :])


def _band_specs(n_tiles, tile_h, wp, down):
    """prev/cur/next block specs for a (possibly reversed) band walk."""
    def at(fn):
        return pl.BlockSpec((1, tile_h, wp), fn, memory_space=pltpu.VMEM)

    if down:
        jmap = lambda i: i
    else:
        jmap = lambda i: n_tiles - 1 - i
    prev = at(lambda bb, i: (bb, jnp.maximum(jmap(i) - 1, 0), 0))
    cur = at(lambda bb, i: (bb, jmap(i), 0))
    nxt = at(lambda bb, i: (bb, jnp.minimum(jmap(i) + 1, n_tiles - 1), 0))
    return prev, cur, nxt


def _pad_bands(arrs, h, w, fills):
    """Pad [B,H,W] arrays to (band-multiple, 128-multiple) shapes."""
    wp = h_pad = None
    out = []
    pw = -w % 128
    tile_h = _tile_h(h, w + pw)
    ph = -h % tile_h
    for a, fill in zip(arrs, fills):
        if ph or pw:
            a = jnp.pad(a, ((0, 0), (0, ph), (0, pw)), constant_values=fill)
        out.append(a)
    return out, h + ph, w + pw, tile_h


@functools.partial(jax.jit, static_argnames=("inner_rounds", "interpret",
                                             "down", "leap"))
def _flood_sweep(reach: jax.Array, mask: jax.Array, down: bool,
                 inner_rounds: int = 1, interpret: bool = False,
                 leap: int = 1) -> jax.Array:
    """One sequential band sweep (top-down or bottom-up) of the flood
    round. reach/mask int8 [B, H, W] (0/1), already band-padded."""
    b, hp, wp = reach.shape
    tile_h = _tile_h(hp, wp)
    n_tiles = hp // tile_h
    assert leap <= tile_h, f"leap {leap} exceeds band height {tile_h}"

    kernel = functools.partial(
        _flood_sweep_kernel, tile_h=tile_h, width=wp, n_tiles=n_tiles,
        inner_rounds=inner_rounds, down=down, leap=leap,
    )
    prev, cur, nxt = _band_specs(n_tiles, tile_h, wp, down)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[prev, cur, nxt, prev, cur, nxt],
        out_specs=cur,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.int8),
        scratch_shapes=[pltpu.VMEM((leap, wp), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(mask, mask, mask, reach, reach, reach)


def flood_reach_pallas(seeds: jax.Array, mask: jax.Array,
                       max_iters: int = 256, interpret: bool = False,
                       leap: int = 1) -> jax.Array:
    """Exact fixed-point flood (8-connectivity; mask pixels within
    Chebyshev distance `leap` are connected). seeds/mask bool [B,H,W]
    -> bool [B,H,W]. Each round = one down + one up band sweep (2 HBM
    passes); rounds converge in O(snake turns), not O(page height)."""
    b, h, w = mask.shape
    m8 = mask.astype(jnp.int8)
    r0 = (seeds.astype(bool) & mask.astype(bool)).astype(jnp.int8)
    (m8, r0), hp, wp, _ = _pad_bands([m8, r0], h, w, [0, 0])

    def round_(r):
        r = _flood_sweep(r, m8, down=True, interpret=interpret, leap=leap)
        return _flood_sweep(r, m8, down=False, interpret=interpret, leap=leap)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        r, _, it = state
        r2 = round_(r)
        return r2, jnp.any(r2 != r), it + 1

    r, _, _ = jax.lax.while_loop(cond, body, (round_(r0), jnp.bool_(True), 1))
    return r[:, :h, :w].astype(bool)


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


def _label_sweep_kernel(mp_ref, mc_ref, mn_ref, lp_ref, lc_ref, ln_ref,
                        out_ref, carry_ref, *, tile_h, width, n_tiles,
                        inner_rounds, big, down):
    i = pl.program_id(1)
    j = i if down else n_tiles - 1 - i

    def band(prev, cur, nxt, fill):
        frow = jnp.full((1, width), fill, jnp.int32)
        top = jnp.where(j == 0, frow,
                        prev[0, tile_h - 1 :, :].astype(jnp.int32))
        bot = jnp.where(j == n_tiles - 1, frow,
                        nxt[0, :1, :].astype(jnp.int32))
        return jnp.concatenate([top, cur[0].astype(jnp.int32), bot], axis=0)

    m = band(mp_ref, mc_ref, mn_ref, 0)
    lab = jnp.where(m != 0, band(lp_ref, lc_ref, ln_ref, big), big)

    carry = carry_ref[...]
    bigrow = jnp.full((1, width), big, jnp.int32)
    if down:
        fresh = jnp.where(j == 0, bigrow, carry)
        lab = jnp.concatenate(
            [jnp.where(m[:1] != 0, jnp.minimum(lab[:1], fresh), big),
             lab[1:]], axis=0)
    else:
        fresh = jnp.where(j == n_tiles - 1, bigrow, carry)
        lab = jnp.concatenate(
            [lab[:-1],
             jnp.where(m[-1:] != 0, jnp.minimum(lab[-1:], fresh), big)],
            axis=0)

    for _ in range(inner_rounds):
        lab = _seg_min_doubling(lab, m, 1, width, big)
        lab = _seg_min_doubling(lab, m, 0, tile_h + 2, big)
        lab = jnp.where(m != 0, _neighbor_min8(lab, big), big)

    out_ref[0] = lab[1 : 1 + tile_h, :]
    carry_ref[...] = lab[tile_h : tile_h + 1, :] if down else lab[1:2, :]


@functools.partial(jax.jit, static_argnames=("inner_rounds", "interpret",
                                             "down", "big"))
def _label_sweep(labels: jax.Array, mask: jax.Array, down: bool, big: int,
                 inner_rounds: int = 1, interpret: bool = False) -> jax.Array:
    """One sequential band sweep of min-label propagation. labels int32
    [B,H,W] (background = big), mask int8, already band-padded."""
    b, hp, wp = labels.shape
    tile_h = _tile_h(hp, wp)
    n_tiles = hp // tile_h

    kernel = functools.partial(
        _label_sweep_kernel, tile_h=tile_h, width=wp, n_tiles=n_tiles,
        inner_rounds=inner_rounds, big=big, down=down,
    )
    prev, cur, nxt = _band_specs(n_tiles, tile_h, wp, down)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[prev, cur, nxt, prev, cur, nxt],
        out_specs=cur,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, wp), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(mask, mask, mask, labels, labels, labels)


def label_components_pallas(mask: jax.Array, max_iters: int = 256,
                            interpret: bool = False) -> jax.Array:
    """Exact CC labels (8-conn, min flat index, background = H*W) via the
    sequential sweep kernels."""
    mask_b = mask.astype(bool)
    b, h, w = mask_b.shape
    big = h * w
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1) * w
        + jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    )
    lab0 = jnp.where(mask_b, idx, big)
    m8 = mask_b.astype(jnp.int8)
    (m8, lab0), hp, wp, _ = _pad_bands([m8, lab0], h, w, [0, big])

    def round_(lab):
        lab = _label_sweep(lab, m8, down=True, big=big, interpret=interpret)
        return _label_sweep(lab, m8, down=False, big=big, interpret=interpret)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        lab2 = round_(lab)
        return lab2, jnp.any(lab2 != lab), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body,
                                   (round_(lab0), jnp.bool_(True), 1))
    return lab[:, :h, :w]
