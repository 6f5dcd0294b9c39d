"""Bit-packed whole-page Pallas flood kernel.

Ref: the reference's BFS flood fills (blackfilter.c, canny.c hysteresis —
SURVEY.md §3.2/§3.4). The band-sweep kernel (flood_kernel.py) is
VPU-compute-bound: its doubling chains run ~130 vector ops per band over
55 bands of [84, 2560] int32 per A4 page — ~8.5 ms per sweep on v5e
where the HBM SOL is 0.26 ms.

This kernel attacks the compute, not the traffic: rows pack 32-to-a-word
along H (bit k of word (q, x) = pixel (32q+k, x)), so an A4 page
collapses to a [110, 2560] uint32 plane — 1.1 MB, whole page resident in
VMEM. Every segmented-OR / dilation step is bitwise (AND/OR/shift), so
one word op advances 32 rows at once: 32x less VPU work, and *no bands,
no sequential grid, no carries*. The full fixed point (horizontal
doubling seg-OR along lanes, vertical doubling seg-OR along the bit axis
with cross-word carries, Chebyshev-ball gap-leap dilation) runs to
convergence inside ONE kernel invocation via lax.while_loop on
VMEM-resident state. HBM traffic for the entire flood: one packed read
of mask+seeds (0.25 B/px) + one packed write (0.125 B/px).

Pages too large for the whole-plane working set (~12 MB of VMEM, i.e.
packed plane > ~1.5 MB) fall back to the band-sweep kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32

# Whole-plane VMEM budget: ~8 live packed planes during the doubling
# chains must fit in 16 MB VMEM alongside Mosaic's own overheads.
_MAX_PLANE_BYTES = 1_500_000


def packed_fits(h: int, w: int) -> bool:
    hq = (h + 31) // 32
    wp = w + (-w % 128)
    return hq * wp * 4 <= _MAX_PLANE_BYTES


# ------------------------------------------------------------- packing
#
# pack/unpack are their own tiny Pallas kernels on TPU: every XLA
# formulation tried (shift-reduce over a [B,Hq,32,W] reshape, MXU
# contraction with power-of-two weights, sublane repeat + fused shift)
# ends up paying one or more FULL-RESOLUTION relayout copies when
# composed into a larger program (~0.7-2.6 ms extra at A4 x 8 on v5e,
# vs a ~0.1 ms traffic bound). In-kernel, the [HT,W] <-> [32*HT,W]
# interleave is a leading-dims reshape — layout-trivial for Mosaic.

_PACK_TILE = 8  # packed words per grid step: [8,32,wp] u32 < 3 MB VMEM


def _pack_kernel(x_ref, out_ref, *, ht, wp):
    # i32 arithmetic (Mosaic lacks u32 reductions): disjoint-bit adds
    # never carry, so the sum is the bitwise OR even with bit 31 set
    x = x_ref[0].astype(jnp.int32).reshape(ht, 32, wp)
    k = jax.lax.broadcasted_iota(jnp.int32, (ht, 32, wp), 1)
    out_ref[0] = jax.lax.bitcast_convert_type(
        jnp.sum(x << k, axis=1, dtype=jnp.int32), _U32)


def _unpack_kernel(p_ref, out_ref, *, ht, wp):
    p = jnp.broadcast_to(p_ref[0][:, None, :], (ht, 32, wp))
    k = jax.lax.broadcasted_iota(_U32, (ht, 32, wp), 1)
    bits = (p >> k) & _U32(1)
    out_ref[0] = bits.reshape(ht * 32, wp).astype(jnp.int8)


def _pack_pallas(x8: jax.Array) -> jax.Array:
    b, h32, wp = x8.shape
    hq = h32 // 32
    ht = min(_PACK_TILE, hq)
    n_t = -(-hq // ht)
    if n_t * ht != hq:  # pad word rows to the tile
        x8 = jnp.pad(x8, ((0, 0), (0, (n_t * ht - hq) * 32), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_pack_kernel, ht=ht, wp=wp),
        grid=(b, n_t),
        in_specs=[pl.BlockSpec((1, ht * 32, wp), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ht, wp), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_t * ht, wp), _U32),
    )(x8)
    return out[:, :hq, :] if n_t * ht != hq else out


def pack_rows(x: jax.Array) -> jax.Array:
    """bool/int [B, H, W] -> uint32 [B, ceil(H/32), W]; bit k of word
    (q, x) = pixel (32q + k, x). Pallas kernel on TPU (see note above);
    XLA shift-reduce elsewhere."""
    b, h, w = x.shape
    hq = (h + 31) // 32
    if jax.default_backend() == "tpu" and w % 128 == 0:
        x8 = x.astype(jnp.int8)
        if hq * 32 != h:
            x8 = jnp.pad(x8, ((0, 0), (0, hq * 32 - h), (0, 0)))
        return _pack_pallas(x8)
    xp = x.astype(_U32)
    if hq * 32 != h:
        xp = jnp.pad(xp, ((0, 0), (0, hq * 32 - h), (0, 0)))
    xp = xp.reshape(b, hq, 32, w)
    shifts = jnp.arange(32, dtype=_U32).reshape(1, 1, 32, 1)
    return jnp.sum(xp << shifts, axis=2, dtype=_U32)


def unpack_rows(p: jax.Array, h: int, w: int | None = None) -> jax.Array:
    """uint32 [B, Hq, W] -> bool [B, H, W] (lane-sliced to `w` if given).
    Pallas kernel on TPU; XLA bit-expand elsewhere."""
    b, hq, wp = p.shape
    if jax.default_backend() == "tpu" and wp % 128 == 0:
        ht = min(_PACK_TILE, hq)
        n_t = -(-hq // ht)
        if n_t * ht != hq:
            p = jnp.pad(p, ((0, 0), (0, n_t * ht - hq), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_unpack_kernel, ht=ht, wp=wp),
            grid=(b, n_t),
            in_specs=[pl.BlockSpec((1, ht, wp), lambda bb, i: (bb, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ht * 32, wp), lambda bb, i: (bb, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n_t * ht * 32, wp), jnp.int8),
        )(p)
        out = out[:, :h, :]
        return (out[:, :, :w] if w is not None and w != wp else out) != 0
    shifts = jnp.arange(32, dtype=_U32).reshape(1, 1, 32, 1)
    bits = (p[:, :, None, :] >> shifts) & _U32(1)
    full = bits.reshape(b, hq * 32, wp)[:, :h, :]
    return (full[:, :, :w] if w is not None and w != wp else full).astype(bool)


# ---------------------------------------------------- in-kernel helpers

def _roll_fwd(x, s, width):
    """Lane shift: out[:, i] = x[:, i-s], zero fill."""
    r = pltpu.roll(x, s, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx >= s, r, _U32(0))


def _roll_bwd(x, s, width):
    """Lane shift: out[:, i] = x[:, i+s], zero fill."""
    r = pltpu.roll(x, (width - s) % width, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx < width - s, r, _U32(0))


def _sub_down(x, q):
    """Sublane shift: out[j] = x[j-q], zero fill (static q)."""
    if q == 0:
        return x
    return jnp.concatenate(
        [jnp.zeros((q,) + x.shape[1:], x.dtype), x[:-q]], 0)


def _sub_up(x, q):
    """Sublane shift: out[j] = x[j+q], zero fill (static q)."""
    if q == 0:
        return x
    return jnp.concatenate(
        [x[q:], jnp.zeros((q,) + x.shape[1:], x.dtype)], 0)


def _vshift_down(x, s):
    """Packed row shift: out bit-row r = in bit-row r - s (rows move
    down). s static. Crosses word boundaries via a carry word."""
    q, t = divmod(s, 32)
    a = _sub_down(x, q)
    if t == 0:
        return a
    b = _sub_down(x, q + 1)
    return (a << _U32(t)) | (b >> _U32(32 - t))


def _vshift_up(x, s):
    """Packed row shift: out bit-row r = in bit-row r + s."""
    q, t = divmod(s, 32)
    a = _sub_up(x, q)
    if t == 0:
        return a
    b = _sub_up(x, q + 1)
    return (a >> _U32(t)) | (b << _U32(32 - t))


def _seg_or_lanes(r, m, width):
    """Horizontal segmented OR (per bit-row independent): r[y, i] |= any
    r within (y, i)'s contiguous mask run along lanes. Doubling with
    AND-reachability chains; all ops bitwise on packed words."""
    a_f = m
    a_b = m
    s = 1
    while s < width:
        r = r | (a_f & _roll_fwd(r, s, width)) | (a_b & _roll_bwd(r, s, width))
        a_f = a_f & _roll_fwd(a_f, s, width)
        a_b = a_b & _roll_bwd(a_b, s, width)
        s *= 2
    return r & m


def _seg_or_rows(r, m, n_rows):
    """Vertical segmented OR along the packed bit axis (32 rows/word,
    carries across words)."""
    a_f = m
    a_b = m
    s = 1
    while s < n_rows:
        r = r | (a_f & _vshift_down(r, s)) | (a_b & _vshift_up(r, s))
        a_f = a_f & _vshift_down(a_f, s)
        a_b = a_b & _vshift_up(a_b, s)
        s *= 2
    return r & m


def _dilate_cheb(r, k, width):
    """Chebyshev-ball OR-dilation of radius k, separable doubling
    (union of [-c..c] with its +/-s shifts covers [-(c+s)..(c+s)])."""
    c = 0
    while c < k:
        s = min(max(c, 1), k - c)
        r = r | _roll_fwd(r, s, width) | _roll_bwd(r, s, width)
        c += s
    c = 0
    while c < k:
        s = min(max(c, 1), k - c)
        r = r | _vshift_down(r, s) | _vshift_up(r, s)
        c += s
    return r


# ------------------------------------------------------------- kernels
#
# One kernel per propagation phase (lanes / rows / dilate+gate), with the
# round-level convergence while_loop at the XLA level. A single fused
# round kernel OOMs Mosaic's scoped-VMEM stack (~55 MB requested: the
# unrolled doubling chains of all three phases stay live together);
# per-phase kernels peak at ~7 planes (~8 MB). The inter-kernel HBM
# traffic this costs is packed — 0.125 B/px per plane pass — so a full
# round still moves ~50x less HBM than one band-kernel sweep.

def _lanes_kernel(m_ref, r_ref, out_ref, *, width):
    out_ref[0] = _seg_or_lanes(r_ref[0] & m_ref[0], m_ref[0], width)


def _rows_kernel(m_ref, r_ref, out_ref, *, n_rows):
    out_ref[0] = _seg_or_rows(r_ref[0], m_ref[0], n_rows)


def _dilate_kernel(m_ref, r_ref, out_ref, chg_ref, *, width, leap):
    r = r_ref[0]
    r2 = (_dilate_cheb(r, leap, width) & m_ref[0]) | r
    out_ref[0] = r2
    chg_ref[pl.program_id(0)] = jnp.sum((r2 != r).astype(jnp.int32))


def _phase_call(kernel, m_packed, r_packed, n_out=1, interpret=False):
    b, hq, wp = m_packed.shape
    plane = pl.BlockSpec((1, hq, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_specs = plane
    out_shape = jax.ShapeDtypeStruct((b, hq, wp), _U32)
    if n_out == 2:
        out_specs = (plane, pl.BlockSpec((b,), lambda i: (0,),
                                         memory_space=pltpu.SMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((b,), jnp.int32))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[plane, plane],
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(m_packed, r_packed)


@functools.partial(jax.jit, static_argnames=("leap", "max_rounds",
                                             "interpret"),
                   donate_argnames=("s_packed",))
def _flood_packed(m_packed: jax.Array, s_packed: jax.Array, leap: int,
                  max_rounds: int, interpret: bool) -> jax.Array:
    b, hq, wp = m_packed.shape
    lanes = functools.partial(_lanes_kernel, width=wp)
    rows = functools.partial(_rows_kernel, n_rows=hq * 32)
    dil = functools.partial(_dilate_kernel, width=wp, leap=leap)

    def round_(r):
        r = _phase_call(lanes, m_packed, r, interpret=interpret)
        r = _phase_call(rows, m_packed, r, interpret=interpret)
        return _phase_call(dil, m_packed, r, n_out=2, interpret=interpret)

    # a round whose dilate+gate changes nothing is the fixed point: the
    # preceding lane/row seg-ORs are re-applied at the start of the next
    # round, so pending within-round work always resurfaces as a change.
    #
    # The first two rounds are PEELED out of the while_loop: scanned
    # pages converge in round 1 (round 2 confirms with zero changes),
    # and an XLA while iteration costs ~0.4 ms in carried-buffer
    # copies on top of the ~0.34 ms of phase work (measured, v5e) —
    # peeling makes the common case straight-line and the loop runs
    # only for genuinely winding masks.
    r, chg = round_(s_packed & m_packed)
    r, chg2 = round_(r)

    def cond(state):
        _, ch, i = state
        return (ch > 0) & (i < max_rounds)

    def body(state):
        r, _, i = state
        r2, c = round_(r)
        return r2, jnp.sum(c), i + 1

    r, _, _ = jax.lax.while_loop(cond, body, (r, jnp.sum(chg2), jnp.int32(2)))
    return r


def flood_reach_packed(seeds: jax.Array, mask: jax.Array,
                       max_iters: int | None = None, leap: int = 1,
                       interpret: bool = False) -> jax.Array:
    """Exact fixed-point flood (8-connectivity; mask pixels within
    Chebyshev distance `leap` are connected). seeds/mask bool [B, H, W]
    -> bool [B, H, W]. One kernel call computes the full fixed point.

    max_iters=None (the default) caps the round loop at H*W + 2 — a
    TRUE upper bound: every round counted as "changed" strictly grows
    the reach set (r2 = dilate(r) | r), and the set has at most H*W
    members, so the convergence check always fires first and the result
    is exact unconditionally. Pass a finite max_iters only to trade
    exactness for a latency bound."""
    b, h, w = mask.shape
    if max_iters is None:
        max_iters = h * w + 2
    mask = jnp.asarray(mask).astype(bool)
    seeds = jnp.asarray(seeds).astype(bool) & mask
    # lane pad at pixel level fuses into the pack kernel's i8 input
    # materialization (one pass); the word-axis pad stays packed
    pw = -w % 128
    if pw:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pw)))
        seeds = jnp.pad(seeds, ((0, 0), (0, 0), (0, pw)))
    mp = pack_rows(mask)
    sp = pack_rows(seeds)
    ph = -mp.shape[1] % 8
    if ph:
        mp = jnp.pad(mp, ((0, 0), (0, ph), (0, 0)))
        sp = jnp.pad(sp, ((0, 0), (0, ph), (0, 0)))
    out = _flood_packed(mp, sp, leap, max_iters, interpret)
    return unpack_rows(out, h, w)


def flood_reach_packed_words(seeds_w: jax.Array, mask_w: jax.Array,
                             h: int, w: int, max_iters: int | None = None,
                             leap: int = 1,
                             interpret: bool = False) -> jax.Array:
    """flood_reach_packed for callers that already hold PACKED u32 word
    planes [B, ceil(H/32), Wp] (e.g. a Pallas producer that bit-packs
    in-kernel — see noise_kernel._cert_band_kernel). Lanes must already
    be padded to 128. Returns bool [B, h, w]."""
    if max_iters is None:
        max_iters = h * w + 2
    ph = -mask_w.shape[1] % 8
    if ph:
        mask_w = jnp.pad(mask_w, ((0, 0), (0, ph), (0, 0)))
        seeds_w = jnp.pad(seeds_w, ((0, 0), (0, ph), (0, 0)))
    out = _flood_packed(mask_w, seeds_w, leap, max_iters, interpret)
    return unpack_rows(out, h, w)
