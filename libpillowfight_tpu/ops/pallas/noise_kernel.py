"""Pallas TPU kernel: noisefilter bounded-flood ball count.

Ref: the reference noisefilter's per-pixel bounded flood count
(src/pillowfight/noisefilter.c — SURVEY.md §2.2): erase every
8-connected cluster of <= k non-white pixels.

Algorithm (same bitboard formulation as morph.small_cluster_mask):
each pixel p carries a (2k+1)^2-bit board over window offsets; bit
(dy+k)*(2k+1)+(dx+k) of the reach board means "p+(dy,dx) is reachable
from p within j steps through the mask". k bit-parallel dilation steps
compute the exact graph-ball size |B_k(p)|, and
    |cluster(p)| <= k  <=>  |B_k(p)| <= k.
Crucially the dilation is *per-pixel bit-plane arithmetic*: once the
window bitboards are built, no spatial communication happens at all.

Why a Pallas kernel: the XLA formulation materializes every shifted
uint32 word plane in HBM — measured 14.9 GB of temporaries at A4 x 8
(the round-2 bench OOM). Here each band's boards live in VMEM; HBM
traffic is exactly one int8 mask read + one int8 result write per pixel.

Banding: a pixel's result needs mask rows within +-k. A single top-down
sweep carries the previous band's trailing 2k mask rows in a VMEM
scratch ("arbitrary" grid dims run in order on TPU), and each band
writes its results lagged by 2k rows: band j's VMEM holds mask_in rows
[j*th - 2k, (j+1)*th), which fully covers the +-k windows of original
rows [j*th - 2k, (j+1)*th - 2k). The caller pads the mask with k zero
rows on top and slices the output back by 2k.

Per-step bit-plane dilation is separable: the union over the 8+1
neighbor moves equals a horizontal +-1-bit pass then a vertical
+-s-bit pass (shifts compose before the &mask at step end), with
constant per-word validity masks killing bits that alias across window
rows. Popcount is branch-free SWAR (Mosaic has no population_count).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_CELLS = 48 * 2560  # keep ~15 live u32 band planes under the VMEM cap


def _tile_h(h: int, wp: int, k: int) -> int:
    th = max(32, min(((_TILE_CELLS // wp) // 32) * 32, ((h + 31) // 32) * 32))
    return max(th, ((2 * k + 31) // 32) * 32)  # carry needs th >= 2k


def _lane_shift(x, s, wrap_ok=False):
    """Value at lane i-s (s may be negative); zero filled. Static s.

    wrap_ok=True skips the zero-fill mask (1 VPU op instead of 3): safe
    when the caller's lane padding is >= |s| zeros, so wrapped-in values
    land only in pad lanes (sliced away) and the pad contributes zeros
    to real lanes."""
    if s == 0:
        return x
    n = x.shape[-1]
    r = pltpu.roll(x, s % n, axis=len(x.shape) - 1)
    if wrap_ok:
        return r
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    keep = idx >= s if s > 0 else idx < n + s
    return jnp.where(keep, r, jnp.zeros_like(r))


def _popcount32(v):
    """SWAR popcount of a uint32 plane -> int32 plane."""
    u = jnp.uint32
    v = v - ((v >> u(1)) & u(0x55555555))
    v = (v & u(0x33333333)) + ((v >> u(2)) & u(0x33333333))
    v = (v + (v >> u(4))) & u(0x0F0F0F0F)
    v = (v * u(0x01010101)) >> u(24)
    return v.astype(jnp.int32)


def _popcount_words(words):
    """Total popcount over a list of uint32 planes. Words merge in
    groups of 3 at the 4-bit-count stage (fields <= 4 each, <= 12
    summed <= 15; the byte stage then holds <= 24) — fewer ops than
    summing full per-word popcounts."""
    u = jnp.uint32
    total = None
    for i in range(0, len(words), 3):
        acc = None
        for v in words[i : i + 3]:
            c2 = v - ((v >> u(1)) & u(0x55555555))
            c4 = (c2 & u(0x33333333)) + ((c2 >> u(2)) & u(0x33333333))
            acc = c4 if acc is None else acc + c4
        acc = (acc & u(0x0F0F0F0F)) + ((acc >> u(4)) & u(0x0F0F0F0F))
        s = ((acc * u(0x01010101)) >> u(24)).astype(jnp.int32)
        total = s if total is None else total + s
    return total


def _board_consts(k: int):
    """Static per-word constants for the (2k+1)^2-bit board."""
    s = 2 * k + 1
    nb = s * s
    nw = (nb + 31) // 32

    def mask_where(pred):
        out = []
        for w in range(nw):
            m = 0
            for bit in range(32):
                b = w * 32 + bit
                if b < nb and pred(b):
                    m |= 1 << bit
            out.append(np.uint32(m))
        return out

    board = mask_where(lambda b: True)
    # after a +1 bit shift, a bit landing on dx=-k aliased from the
    # previous window row; after -1, dx=+k aliased from the next row
    val_p = mask_where(lambda b: b % s != 0)
    val_m = mask_where(lambda b: b % s != s - 1)
    return s, nb, nw, board, val_p, val_m


def _shift_board(words, amt, nw, board):
    """Shift an nw-word little-endian bitboard by `amt` bits (|amt|<32),
    zero fill, then clip to valid board bits."""
    u = jnp.uint32
    out = []
    a = amt if amt > 0 else -amt
    for w in range(nw):
        if amt > 0:
            v = words[w] << u(a)
            if w - 1 >= 0:
                v = v | (words[w - 1] >> u(32 - a))
        else:
            v = words[w] >> u(a)
            if w + 1 < nw:
                v = v | (words[w + 1] << u(32 - a))
        out.append(v & board[w])
    return out


def _noise_band_kernel(m_ref, out_ref, carry_ref, *, tile_h, width, k,
                       steps, cert_thresh, wrap_ok=False):
    """One band of the ball-count sweep (top-down, outputs lagged 2k).

    k is the board radius (window (2k+1)^2) and `steps` the number of
    dilation steps. cert_thresh=None: output = mask pixel whose
    |B_steps| <= k ("small cluster", needs steps == k for exactness).
    cert_thresh=t: output = mask pixel whose |B_steps| >= t — the
    big-cluster certificate used by the flood formulation (see
    small_cluster_mask_pallas)."""
    s, nb, nw, board, val_p, val_m = _board_consts(k)
    u = jnp.uint32
    i = pl.program_id(1)

    m_band = m_ref[0].astype(jnp.uint32)  # [tile_h, W] 0/1
    halo = jnp.where(i == 0, jnp.zeros((2 * k, width), jnp.uint32),
                     carry_ref[:])
    m_ext = jnp.concatenate([halo, m_band], axis=0)  # [tile_h+2k, W]

    # horizontal (2k+1)-bit strips for every extended row:
    # hstrip[r, x] bit (dx+k) = mask[r, x+dx]
    hstrip = jnp.zeros_like(m_ext)
    for dx in range(-k, k + 1):
        hstrip = hstrip | (_lane_shift(m_ext, -dx, wrap_ok) << u(dx + k))

    # window boards per output pixel: insert row-d strip at bit d*s
    m_words = [jnp.zeros((tile_h, width), jnp.uint32) for _ in range(nw)]
    for d in range(s):
        strip = hstrip[d : d + tile_h]
        off = d * s
        w, o = divmod(off, 32)
        m_words[w] = m_words[w] | (strip << u(o))
        if o + s > 32 and w + 1 < nw:
            m_words[w + 1] = m_words[w + 1] | (strip >> u(32 - o))
    m_words = [m_words[w] & board[w] for w in range(nw)]

    # reach init + analytic first step: from the center bit, one king
    # move reaches exactly the 3x3 board bits around center that are in
    # the window mask — no shifts needed for step 1
    center = m_ext[k : k + tile_h]
    cbit = k * s + k
    neigh3 = []
    for w in range(nw):
        bits = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                b = cbit + dy * s + dx
                if w * 32 <= b < w * 32 + 32:
                    bits |= 1 << (b - w * 32)
        neigh3.append(u(bits))
    r = [jnp.where(center != 0, m_words[w] & neigh3[w], u(0))
         for w in range(nw)]

    # remaining separable bit-plane dilation steps gated by the mask
    for _ in range(steps - 1):
        shp = _shift_board(r, 1, nw, val_p)
        shm = _shift_board(r, -1, nw, val_m)
        t = [r[w] | shp[w] | shm[w] for w in range(nw)]
        up = _shift_board(t, s, nw, board)
        dn = _shift_board(t, -s, nw, board)
        r = [(t[w] | up[w] | dn[w]) & m_words[w] for w in range(nw)]

    size = _popcount_words(r)
    hit = size <= k if cert_thresh is None else size >= cert_thresh
    out_ref[0] = ((center != 0) & hit).astype(jnp.int8)
    carry_ref[:] = m_band[tile_h - 2 * k :]


def _pack32(x, th, wp):
    """[th, wp] 0/1 u32 -> [th//32, wp] u32 words (bit k = row 32q+k).
    i32 adds of disjoint bits = bitwise OR (no carries)."""
    x3 = x.astype(jnp.int32).reshape(th // 32, 32, wp)
    kk = jax.lax.broadcasted_iota(jnp.int32, (th // 32, 32, wp), 1)
    return jax.lax.bitcast_convert_type(
        jnp.sum(x3 << kk, axis=1, dtype=jnp.int32), jnp.uint32)


def _cert_band_kernel(m_ref, cert_ref, mask_ref, carry_ref, *, tile_h,
                      width, k, cert_thresh, wrap_ok=False):
    """Certificate sweep emitting PACKED (32 rows/word) cert + mask
    planes, ready for the bit-packed flood — no i8 result plane, no
    separate pack passes. Same band/carry structure as
    _noise_band_kernel; the caller top-pads by 32-k so the k-row output
    lag lands word-aligned."""
    s, nb, nw, board, val_p, val_m = _board_consts(k)
    u = jnp.uint32
    i = pl.program_id(1)

    m_band = m_ref[0].astype(jnp.uint32)
    halo = jnp.where(i == 0, jnp.zeros((2 * k, width), jnp.uint32),
                     carry_ref[:])
    m_ext = jnp.concatenate([halo, m_band], axis=0)

    hstrip = jnp.zeros_like(m_ext)
    for dx in range(-k, k + 1):
        hstrip = hstrip | (_lane_shift(m_ext, -dx, wrap_ok) << u(dx + k))

    m_words = [jnp.zeros((tile_h, width), jnp.uint32) for _ in range(nw)]
    for d in range(s):
        strip = hstrip[d : d + tile_h]
        off = d * s
        w, o = divmod(off, 32)
        m_words[w] = m_words[w] | (strip << u(o))
        if o + s > 32 and w + 1 < nw:
            m_words[w + 1] = m_words[w + 1] | (strip >> u(32 - o))
    m_words = [m_words[w] & board[w] for w in range(nw)]

    center = m_ext[k : k + tile_h]
    cbit = k * s + k
    neigh3 = []
    for w in range(nw):
        bits = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                b = cbit + dy * s + dx
                if w * 32 <= b < w * 32 + 32:
                    bits |= 1 << (b - w * 32)
        neigh3.append(u(bits))
    r = [jnp.where(center != 0, m_words[w] & neigh3[w], u(0))
         for w in range(nw)]

    for _ in range(k - 1):
        shp = _shift_board(r, 1, nw, val_p)
        shm = _shift_board(r, -1, nw, val_m)
        t = [r[w] | shp[w] | shm[w] for w in range(nw)]
        up = _shift_board(t, s, nw, board)
        dn = _shift_board(t, -s, nw, board)
        r = [(t[w] | up[w] | dn[w]) & m_words[w] for w in range(nw)]

    size = _popcount_words(r)
    is_m = center != 0
    cert = is_m & (size >= cert_thresh)
    # out refs hold the WHOLE per-page word plane (tiny: Hq x W u32);
    # each band stores its tile_h//32 word rows at its offset
    thw = tile_h // 32
    cert_ref[0, pl.ds(i * thw, thw)] = _pack32(cert, tile_h, width)
    mask_ref[0, pl.ds(i * thw, thw)] = _pack32(is_m, tile_h, width)
    carry_ref[:] = m_band[tile_h - 2 * k :]


@functools.partial(jax.jit, static_argnames=("k", "steps", "cert_thresh",
                                             "wrap_ok", "interpret"))
def _noise_sweep(mask_in: jax.Array, k: int, steps: int | None = None,
                 cert_thresh: int | None = None, wrap_ok: bool = False,
                 interpret: bool = False):
    b, hp, wp = mask_in.shape
    th = _tile_h(hp, wp, k)
    n_tiles = hp // th
    kernel = functools.partial(_noise_band_kernel, tile_h=th, width=wp, k=k,
                               steps=k if steps is None else steps,
                               cert_thresh=cert_thresh, wrap_ok=wrap_ok)
    band = pl.BlockSpec((1, th, wp), lambda bb, i: (bb, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[band],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2 * k, wp), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(mask_in)


def _ball_sweep(mask: jax.Array, k_board: int, steps: int,
                cert_thresh: int | None, interpret: bool) -> jax.Array:
    """Pad/band plumbing shared by both formulations."""
    b, h, w = mask.shape
    pw = -w % 128
    th = _tile_h(h + 2 * k_board, w + pw, k_board)
    hp = -(-(h + 2 * k_board) // th) * th
    m_in = jnp.pad(mask.astype(jnp.int8),
                   ((0, 0), (k_board, hp - h - k_board), (0, pw)))
    # wrapped lane rolls only corrupt the trailing k pad lanes, which
    # the slice below drops — safe when the pad holds them
    out = _noise_sweep(m_in, k_board, steps=steps, cert_thresh=cert_thresh,
                       wrap_ok=pw >= k_board, interpret=interpret)
    return out[:, 2 * k_board : 2 * k_board + h, :w] != 0


_CERT_TILE = 256  # multiple of 256: packed stores need 8-aligned word rows


@functools.partial(jax.jit, static_argnames=("j", "thresh", "wrap_ok",
                                             "interpret"))
def _cert_sweep(m_in: jax.Array, j: int, thresh: int, wrap_ok: bool = False,
                interpret: bool = False):
    """Packed-output certificate sweep: [B,hp,wp] i8 -> two u32 word
    planes [B, hp//32, wp] (certs, mask). hp must be a _CERT_TILE
    multiple (caller pads)."""
    b, hp, wp = m_in.shape
    th = min(_CERT_TILE, hp)
    n_tiles = hp // th
    kernel = functools.partial(_cert_band_kernel, tile_h=th, width=wp,
                               k=j, cert_thresh=thresh, wrap_ok=wrap_ok)
    in_band = pl.BlockSpec((1, th, wp), lambda bb, i: (bb, i, 0),
                           memory_space=pltpu.VMEM)
    # whole word plane per page (Hq x W u32 is ~1 MB at A4): bands
    # store their rows at dynamic offsets, sidestepping the 8-sublane
    # block-shape floor a (1, th//32, wp) banded out spec would violate
    out_plane = pl.BlockSpec((1, hp // 32, wp), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, hp // 32, wp), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[in_band],
        out_specs=(out_plane, out_plane),
        out_shape=(shape, shape),
        scratch_shapes=[pltpu.VMEM((2 * j, wp), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(m_in)


def small_cluster_mask_pallas(mask: jax.Array, k: int,
                              interpret: bool = False) -> jax.Array:
    """Pixels whose 8-connected cluster has <= k members. bool [B,H,W].
    Exact. k <= 15 (cross-word strip/shift constants assume 2k+1 < 32).

    Two formulations, picked by cost:

    * certificate + flood (default on TPU when the packed flood fits):
      every cluster of >= k+1 pixels contains a pixel p whose radius-
      ceil(k/2) graph ball has >= k+1 members (any connected (k+1)-
      subtree has diameter <= k, so its tree center reaches all of it
      in <= ceil(k/2) steps), while a <= k cluster's ball can never
      exceed k. So a ceil(k/2)-step sweep on the (2*ceil(k/2)+1)^2-bit
      board marks big-cluster certificates (for k=4: a 5x5 one-word
      board, 2 steps — ~4x fewer VPU ops than the direct 9x9 3-word
      4-step ball), the bit-packed flood reaches exactly the big
      clusters from them, and small = mask & ~reached.
    * direct ball count (fallback): |B_k(p)| <= k on the (2k+1)^2
      board, k steps — no flood needed.
    """
    assert 1 <= k <= 15, k
    mask = mask.astype(bool)
    b, h, w = mask.shape
    j = (k + 1) // 2
    if j < k:
        from .flood_packed import (flood_reach_packed_words, packed_fits,
                                   unpack_rows)

        if packed_fits(h, w) and j <= 16:
            # top pad 32-j: the sweep's j-row output lag + the pad put
            # original row 0 exactly at output row 32, so the kernel's
            # packed words are aligned to original rows at word 1
            p_t = 32 - j
            pw = -w % 128
            hq = (h + 31) // 32
            need = max(h + p_t + j, (hq + 1) * 32)
            hp = -(-need // _CERT_TILE) * _CERT_TILE
            m_in = jnp.pad(mask.astype(jnp.int8),
                           ((0, 0), (p_t, hp - h - p_t), (0, pw)))
            # wrap garbage lands in the trailing j pad lanes of the
            # PACKED planes the flood consumes: require the pad to both
            # hold it (>= j) and isolate it from real lanes by more
            # than the flood's connectivity radius (leap=1)
            certw, maskw = _cert_sweep(m_in, j, k + 1,
                                       wrap_ok=pw >= 2 * j + 2,
                                       interpret=interpret)
            certw = certw[:, 1 : 1 + hq]
            maskw = maskw[:, 1 : 1 + hq]
            big = flood_reach_packed_words(certw, maskw, h, w,
                                           interpret=interpret)
            return mask & ~big
    return _ball_sweep(mask, k, k, None, interpret)
