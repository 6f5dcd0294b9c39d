"""Pallas TPU kernel: row + column dark-pixel counts in ONE plane read.

Ref: unpaper masks/border strip scans (SURVEY.md §2.2) consume per-row
and per-column dark counts. Every XLA formulation tried pays extra:
`jnp.sum` over lanes propagates an H-minor layout preference to the jit
entry (full-plane relayout copies), and a ones-matrix MXU contraction
gets rewritten by XLA into a batch-bitpack + custom-call costing ~0.4 ms
per plane at A4x8 on v5e. This kernel reads the i8 mask band once and
accumulates both reductions in VMEM: ~1 B/px of HBM traffic total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_H = 512


def _lc_kernel(m_ref, rows_ref, cols_ref, col_acc, *, th, wp, n_tiles):
    i = pl.program_id(1)
    x = m_ref[0].astype(jnp.float32)  # [th, wp]
    rows_ref[0] = jnp.sum(x, axis=1)[None, :]  # [1, th]

    @pl.when(i == 0)
    def _():
        col_acc[...] = jnp.zeros_like(col_acc)

    col_acc[...] += jnp.sum(x, axis=0)[None, :]

    @pl.when(i == n_tiles - 1)
    def _():
        cols_ref[0] = col_acc[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _line_counts_pallas(m8: jax.Array, interpret: bool = False):
    b, hp, wp = m8.shape
    th = min(_TILE_H, hp)
    n_tiles = hp // th
    kernel = functools.partial(_lc_kernel, th=th, wp=wp, n_tiles=n_tiles)
    rows, cols = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1, th, wp), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 1, th), lambda bb, i: (bb, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wp), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, hp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, wp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, wp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(m8)
    return rows[:, 0, :], cols[:, 0, :]


def line_counts_pallas(mask: jax.Array, interpret: bool = False):
    """(row_counts [B,H], col_counts [B,W]) f32 for bool [B,H,W]."""
    b, h, w = mask.shape
    pw = -w % 128
    th = min(_TILE_H, ((h + 31) // 32) * 32)
    ph = -h % th
    m8 = mask.astype(jnp.int8)
    if ph or pw:
        m8 = jnp.pad(m8, ((0, 0), (0, ph), (0, pw)))
    rows, cols = _line_counts_pallas(m8, interpret=interpret)
    return rows[:, :h], cols[:, :w]
