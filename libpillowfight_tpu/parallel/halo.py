"""Spatial-context parallelism: halo (ghost-row) exchange under shard_map.

SURVEY.md §5: the reference's analogue of sequence parallelism is spatial
tiling with neighbor context. When one page's rows are sharded across
chips, every stencil kernel needs `halo` rows from each neighbor. This
module provides the ring-style neighbor exchange (ppermute over ICI —
the moral equivalent of ring attention's block passing) and a wrapper
that runs any [B,H,W]-stencil function under shard_map with correct halo
semantics (zero padding at the true page boundary, matching the
reference's pf_dbl_matrix_convolution zero-padding contract).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import PAGES_AXIS, ROWS_AXIS


def exchange_halo_rows(block: jax.Array, halo: int, axis_name: str = ROWS_AXIS
                       ) -> jax.Array:
    """Append `halo` ghost rows from each rows-axis neighbor.

    block: local shard [..., h_local, W] (rows split along -2).
    Returns [..., h_local + 2*halo, W]; boundary shards get zero ghosts.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = block[..., :halo, :]      # rows my lower-index neighbor needs
    bot = block[..., -halo:, :]     # rows my higher-index neighbor needs
    if n == 1:
        up = jnp.zeros_like(bot)
        down = jnp.zeros_like(top)
    else:
        # shift bottom rows downward ring-wise: shard i receives from i-1
        down = jax.lax.ppermute(bot, axis_name,
                                [(i, (i + 1) % n) for i in range(n)])
        up = jax.lax.ppermute(top, axis_name,
                              [(i, (i - 1) % n) for i in range(n)])
        down = jnp.where(idx == 0, 0.0, down)      # no neighbor above row 0
        up = jnp.where(idx == n - 1, 0.0, up)      # none below the last row
    return jnp.concatenate([down, block, up], axis=-2)


def sharded_stencil(fn, mesh: Mesh, halo: int):
    """Wrap fn([B,H,W])->[B,H,W] to run rows-sharded with halo exchange.

    fn must be local (output pixel depends on <= halo rows of context) and
    use zero padding at page edges. The wrapped function takes/returns
    arrays sharded P(pages, rows).
    """
    def local(block):
        padded = exchange_halo_rows(block, halo)
        out = fn(padded)
        return out[..., halo:-halo, :]

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=P(PAGES_AXIS, ROWS_AXIS, None),
            out_specs=P(PAGES_AXIS, ROWS_AXIS, None),
        )
    )
