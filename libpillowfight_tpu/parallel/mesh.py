"""Device mesh + sharding helpers (SURVEY.md §2.4, §5).

The reference has no distribution at all (single-process C, one image per
call; ACE's pthreads are the only parallelism). Here distribution is
first-class: pages shard over a ("pages",) data axis and, for huge pages,
rows of one page shard over a ("rows",) spatial axis with halo exchange
(see halo.py). Collectives ride ICI via jax.sharding + shard_map.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PAGES_AXIS = "pages"
ROWS_AXIS = "rows"


def make_mesh(n_devices: int | None = None, rows: int = 1) -> Mesh:
    """2-D mesh (pages, rows). rows > 1 enables intra-page spatial sharding."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n % rows != 0:
        raise ValueError(f"{n} devices not divisible by rows={rows}")
    arr = np.array(devs[:n]).reshape(n // rows, rows)
    return Mesh(arr, (PAGES_AXIS, ROWS_AXIS))


def page_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [B, H, W, ...] page batch: B over pages, H over rows."""
    return NamedSharding(mesh, P(PAGES_AXIS, ROWS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pages(pages: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a page batch on the mesh (B over pages-axis, H over rows-axis)."""
    return jax.device_put(pages, page_sharding(mesh))
