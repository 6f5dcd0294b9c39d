"""Device mesh + sharding helpers (SURVEY.md §2.4, §5).

The reference has no distribution at all (single-process C, one image per
call; ACE's pthreads are the only parallelism). Here distribution is
first-class: pages shard over a ("pages",) data axis and, for huge pages,
rows of one page shard over a ("rows",) spatial axis with halo exchange
(see halo.py). Collectives ride ICI via jax.sharding + shard_map.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PAGES_AXIS = "pages"
ROWS_AXIS = "rows"

# Trace-time flag: rows-sharded (spatial) execution in progress. The
# Pallas band kernels walk whole-page bands through a sequential grid
# with VMEM carries — GSPMD has no partitioning rule for that, so under
# a rows-sharded mesh every morph op must take the XLA scan path (which
# GSPMD partitions correctly, inserting the cross-shard collectives).
# Pages-only sharding goes through shard_map (map_sharded_pages), where
# each device runs the full per-page program locally and Pallas is safe.
_SPATIAL = contextvars.ContextVar("pf_spatial_sharding", default=False)


@contextlib.contextmanager
def spatial_sharding():
    """Mark the enclosed trace as rows-sharded: Pallas whole-page band
    kernels are fenced off in favor of GSPMD-partitionable XLA paths."""
    tok = _SPATIAL.set(True)
    try:
        yield
    finally:
        _SPATIAL.reset(tok)


def in_spatial_sharding() -> bool:
    return _SPATIAL.get()


def pallas_backend_ok() -> bool:
    """True when Mosaic-compiled Pallas kernels can execute here: an
    accelerator backend, no enclosing jax.default_device(cpu) context
    (default_backend() ignores it — the on-TPU lane's CPU-reference arm
    hit Mosaic-on-CPU errors without this check), and not under rows
    (spatial) sharding, which GSPMD cannot partition the sequential-grid
    band kernels for."""
    if in_spatial_sharding():
        return False
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax accepts both Device objects and platform strings here
        # (jax.default_device("cpu")); handle both forms
        platform = dev.lower() if isinstance(dev, str) else getattr(
            dev, "platform", None)
        if platform == "cpu":
            return False
    return jax.default_backend() not in ("cpu",)


def map_sharded_pages(fn, mesh: Mesh):
    """Data-parallel page map: shard_map over the pages axis; each device
    runs `fn` on its local page shard (Pallas kernels run per-device, no
    GSPMD partitioning of the kernels themselves). The rows axis must be
    size 1 — spatial sharding goes through GSPMD + spatial_sharding()."""
    from jax.experimental.shard_map import shard_map

    if mesh.shape[ROWS_AXIS] != 1:
        raise ValueError("map_sharded_pages needs a pages-only mesh")
    return shard_map(
        fn, mesh=mesh,
        in_specs=P(PAGES_AXIS),
        out_specs=P(PAGES_AXIS),
        check_rep=False,
    )


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
    """Place a page batch on the mesh (B over pages-axis, H over rows-axis).

    NOT layout-pinned: the unpinned jit a BatchRunner compiles keys its
    persistent-cache entry without the arg layout (jax 0.9 + this
    backend), so mixing pinned arrays with unpinned jits can replay a
    stale executable and fail at runtime. Benchmarks pin BOTH sides
    (bitmap.put_row_major + explicit in_shardings/out_shardings)."""
    return jax.device_put(pages, page_sharding(mesh))
