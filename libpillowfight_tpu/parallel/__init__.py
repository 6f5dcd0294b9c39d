"""Distribution layer: mesh, halo exchange, pipelines, batch driver."""

from .batch import BatchMetrics, BatchRunner
from .halo import exchange_halo_rows, sharded_stencil
from .multihost import Heartbeat, initialize_distributed, make_host_mesh
from .mesh import (
    PAGES_AXIS,
    ROWS_AXIS,
    make_mesh,
    page_sharding,
    replicated,
    shard_pages,
)
from .pipeline import (
    DOCUMENT_CLEANUP,
    EDGE_STACK,
    compile_pipeline,
    normalize_spec,
    run_pipeline,
)

__all__ = [
    "BatchMetrics", "BatchRunner", "exchange_halo_rows", "sharded_stencil",
    "Heartbeat", "initialize_distributed", "make_host_mesh",
    "PAGES_AXIS", "ROWS_AXIS", "make_mesh", "page_sharding", "replicated",
    "shard_pages", "DOCUMENT_CLEANUP", "EDGE_STACK", "compile_pipeline",
    "normalize_spec", "run_pipeline",
]
