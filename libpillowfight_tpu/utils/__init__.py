"""Utilities: oracle bindings, profiling helpers."""

from . import oracle

__all__ = ["oracle"]
