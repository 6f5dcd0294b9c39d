"""On-TPU test lane (SURVEY.md §4: the suite must exercise the shipped
artifact). Unlike tests/ (which pins the CPU backend and interprets every
Pallas kernel), this lane runs the Mosaic-compiled kernels and the fused
pipeline on the real chip at production shapes.

Run: python -m pytest tests_tpu/ -q        (skips itself off-TPU)
ci.sh runs it automatically when a TPU is attached.

Round-2 lesson: the fused chain OOMed at bench shape while every CPU
test was green — nothing had ever executed the shipped configuration.
The memory-guard test here fails at *compile* time on any regression of
that class.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if jax.default_backend() in ("cpu",):
    collect_ignore_glob = ["test_*.py"]


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() in ("cpu",):
        skip = pytest.mark.skip(reason="no TPU attached")
        for item in items:
            item.add_marker(skip)


A4_H, A4_W = 3508, 2480


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260820)


@pytest.fixture(scope="session")
def a4_page():
    """One synthetic A4 scan page (same generator as bench.py)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _pages

    return _pages(1, A4_H, A4_W, seed=7)


@pytest.fixture(scope="session")
def a4_batch8():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _pages

    return _pages(8, A4_H, A4_W, seed=3)
