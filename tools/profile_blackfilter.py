"""Dissect blackfilter cost at the bench shape: stats vs flood, flood
round count, and per-sweep cost. Run on TPU."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import tempfile as _tf
jax.config.update("jax_compilation_cache_dir", _tf.mkdtemp(prefix="jaxcache_"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import _pages
from libpillowfight_tpu.core.bitmap import rgba_to_gray
from libpillowfight_tpu.core import constants as C
from libpillowfight_tpu.ops.unpaper.blackfilter import blackfilter_wipe
from libpillowfight_tpu.ops.unpaper.common import (
    block_sums, coverage_from_blocks, dark_mask)
from libpillowfight_tpu.ops.pallas.flood_kernel import (
    _flood_sweep, _pad_bands, flood_reach_pallas)


def fetch(x):
    return float(jnp.sum(x.astype(jnp.int32)))


def timed(fn, *args, iters=5, label=""):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        fetch(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:9.1f} ms", flush=True)
    return dt


pages = jnp.asarray(_pages(8, 3508, 2480))
gray = jax.jit(rgba_to_gray)(pages)
gray.block_until_ready()

timed(jax.jit(blackfilter_wipe), gray, label="blackfilter_wipe total")

dark_fn = jax.jit(lambda g: dark_mask(g, C.UNPAPER_BLACK_THRESHOLD))
dark = dark_fn(gray)

def stats(g):
    d = dark_mask(g, C.UNPAPER_BLACK_THRESHOLD)
    counts = block_sums(d, 20, 5)
    trig = counts >= (0.95 * 400)
    return coverage_from_blocks(trig, d.shape, 20, 5) & d

timed(jax.jit(stats), gray, label="stats (dark+block_sums+coverage)")

seeds = jax.jit(stats)(gray)

# flood with round counting
def flood_counted(seeds, mask, leap):
    b, h, w = mask.shape
    m8 = mask.astype(jnp.int8)
    r0 = (seeds.astype(bool) & mask.astype(bool)).astype(jnp.int8)
    (m8, r0), hp, wp, _ = _pad_bands([m8, r0], h, w, [0, 0])

    def round_(r):
        r, c1 = _flood_sweep(r, m8, down=True, leap=leap)
        r, c2 = _flood_sweep(r, m8, down=False, leap=leap)
        return r, jnp.sum(c1) + jnp.sum(c2)

    def cond(state):
        _, changed, it = state
        return (changed > 0) & (it < 256)

    def body(state):
        r, _, it = state
        r2, ch = round_(r)
        return r2, ch, it + 1

    r0, ch0 = round_(r0)
    r, _, it = jax.lax.while_loop(cond, body, (r0, ch0, 1))
    return r[:, :h, :w].astype(bool), it

fl = jax.jit(lambda s, m: flood_counted(s, m, C.BLACKFILTER_INTENSITY))
out, rounds = fl(seeds, dark)
print("flood rounds (incl. final no-change round):", int(rounds), flush=True)
timed(lambda s, m: fl(s, m)[0], seeds, dark, label="flood total (leap=20)")

# single sweep cost
m8 = dark.astype(jnp.int8)
r8 = (seeds & dark).astype(jnp.int8)
(m8p, r8p), hp, wp, th = _pad_bands([m8, r8], 3508, 2480, [0, 0])
print(f"tile_h={th} n_tiles={hp//th} wp={wp}")
sw = jax.jit(lambda r, m: _flood_sweep(r, m, down=True,
                                       leap=C.BLACKFILTER_INTENSITY)[0])
timed(sw, r8p, m8p, label="one down sweep (leap=20)")
sw1 = jax.jit(lambda r, m: _flood_sweep(r, m, down=True, leap=1)[0])
timed(sw1, r8p, m8p, label="one down sweep (leap=1)")
