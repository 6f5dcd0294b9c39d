"""Sub-component device-time profile of the cleanup-chain stages at
A4 x 8 (finding the fat for the >=50% stagewise-roofline push)."""

import sys

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
from libpillowfight_tpu.ops.morph import flood_reach, small_cluster_mask
from libpillowfight_tpu.ops.unpaper.common import (
    block_sums, coverage_from_blocks, dark_mask, nonwhite_mask)
from libpillowfight_tpu.utils.metrics import device_time

b, h, w = 8, 3508, 2480
pages = jnp.asarray(_pages(b, h, w))
gray = jax.jit(rgba_to_gray)(pages)
gray.block_until_ready()
dark = jax.jit(dark_mask)(gray)
nonwhite = jax.jit(nonwhite_mask)(gray)
jax.block_until_ready((dark, nonwhite))
mp = b * h * w / 1e6


def rep(label, fn, *a, iters=4):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:44s} {dt*1e3:8.2f} ms  {mp/max(dt,1e-9):8.0f} MP/s",
          flush=True)
    return dt


# blackfilter parts
rep("bf block_sums 20/5", lambda d: block_sums(d, 20, 5), dark)
def bf_seed(d):
    counts = block_sums(d, 20, 5)
    trig = counts >= (C.BLACKFILTER_SCAN_THRESHOLD * 400)
    return coverage_from_blocks(trig, d.shape, 20, 5) & d
rep("bf seeds (sums+coverage)", bf_seed, dark)
seeds = jax.jit(bf_seed)(dark)
seeds.block_until_ready()
rep("bf flood_reach leap=20", lambda s, d: flood_reach(s, d, leap=C.BLACKFILTER_INTENSITY), seeds, dark)

# noisefilter
rep("nf small_cluster_mask k=4", lambda m: small_cluster_mask(m, 4), nonwhite)

# blurfilter
rep("blur block_sums 100/50", lambda m: block_sums(m, 100, 50), nonwhite)
from libpillowfight_tpu.ops.unpaper.blurfilter import blurfilter_wipe_nonwhite
rep("blur full", blurfilter_wipe_nonwhite, nonwhite)

# grayfilter
from libpillowfight_tpu.ops.unpaper.grayfilter import grayfilter_wipe_planes
rep("grayfilter full", grayfilter_wipe_planes, dark, gray)

# plane derivations
rep("dark+nonwhite from gray", lambda g: (dark_mask(g), nonwhite_mask(g)), gray)
rep("rgba_to_gray", rgba_to_gray, pages)
from libpillowfight_tpu.core.bitmap import pages_to_words, words_to_gray
words = jax.jit(pages_to_words)(pages)
words.block_until_ready()
rep("words_to_gray", words_to_gray, words)
