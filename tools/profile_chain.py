"""Device-side per-stage profile of the unpaper cleanup chain at bench
shape (A4 x 8). Uses metrics.device_time (RTT-free chained timing). Run
on TPU:  python tools/profile_chain.py [--b 8]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import tempfile as _tf
jax.config.update("jax_compilation_cache_dir", _tf.mkdtemp(prefix="jaxcache_"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import _pages
from libpillowfight_tpu.core.bitmap import rgba_to_gray
from libpillowfight_tpu.ops.unpaper.blackfilter import blackfilter_wipe
from libpillowfight_tpu.ops.unpaper.blurfilter import blurfilter_wipe
from libpillowfight_tpu.ops.unpaper.border import border_wipe
from libpillowfight_tpu.ops.unpaper.grayfilter import grayfilter_wipe
from libpillowfight_tpu.ops.unpaper.masks import masks_wipe
from libpillowfight_tpu.ops.unpaper.noisefilter import noisefilter_wipe
from libpillowfight_tpu.parallel.pipeline import (
    DOCUMENT_CLEANUP, normalize_spec, run_pipeline)
from libpillowfight_tpu.utils.metrics import device_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from libpillowfight_tpu.core.bitmap import put_row_major

    h, w = 3508, 2480
    pages = put_row_major(_pages(args.b, h, w))
    gray = jax.jit(rgba_to_gray)(pages)
    gray.block_until_ready()
    mp = args.b * h * w / 1e6

    def report(label, fn, *a):
        dt = device_time(fn, *a, iters=args.iters)
        print(f"{label:34s} {dt*1e3:9.2f} ms   {mp/max(dt,1e-9):9.0f} MP/s",
              flush=True)
        return dt

    report("rgba_to_gray", rgba_to_gray, pages)
    total = 0.0
    for name, fn in [
        ("blackfilter_wipe", blackfilter_wipe),
        ("noisefilter_wipe", noisefilter_wipe),
        ("blurfilter_wipe", blurfilter_wipe),
        ("masks_wipe", masks_wipe),
        ("grayfilter_wipe", grayfilter_wipe),
        ("border_wipe", border_wipe),
    ]:
        total += report(name, fn, gray)
    print(f"{'sum of stages':34s} {total*1e3:9.2f} ms")

    spec = normalize_spec(DOCUMENT_CLEANUP)
    report("FUSED CHAIN (RGBA u8 in/out)", lambda p: run_pipeline(p, spec), pages)

    from libpillowfight_tpu.core.bitmap import host_pages_to_words
    words = put_row_major(host_pages_to_words(_pages(args.b, h, w)))
    report("FUSED CHAIN (u32 words in/out)", lambda p: run_pipeline(p, spec),
           words)


if __name__ == "__main__":
    main()
