"""Per-filter TPU throughput profile with honest timing.

The axon tunnel's block_until_ready can return before execution
completes, so each iteration is timed by fetching a scalar checksum
(forces full materialization). Usage:
    python tools/profile_filters.py [--b 2] [--h 3508] [--w 2480] [--filters a,b]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--h", type=int, default=3508)
    ap.add_argument("--w", type=int, default=2480)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--filters", type=str, default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import tempfile as _tf
    jax.config.update("jax_compilation_cache_dir", _tf.mkdtemp(prefix="jaxcache_"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _pages
    from libpillowfight_tpu.parallel.pipeline import _FILTERS

    pages = jnp.asarray(_pages(args.b, args.h, args.w))
    mp = args.b * args.h * args.w / 1e6

    names = args.filters.split(",") if args.filters else list(_FILTERS)
    for name in names:
        fn = jax.jit(_FILTERS[name])
        try:
            t_c0 = time.perf_counter()
            out = fn(pages)
            _ = float(jnp.sum(out[..., 0].astype(jnp.int32)))
            compile_s = time.perf_counter() - t_c0
            # chained iterations: each output feeds the next input, so one
            # final scalar fetch forces the whole chain to execute (the
            # axon tunnel's block_until_ready returns early; a dependency
            # chain is the honest timer)
            t0 = time.perf_counter()
            out = pages
            for _ in range(args.iters):
                out = fn(out)
            _ = float(jnp.sum(out[..., 0].astype(jnp.int32)))
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:24s} {mp/dt:10.1f} MP/s   {dt*1e3:9.1f} ms/iter"
                  f"   (compile+first {compile_s:.1f}s)", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
