"""Headline benchmark: full unpaper cleanup pipeline, MP/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against this machine's CPU running the same pipeline spec via
XLA-CPU single-threaded-equivalent? No — the honest baseline is the C
oracle (oracle/ — reconstructed reference, same algorithms, compiled
-O2). When the oracle binary is present we time it on one page and
report TPU-vs-C-reference speedup; otherwise vs_baseline is null.
Pass --quick for a reduced-size smoke run.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

A4_H, A4_W = 3508, 2480  # 300dpi A4 ~ 8.7 MP
BATCH = 16  # matches BASELINE.md config 3 (amortizes the ~24 ms tunnel RTT)


def _pages(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    pages = np.full((b, h, w, 4), 245, np.uint8)
    pages[..., 3] = 255
    # black border, text lines, gray shading, speckle — a scan-like page
    pages[:, :, : w // 40, :3] = 0
    for y in range(h // 10, h - h // 10, 40):
        pages[:, y : y + 3, w // 8 : w - w // 8, :3] = 15
    pages[:, h // 2 : h // 2 + h // 8, w // 10 : w // 4, :3] = 190
    ys = rng.integers(0, h, 500)
    xs = rng.integers(w // 20, w, 500)
    pages[:, ys, xs, :3] = 30
    return pages


def _bench_tpu(pages, iters=3):
    import jax
    import tempfile as _tf
    jax.config.update("jax_compilation_cache_dir", _tf.mkdtemp(prefix="jaxcache_"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from libpillowfight_tpu.parallel.pipeline import (
        DOCUMENT_CLEANUP, normalize_spec, run_pipeline,
    )

    from libpillowfight_tpu.core.bitmap import host_pages_to_words, put_row_major

    spec = normalize_spec(DOCUMENT_CLEANUP)
    # two distinct device-resident dirty batches: every timed iteration
    # processes a FRESH page (output-feeds-input chaining would hand later
    # iterations an already-clean page, understating the flood-fill work)
    # Transport form: u32 words (free host-side view; the u8 last-dim-4
    # layout wastes TPU lanes — bitmap.pages_to_words), transferred
    # row-major (the XLA default layout for A4 planes is H-on-lanes,
    # which costs two full-plane relayouts per call — bitmap.put_row_major)
    xs = [put_row_major(host_pages_to_words(pages)),
          put_row_major(host_pages_to_words(_pages(*pages.shape[:3], seed=1)))]
    try:
        fmt = xs[0].format
        fn = jax.jit(lambda p: run_pipeline(p, spec),
                     in_shardings=fmt, out_shardings=fmt)
    except Exception:
        fn = jax.jit(lambda p: run_pipeline(p, spec))

    def fetch(o):
        # blocking scalar fetch: forces real execution (block_until_ready
        # through the axon tunnel can return before execution finishes)
        return float(jnp.sum(o[..., 0].astype(jnp.int32)))

    fetch(fn(xs[0]))  # warm up / compile
    times = []
    for i in range(iters):
        # per-iteration fetch: serializes iterations (bounded live
        # memory) and keeps the protocol comparable across rounds; the
        # ~25 ms tunnel RTT is ~10% of one A4x8 iteration
        t0 = time.perf_counter()
        fetch(fn(xs[i % 2]))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    mp = pages.shape[0] * pages.shape[1] * pages.shape[2] / 1e6
    return mp / dt


def _bench_oracle_cpu(h, w):
    """Time the C oracle's unpaper chain on one page; MP/s, or None."""
    import os

    exe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "oracle", "pf_oracle")
    if not os.path.exists(exe):
        return None
    try:
        out = subprocess.run(
            [exe, "bench-unpaper-chain", str(h), str(w)],
            capture_output=True, text=True, timeout=600,
        )
        if out.returncode == 0:
            return float(json.loads(out.stdout.strip())["mp_per_sec"])
    except Exception:
        pass
    return None


def main():
    quick = "--quick" in sys.argv
    h, w, b = (512, 512, 2) if quick else (A4_H, A4_W, BATCH)
    pages = _pages(b, h, w)
    tpu_mps = _bench_tpu(pages, iters=2 if quick else 3)
    base_mps = _bench_oracle_cpu(h, w)
    vs = round(tpu_mps / base_mps, 3) if base_mps else None
    print(json.dumps({
        "metric": "unpaper_cleanup_pipeline_throughput",
        "value": round(tpu_mps, 2),
        "unit": "MP/s/chip",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
