"""Full benchmark suite: one entry per BASELINE.md config.

Writes ``BENCH_DETAIL.json`` (list of records) and prints each record as
it completes. Timing protocol: every iteration consumes a *fresh* (dirty)
device-resident batch — unlike output-feeds-input chaining, which would
hand later iterations an already-clean page and overstate throughput on
the flood-fill filters — and each iteration ends with a blocking scalar
fetch from its output, so iteration i+1 is not dispatched until i has
fully executed (no pipelining across timed iterations).

Usage: python tools/bench_suite.py [--quick] [--configs 1,2,3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

A4 = (3508, 2480)       # 300dpi A4, ~8.7 MP
A4_600 = (7016, 4960)   # 600dpi A4, ~34.8 MP

# Speed-of-light traffic model: every filter must at minimum read the
# uint8 RGBA page (4 B/px) and write the result (4 B/px). A perfectly
# fused chain touches the same 8 B/px regardless of stage count; the
# stagewise model charges 8 B/px per stage (each stage reads + writes
# HBM once — what XLA actually does when flood fixed-points prevent
# cross-stage fusion).
SOL_BYTES_PER_PX = 8.0


def _peak_hbm_bw():
    """Per-chip peak HBM bandwidth for the attached device (bytes/s)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = (  # public spec sheets; device_kind strings like "TPU v5 lite"
        ("v6e", 1640e9), ("v6 lite", 1640e9), ("v5p", 2765e9),
        ("v5e", 819e9), ("v5 lite", 819e9), ("v4", 1228e9),
        ("v3", 900e9), ("v2", 700e9),
    )
    for key, bw in table:
        if key in kind:
            return bw, kind
    return 819e9, kind  # conservative default (v5e)


def _roofline_fields(rec, dt, n_px, n_stages=1, dt_device=None):
    """Attach achieved-bandwidth + %-of-roofline columns to a record.

    dt_device (metrics.device_time: RTT-free chained timing with a DCE
    barrier) is the authoritative denominator for roofline %: wall time
    through the axon tunnel embeds a ~25 ms RTT per iteration."""
    peak, kind = _peak_hbm_bw()
    sol_bytes = SOL_BYTES_PER_PX * n_px
    achieved = sol_bytes / dt          # useful bytes moved per second
    rtt = tunnel_rtt_s()
    rec["tunnel_rtt_ms"] = rtt * 1e3
    if dt > rtt:
        # iteration time net of the one per-iteration tunnel round-trip:
        # the device-side figure a production (non-tunneled) host sees
        rec["mp_per_s_chip_net_rtt"] = (n_px / 1e6) / (dt - rtt)
    rec["device_kind"] = kind
    rec["peak_hbm_gb_s"] = peak / 1e9
    rec["sol_bytes_per_px"] = SOL_BYTES_PER_PX
    rec["achieved_useful_gb_s"] = achieved / 1e9
    rec["roofline_pct_fused_sol"] = 100.0 * achieved / peak
    if n_stages > 1:
        rec["n_stages"] = n_stages
        rec["roofline_pct_stagewise"] = 100.0 * achieved * n_stages / peak
    if dt_device:
        ach_dev = sol_bytes / dt_device
        rec["device_ms"] = dt_device * 1e3
        rec["mp_per_s_chip_device"] = (n_px / 1e6) / dt_device
        rec["roofline_pct_device"] = 100.0 * ach_dev / peak
        if n_stages > 1:
            rec["roofline_pct_stagewise_device"] = (
                100.0 * ach_dev * n_stages / peak)
    return rec


def _device_time(fn, x, iters=3):
    """RTT-free device seconds/iter (None if measurement fails)."""
    try:
        from libpillowfight_tpu.utils.metrics import device_time

        return device_time(fn, x, iters=iters)
    except Exception:
        return None


def _fetch(o):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(o)[0]
    # blocking scalar fetch: forces full execution through the axon
    # tunnel (block_until_ready can return early across it)
    return float(jnp.sum(leaf[(0,) * leaf.ndim].astype(jnp.float32)))


_RTT_CACHE = []


def tunnel_rtt_s() -> float:
    """Median round-trip of a trivial dispatch+fetch through the axon
    tunnel (~25 ms here). Every timed iteration below pays this once;
    recorded in each benchmark record so small-iteration configs can be
    interpreted (queueing N un-fetched iterations instead would allocate
    N output buffers at once and OOM the large configs)."""
    if not _RTT_CACHE:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: (x * 2).sum())
        x = jnp.ones((8, 128))
        float(f(x))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        _RTT_CACHE.append(float(np.median(ts)))
    return _RTT_CACHE[0]


def _timed(fn, batches, iters):
    """Median seconds/iteration; each iteration consumes a fresh (dirty)
    batch and ends with a blocking scalar fetch (serializes iterations
    and bounds live memory to one iteration's working set)."""
    _fetch(fn(batches[0]))  # warm-up (compile)
    times = []
    for i in range(iters):
        x = batches[i % len(batches)]
        t0 = time.perf_counter()
        _fetch(fn(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _scan_pages(b, h, w, seed=0):
    from bench import _pages

    return _pages(b, h, w, seed)


_ORACLE_FILTER = {  # bench-suite kernel name -> oracle bench-filter name
    "sobel": "sobel", "gaussian": "gaussian", "canny": "canny",
    "ace": "ace", "swt": "swt",
    "unpaper_blackfilter": "blackfilter", "unpaper_noisefilter": "noisefilter",
    "unpaper_blurfilter": "blurfilter", "unpaper_masks": "masks",
    "unpaper_grayfilter": "grayfilter", "unpaper_border": "border",
}


def _oracle_filter_mps(name, h, w):
    """Single-core C-reference MP/s for one filter (None if unavailable)."""
    import subprocess

    exe = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "oracle", "pf_oracle")
    if not os.path.exists(exe) or name not in _ORACLE_FILTER:
        return None
    try:
        out = subprocess.run(
            [exe, "bench-filter", _ORACLE_FILTER[name], str(h), str(w)],
            capture_output=True, text=True, timeout=900,
        )
        if out.returncode == 0:
            return float(json.loads(out.stdout.strip())["mp_per_sec"])
    except Exception:
        pass
    return None


def _with_oracle(rec, name, h, w, mps_key="mp_per_s_chip"):
    o = _oracle_filter_mps(name, h, w)
    if o:
        rec["oracle_cpu_mp_per_s"] = o
        rec["vs_oracle"] = rec[mps_key] / o
    return rec


def _jit_rm(f, sample):
    """jit pinned to the sample array's (row-major) format: the layout
    reaches the executable AND its persistent-cache key (an unpinned
    jit would omit it and could replay a stale default-layout binary)."""
    import jax

    try:
        return jax.jit(f, in_shardings=(sample.format,))
    except Exception:
        return jax.jit(f)


def _device_batches(b, h, w, n=2):
    from libpillowfight_tpu.core.bitmap import put_row_major

    return [put_row_major(_scan_pages(b, h, w, seed=s)) for s in range(n)]


def _word_batches(b, h, w, n=2):
    from libpillowfight_tpu.core.bitmap import (host_pages_to_words,
                                                put_row_major)

    return [put_row_major(host_pages_to_words(_scan_pages(b, h, w, seed=s)))
            for s in range(n)]


def run_config(idx, quick):
    import jax
    import jax.numpy as jnp

    from libpillowfight_tpu.ops import ace, canny, sobel
    from libpillowfight_tpu.ops.swt import swt
    from libpillowfight_tpu.parallel.pipeline import (
        DOCUMENT_CLEANUP, compile_pipeline,
    )

    h, w = A4
    if quick:
        h, w = h // 2, w // 2

    if idx == 1:  # Sobel, one 300dpi A4 page
        xs = _device_batches(1, h, w)
        dt = _timed(_jit_rm(sobel, xs[0]), xs, 3)
        dtd = _device_time(sobel, xs[0])
        mp = h * w / 1e6
        return _with_oracle(_roofline_fields(
            {"config": "sobel_1page_300dpi", "mp_per_s_chip": mp / dt,
             "ms_per_page": dt * 1e3, "pages": 1, "page_mp": mp},
            dt, h * w, dt_device=dtd), "sobel", h, w)

    if idx == 2:  # Gaussian + full Canny, 64-page batch
        from libpillowfight_tpu.parallel.batch import map_chunked

        b = 8 if quick else 64
        # canny holds ~6 full-res f32 planes; at batch 64 that exceeds
        # one chip's HBM — stream 16 pages at a time inside one jit
        xs = _device_batches(b, h, w)
        fn = _jit_rm(lambda p: map_chunked(canny, p, 16), xs[0])
        dt = _timed(fn, xs, 3)
        dtd = _device_time(fn, xs[0], iters=2)
        mp = b * h * w / 1e6
        return _with_oracle(_roofline_fields(
            {"config": "canny_batch64", "mp_per_s_chip": mp / dt,
             "pages_per_s": b / dt, "pages": b, "page_mp": h * w / 1e6},
            dt, b * h * w, dt_device=dtd), "canny", h, w)

    if idx == 3:  # unpaper chain, 256 pages (chunked)
        b = 8 if quick else 16
        chunks = 2 if quick else 16  # 16 x 16 = 256 pages
        xs = _word_batches(b, h, w, n=2)  # u32 word transport (free host view)
        fn = _jit_rm(compile_pipeline(DOCUMENT_CLEANUP), xs[0])
        dt = _timed(fn, xs, chunks)
        dtd = _device_time(fn, xs[0])
        pages = b
        mp = pages * h * w / 1e6
        return _roofline_fields(
            {"config": "unpaper_chain_256pages", "mp_per_s_chip": mp / dt,
             "pages_per_s": pages / dt, "pages_total": b * chunks,
             "page_mp": h * w / 1e6, "transport": "u32_words"},
            dt, b * h * w, n_stages=6, dt_device=dtd)

    if idx == 4:  # ACE on 600dpi color scans
        hh, ww = (A4_600[0] // 2, A4_600[1] // 2) if quick else A4_600
        xs = _device_batches(1, hh, ww)
        fn = _jit_rm(lambda p: ace(p), xs[0])
        dt = _timed(fn, xs, 3)
        dtd = _device_time(fn, xs[0], iters=2)
        mp = hh * ww / 1e6
        rec = _with_oracle(_roofline_fields(
            {"config": "ace_600dpi", "mp_per_s_chip": mp / dt,
             "ms_per_page": dt * 1e3, "page_mp": mp},
            dt, hh * ww, dt_device=dtd), "ace", hh, ww)
        # ACE at S=100 samples/px is VPU-COMPUTE-bound, not HBM-bound:
        # ~23 f32 ops per sample per pixel (distance: 2 mul + add +
        # sqrt + max + recip shared across channels; per channel:
        # sub, mul, 2x clamp, fma). Report %-of-VPU-peak so the number
        # means something (the HBM roofline column reads ~0.5% here by
        # construction).
        ace_flops = 23.0 * 100 * hh * ww
        vpu_peak = 3.85e12  # v5e: 8x128 lanes x 4 ALUs x 0.94 GHz, f32
        rec["ace_flops_model_total"] = ace_flops
        rec["vpu_peak_flops_f32"] = vpu_peak
        rec["bound_by"] = "vpu-compute"
        if dtd:
            rec["pct_vpu_peak_device"] = 100.0 * ace_flops / dtd / vpu_peak
        return rec

    if idx == 5:  # SWT + full cleanup (single-chip slice of config 5)
        b = 1
        hh, ww = (h // 2, w // 2) if quick else (h, w)
        cleanup = compile_pipeline(DOCUMENT_CLEANUP)
        xs = _word_batches(b, hh, ww)
        fn = _jit_rm(lambda p: swt(cleanup(p)), xs[0])
        dt = _timed(fn, xs, 2)
        dtd = _device_time(fn, xs[0], iters=2)
        mp = b * hh * ww / 1e6
        return _with_oracle(_roofline_fields(
            {"config": "swt_plus_cleanup", "mp_per_s_chip": mp / dt,
             "pages_per_s": b / dt,
             "pages_per_s_per_chip_extrapolated_10k": b / dt,
             "page_mp": hh * ww / 1e6, "transport": "u32_words"},
            dt, b * hh * ww, n_stages=7, dt_device=dtd), "swt", hh, ww)

    if idx == 6:  # per-kernel microbench: every filter alone, same batch
        from libpillowfight_tpu.ops import gaussian, unpaper

        b = 2 if quick else 8
        xs = _device_batches(b, h, w)
        n_px = b * h * w
        mp = n_px / 1e6
        kernels = {
            "gaussian": lambda p: gaussian(p),
            "sobel": sobel,
            "canny": lambda p: canny(p),
            "ace": lambda p: ace(p),
            "unpaper_blackfilter": unpaper.unpaper_blackfilter,
            "unpaper_noisefilter": unpaper.unpaper_noisefilter,
            "unpaper_blurfilter": unpaper.unpaper_blurfilter,
            "unpaper_grayfilter": unpaper.unpaper_grayfilter,
            "unpaper_border": unpaper.unpaper_border,
            "unpaper_masks": unpaper.unpaper_masks,
        }
        per = {}
        for name, raw in kernels.items():
            dt = _timed(_jit_rm(raw, xs[0]), xs, 3)
            # device_time builds its own (unpinned) chained jit: hand it
            # the raw callable — a pinned jit nested under the scan
            # wrapper trips the backend (runtime InvalidArgument)
            dtd = _device_time(raw, xs[0], iters=2)
            per[name] = _with_oracle(_roofline_fields(
                {"mp_per_s_chip": mp / dt, "ms_per_batch": dt * 1e3},
                dt, n_px, dt_device=dtd), name, h, w)
            dev = f" {per[name]['device_ms']:.1f} ms dev" if dtd else ""
            print(f"  {name}: {mp/dt:.0f} MP/s "
                  f"({per[name]['roofline_pct_fused_sol']:.1f}% roofline{dev})",
                  flush=True)
        return {"config": "per_kernel_microbench", "pages": b,
                "page_mp": h * w / 1e6, "kernels": per}

    raise ValueError(idx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--configs", type=str, default="1,2,3,4,5,6")
    ap.add_argument("--out", type=str, default="BENCH_DETAIL.json")
    args = ap.parse_args()

    import jax
    import tempfile as _tf
    jax.config.update("jax_compilation_cache_dir", _tf.mkdtemp(prefix="jaxcache_"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        args.out)
    records = []
    if os.path.exists(path):
        with open(path) as f:
            records = json.load(f)
    done = {r["config"] for r in records}
    for idx in [int(c) for c in args.configs.split(",")]:
        rec = run_config(idx, args.quick)
        if rec["config"] in done:
            records = [r for r in records if r["config"] != rec["config"]]
        rec["device"] = jax.devices()[0].platform
        rec["quick"] = args.quick
        records.append(rec)
        print(json.dumps(rec), flush=True)
        with open(path, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
