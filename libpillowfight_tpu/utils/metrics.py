"""Observability: timers, throughput meters, roofline accounting.

SURVEY.md §5 — the reference has no tracing/metrics at all (debugging is
PPM dumps); the north-star contract here is %-of-HBM-roofline per kernel,
so the framework carries its own accounting:

* `timed_fetch`   — honest wall timing under the axon tunnel (a scalar
  fetch forces execution; plain block_until_ready can return early).
* `Meter`         — pages/sec, MP/s aggregation for batch drivers.
* `roofline`      — achieved-vs-peak bandwidth for a kernel given its
  bytes-touched model.
* `trace`         — context manager around jax.profiler for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

# Per-chip peak HBM bandwidth (bytes/s). v5e ≈ 819 GB/s; override for
# other generations via set_peak_hbm_bw.
_PEAK_HBM_BW = 819e9


def set_peak_hbm_bw(bw_bytes_per_s: float) -> None:
    global _PEAK_HBM_BW
    _PEAK_HBM_BW = float(bw_bytes_per_s)


def timed_fetch(fn, x, iters: int = 3):
    """Time jitted fn by chaining iterations (out feeds in) and fetching a
    scalar once. Returns (seconds_per_iter, last_output)."""
    out = fn(x)
    _ = float(jnp.sum(out.reshape(-1)[:1].astype(jnp.float32)))  # warmup+sync
    t0 = time.perf_counter()
    out = x
    for _ in range(iters):
        out = fn(out)
    _ = float(jnp.sum(out.reshape(-1)[:1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters, out


def device_time(fn, *args, iters: int = 8):
    """Device-side seconds per call of `fn(*args)`, measured free of the
    host<->device tunnel RTT.

    Builds ONE jitted program that runs `fn` in a lax.scan dependency
    chain of K sequential calls (each call's first argument is perturbed
    by a runtime-zero derived from the previous output, so XLA cannot
    parallelize or elide iterations) and fetches a single scalar. Wall
    time is then RTT + K * t_device + c; timing the chain at K and 2K and
    differencing cancels RTT and every per-dispatch constant:
        t_device = (wall(2K) - wall(K)) / K.
    This is the `device_ms` figure BENCH_DETAIL reports — the roofline
    denominators come from here, not from RTT-polluted wall clocks.
    """
    flat, treedef = jax.tree.flatten(args)
    # index of the first non-bool numeric leaf: the perturbation target
    # (bool fallback: XOR with a runtime-false derived from the token)
    tgt = next((i for i, leaf in enumerate(flat)
                if jnp.asarray(leaf).dtype != jnp.bool_), 0)

    # The chained jit is NOT layout-pinned: it compiles for the layouts
    # of the arrays actually passed (so measurements see the caller's
    # layouts), and explicit Format pinning composed badly with the
    # scan wrapper + persistent cache on this backend (runtime
    # InvalidArgument). Callers keep one layout policy per cache dir.
    def chained(k):
        def run(flat):
            def body(tok, _):
                cur = list(flat)
                a0 = jnp.asarray(cur[tgt])
                # runtime-zero: float mul is not folded by XLA (NaN/inf
                # semantics), so the dependency is real but exact-zero
                if a0.dtype == jnp.bool_:
                    cur[tgt] = a0 ^ ((tok * 0.0) > 1.0)
                else:
                    cur[tgt] = a0 + (tok * 0.0).astype(a0.dtype)
                out = fn(*jax.tree.unflatten(treedef, cur))
                # optimization_barrier forces the FULL output to be
                # computed (without it XLA dead-code-eliminates whatever
                # the scalar token below doesn't touch)
                out = jax.lax.optimization_barrier(out)
                leaf = jnp.asarray(jax.tree.leaves(out)[0])
                tok2 = leaf.reshape(-1)[0].astype(jnp.float32)
                return jnp.where(jnp.isfinite(tok2), tok2, 0.0) * 1e-20, ()
            tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return tok
        return jax.jit(run)

    run_k, run_2k = chained(iters), chained(2 * iters)
    float(run_k(flat))   # compile + warm
    float(run_2k(flat))
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_k(flat))
        t1 = time.perf_counter()
        float(run_2k(flat))
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / iters)
    diffs.sort()
    return max(diffs[len(diffs) // 2], 0.0)  # median: robust to jitter


@dataclass
class RooflineReport:
    seconds: float
    bytes_touched: int
    achieved_bw: float
    peak_bw: float

    @property
    def fraction_of_roofline(self) -> float:
        return self.achieved_bw / self.peak_bw

    def __str__(self) -> str:
        return (f"{self.achieved_bw/1e9:.1f} GB/s achieved of "
                f"{self.peak_bw/1e9:.0f} GB/s peak "
                f"({100*self.fraction_of_roofline:.1f}% of roofline)")


def roofline(seconds: float, bytes_touched: int) -> RooflineReport:
    """Achieved bandwidth vs peak for a memory-bound kernel."""
    return RooflineReport(seconds, bytes_touched, bytes_touched / seconds,
                          _PEAK_HBM_BW)


@dataclass
class Meter:
    """Streaming throughput meter for the batch drivers."""
    pages: int = 0
    megapixels: float = 0.0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def record(self, n_pages: int, h: int, w: int):
        self.pages += n_pages
        self.megapixels += n_pages * h * w / 1e6
        self.seconds = time.perf_counter() - self._t0

    @property
    def pages_per_sec(self) -> float:
        return self.pages / self.seconds if self.seconds else 0.0

    @property
    def mp_per_sec(self) -> float:
        return self.megapixels / self.seconds if self.seconds else 0.0


@contextlib.contextmanager
def trace(logdir: str = "/tmp/pf_trace"):
    """jax.profiler trace for TensorBoard / Perfetto inspection."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
