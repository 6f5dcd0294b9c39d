"""Dissect flood_reach cost on TPU: per-round cost, round count, and a
cummax-based segmented-scan variant vs the generic associative_scan."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import tempfile as _tf
jax.config.update("jax_compilation_cache_dir", _tf.mkdtemp(prefix="jaxcache_"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from libpillowfight_tpu.ops import morph


def fetch(x):
    return float(jnp.sum(x.astype(jnp.int32)))


def timed(fn, *args, iters=3, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt*1e3:9.1f} ms  (compile {compile_s:.0f}s)", flush=True)
    return dt


def seg_or_cummax(mask, r, axis):
    """Segmented OR via 2x cummax per direction (int32 arithmetic)."""
    n = mask.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, mask.shape, axis % mask.ndim)
    gap = jnp.where(mask, -1, idx)
    seen = jnp.where(r, idx, -1)
    fwd = mask & (jax.lax.cummax(seen, axis=axis) > jax.lax.cummax(gap, axis=axis))
    gap_r = jnp.where(mask, n, idx)
    seen_r = jnp.where(r, idx, n)
    rev = mask & (
        jax.lax.cummin(seen_r, axis=axis, reverse=True)
        < jax.lax.cummin(gap_r, axis=axis, reverse=True)
    )
    return r | fwd | rev


def flood_cummax(seeds, mask, max_iters=4096):
    mask = mask.astype(bool)
    seeds = seeds.astype(bool) & mask

    def round_(r):
        r = seg_or_cummax(mask, r, -1)
        r = seg_or_cummax(mask, r, -2)
        return (morph.dilate8(r) & mask) | r

    def cond(s):
        _, ch, it = s
        return ch & (it < max_iters)

    def body(s):
        r, _, it = s
        r2 = round_(r)
        return r2, jnp.any(r2 != r), it + 1

    r, _, _ = jax.lax.while_loop(cond, body, (round_(seeds), jnp.bool_(True), 1))
    return r


def main():
    b, h, w = 2, 3508, 2480
    rng = np.random.default_rng(0)
    # scan-like mask: black border + text + speckle
    mask = np.zeros((b, h, w), bool)
    mask[:, :, :60] = True
    for y in range(100, h - 100, 40):
        mask[:, y : y + 6, 200 : w - 200] = True
    pts = rng.random((h, w)) < 0.001
    mask |= pts
    seeds = np.zeros_like(mask)
    seeds[:, :, :20] = True
    mask_j = jnp.asarray(mask)
    seeds_j = jnp.asarray(seeds) & mask_j

    import functools

    # fixed numbers of rounds (no while_loop) to price one round
    for n_rounds in (1, 2, 4):
        def fixed(seeds_, mask_, n=n_rounds):
            r = seeds_
            for _ in range(n):
                r = morph._seg_or_scan_1d(mask_, r, axis=-1)
                r = morph._seg_or_scan_1d(mask_, r, axis=-2)
                r = (morph.dilate8(r) & mask_) | r
            return r
        timed(jax.jit(fixed), seeds_j, mask_j, label=f"assoc-scan {n_rounds} round(s)")

    for n_rounds in (1, 2, 4):
        def fixed_c(seeds_, mask_, n=n_rounds):
            r = seeds_
            for _ in range(n):
                r = seg_or_cummax(mask_, r, -1)
                r = seg_or_cummax(mask_, r, -2)
                r = (morph.dilate8(r) & mask_) | r
            return r
        timed(jax.jit(fixed_c), seeds_j, mask_j, label=f"cummax-scan {n_rounds} round(s)")

    # full while_loop versions
    timed(jax.jit(functools.partial(morph.flood_reach, connectivity=8)),
          seeds_j, mask_j, label="flood_reach (assoc, while_loop)")
    timed(jax.jit(flood_cummax), seeds_j, mask_j,
          label="flood_cummax (while_loop)")

    # round count
    def count_rounds(seeds_, mask_):
        def round_(r):
            r = seg_or_cummax(mask_, r, -1)
            r = seg_or_cummax(mask_, r, -2)
            return (morph.dilate8(r) & mask_) | r

        def cond(s):
            _, ch, it = s
            return ch & (it < 64)

        def body(s):
            r, _, it = s
            r2 = round_(r)
            return r2, jnp.any(r2 != r), it + 1

        _, _, it = jax.lax.while_loop(
            cond, body, (round_(seeds_), jnp.bool_(True), 1))
        return it

    print("rounds to converge:", int(jax.jit(count_rounds)(seeds_j, mask_j)),
          flush=True)


if __name__ == "__main__":
    main()
