"""Dissect SWT cost at A4 on TPU: edge stack, width chains, median clamp,
CC labeling, letter stats. Run on the real chip."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import tempfile as _tf
jax.config.update("jax_compilation_cache_dir", _tf.mkdtemp(prefix="jaxcache_"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from libpillowfight_tpu.core import constants as C
from libpillowfight_tpu.core.bitmap import rgba_to_gray
from libpillowfight_tpu.ops import swt as S
from libpillowfight_tpu.ops.canny import canny_edge_mask
from libpillowfight_tpu.ops.morph import label_components_links


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(fn, *args, iters=3, label=""):
    fetch(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    fetch(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt*1e3:9.1f} ms/it", flush=True)
    return dt


def _text_page(h=3508, w=2480):
    g = np.full((h, w), 255, np.uint8)
    for y0 in range(120, h - 120, 110):
        for x0 in range(120, w - 120, 45):
            g[y0:y0 + 50, x0:x0 + 6] = 0
    g[h - 180:h - 80, 40:400] = 215
    return np.stack([g, g, g, np.full_like(g, 255)], -1)


page = jnp.asarray(_text_page())
h, w = 3508, 2480
max_rays = max(h * w // 32, 256)
max_valid = max(h * w // 8, 512)
max_len = C.SWT_MAX_RAY_LEN
print("max_len:", max_len, "max_rays:", max_rays, "max_valid:", max_valid)

gray = jax.jit(lambda p: rgba_to_gray(p[None])[0])(page)
gray.block_until_ready()

timed(jax.jit(lambda g: canny_edge_mask(g[None])[0]), gray, label="canny edge mask")
edges = jax.jit(lambda g: canny_edge_mask(g[None])[0])(gray)

timed(jax.jit(lambda g, e: S._swt_maps_one(g, e, max_rays, max_len)),
      gray, edges, iters=2, label="swt maps (chains + median, both pol)")
sm, sp = jax.jit(lambda g, e: S._swt_maps_one(g, e, max_rays, max_len))(gray, edges)

timed(jax.jit(lambda g, s: S._letter_mask_one(g, s, -1, 512, max_valid)),
      gray, sm, iters=2, label="letter mask (CC + stats), one pol")

# CC labeling alone
valid = sm < S._INF
def links_of(swt):
    valid = swt < S._INF
    def link(dy, dx):
        rolled = jnp.roll(jnp.roll(swt, -dy, 0), -dx, 1)
        nvalid = jnp.roll(jnp.roll(valid, -dy, 0), -dx, 1)
        ratio_ok = ((jnp.maximum(swt, rolled)
                     / jnp.maximum(jnp.minimum(swt, rolled), 1e-6))
                    <= C.SWT_CC_SW_RATIO)
        ok = valid & nvalid & ratio_ok
        ys = jax.lax.broadcasted_iota(jnp.int32, swt.shape, 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, swt.shape, 1)
        return ok & (ys + dy < swt.shape[0]) & (ys + dy >= 0) \
            & (xs + dx < swt.shape[1]) & (xs + dx >= 0)
    return {d: link(*d)[None] for d in ((0, 1), (1, 0), (1, 1), (1, -1))}

timed(jax.jit(lambda s: label_components_links((s < S._INF)[None], links_of(s))[0]),
      sm, iters=2, label="label_components_links")

timed(jax.jit(lambda p: S.swt(p)), page, iters=2, label="swt total (mode 0)")
