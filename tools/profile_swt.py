"""Dissect SWT cost at A4 on TPU: edge stack, width chains, median clamp,
CC labeling, letter stats. Run on the real chip."""

import sys

sys.path.insert(0, ".")

import jax
import tempfile as _tf

jax.config.update("jax_compilation_cache_dir", _tf.mkdtemp(prefix="jaxcache_"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from libpillowfight_tpu.core import constants as C
from libpillowfight_tpu.core.bitmap import put_row_major, rgba_to_gray
from libpillowfight_tpu.ops import swt as S
from libpillowfight_tpu.ops.canny import canny_edge_mask
from libpillowfight_tpu.utils.metrics import device_time


def timed(fn, *args, iters=3, label=""):
    dt = device_time(fn, *args, iters=iters)
    print(f"{label:46s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def _text_page(h=3508, w=2480):
    g = np.full((h, w), 255, np.uint8)
    for y0 in range(120, h - 120, 110):
        for x0 in range(120, w - 120, 45):
            g[y0:y0 + 50, x0:x0 + 6] = 0
    g[h - 180:h - 80, 40:400] = 215
    return np.stack([g, g, g, np.full_like(g, 255)], -1)


page = put_row_major(_text_page()[None])
h, w = 3508, 2480
max_rays = max(h * w // 8, 1024)
max_runs = max(h * w // 16, 1024)
max_letters = max(h * w // 2048, 1024)
max_len = C.SWT_MAX_RAY_LEN

gray = jax.jit(lambda p: rgba_to_gray(p))(page)
gray.block_until_ready()

timed(lambda g: canny_edge_mask(g), gray, label="canny edge mask")
edges = jax.jit(lambda g: canny_edge_mask(g))(gray)
edges.block_until_ready()

from libpillowfight_tpu.ops.canny import canny_gradients
ggx, ggy = jax.jit(canny_gradients)(gray)
jax.block_until_ready((ggx, ggy))
timed(lambda g, e, x, y: S._swt_maps_one(g[0], e[0], x[0], y[0], max_len),
      gray, edges, ggx, ggy, iters=2,
      label="swt maps (chains + median, both pol)")
sm, sp, _ = jax.jit(
    lambda g, e, x, y: S._swt_maps_one(g[0], e[0], x[0], y[0], max_len))(
        gray, edges, ggx, ggy)
jax.block_until_ready((sm, sp))

timed(lambda g, a, b2: S._letter_mask(g, a[None], b2[None], max_letters,
                                      max_runs),
      gray, sm, sp, iters=2, label="letter pass (CC + stats, both pol)")

timed(lambda p: S.swt(p), page, iters=2, label="swt total (mode 0)")
mp = h * w / 1e6
dt = device_time(lambda p: S.swt(p), page, iters=2)
print(f"{'=> MP/s device':46s} {mp/dt:9.1f}")
