"""SWT — Stroke Width Transform (Epshtein et al., CVPR'08).

Ref: src/pillowfight/swt.c pf_swt (a port of CCV/DetectText) — SURVEY.md
§2.2/§3.3. The reference walks rays with pointer arithmetic, qsorts each
ray for the median clamp, and merges connected components sequentially.

TPU re-design (everything static-shaped, jit-safe, batched over pages):

1. Edge map + gradients come from the shared canny/sobel/gaussian stack.
2. Edge pixels are *compacted* to a fixed-size list (``jnp.nonzero`` with
   a static ``size``), so all later work is proportional to the number of
   edges, not the page area.
3. Ray casting is a bounded ``lax.scan`` over ray steps (static
   ``SWT_MAX_RAY_LEN``): every edge pixel marches in lock-step along its
   quantized gradient until an opposing edge (gradient within pi/6 of
   anti-parallel) terminates the ray.
4. Stroke widths are committed with scatter-min (`.at[idx].min`) — the
   data-parallel replacement for the reference's per-ray write loops.
5. The per-ray median clamp gathers each ray's stroke widths into a
   [edges, max_len] block, sorts along the ray axis (one vectorized sort
   instead of qsort-per-ray) and scatter-mins the median back.
6. Connected components over similar stroke widths use
   morph.label_components_links (pairwise-gated parallel label
   propagation); letter filtering is computed from per-component
   scatter-add statistics; the nested-box test compacts component boxes
   to a fixed-size list and does one O(K^2) containment pass.

Outputs (enum parity with the reference):
  SWT_OUTPUT_BW_TEXT         0: detected letter pixels black on white
  SWT_OUTPUT_GRAYSCALE_TEXT  1: letter pixels keep their gray value on white
  SWT_OUTPUT_ORIGINAL_BOXES  2: original page + letter bounding boxes
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.bitmap import ensure_batched, maybe_unbatch, rgba_to_gray
from .canny import canny_edge_mask
from .gaussian import gaussian_on_matrix
from .morph import label_components_links
from .sobel import sobel_on_matrix

_INF = jnp.float32(1e9)


# --------------------------------------------------------------------------
# ray casting (single page; vmapped over the batch)
# --------------------------------------------------------------------------

def _cast_rays(edges, ux, uy, sign, h, w, max_edges, max_len):
    """March every edge pixel along sign*unit-gradient.

    edges bool [H,W]; ux/uy f32 [H,W] unit gradient. Returns
    (ey, ex int32 [E] edge coords, valid bool [E], hit_t int32 [E],
    sw f32 [E] euclidean stroke width).
    """
    ey, ex = jnp.nonzero(edges, size=max_edges, fill_value=-1)
    is_edge = ey >= 0
    ey_s = jnp.maximum(ey, 0)
    ex_s = jnp.maximum(ex, 0)

    dirx = sign * ux[ey_s, ex_s]
    diry = sign * uy[ey_s, ex_s]
    u0x = ux[ey_s, ex_s]
    u0y = uy[ey_s, ex_s]
    cos_tol = -jnp.cos(jnp.float32(C.SWT_RAY_ANGLE_TOLERANCE))

    def step(carry, t):
        found, hit_t = carry
        fy = ey_s.astype(jnp.float32) + diry * t.astype(jnp.float32)
        fx = ex_s.astype(jnp.float32) + dirx * t.astype(jnp.float32)
        iy = jnp.round(fy).astype(jnp.int32)
        ix = jnp.round(fx).astype(jnp.int32)
        inb = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        iy_c = jnp.clip(iy, 0, h - 1)
        ix_c = jnp.clip(ix, 0, w - 1)
        at_edge = edges[iy_c, ix_c] & inb
        # opposing gradient: within pi/6 of anti-parallel to the start's
        opposing = (u0x * ux[iy_c, ix_c] + u0y * uy[iy_c, ix_c]) <= cos_tol
        moved = (iy != ey_s) | (ix != ex_s)
        hit = at_edge & opposing & moved & ~found & is_edge
        hit_t = jnp.where(hit, t, hit_t)
        # a non-opposing edge crossing also ends the walk (ray discarded),
        # matching the reference's "hit an edge" termination
        stop = at_edge & moved & ~found
        found = found | hit | stop | ~inb
        return (found, hit_t), None

    ts = jnp.arange(1, max_len + 1, dtype=jnp.int32)
    (found, hit_t), _ = jax.lax.scan(
        step, (jnp.zeros(max_edges, bool), jnp.full(max_edges, -1, jnp.int32)), ts
    )
    del found
    valid = (hit_t > 0) & is_edge
    tf = hit_t.astype(jnp.float32)
    sw = jnp.sqrt((dirx * tf) ** 2 + (diry * tf) ** 2)
    sw = jnp.where(valid, jnp.maximum(sw, 1.0), _INF)
    return ey_s, ex_s, valid, hit_t, sw


def _ray_positions(ey, ex, dirx, diry, t):
    fy = ey.astype(jnp.float32) + diry * t.astype(jnp.float32)
    fx = ex.astype(jnp.float32) + dirx * t.astype(jnp.float32)
    return jnp.round(fy).astype(jnp.int32), jnp.round(fx).astype(jnp.int32)


def _swt_map_one(gray, edges, sign, max_edges, max_len):
    """Stroke-width map for one page and one polarity. f32 [H,W], _INF = none."""
    h, w = gray.shape
    smoothed = gaussian_on_matrix(
        gray[None], C.CANNY_GAUSSIAN_SIGMA, C.CANNY_GAUSSIAN_NB_STDDEV
    )[0]
    grad = sobel_on_matrix(smoothed[None])
    inten = grad.intensity[0]
    gx = jnp.cos(grad.direction[0]) * inten
    gy = jnp.sin(grad.direction[0]) * inten
    norm = jnp.maximum(jnp.sqrt(gx * gx + gy * gy), 1e-6)
    ux, uy = gx / norm, gy / norm

    ey, ex, valid, hit_t, sw = _cast_rays(edges, ux, uy, sign, h, w, max_edges, max_len)
    dirx = sign * ux[ey, ex]
    diry = sign * uy[ey, ex]

    # ---- pass 1: scatter-min the ray's width over every pixel it covers
    swt_flat = jnp.full(h * w + 1, _INF, jnp.float32)  # slot h*w = trash

    def commit(swt_flat, t):
        iy, ix = _ray_positions(ey, ex, dirx, diry, t)
        on_ray = valid & (t <= hit_t)
        inb = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        idx = jnp.where(on_ray & inb, iy * w + ix, h * w)
        return swt_flat.at[idx].min(sw), None

    ts_all = jnp.arange(0, max_len + 1, dtype=jnp.int32)
    swt_flat, _ = jax.lax.scan(commit, swt_flat, ts_all)

    # ---- pass 2: median clamp. Gather ray values, sort, scatter-min median.
    def gather_vals(_, t):
        iy, ix = _ray_positions(ey, ex, dirx, diry, t)
        on_ray = valid & (t <= hit_t)
        inb = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        idx = jnp.where(on_ray & inb, iy * w + ix, h * w)
        return None, jnp.where(on_ray & inb, swt_flat[idx], _INF)

    _, vals = jax.lax.scan(gather_vals, None, ts_all)  # [T+1, E]
    vals = jnp.sort(vals, axis=0)
    n_ray = (hit_t + 1).astype(jnp.int32)
    median = vals[jnp.clip(n_ray // 2, 0, max_len), jnp.arange(max_edges)]
    median = jnp.where(valid, median, _INF)

    def clamp(swt_flat, t):
        iy, ix = _ray_positions(ey, ex, dirx, diry, t)
        on_ray = valid & (t <= hit_t)
        inb = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        idx = jnp.where(on_ray & inb, iy * w + ix, h * w)
        return swt_flat.at[idx].min(jnp.where(on_ray, median, _INF)), None

    swt_flat, _ = jax.lax.scan(clamp, swt_flat, ts_all)
    return swt_flat[: h * w].reshape(h, w)


# --------------------------------------------------------------------------
# letter components
# --------------------------------------------------------------------------

def _letter_mask_one(gray, swt, sign, max_letters):
    """Filter SWT components down to letter candidates. bool [H,W].

    Polarity consistency gate: the dark-on-light pass only keeps pixels
    darker than the page median (strokes are dark), the light-on-dark
    pass only pixels lighter — this rejects the page-spanning pseudo
    strokes that inter-letter gaps / blank pages produce.
    """
    h, w = swt.shape
    # gradient (correlation semantics) points dark -> light, so sign=-1
    # marches into dark strokes (dark-on-light text) and sign=+1 into
    # light strokes (light-on-dark text)
    med = jnp.median(gray)
    polarity_ok = jnp.where(sign < 0, gray < med, gray > med)
    swt = jnp.where(polarity_ok, swt, _INF)
    valid = swt < _INF

    # pairwise links: neighbors whose stroke-width ratio <= SWT_CC_SW_RATIO
    def link(dy, dx):
        rolled = jnp.roll(jnp.roll(swt, -dy, 0), -dx, 1)
        nvalid = jnp.roll(jnp.roll(valid, -dy, 0), -dx, 1)
        ratio_ok = (
            (jnp.maximum(swt, rolled) / jnp.maximum(jnp.minimum(swt, rolled), 1e-6))
            <= C.SWT_CC_SW_RATIO
        )
        ok = valid & nvalid & ratio_ok
        # kill wrap-around links
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        ok = ok & (ys + dy < h) & (ys + dy >= 0) & (xs + dx < w) & (xs + dx >= 0)
        return ok

    links = {d: link(*d)[None] for d in ((0, 1), (1, 0), (1, 1), (1, -1))}
    labels = label_components_links(valid[None], links)[0]  # [H,W], bg = h*w

    # ---- per-component statistics via scatter-add into [h*w+1] buckets
    flat_lab = labels.reshape(-1)
    swt_f = jnp.where(valid, swt, 0.0).reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
    nb = h * w + 1

    cnt = jnp.zeros(nb, jnp.float32).at[flat_lab].add(1.0)
    s1 = jnp.zeros(nb, jnp.float32).at[flat_lab].add(swt_f)
    s2 = jnp.zeros(nb, jnp.float32).at[flat_lab].add(swt_f * swt_f)
    ymin = jnp.full(nb, h, jnp.int32).at[flat_lab].min(ys)
    ymax = jnp.zeros(nb, jnp.int32).at[flat_lab].max(ys)
    xmin = jnp.full(nb, w, jnp.int32).at[flat_lab].min(xs)
    xmax = jnp.zeros(nb, jnp.int32).at[flat_lab].max(xs)

    n = jnp.maximum(cnt, 1.0)
    mean_sw = s1 / n
    var_sw = jnp.maximum(s2 / n - mean_sw * mean_sw, 0.0)
    bw = (xmax - xmin + 1).astype(jnp.float32)
    bh = (ymax - ymin + 1).astype(jnp.float32)
    diag = jnp.sqrt(bw * bw + bh * bh)
    aspect = jnp.maximum(bw, bh) / jnp.maximum(jnp.minimum(bw, bh), 1.0)

    ok = (
        (cnt >= C.SWT_LETTER_MIN_PIXELS)
        & (var_sw <= C.SWT_LETTER_VARIANCE_RATIO * mean_sw * mean_sw)
        & (aspect <= C.SWT_LETTER_ASPECT_RATIO_MAX)
        & (diag < C.SWT_LETTER_DIAMETER_SW_RATIO * jnp.maximum(mean_sw, 1e-6))
        & (bh >= C.SWT_LETTER_HEIGHT_MIN)
        & (bh <= C.SWT_LETTER_HEIGHT_MAX)
    )

    # ---- nested-box filter: a component containing > SWT_MAX_NESTED_LETTERS
    # other accepted boxes is a frame, not a letter (ref: swt.c).
    idx_all = jnp.arange(h * w, dtype=jnp.int32)
    is_rep = (flat_lab[: h * w] == idx_all) & ok[flat_lab[: h * w]]
    rep_idx = jnp.nonzero(is_rep, size=max_letters, fill_value=h * w)[0]
    r_ok = rep_idx < h * w
    ry0 = ymin[rep_idx]
    ry1 = ymax[rep_idx]
    rx0 = xmin[rep_idx]
    rx1 = xmax[rep_idx]
    contains = (
        (ry0[:, None] <= ry0[None, :]) & (ry1[:, None] >= ry1[None, :])
        & (rx0[:, None] <= rx0[None, :]) & (rx1[:, None] >= rx1[None, :])
        & r_ok[:, None] & r_ok[None, :]
        & ~jnp.eye(max_letters, dtype=bool)
    )
    nested = jnp.sum(contains, axis=1)
    reject_mask = jnp.zeros(nb, bool).at[
        jnp.where(r_ok & (nested > C.SWT_MAX_NESTED_LETTERS), rep_idx, h * w)
    ].set(True)
    ok = ok & ~reject_mask

    return valid & ok[labels]


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------

def _draw_boxes(pages_rgb, letter, labels_slots=None):
    """Draw red bounding boxes of letter components onto uint8 RGB [H,W,3]."""
    h, w = letter.shape
    # box edges: dilate the component bbox via per-row/col min/max
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    any_letter = letter.any()
    y0 = jnp.min(jnp.where(letter, ys, h))
    y1 = jnp.max(jnp.where(letter, ys, -1))
    x0 = jnp.min(jnp.where(letter, xs, w))
    x1 = jnp.max(jnp.where(letter, xs, -1))
    on_box = (
        (((ys == y0) | (ys == y1)) & (xs >= x0) & (xs <= x1))
        | (((xs == x0) | (xs == x1)) & (ys >= y0) & (ys <= y1))
    ) & any_letter
    red = jnp.stack(
        [jnp.full((h, w), 255, jnp.uint8), jnp.zeros((h, w), jnp.uint8),
         jnp.zeros((h, w), jnp.uint8)], axis=-1)
    return jnp.where(on_box[..., None], red, pages_rgb)


def _swt_one(page, output_type, max_edges, max_len, max_letters):
    """SWT for one RGBA page [H,W,4]."""
    gray = rgba_to_gray(page[None])[0]
    edges = canny_edge_mask(gray[None])[0]

    letter = jnp.zeros(gray.shape, bool)
    for sign in (1.0, -1.0):  # dark-on-light and light-on-dark passes
        swt = _swt_map_one(gray, edges, jnp.float32(sign), max_edges, max_len)
        letter = letter | _letter_mask_one(gray, swt, sign, max_letters)

    h, w = gray.shape
    alpha = page[..., 3:]
    if output_type == C.SWT_OUTPUT_BW_TEXT:
        v = jnp.where(letter, jnp.uint8(C.PF_BLACK), jnp.uint8(C.PF_WHITE))
        rgb = jnp.stack([v, v, v], axis=-1)
    elif output_type == C.SWT_OUTPUT_GRAYSCALE_TEXT:
        g = jnp.clip(jnp.round(gray), 0, 255).astype(jnp.uint8)
        v = jnp.where(letter, g, jnp.uint8(C.PF_WHITE))
        rgb = jnp.stack([v, v, v], axis=-1)
    elif output_type == C.SWT_OUTPUT_ORIGINAL_BOXES:
        rgb = _draw_boxes(page[..., :3], letter)
    else:
        raise ValueError(f"unknown swt output_type {output_type}")
    return jnp.concatenate([rgb, alpha], axis=-1)


@partial(jax.jit, static_argnames=("output_type", "max_edges", "max_len", "max_letters"))
def swt(
    pages: jax.Array,
    output_type: int = C.SWT_OUTPUT_BW_TEXT,
    max_edges: int | None = None,
    max_len: int = C.SWT_MAX_RAY_LEN,
    max_letters: int = 512,
) -> jax.Array:
    """Stroke Width Transform. uint8 RGBA [B,H,W,4] (or single page) in/out.

    max_edges bounds the compacted edge list (default: H*W//8); max_len
    bounds ray length; max_letters bounds the nested-box candidate list.
    """
    pages, unb = ensure_batched(pages)
    _, h, w, _ = pages.shape
    if max_edges is None:
        max_edges = max(h * w // 8, 256)
    out = jax.vmap(
        lambda p: _swt_one(p, output_type, max_edges, max_len, max_letters)
    )(pages)
    return maybe_unbatch(out, unb)
