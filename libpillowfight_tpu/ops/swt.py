"""SWT — Stroke Width Transform (Epshtein et al., CVPR'08).

Ref: src/pillowfight/swt.c pf_swt (a port of CCV/DetectText) — SURVEY.md
§2.2/§3.3. The reference walks rays with pointer arithmetic, qsorts each
ray for the median clamp, and merges connected components sequentially.

TPU re-design (everything static-shaped, jit-safe, batched over pages).
Random-access gathers/scatters run at ~20-50M elem/s on TPU — each
1M-element gather costs as much as ~500 dense page sweeps — so the ray
machinery is reformulated to be *dense and shift-based*:

1. Edge map + gradients come from the shared canny/sobel/gaussian stack.
2. Ray directions are quantized to 16 primitive integer vectors
   (SWT_N_DIRS; axis, diagonal and knight moves, max error ~13 deg vs the
   reference's continuous march — well inside the pi/6 opposing-gradient
   tolerance). A ray of class k visits multiples of v_k (plus the
   intermediate cell for knight moves, so 1-px canny edge lines cannot be
   jumped).
3. First-edge distance for EVERY pixel along every class is computed by
   pointer doubling over static shifts: log2(T) dense select passes per
   class carry (euclidean distance, class-at-first-edge, plus optional
   payloads pulled from the first-edge cell). One set of 16 chains
   serves both polarity passes (a dark-on-light ray of class k is a
   light-on-dark ray of class k+8).
4. Stroke widths are committed WITHOUT ray marching, by the segment
   identity: a class-k ray stops at the first edge, so the cells a ray
   covers are exactly one edge-free run between two edge pixels — which
   means the ONLY anchor that can commit to a pixel p along class k is
   p's nearest upstream edge e1, its hit is p's nearest downstream edge
   e2, and the stroke width is dist(e1, p) + dist(p, e2). Both come from
   the first-edge chains of k and k+8, so the whole commit is O(1) dense
   selects per class — no while_loop, no t_cap, no dynamic rolls.
5. The per-ray median clamp gathers an evenly-subsampled 17-point
   profile per compacted valid ray (the only gather in the kernel),
   sorts once, writes medians back to their unique anchor pixels, and
   re-commits them through a second payload-carrying first-edge chain
   (the median rides the same upstream pull as the width).
6. Connected components over similar stroke widths use
   morph.label_components_links; per-component statistics compact the
   valid-SWT pixels first so the scatter-adds touch ~1/8 of the page.

Outputs (enum parity with the reference):
  SWT_OUTPUT_BW_TEXT         0: detected letter pixels black on white
  SWT_OUTPUT_GRAYSCALE_TEXT  1: letter pixels keep their gray value on white
  SWT_OUTPUT_ORIGINAL_BOXES  2: original page + letter bounding boxes
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.bitmap import ensure_batched, maybe_unbatch, rgba_to_gray
from .canny import canny_edge_mask
from .gaussian import gaussian_on_matrix
from .morph import label_components_links
from .sobel import sobel_on_matrix

# plain float, not jnp.float32: a module-level jnp scalar would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize (it must run before backend init)
_INF = 1e9

# 16 primitive direction vectors (dy, dx), ordered by angle; class k + 8
# is the opposite direction. Knight moves carry an intermediate cell
# (the rounded half-step) so digital rays cannot jump a 1-px edge line.
_VECS = (
    (0, 1), (1, 2), (1, 1), (2, 1),
    (1, 0), (2, -1), (1, -1), (1, -2),
    (0, -1), (-1, -2), (-1, -1), (-2, -1),
    (-1, 0), (-2, 1), (-1, 1), (-1, 2),
)
_NDIR = len(_VECS)
_ANGLES = np.arctan2([v[0] for v in _VECS], [v[1] for v in _VECS])
_NORMS = np.hypot([v[0] for v in _VECS], [v[1] for v in _VECS])


def _half(v):
    """Intermediate cell of one v-step (knight moves only), else None."""
    w = (int(np.round(v[0] / 2.0)), int(np.round(v[1] / 2.0)))
    return w if w != (0, 0) and w != v else None


def _shift_static(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """out[y, x] = x[y + dy, x + dx], `fill` outside. x is [H, W]."""
    h, w = x.shape
    py, px = abs(dy), abs(dx)
    p = jnp.pad(x, ((py, py), (px, px)), constant_values=fill)
    return p[py + dy : py + dy + h, px + dx : px + dx + w]


def _quantize_dirs(ux: jax.Array, uy: jax.Array) -> jax.Array:
    """Nearest primitive-vector class (int8) for unit directions."""
    ang = jnp.arctan2(uy, ux)  # [-pi, pi]
    # distance on the circle to each class angle
    diffs = jnp.abs(
        jnp.mod(ang[..., None] - jnp.asarray(_ANGLES, jnp.float32) + np.pi,
                2 * np.pi) - np.pi
    )
    return jnp.argmin(diffs, axis=-1).astype(jnp.int8)


def _halves(v):
    """Intermediate cells of one v-step (knight moves), ordered far to
    near so overwriting base-case hits leaves the NEAREST one. A digital
    ray is blocked by an edge on EITHER intermediate (symmetric in the
    travel direction, so upstream and downstream chains agree)."""
    h = _half(v)
    if h is None:
        return ()
    g = (v[0] - h[0], v[1] - h[1])
    pair = sorted({h, g}, key=lambda c: -np.hypot(*c))
    return tuple(pair)


def _first_edge_along(edge_cls: jax.Array, k: int, t_units: int,
                      payloads=()):
    """First edge pixel along direction class k from every pixel.

    edge_cls int8 [H,W]: class id at edge pixels, -1 elsewhere. Checks
    the intermediate half-step cells first for knight vectors (a digital
    ray must not pass through a 1-px edge). Pointer doubling: after step
    j the carry holds the first edge within 2^j v-steps, so log2(t_units)
    static-shift select passes compute every pixel's first hit.

    payloads: optional f32 [H,W] maps; their value AT the first-edge
    cell is pulled back to every pixel (fill _INF on miss) — this is how
    the median clamp rides the chain back over the ray cells.

    Returns (dist f32 [H,W] euclidean distance, units i32 [H,W] v-step
    count, cls int8 [H,W] class at the hit, lat bool [H,W] hit at a
    lattice multiple of v (False = hit at a knight intermediate — such an
    edge blocks the ray but lies on a NEIGHBOR line, so it cannot anchor
    a ray through this pixel), [pulled payloads...]; INF / -1 on miss).
    """
    v = _VECS[k]
    nv = float(_NORMS[k])
    halves = _halves(v)
    # axis/diagonal classes hit only at lattice multiples of v, so the
    # step count and lattice flag are pure functions of the distance
    # (u = d/nv, lat = hit) — dropping their carries removes 2 of the
    # ~5 shifted planes per doubling step for half the classes
    simple = not halves

    # one-step base case: full step first, then intermediates far->near
    # overwrite (the continuously-first hit wins)
    ev = _shift_static(edge_cls, v[0], v[1], -1)
    d = jnp.where(ev >= 0, jnp.float32(nv), _INF)
    c = jnp.where(ev >= 0, ev, -1).astype(jnp.int8)
    u = None if simple else jnp.where(ev >= 0, 1, 0).astype(jnp.int32)
    lat = None if simple else (ev >= 0)
    pl = [jnp.where(ev >= 0, _shift_static(p, v[0], v[1], _INF), _INF)
          for p in payloads]
    for hc in halves:
        eh = _shift_static(edge_cls, hc[0], hc[1], -1)
        hit_h = eh >= 0
        d = jnp.where(hit_h, jnp.float32(np.hypot(*hc)), d)
        u = jnp.where(hit_h, 1, u)  # intermediate counts as the 1st step
        c = jnp.where(hit_h, eh, c)
        lat = jnp.where(hit_h, False, lat)
        pl = [jnp.where(hit_h, _shift_static(p, hc[0], hc[1], _INF), q)
              for p, q in zip(payloads, pl)]

    step = 1
    while step < t_units:
        sy, sx = step * v[0], step * v[1]
        d2 = _shift_static(d, sy, sx, _INF)
        c2 = _shift_static(c, sy, sx, -1)
        miss = d >= _INF
        ext = d2 < _INF
        take = miss & ext
        d = jnp.where(take, step * nv + d2, d)
        c = jnp.where(take, c2, c)
        if not simple:
            u2 = _shift_static(u, sy, sx, 0)
            u = jnp.where(take, step + u2, u)
            lat = jnp.where(take, _shift_static(lat, sy, sx, False), lat)
        pl = [jnp.where(take, _shift_static(q, sy, sx, _INF), q) for q in pl]
        step *= 2
    if simple:
        hit = d < _INF
        u = jnp.where(hit, jnp.round(d / nv).astype(jnp.int32), 0)
        lat = hit
    return (d, u, c, lat, *pl)


_MED_SAMPLES = 17  # evenly subsampled ray profile for the median clamp


def _class_commit(k: int, s: int, down, up, edge_cls, is_edge, t_units,
                  opposing, payload_up=None, payload_anchor=None):
    """Committed value map for (class k, sign s) via the segment pull.

    down/up = (d, u, c) chains along k and k+8. A pixel p's only class-k
    committer is its nearest upstream edge e1 (u chain); the hit is its
    nearest downstream edge e2 (d chain); both ends' validity conditions
    are re-derived from the chain carries. With payload_up (the value
    pulled from e1, e.g. the ray median) the committed value is that
    payload instead of the geometric width; payload_anchor is the value
    an anchor pixel commits to itself.

    Returns (contrib f32 [H,W], is_anchor bool, u_dn i32) — contrib
    already includes knight-move intermediate coverage.
    """
    d_dn, u_dn, c_dn = down[0], down[1], down[2]
    d_up, u_up, c_up, lat_up = up[0], up[1], up[2], up[3]
    # an edge of gradient class c casts along class c (sign +1) or c+8
    # (sign -1). The Epshtein condition compares the HIT gradient against
    # the ANCHOR's gradient class `src` (~anti-parallel) — ref: swt.c.
    src = (k - (_NDIR // 2 if s == -1 else 0)) % _NDIR
    # e1 is a src-class edge ON THIS LATTICE LINE (an edge at a knight
    # intermediate blocks rays but anchors only its own neighbor line —
    # that coverage arrives via the half-cell shift below)
    anchor_up_ok = (c_up == src) & lat_up
    hit_dn_ok = opposing(c_dn, src)       # e2 opposes the anchor

    # mid cells: the edge-free run (e1, e2) is e1's ray
    mid_ok = (
        (~is_edge) & anchor_up_ok & hit_dn_ok
        & (d_up < _INF) & (d_dn < _INF) & (u_up + u_dn <= t_units)
    )
    # hit cells: p == e2 of e1's ray (rays include their hit pixel)
    hit_ok = (
        is_edge & anchor_up_ok & opposing(edge_cls, src)
        & (d_up < _INF) & (u_up <= t_units)
    )
    # anchor cells: p == e1 (rays cover their own anchor)
    is_anchor = (
        (edge_cls == src) & hit_dn_ok & (d_dn < _INF) & (u_dn <= t_units)
    )
    if payload_up is None:
        w_mid = jnp.where(mid_ok, jnp.maximum(d_up + d_dn, 1.0), _INF)
        w_hit = jnp.where(hit_ok, jnp.maximum(d_up, 1.0), _INF)
        w_anc = jnp.where(is_anchor, jnp.maximum(d_dn, 1.0), _INF)
    else:
        w_mid = jnp.where(mid_ok, payload_up, _INF)
        w_hit = jnp.where(hit_ok, payload_up, _INF)
        w_anc = (jnp.where(is_anchor, payload_anchor, _INF)
                 if payload_anchor is not None else _INF)

    contrib = jnp.minimum(jnp.minimum(w_mid, w_hit), w_anc)
    half = _half(_VECS[k])
    if half is not None:
        # knight rays also cover the half-step cell after every covered
        # non-hit cell m: intermediate c = m + half pulls from m
        w_prev = jnp.minimum(w_mid, w_anc)
        contrib = jnp.minimum(
            contrib, _shift_static(w_prev, -half[0], -half[1], _INF))
    return contrib, is_anchor, u_dn


def _swt_maps_one(gray, edges, max_rays, max_len):
    """Both polarities' stroke-width maps for one page.

    Returns (swt_minus, swt_plus) f32 [H,W] (_INF = no stroke):
    sign=-1 marches against the gradient (into dark strokes,
    dark-on-light text), sign=+1 along it (light-on-dark).
    """
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

    cls = _quantize_dirs(ux, uy)                   # gradient class, int8
    edge_cls = jnp.where(edges, cls, jnp.int8(-1))
    is_edge = edge_cls >= 0

    # opposing-gradient test on classes: within pi/6 of anti-parallel.
    # class angular spacing alternates 18.4/26.6 deg, so +-1 class of the
    # opposite direction covers the tolerance.
    def opposing(hit_cls, k):
        diff = jnp.mod(hit_cls.astype(jnp.int32) - (k + _NDIR // 2), _NDIR)
        return (hit_cls >= 0) & ((diff <= 1) | (diff >= _NDIR - 1))

    def t_units(k):
        return max(int(np.ceil(max_len / _NORMS[k])), 1)

    swt = {s: jnp.full((h, w), _INF, jnp.float32) for s in (-1, 1)}
    any_anchor = {s: jnp.zeros((h, w), bool) for s in (-1, 1)}
    a_units = {s: jnp.zeros((h, w), jnp.int32) for s in (-1, 1)}
    a_k = {s: jnp.zeros((h, w), jnp.int8) for s in (-1, 1)}

    # ---- pass 1: width maps. Chains come in opposite pairs so only two
    # are live at a time (memory: O(1) page maps, not O(classes)).
    for k in range(_NDIR // 2):
        ch_k = _first_edge_along(edge_cls, k, t_units(k))
        ch_o = _first_edge_along(edge_cls, k + _NDIR // 2, t_units(k))
        for kk, down, up in ((k, ch_k, ch_o), (k + _NDIR // 2, ch_o, ch_k)):
            for s in (-1, 1):
                contrib, is_anchor, u_dn = _class_commit(
                    kk, s, down, up, edge_cls, is_edge, t_units(kk), opposing)
                swt[s] = jnp.minimum(swt[s], contrib)
                any_anchor[s] = any_anchor[s] | is_anchor
                a_units[s] = jnp.where(is_anchor, u_dn, a_units[s])
                a_k[s] = jnp.where(is_anchor, jnp.int8(kk), a_k[s])

    # ---- median clamp (pass 2, ref: swt.c / Epshtein sec. 3.1):
    # per valid ray, the median of an evenly subsampled swt profile,
    # re-committed along the same segment via a payload-carrying chain.
    vy = jnp.asarray([v[0] for v in _VECS], jnp.int32)
    vx = jnp.asarray([v[1] for v in _VECS], jnp.int32)
    med_map = {}
    for s in (-1, 1):
        ay, ax = jnp.nonzero(any_anchor[s], size=max_rays, fill_value=-1)
        valid_r = ay >= 0
        ays = jnp.maximum(ay, 0)
        axs = jnp.maximum(ax, 0)
        r_units = a_units[s][ays, axs]
        r_k = a_k[s][ays, axs].astype(jnp.int32)
        r_vy = vy[r_k]
        r_vx = vx[r_k]

        swt_flat = jnp.concatenate([swt[s].reshape(-1), jnp.array([_INF])])
        js = jnp.arange(_MED_SAMPLES, dtype=jnp.int32)
        # evenly spread sample steps 0..units over _MED_SAMPLES slots
        tj = (js[:, None] * r_units[None, :]) // (_MED_SAMPLES - 1)  # [M,R]
        py = ays[None, :] + tj * r_vy[None, :]
        px = axs[None, :] + tj * r_vx[None, :]
        inb = (py >= 0) & (py < h) & (px >= 0) & (px < w) & valid_r[None, :]
        idx = jnp.where(inb, py * w + px, h * w)
        vals = swt_flat[idx]                                   # [M, R]
        vals = jnp.sort(vals, axis=0)
        med = vals[_MED_SAMPLES // 2, jnp.arange(max_rays)]
        med = jnp.where(valid_r, med, _INF)

        # medians back onto their (unique) anchor pixels
        mm = jnp.full(h * w + 1, _INF, jnp.float32)
        med_idx = jnp.where(valid_r, ays * w + axs, h * w)
        mm = mm.at[med_idx].min(med, unique_indices=False)
        med_map[s] = mm[: h * w].reshape(h, w)

    # clamp covers the anchor itself; ray cells get the median through a
    # second chain that pulls med_map from the upstream anchor (both
    # signs' payloads ride one chain pair per class)
    res = {s: jnp.minimum(swt[s], med_map[s]) for s in (-1, 1)}
    for k in range(_NDIR // 2):
        pls = (med_map[-1], med_map[1])
        ch_k = _first_edge_along(edge_cls, k, t_units(k), payloads=pls)
        ch_o = _first_edge_along(edge_cls, k + _NDIR // 2, t_units(k),
                                 payloads=pls)
        for kk, down, up in ((k, ch_k, ch_o), (k + _NDIR // 2, ch_o, ch_k)):
            for si, s in enumerate((-1, 1)):
                contrib, _, _ = _class_commit(
                    kk, s, down, up, edge_cls, is_edge, t_units(kk), opposing,
                    payload_up=up[4 + si], payload_anchor=med_map[s])
                res[s] = jnp.minimum(res[s], contrib)
    return res[-1], res[1]


# --------------------------------------------------------------------------
# letter components
# --------------------------------------------------------------------------

def _letter_mask_one(gray, swt_minus, swt_plus, max_letters, max_valid):
    """Filter SWT components down to letter candidates — BOTH polarity
    passes in one labeling + one statistics sweep.

    Returns (mask bool [H,W], boxes int32 [max_letters, 4] as
    (y0, y1, x0, x1), boxes_ok bool [max_letters]) — the boxes are the
    accepted letter components' bounding boxes (ref: swt.c renders one
    box per accepted letter in PF_SWT_OUTPUT_ORIGINAL_BOXES mode; the
    C++ oracle pf_oracle_swt draws the same set).

    Polarity consistency gate (shared spec extension with the oracle):
    the dark-on-light pass only keeps pixels darker than the page median
    (strokes are dark), the light-on-dark pass only pixels lighter —
    this rejects the page-spanning pseudo strokes that inter-letter
    gaps / blank pages produce. The two gated pixel sets are therefore
    DISJOINT, so both passes share one combined SWT plane; CC links add
    a same-polarity condition, making each component single-polarity —
    identical components and statistics to two separate passes at half
    the labeling/scatter cost (the stats sweep is the dominant ~300 ms
    of an A4 SWT on v5e).
    """
    h, w = swt_minus.shape
    med = jnp.median(gray)
    neg = gray < med
    pos = gray > med
    swt = jnp.where(neg, swt_minus, jnp.where(pos, swt_plus, _INF))
    valid = swt < _INF

    # pairwise links: neighbors whose stroke-width ratio <= SWT_CC_SW_RATIO
    # and (combined-pass invariant) equal polarity
    def link(dy, dx):
        rolled = jnp.roll(jnp.roll(swt, -dy, 0), -dx, 1)
        nvalid = jnp.roll(jnp.roll(valid, -dy, 0), -dx, 1)
        npol = jnp.roll(jnp.roll(neg, -dy, 0), -dx, 1)
        ratio_ok = (
            (jnp.maximum(swt, rolled) / jnp.maximum(jnp.minimum(swt, rolled), 1e-6))
            <= C.SWT_CC_SW_RATIO
        )
        ok = valid & nvalid & ratio_ok & (neg == npol)
        # kill wrap-around links
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        ok = ok & (ys + dy < h) & (ys + dy >= 0) & (xs + dx < w) & (xs + dx >= 0)
        return ok

    links = {d: link(*d)[None] for d in ((0, 1), (1, 0), (1, 1), (1, -1))}
    labels = label_components_links(valid[None], links)[0]  # [H,W], bg = h*w

    # ---- per-component statistics: compact the valid pixels first so the
    # scatter-adds touch max_valid elements instead of the whole page
    # (TPU scatters run at ~20M elem/s — SURVEY.md §5 roofline notes)
    nb = h * w + 1
    cy, cx = jnp.nonzero(valid, size=max_valid, fill_value=-1)
    c_ok = cy >= 0
    cys = jnp.maximum(cy, 0)
    cxs = jnp.maximum(cx, 0)
    c_lab = jnp.where(c_ok, labels[cys, cxs], h * w)
    c_swt = jnp.where(c_ok, swt[cys, cxs], 0.0)
    c_one = c_ok.astype(jnp.float32)

    cnt = jnp.zeros(nb, jnp.float32).at[c_lab].add(c_one)
    s1 = jnp.zeros(nb, jnp.float32).at[c_lab].add(c_swt)
    s2 = jnp.zeros(nb, jnp.float32).at[c_lab].add(c_swt * c_swt)
    ymin = jnp.full(nb, h, jnp.int32).at[c_lab].min(jnp.where(c_ok, cys, h))
    ymax = jnp.zeros(nb, jnp.int32).at[c_lab].max(jnp.where(c_ok, cys, 0))
    xmin = jnp.full(nb, w, jnp.int32).at[c_lab].min(jnp.where(c_ok, cxs, w))
    xmax = jnp.zeros(nb, jnp.int32).at[c_lab].max(jnp.where(c_ok, cxs, 0))

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
    ok_c = ok[c_lab]  # per-compacted-pixel acceptance (reused for render)
    rep = jnp.where(c_ok & (c_lab == cys * w + cxs) & ok_c, c_lab, h * w)
    rep_idx = jnp.sort(rep)[:max_letters]
    r_ok = rep_idx < h * w
    ry0 = ymin[rep_idx]
    ry1 = ymax[rep_idx]
    rx0 = xmin[rep_idx]
    rx1 = xmax[rep_idx]
    # nesting is counted within a polarity pass (the oracle runs the
    # nested filter per swt_polarity call), so cross-polarity containment
    # must not count; a rep's polarity is its representative pixel's
    r_neg = neg.reshape(-1)[jnp.minimum(rep_idx, h * w - 1)]
    contains = (
        (ry0[:, None] <= ry0[None, :]) & (ry1[:, None] >= ry1[None, :])
        & (rx0[:, None] <= rx0[None, :]) & (rx1[:, None] >= rx1[None, :])
        & (r_neg[:, None] == r_neg[None, :])
        & r_ok[:, None] & r_ok[None, :]
        & ~jnp.eye(max_letters, dtype=bool)
    )
    nested = jnp.sum(contains, axis=1)
    reject_mask = jnp.zeros(nb, bool).at[
        jnp.where(r_ok & (nested > C.SWT_MAX_NESTED_LETTERS), rep_idx, h * w)
    ].set(True)

    # letter mask via the compacted pixel list: valid pixels are exactly
    # the compacted points, so gathering acceptance at 1/8-page points and
    # scattering True back is ~3x cheaper than the full-page ok[labels]
    # gather (80 ms -> ~45 ms at A4 on v5e; TPU gathers are per-element)
    keep_c = c_ok & ok_c & ~reject_mask[c_lab]
    mask = jnp.zeros(h * w + 1, bool).at[
        jnp.where(keep_c, cys * w + cxs, h * w)
    ].set(True)[: h * w].reshape(h, w)

    boxes = jnp.stack([ry0, ry1, rx0, rx1], axis=-1).astype(jnp.int32)
    boxes_ok = r_ok & (nested <= C.SWT_MAX_NESTED_LETTERS)
    return mask, boxes, boxes_ok


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------

def _draw_boxes(pages_rgb, boxes, boxes_ok):
    """Draw red per-letter bounding boxes onto uint8 RGB [H,W,3].

    boxes int32 [N,4] = (y0, y1, x0, x1); boxes_ok bool [N]. One cheap
    fori_loop iteration per candidate slot (pure VPU compares, no
    materialized [N,H,W] tensor). Ref: swt.c PF_SWT_OUTPUT_ORIGINAL_BOXES.
    """
    h, w, _ = pages_rgb.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def body(i, on):
        y0, y1, x0, x1 = boxes[i, 0], boxes[i, 1], boxes[i, 2], boxes[i, 3]
        per = (
            (((ys == y0) | (ys == y1)) & (xs >= x0) & (xs <= x1))
            | (((xs == x0) | (xs == x1)) & (ys >= y0) & (ys <= y1))
        )
        return on | (per & boxes_ok[i])

    on_box = jax.lax.fori_loop(
        0, boxes.shape[0], body, jnp.zeros((h, w), bool))
    red = jnp.stack(
        [jnp.full((h, w), 255, jnp.uint8), jnp.zeros((h, w), jnp.uint8),
         jnp.zeros((h, w), jnp.uint8)], axis=-1)
    return jnp.where(on_box[..., None], red, pages_rgb)


def _swt_one(page, output_type, max_rays, max_len, max_letters, max_valid):
    """SWT for one RGBA page [H,W,4]."""
    gray = rgba_to_gray(page[None])[0]
    edges = canny_edge_mask(gray[None])[0]

    swt_minus, swt_plus = _swt_maps_one(gray, edges, max_rays, max_len)
    letter, boxes, boxes_ok = _letter_mask_one(
        gray, swt_minus, swt_plus, max_letters, max_valid)

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
        rgb = _draw_boxes(page[..., :3], boxes, boxes_ok)
    else:
        raise ValueError(f"unknown swt output_type {output_type}")
    return jnp.concatenate([rgb, alpha], axis=-1)


@partial(jax.jit, static_argnames=(
    "output_type", "max_rays", "max_len", "max_letters", "max_valid",
    "max_edges"))
def swt(
    pages: jax.Array,
    output_type: int = C.SWT_OUTPUT_BW_TEXT,
    max_rays: int | None = None,
    max_len: int = C.SWT_MAX_RAY_LEN,
    max_letters: int = 1024,
    max_valid: int | None = None,
    max_edges: int | None = None,  # legacy alias for max_rays
) -> jax.Array:
    """Stroke Width Transform. uint8 RGBA [B,H,W,4] (or single page) in/out.

    max_rays bounds the compacted valid-ray list for the median clamp
    (default H*W//32, per polarity); max_len bounds ray length in pixels;
    max_valid bounds the compacted stroke-pixel list for component
    statistics (default H*W//4, shared by both polarity passes — their
    gated pixel sets are disjoint); max_letters bounds the nested-box
    candidate list (total across both polarities; nesting itself is
    counted per polarity, matching the oracle's per-pass filter).
    """
    pages, unb = ensure_batched(pages)
    _, h, w, _ = pages.shape
    if max_rays is None:
        max_rays = max_edges if max_edges is not None else max(h * w // 32, 256)
    if max_valid is None:
        # shared by BOTH polarity passes (their gated pixel sets are
        # disjoint): h*w//4 gives each pass the h*w//8 budget the
        # previous two-pass formulation had, so dense mixed-polarity
        # pages don't silently truncate component pixels
        max_valid = max(h * w // 4, 1024)
    out = jax.vmap(
        lambda p: _swt_one(p, output_type, max_rays, max_len, max_letters,
                           max_valid)
    )(pages)
    return maybe_unbatch(out, unb)
