"""Golden tests: TPU kernels vs the C++ oracle, per-pixel.

Parity contract (BASELINE.md): <=1 LSB for linear filters; structural
filters (flood/CC/strip scans are discrete decisions) must match
near-exactly — we allow a tiny fraction of boundary pixels to differ to
absorb f32-vs-f64 threshold rounding, and assert IoU >= 0.99 on the
wiped-region masks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from libpillowfight_tpu.ops.ace import ace_with_samples
from libpillowfight_tpu.ops.canny import canny
from libpillowfight_tpu.ops.gaussian import gaussian
from libpillowfight_tpu.ops.sobel import sobel
from libpillowfight_tpu.core import bitmap
from libpillowfight_tpu.ops import unpaper
from libpillowfight_tpu.utils import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="oracle not built")


def _scanlike(rng, h=140, w=180):
    g = np.full((h, w), 245, np.uint8)
    g[:, :7] = 0
    for y0 in range(20, h - 20, 25):
        g[y0 : y0 + 3, 30 : w - 30] = 15
    g[100:120, 20:60] = 200
    ys = rng.integers(5, h - 5, 25)
    xs = rng.integers(10, w - 5, 25)
    g[ys, xs] = 35
    return np.stack([g, g, g, np.full_like(g, 255)], axis=-1)


def _lsb_diff(a, b):
    return np.abs(a[..., :3].astype(int) - b[..., :3].astype(int)).max()


def test_gaussian_vs_oracle(rng, page):
    want = oracle.gaussian(page, 2.0, 5)
    got = np.asarray(gaussian(jnp.asarray(page), 2.0, 5))
    assert _lsb_diff(got, want) <= 1


def test_sobel_vs_oracle(rng, page):
    want = oracle.sobel(page)
    got = np.asarray(sobel(jnp.asarray(page)))
    assert _lsb_diff(got, want) <= 1


def test_canny_vs_oracle(rng):
    page = _scanlike(rng)
    want = oracle.canny(page)[..., 0] > 0
    got = np.asarray(canny(jnp.asarray(page)))[..., 0] > 0
    # Edge maps are discrete decisions: borderline NMS ties flip between
    # f32 (TPU) and f64 (oracle) and propagate via hysteresis. Standard
    # edge-parity metric: 1-px localization tolerance both ways + matched
    # total edge mass.
    import scipy.ndimage

    dil_want = scipy.ndimage.binary_dilation(want, np.ones((3, 3), bool))
    dil_got = scipy.ndimage.binary_dilation(got, np.ones((3, 3), bool))
    stray_got = (got & ~dil_want).mean()
    stray_want = (want & ~dil_got).mean()
    assert stray_got < 0.001 and stray_want < 0.001, (stray_got, stray_want)
    assert abs(int(got.sum()) - int(want.sum())) <= max(0.15 * want.sum(), 150)


def test_ace_vs_oracle_identical_samples(rng, page):
    s = 24
    sy = rng.integers(0, page.shape[0], s).astype(np.int32)
    sx = rng.integers(0, page.shape[1], s).astype(np.int32)
    want = oracle.ace_samples(page, sy, sx, 10.0, 1000.0)
    got = np.asarray(ace_with_samples(
        jnp.asarray(page)[None], jnp.asarray(sy)[None], jnp.asarray(sx)[None],
        10.0, 1000.0)[0])
    assert _lsb_diff(got, want) <= 1


def _iou_wiped(a_in, a_out, b_out):
    wa = (a_out[..., :3] != a_in[..., :3]).any(-1)
    wb = (b_out[..., :3] != a_in[..., :3]).any(-1)
    union = (wa | wb).sum()
    if union == 0:
        return 1.0
    return (wa & wb).sum() / union


def _text_page(h=96, w=128):
    """Bar-'letters' of consistent stroke width on white + gray shading."""
    g = np.full((h, w), 255, np.uint8)
    for x0 in (20, 40, 60, 80):
        g[25:75, x0 : x0 + 6] = 0  # vertical strokes, width 6, height 50
    g[80:92, 8:40] = 210  # light shading the letter filters must ignore
    return np.stack([g, g, g, np.full_like(g, 255)], axis=-1)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_swt_vs_oracle(mode):
    """SWT letter masks pinned against pf_oracle_swt (ref: swt.c, the
    reference's largest kernel — SURVEY.md §2.2) for all 3 output modes."""
    from libpillowfight_tpu.ops.swt import swt

    page = _text_page()
    want = oracle.swt(page, mode)
    got = np.asarray(swt(jnp.asarray(page), mode))
    if mode == 2:
        # per-letter red boxes: 1-px localization tolerance both ways plus
        # a <=2% stray allowance (quantized digital rays can grow a
        # component's bbox by one pixel vs the oracle's continuous rays)
        import scipy.ndimage

        wr = (want[..., 0] == 255) & (want[..., 1] == 0) & (want[..., 2] == 0)
        gr = (got[..., 0] == 255) & (got[..., 1] == 0) & (got[..., 2] == 0)
        assert wr.sum() > 0 and gr.sum() > 0
        dil = np.ones((3, 3), bool)
        stray_got = (gr & ~scipy.ndimage.binary_dilation(wr, dil)).sum()
        stray_want = (wr & ~scipy.ndimage.binary_dilation(gr, dil)).sum()
        assert stray_got <= 0.02 * gr.sum(), (stray_got, gr.sum())
        assert stray_want <= 0.02 * wr.sum(), (stray_want, wr.sum())
    else:
        wm = (want[..., :3] != 255).any(-1)
        gm = (got[..., :3] != 255).any(-1)
        union = (wm | gm).sum()
        iou = (wm & gm).sum() / max(union, 1)
        assert wm.sum() > 0, "oracle found no text on the text page"
        assert iou >= 0.99, f"swt mode {mode} letter-mask IoU {iou:.4f}"
        if mode == 1:
            # gray values must agree exactly where both sides agree the
            # pixel is a letter (disagreement pixels are covered by IoU)
            both = wm & gm
            d = np.abs(got[..., :3].astype(int) - want[..., :3].astype(int))
            assert d[both].max() <= 1


@pytest.mark.parametrize("name,tpu_fn", [
    ("blackfilter", unpaper.unpaper_blackfilter),
    ("noisefilter", unpaper.unpaper_noisefilter),
    ("blurfilter", unpaper.unpaper_blurfilter),
    ("grayfilter", unpaper.unpaper_grayfilter),
    ("border", unpaper.unpaper_border),
    ("masks", unpaper.unpaper_masks),
])
def test_unpaper_vs_oracle(rng, name, tpu_fn):
    page = _scanlike(rng, h=220, w=260)
    want = getattr(oracle, name)(page)
    got = np.asarray(tpu_fn(jnp.asarray(page)))
    iou = _iou_wiped(page, got, want)
    assert iou >= 0.99, f"{name} wiped-region IoU {iou:.4f}"
    n, _ = bitmap.compare(jnp.asarray(got)[None], jnp.asarray(want)[None])
    frac = int(n[0]) / (page.shape[0] * page.shape[1])
    assert frac < 0.01, f"{name} pixel mismatch fraction {frac:.4%}"
