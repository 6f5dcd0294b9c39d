"""SWT: structural tests on synthetic text-like strokes."""

import jax.numpy as jnp
import numpy as np

from libpillowfight_tpu.ops.swt import swt
from libpillowfight_tpu.core import constants as C


def _rgba(gray2d):
    g = np.asarray(gray2d, np.uint8)
    return np.stack([g, g, g, np.full_like(g, 255)], axis=-1)


def _text_page(h=96, w=128):
    """Dark bar-'letters' of consistent stroke width on white."""
    g = np.full((h, w), 255, np.uint8)
    for x0 in (20, 40, 60, 80):
        g[25:75, x0 : x0 + 6] = 0  # vertical strokes, width 6, height 50
    return g


def test_swt_finds_strokes_bw():
    page = _rgba(_text_page())
    out = np.asarray(swt(jnp.asarray(page), C.SWT_OUTPUT_BW_TEXT))
    assert out.shape == page.shape
    black = out[..., 0] == 0
    # stroke cores detected as text
    hits = sum(black[50, x0 + 3] for x0 in (20, 40, 60, 80))
    assert hits >= 3
    # background white
    assert not black[5:15, 5:15].any()


def test_swt_blank_page_no_text():
    page = _rgba(np.full((64, 64), 255))
    out = np.asarray(swt(jnp.asarray(page), C.SWT_OUTPUT_BW_TEXT))
    assert np.all(out[..., 0] == 255)


def test_swt_grayscale_and_boxes_modes():
    page = _rgba(_text_page())
    gs = np.asarray(swt(jnp.asarray(page), C.SWT_OUTPUT_GRAYSCALE_TEXT))
    assert gs.shape == page.shape
    # non-text is white; text keeps (dark) gray values
    assert gs[..., 0].min() < 60 and (gs[..., 0] == 255).mean() > 0.5

    boxes = np.asarray(swt(jnp.asarray(page), C.SWT_OUTPUT_ORIGINAL_BOXES))
    assert boxes.shape == page.shape
    # red box pixels exist (r=255, g=0)
    assert ((boxes[..., 0] == 255) & (boxes[..., 1] == 0)).any()


def test_swt_rejects_huge_blob():
    """A giant solid blob is not letter-like (fails diameter/stroke test)."""
    g = np.full((128, 128), 255, np.uint8)
    g[10:118, 10:118] = 0
    out = np.asarray(swt(jnp.asarray(_rgba(g)), C.SWT_OUTPUT_BW_TEXT))
    assert (out[..., 0] == 0).mean() < 0.05
