"""Canny edge detector: structural tests on synthetic shapes."""

import jax.numpy as jnp
import numpy as np

from libpillowfight_tpu.ops.canny import canny


def _rgba(gray2d):
    g = np.asarray(gray2d, np.uint8)
    return np.stack([g, g, g, np.full_like(g, 255)], axis=-1)


def test_canny_blank_page():
    # zero padding (reference conv contract) creates gradients at the page
    # border; the interior of a flat page must be edge-free
    out = np.asarray(canny(jnp.asarray(_rgba(np.full((64, 64), 255)))))
    assert np.all(out[16:-16, 16:-16, 0] == 0)
    # and a truly zero page has no edges at all (no border gradient)
    out0 = np.asarray(canny(jnp.asarray(_rgba(np.zeros((64, 64))))))
    assert np.all(out0[..., 0] == 0)


def test_canny_rectangle_outline():
    g = np.full((64, 64), 255, np.uint8)
    g[20:44, 16:48] = 0  # black rectangle
    out = np.asarray(canny(jnp.asarray(_rgba(g))))
    edges = out[..., 0] > 0
    # edges exist near the rectangle boundary
    assert edges[20, 30] or edges[19, 30] or edges[21, 30]
    assert edges[32, 16] or edges[32, 15] or edges[32, 17]
    # rectangle interior (away from boundary) and far background are clean
    assert not edges[30:36, 28:38].any()
    assert not edges[2:8, 2:8].any()
    # edges are thin: NMS should keep boundary band narrow
    assert edges.sum() < 4 * (24 + 32) * 3


def test_canny_hysteresis_links_weak_edges():
    """A gradient-faded edge stays connected through its weak section."""
    g = np.full((48, 96), 255, np.float32)
    # vertical step edge whose contrast fades along y
    contrast = np.linspace(255, 100, 48)
    for y in range(48):
        g[y, 48:] = 255 - contrast[y]
    out = np.asarray(canny(jnp.asarray(_rgba(g.astype(np.uint8)))))
    edges = out[..., 0] > 0
    cols = edges[4:-4].any(axis=1)
    assert cols.all()  # edge present at every row despite fading contrast


def test_canny_batched(page):
    pages = jnp.asarray(np.stack([page, page]))
    out = np.asarray(canny(pages))
    assert out.shape == pages.shape
    np.testing.assert_array_equal(out[0], out[1])
