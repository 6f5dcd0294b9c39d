"""unpaper filter family: behavioral tests on synthetic scan defects."""

import jax.numpy as jnp
import numpy as np

from libpillowfight_tpu.ops import unpaper


def _rgba(gray2d):
    g = np.asarray(gray2d, np.uint8)
    return np.stack([g, g, g, np.full_like(g, 255)], axis=-1)


def test_blackfilter_erases_black_border():
    g = np.full((100, 140), 255, np.uint8)
    g[:, :25] = 0          # solid black scan border
    g[40:43, 60:90] = 10   # text stroke: must survive
    out = np.asarray(unpaper.unpaper_blackfilter(jnp.asarray(_rgba(g))))
    assert np.all(out[:, :25, 0] == 255)          # border wiped
    assert np.all(out[40:43, 60:90, 0] == 10)     # text untouched


def test_blackfilter_connected_region_wiped_entirely():
    g = np.full((100, 140), 255, np.uint8)
    g[:, :25] = 0
    g[50:52, 25:40] = 0    # thin dark tail connected to the border
    out = np.asarray(unpaper.unpaper_blackfilter(jnp.asarray(_rgba(g))))
    assert np.all(out[50:52, 25:40, 0] == 255)    # tail flooded too


def test_noisefilter_removes_specks_keeps_text():
    g = np.full((80, 80), 255, np.uint8)
    g[10, 10] = 0                    # 1-pixel speck
    g[30, 30] = g[30, 31] = 0        # 2-pixel speck
    g[50:53, 20:50] = 0              # 90-pixel text stroke
    out = np.asarray(unpaper.unpaper_noisefilter(jnp.asarray(_rgba(g))))
    assert out[10, 10, 0] == 255
    assert out[30, 30, 0] == 255 and out[30, 31, 0] == 255
    assert np.all(out[50:53, 20:50, 0] == 0)


def test_blurfilter_removes_isolated_smudge():
    g = np.full((300, 300), 255, np.uint8)
    # tiny smudge in the far corner block, > 2 grid steps (200px) away from
    # the content so every neighbor block of its containing block is clean
    g[250:253, 250:253] = 0
    g[20:80, 20:80] = 0              # dense content block: must survive
    out = np.asarray(unpaper.unpaper_blurfilter(jnp.asarray(_rgba(g))))
    assert np.all(out[250:253, 250:253, 0] == 255)
    assert np.all(out[20:80, 20:80, 0] == 0)


def test_grayfilter_wipes_shading_keeps_text():
    g = np.full((150, 150), 255, np.uint8)
    g[:50, :50] = 200                 # light gray shading, no black pixels
    g[100:103, 100:130] = 0           # black text
    out = np.asarray(unpaper.unpaper_grayfilter(jnp.asarray(_rgba(g))))
    assert np.all(out[:40, :40, 0] == 255)        # shading wiped
    assert np.all(out[100:103, 100:130, 0] == 0)  # text untouched


def test_border_wipes_edge_noise():
    g = np.full((200, 200), 255, np.uint8)
    g[10, 50:53] = 0                  # sparse speck (3 px <= threshold 5)
    g[90:110, 80:120] = 0             # central content (> threshold per strip)
    out = np.asarray(unpaper.unpaper_border(jnp.asarray(_rgba(g))))
    assert np.all(out[10, 50:53, 0] == 255)       # speck inside border wiped
    assert np.all(out[90:110, 80:120, 0] == 0)    # content untouched


def test_masks_wipes_outside_content():
    g = np.full((300, 300), 255, np.uint8)
    g[100:200:4, 100:200] = 0         # dense central content block
    g[20:22, 20:40] = 0               # stray mark far outside content
    out = np.asarray(unpaper.unpaper_masks(jnp.asarray(_rgba(g))))
    assert np.all(out[20:22, 20:40, 0] == 255)    # outside mask -> wiped
    assert np.all(out[100:200:4, 120:180, 0] == 0)  # content preserved


def test_all_filters_preserve_shape_dtype(page):
    pages = jnp.asarray(page)
    for fn in (
        unpaper.unpaper_blackfilter,
        unpaper.unpaper_blurfilter,
        unpaper.unpaper_border,
        unpaper.unpaper_grayfilter,
        unpaper.unpaper_masks,
        unpaper.unpaper_noisefilter,
    ):
        out = np.asarray(fn(pages))
        assert out.shape == page.shape and out.dtype == np.uint8
        assert np.all(out[..., 3] == 255)
