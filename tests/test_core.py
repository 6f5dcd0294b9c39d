"""Core data model tests (bitmap, normalize, compare)."""

import jax.numpy as jnp
import numpy as np

from libpillowfight_tpu.core import bitmap


def test_ensure_batched_roundtrip(page):
    b, unb = bitmap.ensure_batched(jnp.asarray(page))
    assert b.shape == (1,) + page.shape and unb
    back = bitmap.maybe_unbatch(b, unb)
    assert back.shape == page.shape


def test_rgba_gray_roundtrip(page):
    pages = jnp.asarray(page)[None]
    gray = bitmap.rgba_to_gray(pages)
    assert gray.shape == (1, 120, 160) and gray.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(gray[0]), page[..., :3].astype(np.float32).mean(-1), atol=1e-4
    )
    rgba = bitmap.gray_to_rgba(gray)
    assert rgba.dtype == jnp.uint8
    assert np.all(np.asarray(rgba[0, ..., 3]) == 255)


def test_normalize():
    m = jnp.asarray(np.array([[[1.0, 2.0], [3.0, 5.0]]], np.float32))
    out = np.asarray(bitmap.normalize(m))
    assert out.min() == 0.0 and out.max() == 255.0
    # flat page maps to 0, not NaN
    flat = bitmap.normalize(jnp.full((1, 4, 4), 7.0))
    assert np.all(np.isfinite(np.asarray(flat)))


def test_compare_identical_and_tolerance(page):
    a = jnp.asarray(page)[None]
    n, diff = bitmap.compare(a, a)
    assert int(n[0]) == 0
    assert np.all(np.asarray(diff)[..., :3] == 255)

    b = np.array(page)
    b[0, 0, 0] = b[0, 0, 0] ^ 0x04  # flip one pixel by 4
    n, _ = bitmap.compare(a, jnp.asarray(b)[None], tolerance=0)
    assert int(n[0]) == 1
    n, _ = bitmap.compare(a, jnp.asarray(b)[None], tolerance=4)
    assert int(n[0]) == 0


def test_pil_roundtrip(page):
    img = bitmap.to_pil(page)
    back = bitmap.from_pil(img)
    np.testing.assert_array_equal(back, page)


def test_write_ppm(tmp_path, page):
    p = tmp_path / "x.ppm"
    bitmap.write_ppm(str(p), page)
    data = p.read_bytes()
    assert data.startswith(b"P6\n160 120\n255\n")
    assert len(data) == len(b"P6\n160 120\n255\n") + 120 * 160 * 3
