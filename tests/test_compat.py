"""The `pillowfight` drop-in shim (ref: src/pillowfight/__init__.py —
SURVEY.md §1 L4): existing pypillowfight user code must run unmodified.
"""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")


def _pil(page):
    return PIL.fromarray(page, mode="RGBA")


def test_import_and_surface():
    import pillowfight

    # the reference's 13 public functions + 3 enums (SURVEY.md §2.3)
    for name in (
        "ace", "canny", "compare", "gaussian", "sobel", "swt",
        "unpaper_blackfilter", "unpaper_blurfilter", "unpaper_border",
        "unpaper_grayfilter", "unpaper_masks", "unpaper_noisefilter",
        "get_version",
    ):
        assert callable(getattr(pillowfight, name)), name
    assert pillowfight.SWT_OUTPUT_BW_TEXT == 0
    assert pillowfight.SWT_OUTPUT_GRAYSCALE_TEXT == 1
    assert pillowfight.SWT_OUTPUT_ORIGINAL_BOXES == 2
    assert isinstance(pillowfight.get_version(), str)


def test_pil_roundtrip_matches_compat(page):
    import pillowfight
    from libpillowfight_tpu import compat

    img = _pil(page)
    out = pillowfight.unpaper_border(img)
    assert out.mode == "RGBA" and out.size == img.size
    ref = compat.unpaper_border(img)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_ace_runs_on_pil(page):
    import pillowfight

    out = pillowfight.ace(_pil(page), samples=8)
    assert out.size == (page.shape[1], page.shape[0])


def test_compare_tuple_return(page):
    import pillowfight

    img = _pil(page)
    n, diff = pillowfight.compare(img, img)
    assert n == 0 and diff.size == img.size
