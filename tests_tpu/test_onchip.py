"""Mosaic-compiled kernels + the fused pipeline on the real chip.

Three classes of assertion:
  1. memory guards — the fused cleanup chain and each heavy filter must
     compile with a bounded temp footprint at the bench shape (A4 x 8);
     round-2's 16.26 GB RESOURCE_EXHAUSTED would fail here at compile
     time, before any execution.
  2. Mosaic-vs-ground-truth — the Pallas kernels (flood, CC labels,
     noise ball count) WITHOUT interpret=True, checked exactly against
     scipy at awkward (non-tile-aligned) page-scale shapes.
  3. backend parity — each filter's TPU output (Pallas default-on)
     equals the CPU/XLA reference path from the golden-tested suite:
     exact for the unpaper wipes and canny, <= 1 LSB for gaussian/sobel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scipy import ndimage

# one chip's usable HBM is 15.75 GB; leave room for 2 resident batches
TEMP_BUDGET_GB = 8.0

_ST8 = np.ones((3, 3), bool)


def _temp_gb(fn, *args):
    ma = jax.jit(fn).lower(*args).compile().memory_analysis()
    return ma.temp_size_in_bytes / 1e9


# ----------------------------------------------------------------- memory

def test_fused_chain_memory_budget(a4_batch8):
    from libpillowfight_tpu.parallel.pipeline import (
        DOCUMENT_CLEANUP, normalize_spec, run_pipeline,
    )

    spec = normalize_spec(DOCUMENT_CLEANUP)
    x = jnp.asarray(a4_batch8)
    gb = _temp_gb(lambda p: run_pipeline(p, spec), x)
    assert gb < TEMP_BUDGET_GB, f"fused chain temp {gb:.2f} GB at A4x8"


def test_per_filter_memory_budget(a4_batch8):
    from libpillowfight_tpu.parallel.pipeline import normalize_spec, run_pipeline

    x = jnp.asarray(a4_batch8)
    for f in ["unpaper_blackfilter", "unpaper_noisefilter", "unpaper_blurfilter",
              "unpaper_masks", "unpaper_grayfilter", "unpaper_border"]:
        spec = normalize_spec(((f, ()),))
        gb = _temp_gb(lambda p, s=spec: run_pipeline(p, s), x)
        assert gb < TEMP_BUDGET_GB, f"{f} temp {gb:.2f} GB at A4x8"


def test_canny_chunked_memory_budget(a4_batch8):
    """Config-2 shape: canny over 64 pages streams in chunks of 16."""
    from libpillowfight_tpu.ops.canny import canny
    from libpillowfight_tpu.parallel.batch import map_chunked

    x = jnp.asarray(np.repeat(a4_batch8, 8, axis=0))  # 64 pages
    gb = _temp_gb(lambda p: map_chunked(canny, p, 16), x)
    assert gb < 12.0, f"chunked canny temp {gb:.2f} GB at A4x64"


# ----------------------------------------------------------------- mosaic

def test_flood_reach_compiled_exact(rng):
    from libpillowfight_tpu.ops.pallas.flood_kernel import flood_reach_pallas

    mask = rng.random((2, 1217, 933)) < 0.55
    seeds = np.zeros_like(mask)
    seeds[:, 0, :] = mask[:, 0, :]
    got = np.asarray(flood_reach_pallas(jnp.asarray(seeds), jnp.asarray(mask)))
    for b in range(2):
        lab, _ = ndimage.label(mask[b], structure=_ST8)
        sl = np.unique(lab[seeds[b]])
        ref = np.isin(lab, sl[sl > 0])
        np.testing.assert_array_equal(got[b], ref)


def test_flood_packed_compiled_exact(rng):
    from libpillowfight_tpu.ops.pallas.flood_packed import flood_reach_packed

    mask = rng.random((2, 1217, 933)) < 0.55
    seeds = np.zeros_like(mask)
    seeds[:, 0, :] = mask[:, 0, :]
    got = np.asarray(flood_reach_packed(jnp.asarray(seeds), jnp.asarray(mask)))
    for b in range(2):
        lab, _ = ndimage.label(mask[b], structure=_ST8)
        sl = np.unique(lab[seeds[b]])
        ref = np.isin(lab, sl[sl > 0])
        np.testing.assert_array_equal(got[b], ref)


def test_flood_packed_leap_compiled(rng):
    """Gap-leap parity between the packed and band kernels at a
    blackfilter-like shape (the packed path is the production default)."""
    from libpillowfight_tpu.ops.pallas.flood_kernel import flood_reach_pallas
    from libpillowfight_tpu.ops.pallas.flood_packed import flood_reach_packed

    mask = rng.random((1, 1100, 800)) < 0.35
    mask[:, :, :30] = True
    seeds = np.zeros_like(mask)
    seeds[:, 500, 5] = True
    a = np.asarray(flood_reach_packed(
        jnp.asarray(seeds), jnp.asarray(mask), leap=20))
    b = np.asarray(flood_reach_pallas(
        jnp.asarray(seeds), jnp.asarray(mask), leap=20))
    np.testing.assert_array_equal(a, b)


def _spiral_mask(h, w, pitch=8, width=3):
    """Rectangular spiral corridor, one connected component with
    ~4*min(h,w)/(2*pitch) direction turns — the adversarial case for
    round-capped flood fixed points (each round completes O(1) turns).
    Each lap's left column stops `pitch` short of its own top bar and
    joins the NEXT lap's top bar (which extends back to the outer lef)."""
    m = np.zeros((h, w), bool)
    top, bot, lef, rig = 0, h - 1, 0, w - 1
    first = True
    while bot - top > 2 * pitch and rig - lef > 2 * pitch:
        tb_left = lef if first else lef - pitch
        m[top : top + width, tb_left : rig + 1] = True       # top bar
        m[top : bot + 1, rig - width + 1 : rig + 1] = True   # right col
        m[bot - width + 1 : bot + 1, lef : rig + 1] = True   # bottom bar
        m[top + pitch : bot + 1, lef : lef + width] = True   # left col
        first = False
        top += pitch
        bot -= pitch
        lef += pitch
        rig -= pitch
    return m


def test_flood_packed_winding_spiral_a4():
    """A4-scale spiral: ~600 turns >> the former 256-round cap. Guards
    the convergence-aware iteration (r4 VERDICT weak #1): the default
    call must reach the true fixed point regardless of winding depth."""
    from libpillowfight_tpu.ops.pallas.flood_packed import (
        flood_reach_packed, packed_fits)

    h, w = 3508, 2480
    assert packed_fits(h, w)
    mask = _spiral_mask(h, w)[None]
    seeds = np.zeros_like(mask)
    seeds[0, 0, 0] = True
    got = np.asarray(flood_reach_packed(jnp.asarray(seeds), jnp.asarray(mask)))
    lab, _ = ndimage.label(mask[0], structure=_ST8)
    ref = lab == lab[0, 0]
    # the spiral must really wind (one component covering ~everything),
    # otherwise this test has no adversarial depth
    assert ref.sum() > 0.95 * mask.sum()
    np.testing.assert_array_equal(got[0], ref)


def test_flood_default_path_winding_serpentine():
    """Serpentine corridor through morph.flood_reach (the production
    entry used by blackfilter/canny): H/pitch turns, plus a disconnected
    twin that must stay unflooded."""
    from libpillowfight_tpu.ops.morph import flood_reach

    h, w = 2048, 1400
    m = np.zeros((h, w), bool)
    for i, y in enumerate(range(0, h - 4, 6)):
        m[y : y + 2, 2 : w - 2] = True
        if y + 6 < h - 4:  # connector alternating sides
            xs = slice(2, 4) if i % 2 else slice(w - 4, w - 2)
            m[y : y + 8, xs] = True
    mask = np.stack([m, m])
    seeds = np.zeros_like(mask)
    seeds[0, 0, 3] = True  # page 0 seeded, page 1 not
    got = np.asarray(flood_reach(jnp.asarray(seeds), jnp.asarray(mask)))
    np.testing.assert_array_equal(got[0], mask[0])
    assert not got[1].any()


def test_labels_compiled_exact(rng):
    from libpillowfight_tpu.ops.pallas.flood_kernel import label_components_pallas

    mask = rng.random((1, 700, 1031)) < 0.5
    got = np.asarray(label_components_pallas(jnp.asarray(mask)))[0]
    lab, n = ndimage.label(mask[0], structure=_ST8)
    ours, ref = got[mask[0]], lab[mask[0]]
    pairs = set(zip(ours.tolist(), ref.tolist()))
    assert len(pairs) == len({a for a, _ in pairs}) == len({b for _, b in pairs})


def test_noise_ball_compiled_exact(rng):
    from libpillowfight_tpu.ops.pallas.noise_kernel import small_cluster_mask_pallas

    mask = rng.random((2, 1111, 517)) < 0.25
    got = np.asarray(small_cluster_mask_pallas(jnp.asarray(mask), 4))
    for b in range(2):
        lab, _ = ndimage.label(mask[b], structure=_ST8)
        sizes = np.bincount(lab.ravel())
        sizes[0] = 0
        np.testing.assert_array_equal(got[b], mask[b] & (sizes[lab] <= 4))


# ----------------------------------------------------------------- parity

def _cpu(fn, *args):
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        return np.asarray(fn(*jax.device_put(args, jax.local_devices(backend="cpu")[0])))


@pytest.mark.parametrize("name", [
    "unpaper_blackfilter", "unpaper_noisefilter", "unpaper_blurfilter",
    "unpaper_masks", "unpaper_grayfilter", "unpaper_border", "canny",
])
def test_filter_tpu_equals_cpu_reference(a4_page, name):
    """TPU (Pallas kernels on) == CPU (golden-tested XLA path), exactly.
    Wipes and canny produce uint8 planes with exact expected equality."""
    from libpillowfight_tpu.parallel.pipeline import _FILTERS

    fn = _FILTERS[name]
    x = np.asarray(a4_page)
    got = np.asarray(fn(jnp.asarray(x)))
    want = _cpu(fn, x)
    mismatch = int((got != want).sum())
    assert mismatch == 0, f"{name}: {mismatch} mismatched bytes at A4"


@pytest.mark.parametrize("name", ["gaussian", "sobel"])
def test_linear_filter_tpu_1lsb(a4_page, name):
    from libpillowfight_tpu.parallel.pipeline import _FILTERS

    fn = _FILTERS[name]
    x = np.asarray(a4_page)
    got = np.asarray(fn(jnp.asarray(x))).astype(np.int16)
    want = _cpu(fn, x).astype(np.int16)
    assert np.abs(got - want).max() <= 1


# ------------------------------------------------------------- execution

def test_fused_chain_executes_at_bench_shape(a4_batch8):
    """The exact bench configuration completes on chip and cleans the page."""
    from libpillowfight_tpu.parallel.pipeline import (
        DOCUMENT_CLEANUP, normalize_spec, run_pipeline,
    )

    spec = normalize_spec(DOCUMENT_CLEANUP)
    x = jnp.asarray(a4_batch8)
    out = jax.jit(lambda p: run_pipeline(p, spec))(x)
    arr = np.asarray(out)
    assert arr.shape == x.shape and arr.dtype == np.uint8
    # black scan border erased, page mostly white
    assert (arr[:, :, : arr.shape[2] // 40, :3] == 255).mean() > 0.99
    assert (arr[..., :3] == 255).mean() > 0.9


def test_pallas_inside_shard_map(a4_page):
    """Pallas kernels execute inside shard_map on a pages-only mesh (the
    multi-chip DP path runs them per-device; 1-device mesh on this chip
    proves the composition compiles + executes with Mosaic kernels on)."""
    from libpillowfight_tpu.parallel.mesh import make_mesh, map_sharded_pages
    from libpillowfight_tpu.parallel.pipeline import (
        DOCUMENT_CLEANUP, normalize_spec, run_pipeline,
    )

    spec = normalize_spec(DOCUMENT_CLEANUP)
    mesh = make_mesh(1, rows=1)
    x = jnp.asarray(a4_page)
    dp = jax.jit(map_sharded_pages(lambda p: run_pipeline(p, spec), mesh))
    got = np.asarray(dp(x))
    want = np.asarray(jax.jit(lambda p: run_pipeline(p, spec))(x))
    np.testing.assert_array_equal(got, want)


def _text_page_a4(h=3508, w=2480):
    """A4 grid of compact bar letters (SW 6, height 50 — passes the
    letter filters) + a gray shading block SWT must ignore."""
    g = np.full((h, w), 255, np.uint8)
    for y0 in range(120, h - 120, 110):
        for x0 in range(120, w - 120, 45):
            g[y0 : y0 + 50, x0 : x0 + 6] = 0
    g[h - 180 : h - 80, 40:400] = 215
    return np.stack([g, g, g, np.full_like(g, 255)], -1)


@pytest.mark.parametrize("mode", [0, 1])
def test_swt_a4_golden(mode):
    """SWT at full A4 on chip vs the C++ oracle (VERDICT r2 item 5: the
    compaction bounds — max_rays H*W//32, max_valid H*W//8 — and the
    17-point median gather had never run at A4)."""
    from libpillowfight_tpu.ops.swt import swt
    from libpillowfight_tpu.utils import oracle

    if not oracle.available():
        pytest.skip("oracle not built")
    page = _text_page_a4()
    want = oracle.swt(page, mode)
    got = np.asarray(swt(jnp.asarray(page), mode))
    wm = (want[..., :3] != 255).any(-1)
    gm = (got[..., :3] != 255).any(-1)
    iou = (wm & gm).sum() / max((wm | gm).sum(), 1)
    assert wm.sum() > 100_000, "oracle found no text at A4"
    assert iou >= 0.99, f"A4 swt mode {mode} IoU {iou:.4f}"


def test_swt_a4_boxes_golden_no_dropped_letters():
    """SWT_OUTPUT_ORIGINAL_BOXES at dense A4: ~1,500 bar letters exceed
    the former fixed max_letters=1024 cap (r4 VERDICT weak #4 — boxes
    silently dropped). The area-scaled default must hold every letter
    (debug counts prove zero truncation) and the red boxes must match
    the oracle's within 1-px localization."""
    from libpillowfight_tpu.ops.swt import swt
    from libpillowfight_tpu.utils import oracle

    if not oracle.available():
        pytest.skip("oracle not built")
    page = _text_page_a4()
    want = oracle.swt(page, 2)
    got, dbg = swt(jnp.asarray(page), 2, return_debug=True)
    got = np.asarray(got)
    assert int(dbg["n_letters"].max()) > 1024, "page not dense enough to test the cap"
    assert int(dbg["n_letters"].max()) <= dbg["max_letters"]
    assert int(dbg["n_anchors"].max()) > 0  # dense median: no cap to audit
    assert int(dbg["n_runs"].max()) <= dbg["max_runs"]
    wr = (want[..., 0] == 255) & (want[..., 1] == 0) & (want[..., 2] == 0)
    gr = (got[..., 0] == 255) & (got[..., 1] == 0) & (got[..., 2] == 0)
    assert wr.sum() > 0 and gr.sum() > 0
    dil = np.ones((3, 3), bool)
    stray_got = (gr & ~ndimage.binary_dilation(wr, dil)).sum()
    stray_want = (wr & ~ndimage.binary_dilation(gr, dil)).sum()
    assert stray_got <= 0.02 * gr.sum(), (stray_got, gr.sum())
    assert stray_want <= 0.02 * wr.sum(), (stray_want, wr.sum())


def test_batch_runner_jpeg_corpus_end_to_end(tmp_path):
    """The full production path on the real chip: JPEG corpus -> threaded
    PIL prefetch (ImagePageSource) -> BatchRunner (pipelined H2D/compute/
    D2H, resumable manifest) -> cleanup chain -> PPM sink. 24 pages in
    chunks of 8 with a resume after 'crash' at the halfway point."""
    from PIL import Image

    from libpillowfight_tpu.io import ImagePageSource, PpmSink, decode_pnm
    from libpillowfight_tpu.parallel import BatchRunner

    h, w = 512, 640
    paths = []
    for i in range(24):
        g = np.full((h, w), 245, np.uint8)
        g[:, : w // 20] = 0                      # black border
        for y in range(60, h - 60, 40):
            g[y : y + 3, 80 : w - 40] = 15       # text lines
        p = str(tmp_path / f"scan{i:03d}.jpg")
        Image.fromarray(g).convert("RGB").save(p, quality=90)
        paths.append(p)

    manifest = str(tmp_path / "m.jsonl")
    out_dir = str(tmp_path / "out")

    # first run: only the first half of the chunks (simulated interrupt)
    with ImagePageSource(paths, shape=(h, w)) as src:
        r1 = BatchRunner([("unpaper_blackfilter", ()), ("unpaper_border", ())],
                         chunk_size=8, manifest_path=manifest)
        half_seen = []
        sink = PpmSink(out_dir)

        def half_sink(idx, pages):
            if len(half_seen) >= 2:
                raise KeyboardInterrupt  # crash after 2 chunks delivered
            half_seen.append(idx)
            sink(idx, pages)

        try:
            r1.run(len(paths), src, half_sink)
        except KeyboardInterrupt:
            pass

    # resume: a fresh runner skips the manifest-recorded chunks
    with ImagePageSource(paths, shape=(h, w)) as src2:
        r2 = BatchRunner([("unpaper_blackfilter", ()), ("unpaper_border", ())],
                         chunk_size=8, manifest_path=manifest)
        m = r2.run(len(paths), src2, sink)
    assert m.pages + 16 == 24  # 2 chunks were already done
    assert src2.failed == 0

    # every page written, black border wiped
    import os as _os
    files = sorted(_os.listdir(out_dir))
    assert len(files) == 24
    page = decode_pnm(_os.path.join(out_dir, files[0]))
    assert (page[:, : w // 20, :3] == 255).mean() > 0.99
