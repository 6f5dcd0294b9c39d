"""Morphology engine (flood fill / connected components) vs scipy.ndimage."""

import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from libpillowfight_tpu.ops import morph

STRUCT8 = np.ones((3, 3), bool)
STRUCT4 = scipy.ndimage.generate_binary_structure(2, 1)


def _random_blobs(rng, h=48, w=64, p=0.35):
    return rng.random((h, w)) < p


def test_flood_reach_matches_scipy(rng):
    mask = _random_blobs(rng)
    seeds = np.zeros_like(mask)
    seeds[10, 10] = seeds[30, 40] = True
    seeds &= mask
    for conn, struct in ((8, STRUCT8), (4, STRUCT4)):
        got = np.asarray(
            morph.flood_reach(jnp.asarray(seeds)[None], jnp.asarray(mask)[None],
                              connectivity=conn)[0]
        )
        labels, _ = scipy.ndimage.label(mask, structure=struct)
        seed_labels = set(labels[seeds]) - {0}
        want = np.isin(labels, list(seed_labels)) if seed_labels else np.zeros_like(mask)
        np.testing.assert_array_equal(got, want)


def test_flood_reach_spiral():
    """A winding spiral path — worst case for round-count convergence."""
    h = w = 33
    mask = np.zeros((h, w), bool)
    # build a rectangular spiral
    y, x = 0, 0
    mask[0, :] = True
    mask[:, -1] = True
    mask[-1, :] = True
    mask[2:, 0] = True
    mask[2, 2 : w - 2] = True
    mask[2 : h - 2, w - 3] = True
    mask[h - 3, 2 : w - 2] = True
    seeds = np.zeros_like(mask)
    seeds[0, 0] = True
    got = np.asarray(
        morph.flood_reach(jnp.asarray(seeds)[None], jnp.asarray(mask)[None])[0]
    )
    labels, _ = scipy.ndimage.label(mask, structure=STRUCT8)
    want = labels == labels[0, 0]
    np.testing.assert_array_equal(got, want)


def test_label_components_matches_scipy(rng):
    mask = _random_blobs(rng, p=0.4)
    for conn, struct in ((8, STRUCT8), (4, STRUCT4)):
        got = np.asarray(
            morph.label_components(jnp.asarray(mask)[None], connectivity=conn)[0]
        )
        want_labels, n = scipy.ndimage.label(mask, structure=struct)
        # same partition: for every scipy component, all our labels equal
        assert np.all((got < mask.size) == mask)
        for i in range(1, n + 1):
            vals = got[want_labels == i]
            assert len(set(vals.tolist())) == 1
        # distinct scipy components get distinct labels
        reps = [got[want_labels == i].flat[0] for i in range(1, n + 1)]
        assert len(set(reps)) == n


def test_label_components_links_rows():
    """Pairwise-connectivity CC: two horizontal runs joined by one link."""
    valid = np.ones((1, 3, 8), bool)
    links = {
        (0, 1): np.zeros((1, 3, 8), bool),
        (1, 0): np.zeros((1, 3, 8), bool),
        (1, 1): np.zeros((1, 3, 8), bool),
        (1, -1): np.zeros((1, 3, 8), bool),
    }
    links[(0, 1)][0, 0, 0:3] = True   # row0: 0-1-2-3 connected
    links[(0, 1)][0, 2, 4:6] = True   # row2: 4-5-6 connected
    links[(1, 0)][0, 0, 2] = False
    got = np.asarray(
        morph.label_components_links(
            jnp.asarray(valid), {k: jnp.asarray(v) for k, v in links.items()}
        )[0]
    )
    assert len(set(got[0, 0:4].tolist())) == 1
    assert len(set(got[2, 4:7].tolist())) == 1
    assert got[0, 0] != got[2, 4]
    # now join them with a diagonal link chain via (1,0) at column 3
    links[(1, 0)][0, 0, 3] = True
    links[(1, 0)][0, 1, 3] = True
    links[(0, 1)][0, 2, 3] = True
    got = np.asarray(
        morph.label_components_links(
            jnp.asarray(valid), {k: jnp.asarray(v) for k, v in links.items()}
        )[0]
    )
    assert got[0, 0] == got[2, 4]


def test_small_cluster_mask_matches_scipy(rng):
    """Bit-parallel bounded ball size vs exact scipy component sizes."""
    for trial in range(4):
        mask = rng.random((40, 56)) < (0.15 + 0.15 * trial)
        labels, n = scipy.ndimage.label(mask, structure=STRUCT8)
        sizes = np.bincount(labels.ravel(), minlength=n + 1)
        for k in (1, 2, 4, 6):
            got = np.asarray(
                morph.small_cluster_mask(jnp.asarray(mask)[None], k)[0]
            )
            want = mask & (sizes[labels] <= k)
            np.testing.assert_array_equal(got, want, err_msg=f"k={k} t={trial}")


def test_small_cluster_mask_large_k(rng):
    """k >= 15 exercises multi-word bitboard shifts (shift amounts 2k+2
    exceed one 32-bit word; regression test for the single-word-carry
    _bit_shift)."""
    mask = rng.random((48, 64)) < 0.12
    labels, n = scipy.ndimage.label(mask, structure=STRUCT8)
    sizes = np.bincount(labels.ravel(), minlength=n + 1)
    for k in (15, 16, 20):
        got = np.asarray(morph.small_cluster_mask(jnp.asarray(mask)[None], k)[0])
        want = mask & (sizes[labels] <= k)
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_small_cluster_mask_exact_boundary():
    """Clusters of exactly k and k+1 pixels straddle the threshold."""
    mask = np.zeros((16, 32), bool)
    mask[2, 2:6] = True          # 4-pixel line
    mask[8, 2:7] = True          # 5-pixel line
    mask[2, 20] = True           # singleton
    mask[10:12, 20:22] = True    # 2x2 square (4 px, diagonal-connected)
    got = np.asarray(morph.small_cluster_mask(jnp.asarray(mask)[None], 4)[0])
    want = mask.copy()
    want[8, 2:7] = False         # the only cluster with > 4 pixels survives
    np.testing.assert_array_equal(got, ~np.logical_xor(got, want) & got)
    np.testing.assert_array_equal(got, want)


def test_flood_reach_leap():
    """Gap-leap connectivity: mask pixels within Chebyshev distance
    `leap` are connected; wider gaps are not (unpaper blackfilter
    intensity semantics). Gap pixels are never filled."""
    h, w = 60, 200
    mask = np.zeros((h, w), bool)
    mask[20:30, 10:60] = True     # region A (seeded)
    mask[20:30, 75:110] = True    # region B: 15px gap  (<= leap 20)
    mask[20:30, 140:180] = True   # region C: 30px gap from B (> leap 20)
    seeds = np.zeros_like(mask)
    seeds[25, 15] = True
    got = np.asarray(
        morph.flood_reach(jnp.asarray(seeds)[None], jnp.asarray(mask)[None],
                          connectivity=8, leap=20)[0])
    assert got[20:30, 10:60].all()
    assert got[20:30, 75:110].all(), "15px gap should be leapt (leap=20)"
    assert not got[20:30, 140:180].any(), "30px gap must NOT be leapt"
    assert not got[~mask].any(), "gap pixels must never be filled"


def test_flood_reach_leap_diagonal_and_rows():
    """Leap works across rows (sublane axis) and diagonally."""
    h, w = 120, 80
    mask = np.zeros((h, w), bool)
    mask[10:20, 10:50] = True
    mask[32:40, 10:50] = True     # 12 rows below (<= 20)
    mask[55:60, 60:70] = True     # diagonal: dy=15, dx=10 -> cheb 15
    seeds = np.zeros_like(mask)
    seeds[15, 15] = True
    got = np.asarray(
        morph.flood_reach(jnp.asarray(seeds)[None], jnp.asarray(mask)[None],
                          connectivity=8, leap=20)[0])
    assert got[32:40, 10:50].all()
    assert got[55:60, 60:70].all()


def test_line_counts_pallas_interpret(rng):
    """Single-read row+col count kernel vs numpy (interpret mode; the
    on-chip lane runs it compiled via the masks/border parity tests)."""
    from libpillowfight_tpu.ops.pallas.linecount_kernel import line_counts_pallas

    mask = jnp.asarray(rng.random((2, 203, 317)) < 0.3)
    rows, cols = line_counts_pallas(mask, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(rows), np.asarray(mask).sum(2).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(cols), np.asarray(mask).sum(1).astype(np.float32))
