"""Bit-packed whole-page flood kernel vs scipy ground truth (interpret
mode on CPU; the on-chip lane runs tests_tpu)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage

from libpillowfight_tpu.ops.pallas.flood_packed import (
    flood_reach_packed, pack_rows, unpack_rows)

STRUCT8 = np.ones((3, 3), bool)


def _truth(seeds, mask):
    labels, _ = scipy.ndimage.label(mask, structure=STRUCT8)
    ids = set(labels[seeds & mask]) - {0}
    return np.isin(labels, list(ids)) if ids else np.zeros_like(mask)


def _truth_leap(seeds, mask, leap):
    """Leap connectivity: mask pixels within Chebyshev distance `leap`
    are connected. Ground truth via dilation-based adjacency."""
    st = np.ones((2 * leap + 1, 2 * leap + 1), bool)
    reach = (seeds & mask).copy()
    while True:
        grown = scipy.ndimage.binary_dilation(reach, st) & mask
        if (grown == reach).all():
            return reach
        reach = grown


def test_pack_unpack_roundtrip(rng):
    x = rng.random((2, 70, 128)) < 0.5
    p = pack_rows(jnp.asarray(x))
    assert p.shape == (2, 3, 128) and p.dtype == jnp.uint32
    back = np.asarray(unpack_rows(p, 70))
    np.testing.assert_array_equal(back, x)


def test_flood_packed_random(rng):
    mask = rng.random((2, 96, 200)) < 0.4
    seeds = np.zeros_like(mask)
    seeds[:, 10, 10] = seeds[:, 50, 150] = True
    got = np.asarray(flood_reach_packed(
        jnp.asarray(seeds), jnp.asarray(mask), interpret=True))
    for b in range(2):
        np.testing.assert_array_equal(got[b], _truth(seeds[b], mask[b]))


def test_flood_packed_tall_column(rng):
    """Full-height 1px column: vertical propagation must cross every
    32-row word boundary in one round."""
    h, w = 300, 140
    mask = np.zeros((1, h, w), bool)
    mask[0, :, 70] = True
    mask[0, 5, 70:100] = True
    seeds = np.zeros_like(mask)
    seeds[0, 5, 99] = True
    got = np.asarray(flood_reach_packed(
        jnp.asarray(seeds), jnp.asarray(mask), interpret=True))
    np.testing.assert_array_equal(got[0], _truth(seeds[0], mask[0]))


def test_flood_packed_spiral():
    h = w = 96
    mask = np.zeros((1, h, w), bool)
    mask[0, 0, :] = True
    mask[0, :, -1] = True
    mask[0, -1, :] = True
    mask[0, 2:, 0] = True
    mask[0, 2, 2 : w - 2] = True
    seeds = np.zeros_like(mask)
    seeds[0, 0, 0] = True
    got = np.asarray(flood_reach_packed(
        jnp.asarray(seeds), jnp.asarray(mask), interpret=True))
    np.testing.assert_array_equal(got[0], _truth(seeds[0], mask[0]))


def test_flood_packed_wrap_no_bridge():
    """Row prefix and suffix both masked but disconnected — lane rolls
    must not bridge them; same for top/bottom rows vertically."""
    mask = np.zeros((1, 64, 256), bool)
    mask[0, 30, :50] = True
    mask[0, 30, 200:] = True
    mask[0, :10, 128] = True
    mask[0, 54:, 128] = True
    seeds = np.zeros_like(mask)
    seeds[0, 30, 5] = True
    seeds[0, 3, 128] = True
    got = np.asarray(flood_reach_packed(
        jnp.asarray(seeds), jnp.asarray(mask), interpret=True))
    np.testing.assert_array_equal(got[0], _truth(seeds[0], mask[0]))


@pytest.mark.parametrize("leap", [2, 5])
def test_flood_packed_leap(rng, leap):
    """Gap-leap connectivity (blackfilter intensity): dark runs separated
    by gaps <= leap flood as one region."""
    mask = np.zeros((1, 80, 160), bool)
    mask[0, 10:14, 5:40] = True
    mask[0, 10:14, 40 + leap : 90] = True      # gap of exactly `leap`
    mask[0, 14 + leap : 40, 60:64] = True      # vertical continuation
    mask[0, 70:75, 120:150] = True             # far island (unreachable)
    seeds = np.zeros_like(mask)
    seeds[0, 11, 6] = True
    got = np.asarray(flood_reach_packed(
        jnp.asarray(seeds), jnp.asarray(mask), leap=leap, interpret=True))
    np.testing.assert_array_equal(got[0], _truth_leap(seeds[0], mask[0], leap))


def test_flood_packed_no_seeds(rng):
    mask = rng.random((1, 40, 130)) < 0.5
    seeds = np.zeros_like(mask)
    got = np.asarray(flood_reach_packed(
        jnp.asarray(seeds), jnp.asarray(mask), interpret=True))
    assert not got.any()


def test_flood_packed_matches_xla_path(rng):
    """Cross-check vs the multigrid XLA fixed point on a scan-like page."""
    from libpillowfight_tpu.ops.morph import _flood_fixed_point

    h, w = 180, 220
    mask = np.zeros((2, h, w), bool)
    mask[:, :, :12] = True                      # black border
    mask[:, 100:104, 8:180] = True              # attached bar
    mask[0, 140:160, 140:160] = rng.random((20, 20)) < 0.6
    seeds = np.zeros_like(mask)
    seeds[:, 50, 3] = True
    got = np.asarray(flood_reach_packed(
        jnp.asarray(seeds), jnp.asarray(mask), leap=3, interpret=True))
    want = np.asarray(_flood_fixed_point(
        jnp.asarray(seeds), jnp.asarray(mask), 8, 4096, leap=3))
    np.testing.assert_array_equal(got, want)
