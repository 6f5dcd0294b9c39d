"""Pallas flood kernel vs scipy ground truth (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from libpillowfight_tpu.ops.pallas.flood_kernel import flood_reach_pallas

STRUCT8 = np.ones((3, 3), bool)


def _truth(seeds, mask):
    labels, _ = scipy.ndimage.label(mask, structure=STRUCT8)
    ids = set(labels[seeds & mask]) - {0}
    return np.isin(labels, list(ids)) if ids else np.zeros_like(mask)


def test_flood_pallas_random(rng):
    mask = rng.random((2, 96, 200)) < 0.4
    seeds = np.zeros_like(mask)
    seeds[:, 10, 10] = seeds[:, 50, 150] = True
    got = np.asarray(flood_reach_pallas(
        jnp.asarray(seeds), jnp.asarray(mask), interpret=True))
    for b in range(2):
        np.testing.assert_array_equal(got[b], _truth(seeds[b], mask[b]))


def test_flood_pallas_cross_band_column(rng):
    """A thin vertical run crossing multiple row bands (worst case for
    band-local propagation)."""
    h, w = 300, 140
    mask = np.zeros((1, h, w), bool)
    mask[0, :, 70] = True            # full-height 1px column
    mask[0, 5, 70:100] = True        # hook at top
    seeds = np.zeros_like(mask)
    seeds[0, 5, 99] = True
    got = np.asarray(flood_reach_pallas(
        jnp.asarray(seeds), jnp.asarray(mask), interpret=True))
    np.testing.assert_array_equal(got[0], _truth(seeds[0], mask[0]))


def test_flood_pallas_spiral():
    h = w = 96
    mask = np.zeros((1, h, w), bool)
    mask[0, 0, :] = True
    mask[0, :, -1] = True
    mask[0, -1, :] = True
    mask[0, 2:, 0] = True
    mask[0, 2, 2 : w - 2] = True
    seeds = np.zeros_like(mask)
    seeds[0, 0, 0] = True
    got = np.asarray(flood_reach_pallas(
        jnp.asarray(seeds), jnp.asarray(mask), interpret=True))
    np.testing.assert_array_equal(got[0], _truth(seeds[0], mask[0]))


def test_flood_pallas_wrap_no_bridge():
    """Row prefix and suffix both masked but disconnected — roll
    wrap-around must not bridge them."""
    mask = np.zeros((1, 64, 256), bool)
    mask[0, 30, :20] = True
    mask[0, 30, -20:] = True
    seeds = np.zeros_like(mask)
    seeds[0, 30, 250] = True
    got = np.asarray(flood_reach_pallas(
        jnp.asarray(seeds), jnp.asarray(mask), interpret=True))
    assert got[0, 30, -20:].all()
    assert not got[0, 30, :20].any()


def test_label_components_pallas(rng):
    from libpillowfight_tpu.ops.pallas.flood_kernel import (
        label_components_pallas,
    )

    mask = rng.random((2, 80, 150)) < 0.4
    got = np.asarray(label_components_pallas(jnp.asarray(mask), interpret=True))
    for b in range(2):
        want_labels, n = scipy.ndimage.label(mask[b], structure=STRUCT8)
        assert np.all((got[b] < mask[b].size) == mask[b])
        reps = []
        for i in range(1, n + 1):
            vals = set(got[b][want_labels == i].tolist())
            assert len(vals) == 1
            reps.append(vals.pop())
        assert len(set(reps)) == n


def test_flood_pallas_leap(rng):
    """Pallas band kernel honors the gap-leap radius, including leaps
    across band boundaries (sublane halo rows)."""
    h, w = 300, 140
    mask = np.zeros((1, h, w), bool)
    mask[0, 10:20, 10:60] = True
    mask[0, 32:40, 10:60] = True    # 12-row gap, leapt
    mask[0, 150:160, 10:60] = True  # far region, NOT leapt
    mask[0, 34:36, 100:130] = True  # dx gap 40 from col 60: > 20, not leapt
    seeds = np.zeros_like(mask)
    seeds[0, 15, 15] = True
    got = np.asarray(flood_reach_pallas(
        jnp.asarray(seeds), jnp.asarray(mask), leap=20, interpret=True))
    assert got[0, 10:20, 10:60].all()
    assert got[0, 32:40, 10:60].all()
    assert not got[0, 150:160, 10:60].any()
    assert not got[0, 34:36, 100:130].any()
    assert not got[0][~mask[0]].any()
