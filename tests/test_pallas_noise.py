"""Pallas noisefilter ball-count kernel vs scipy ground truth.

Runs in interpret mode on the CPU suite; the on-TPU lane (test_tpu.py)
executes the Mosaic-compiled kernel at page scale.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from scipy import ndimage

from libpillowfight_tpu.ops.pallas.noise_kernel import small_cluster_mask_pallas

_ST8 = np.ones((3, 3), bool)


def _ref(mask, k):
    lab, _ = ndimage.label(mask, structure=_ST8)
    sizes = np.bincount(lab.ravel())
    sizes[0] = 0
    return mask & (sizes[lab] <= k)


@pytest.mark.parametrize("k", [1, 2, 4, 5])
@pytest.mark.parametrize("density", [0.08, 0.35, 0.6])
def test_ball_count_matches_scipy(rng, k, density):
    mask = rng.random((2, 97, 143)) < density
    got = np.asarray(small_cluster_mask_pallas(jnp.asarray(mask), k,
                                               interpret=True))
    for b in range(2):
        np.testing.assert_array_equal(got[b], _ref(mask[b], k))


def test_ball_count_boundary_cases(rng):
    """Clusters of exactly k and k+1 pixels, including across band rows
    and at page edges."""
    k = 4
    h, w = 140, 96
    mask = np.zeros((1, h, w), bool)
    mask[0, 0, 0:4] = True            # 4 px at the corner -> wiped
    mask[0, 10, 10:15] = True         # 5 px line -> kept
    mask[0, 30:32, 30:32] = True      # 2x2 = 4 -> wiped
    mask[0, 60:63, 60:62] = True      # 3x2 = 6 -> kept
    mask[0, h - 1, w - 4 :] = True    # 4 px bottom-right edge -> wiped
    # diagonal chain of 5 (8-connected) -> kept
    for i in range(5):
        mask[0, 100 + i, 20 + i] = True
    got = np.asarray(small_cluster_mask_pallas(jnp.asarray(mask), k,
                                               interpret=True))
    np.testing.assert_array_equal(got[0], _ref(mask[0], k))
    assert got[0, 0, 0] and got[0, 30, 30] and got[0, h - 1, w - 1]
    assert not got[0, 10, 10] and not got[0, 60, 60] and not got[0, 102, 22]


def test_xla_pallas_agree_via_morph(rng):
    """morph.small_cluster_mask (XLA path on CPU) agrees with the kernel."""
    from libpillowfight_tpu.ops.morph import small_cluster_mask

    mask = rng.random((2, 64, 80)) < 0.3
    xla = np.asarray(small_cluster_mask(jnp.asarray(mask), 4))
    pal = np.asarray(small_cluster_mask_pallas(jnp.asarray(mask), 4,
                                               interpret=True))
    np.testing.assert_array_equal(xla, pal)
