"""Min/max decimation vs the reference's reduceat semantics."""

import numpy as np
import pytest

from audian_tpu.ops import (
    minmax_decimate,
    minmax_interleaved,
    minmax_pyramid,
    pyramid_levels,
)
from audian_tpu.ops.minmax import reduceat_like


@pytest.mark.parametrize("n,step", [(1000, 10), (1001, 10), (999, 7),
                                    (64, 64), (65, 64), (5, 100)])
def test_interleaved_matches_reduceat(rng, n, step):
    x = rng.standard_normal(n)
    got = np.asarray(minmax_interleaved(x, step))
    want = reduceat_like(x, step)
    np.testing.assert_array_equal(got, want)


def test_multichannel(rng):
    x = rng.standard_normal((1234, 3))
    got = np.asarray(minmax_interleaved(x, 17))
    want = reduceat_like(x, 17)
    np.testing.assert_array_equal(got, want)


def test_step_one_identity(rng):
    x = rng.standard_normal(100)
    mins, maxs = minmax_decimate(x, 1)
    np.testing.assert_array_equal(np.asarray(mins), x)
    np.testing.assert_array_equal(np.asarray(maxs), x)


def test_pyramid_levels_exact(rng):
    """Each pyramid level equals direct decimation at its step (when the
    level's segment count divides evenly)."""
    x = rng.standard_normal(4096)
    pyr = minmax_pyramid(x, 8)
    assert len(pyr) == pyramid_levels(4096, 8)
    for k, (mins, maxs) in enumerate(pyr):
        step = 8 * (2 ** k)
        dmin, dmax = minmax_decimate(x, step)
        np.testing.assert_array_equal(np.asarray(mins), np.asarray(dmin))
        np.testing.assert_array_equal(np.asarray(maxs), np.asarray(dmax))


def test_pyramid_ragged(rng):
    x = rng.standard_normal(1000)
    pyr = minmax_pyramid(x, 7)
    mins0, maxs0 = pyr[0]
    assert mins0.shape[0] == -(-1000 // 7)
    # every level preserves the global extrema
    for mins, maxs in pyr:
        np.testing.assert_allclose(np.asarray(mins).min(), x.min())
        np.testing.assert_allclose(np.asarray(maxs).max(), x.max())
