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


def test_pyramid_levels_match_fold_count():
    """pyramid_levels counts the levels minmax_pyramid actually builds —
    floor-halving undercounted (folds keep ceil(nseg/2) segments)."""
    import numpy as np
    from audian_tpu.ops.minmax import pyramid_levels, minmax_pyramid

    for n, step in ((80, 16), (1000, 7), (64, 64), (130, 4)):
        x = np.arange(n, dtype=np.float32)
        levels = pyramid_levels(n, step)
        pyr = minmax_pyramid(x, step)
        assert len(pyr) == levels, (n, step, len(pyr), levels)
        # coarsest level genuinely has < 2 segments after one more fold
        assert pyr[-1][0].shape[0] >= 1
        # folds are exact min-of-mins / max-of-maxs
        for k in range(1, len(pyr)):
            prev_min, prev_max = pyr[k - 1]
            cur_min, cur_max = pyr[k]
            for s in range(cur_min.shape[0]):
                seg_min = prev_min[2 * s : 2 * s + 2]
                seg_max = prev_max[2 * s : 2 * s + 2]
                assert float(cur_min[s]) == float(seg_min.min())
                assert float(cur_max[s]) == float(seg_max.max())
