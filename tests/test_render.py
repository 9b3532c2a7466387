"""Render tiles vs the reference's decimation semantics."""

import numpy as np
import pytest

from audian_tpu.view.render import TraceTiler, SpecTiler, pick_amplitude
from audian_tpu.ops.minmax import reduceat_like


class FakeTrace:
    """Minimal trace: whole buffer resident at offset 0."""

    def __init__(self, x, rate):
        self.buffer = x.astype(np.float32)
        self.rate = rate
        self.frames = len(x)
        self.offset = 0
        self.channels = x.shape[1]

    def __getitem__(self, key):
        return self.buffer[key]


@pytest.fixture(scope="module")
def trace(rng):
    x = rng.standard_normal((100000, 2))
    return FakeTrace(x, 1000.0)


def test_tile_minmax_matches_reduceat(trace):
    tiler = TraceTiler(max_pixels=100)
    times, values = tiler.tile(trace, 0.0, 99.0)
    # step is bucketed to a power of two >= (frames//max_pixels)
    n = len(values) // 2
    step = int(round((times[1] - times[0]) * 2 * trace.rate))
    assert step & (step - 1) == 0 and step >= 99000 // 100
    want = reduceat_like(trace.buffer[: n * step], step)
    # default tiles cross the link as scale-packed int16: one part in
    # 32767 of the per-channel tile range, invisible at screen scale
    tol = np.abs(want).max() / 32000
    np.testing.assert_allclose(values, want[: 2 * n], atol=tol)
    # interleaving: even rows are minima
    assert np.all(values[0::2] <= values[1::2])
    # the bit-exact path is still available
    exact = TraceTiler(max_pixels=100, quantize=False)
    _, v2 = exact.tile(trace, 0.0, 99.0)
    np.testing.assert_array_equal(v2, want[: 2 * (len(v2) // 2)])


def test_tile_full_resolution(trace):
    tiler = TraceTiler(max_pixels=4000)
    times, values = tiler.tile(trace, 0.0, 0.5)  # 500 frames < max_pixels
    assert len(times) == len(values) == 501
    tol = np.abs(trace.buffer[:501]).max() / 32000
    np.testing.assert_allclose(values, trace.buffer[:501], atol=tol)
    np.testing.assert_allclose(times, np.arange(501) / trace.rate)


def test_tile_respects_window(trace):
    """Tiles clamp to the loaded buffer window."""
    t = FakeTrace(trace.buffer[10000:20000], trace.rate)
    t.offset = 10000
    t.frames = 100000
    tiler = TraceTiler(max_pixels=50)
    times, values = tiler.tile(t, 0.0, 99.0)
    assert times[0] >= 10000 / trace.rate - 1e-9
    assert times[-1] <= 20000 / trace.rate + 1e-9


def test_tile_channel_select(trace):
    tiler = TraceTiler(max_pixels=100)
    _, v_all = tiler.tile(trace, 0.0, 50.0)
    _, v1 = tiler.tile(trace, 0.0, 50.0, channel=1)
    np.testing.assert_array_equal(v1, v_all[:, 1])


def test_pick_amplitude_extremum(trace):
    # within a decimated block, picks the extremum nearest in amplitude
    tt, aa = pick_amplitude(trace, 1.0, 10.0, t1=1.1)
    block = trace.buffer[1000:1100, 0]
    assert aa == pytest.approx(block.max())
    tt, aa = pick_amplitude(trace, 1.0, -10.0, t1=1.1)
    assert aa == pytest.approx(block.min())
    # full resolution: exact sample
    tt, aa = pick_amplitude(trace, 2.0, 0.0)
    assert aa == pytest.approx(trace.buffer[2000, 0])


def test_spec_tile_normalization():
    class SpecTrace(FakeTrace):
        pass

    power = np.abs(np.random.default_rng(0).standard_normal((64, 2, 33))) + 1e-6
    t = SpecTrace(power.reshape(64, -1), 10.0)
    t.buffer = power.astype(np.float32)
    tiler = SpecTiler()
    img, rect = tiler.tile(t, channel=0, zmin=-40.0, zmax=0.0)
    assert img.shape == (64, 33)
    assert img.min() >= 0.0 and img.max() <= 1.0
    img8, _ = tiler.tile(t, channel=0, zmin=-40.0, zmax=0.0, quantize=True)
    assert img8.dtype == np.uint8
    assert rect[0] == 0.0 and rect[2] == pytest.approx(6.4)


# -- device reductions for the power side plot / auto levels ------------------


def test_noise_level_stats_matches_host(rng):
    import jax.numpy as jnp
    from audian_tpu.view.render import noise_level_stats

    buf = (rng.random((700, 3, 64)).astype(np.float32) ** 4) * 1e-4
    nf = max(buf.shape[2] // 16, 1)
    got = np.asarray(noise_level_stats(jnp.asarray(buf), nf))
    assert got.shape == (3, 2)
    for c in range(3):
        db_tail = 10 * np.log10(np.maximum(buf[:, c, -nf:], 1e-20))
        db_all = 10 * np.log10(np.maximum(buf[:, c, :], 1e-20))
        assert got[c, 0] == pytest.approx(np.percentile(db_tail, 95),
                                          abs=1e-4)
        assert got[c, 1] == pytest.approx(np.max(db_all), abs=1e-5)


def test_mean_power_db_slice_matches_host(rng):
    import jax.numpy as jnp
    from audian_tpu.view.render import mean_power_db_slice

    buf = (rng.random((600, 2, 33)).astype(np.float32) ** 2) * 1e-3
    i0, i1 = 150, 411
    width = i1 - i0
    wb = 1 << (width - 1).bit_length()
    start = max(min(i0, len(buf) - wb), 0)
    got = np.asarray(mean_power_db_slice(jnp.asarray(buf), start, 1,
                                         i0 - start, width, wb))
    ref = 10 * np.log10(np.maximum(buf[i0:i1, 1, :].mean(axis=0), 1e-20))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_trace_tiler_cache_reuses_window(trace):
    tiler = TraceTiler(max_pixels=100)
    t1, v1 = tiler.tile(trace, 0.0, 50.0, channel=0)
    assert len(tiler._cache) == 1
    t2, v2 = tiler.tile(trace, 0.0, 50.0, channel=1)
    assert len(tiler._cache) == 1  # second channel reuses the pulled tile
    entry = next(iter(tiler._cache.values()))
    assert entry["buf"]() is trace.buffer  # held weakly (no device pinning)
    # a new window object invalidates the entry
    trace.buffer = trace.buffer.copy()
    t3, v3 = tiler.tile(trace, 0.0, 50.0, channel=0)
    np.testing.assert_array_equal(v1, v3)


def test_spec_tile_batched_matches_single():
    power = (np.abs(np.random.default_rng(1).standard_normal((128, 3, 33)))
             + 1e-6).astype(np.float32)
    t = FakeTrace(power.reshape(128, -1), 10.0)
    t.buffer = power
    tiler = SpecTiler()
    levels = np.array([(-40.0, 0.0), (-35.0, 5.0), (-30.0, -5.0)],
                      np.float32)
    for c in range(3):
        single, rect1 = tiler.tile(t, channel=c, zmin=levels[c, 0],
                                   zmax=levels[c, 1])
        batched, rect2 = tiler.tile(t, channel=c, zmin=levels[c, 0],
                                    zmax=levels[c, 1], levels=levels)
        np.testing.assert_allclose(batched, single, atol=1e-6)
        assert rect1 == rect2
    assert len(tiler._cache) == 1  # all three channels shared one pull
    q, _ = tiler.tile(t, channel=0, zmin=-40.0, zmax=0.0, levels=levels,
                      quantize=True)
    assert q.dtype == np.uint8


def test_trace_tiler_no_cross_trace_thrash(rng):
    """Two traces with identical geometry (filtered + envelope windows)
    must coexist in the cache instead of evicting each other."""
    a = FakeTrace(rng.standard_normal((100000, 2)), 1000.0)
    b = FakeTrace(rng.standard_normal((100000, 2)), 1000.0)
    tiler = TraceTiler(max_pixels=100)
    for _ in range(3):
        t1, v1 = tiler.tile(a, 0.0, 50.0, channel=0)
        t2, v2 = tiler.tile(b, 0.0, 50.0, channel=0)
    assert len(tiler._cache) == 2
    # and the cached tiles stay distinct and correct
    np.testing.assert_array_equal(v1, tiler.tile(a, 0.0, 50.0, 0)[1])
    np.testing.assert_array_equal(v2, tiler.tile(b, 0.0, 50.0, 0)[1])
    assert not np.array_equal(v1, v2)


def test_window_extrema_matches_numpy(trace):
    from audian_tpu.view.render import window_extrema

    for (t0, t1) in ((0.0, 99.0), (10.0, 20.0), (33.3, 37.9)):
        for c in range(2):
            lo, hi = window_extrema(trace, t0, t1, c)
            i0, i1 = int(t0 * trace.rate), int(t1 * trace.rate)
            part = trace.buffer[i0:i1, c]
            assert lo == pytest.approx(float(part.min()))
            assert hi == pytest.approx(float(part.max()))
    # empty window
    assert window_extrema(trace, 5.0, 5.0, 0) == (0.0, 0.0)
