"""Native C++ runtime vs the numpy reference implementations."""

import numpy as np
import pytest

from audian_tpu import native
from audian_tpu.data import wavio
from audian_tpu.ops.minmax import reduceat_like

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler)"
)


@pytest.fixture(scope="module", params=["PCM_16", "PCM_24", "PCM_32",
                                        "FLOAT", "DOUBLE"])
def wav(request, tmp_path_factory, rng):
    x = (0.5 * rng.standard_normal((10000, 3))).clip(-1, 1)
    p = tmp_path_factory.mktemp("native") / f"{request.param}.wav"
    wavio.write_audio(p, x, 48000, encoding=request.param)
    return p, x, request.param


def test_native_read_matches_python(wav):
    p, x, enc = wav
    info = wavio.wav_info(p)
    got = native.read_frames(p, info[4], enc, info[1], 100, 500)
    want = wavio.read_frames(p, 100, 500, info)
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_native_read_eof_clamp(wav):
    p, x, enc = wav
    info = wavio.wav_info(p)
    got = native.read_frames(p, info[4], enc, info[1], 9990, 100)
    assert got.shape == (10, 3)


def test_native_minmax_matches_reduceat(rng):
    x = rng.standard_normal((5000, 2)).astype(np.float32)
    got = native.minmax(x, 37)
    want = reduceat_like(x.astype(np.float64), 37)
    np.testing.assert_allclose(got, want, atol=0)


def test_native_file_minmax(wav):
    p, x, enc = wav
    info = wavio.wav_info(p)
    got = native.file_minmax(p, info[4], enc, info[1], info[2], 100,
                             nthreads=3)
    ref = wavio.read_frames(p, 0, info[2], info)
    want = reduceat_like(ref, 100)
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_native_file_minmax_start_slices(wav):
    """file_minmax(start=...) slices reproduce the whole-file scan —
    the cancellation granularity of the background overview on
    multi-GB single-file recordings."""
    p, x, enc = wav
    info = wavio.wav_info(p)
    step = 100
    whole = native.file_minmax(p, info[4], enc, info[1], info[2], step)
    if whole is None:
        pytest.skip("native library unavailable")
    seg = 7 * step
    parts = [native.file_minmax(p, info[4], enc, info[1],
                                min(seg, info[2] - s), step, start=s)
             for s in range(0, info[2], seg)]
    got = np.concatenate(parts)
    np.testing.assert_allclose(got, whole, atol=0)
