"""Property fuzz for the FLAC encoders (native C++ and Python).

Round-3 convention: every persistence surface gets a byte/property
fuzzer.  The encoder's property is total: for ANY int signal within
the depth's range and ANY legal geometry, encode → decode is
bit-exact through BOTH repo decoders, and (when the oracle is built)
through FFmpeg.  The corpus leans adversarial — constants, impulses,
full-scale alternation (worst case for the Rice planner), staircases
(max wasted bits), white noise at full scale (incompressible →
VERBATIM), tiny lengths around block boundaries, non-pow2 blocksizes.
"""

import numpy as np
import pytest

from audian_tpu import native
from audian_tpu.data import flac


def adversarial_signals(rng, n, channels, bits):
    scale = 1 << (bits - 1)
    full = scale - 1

    def ch(base):
        return np.stack([np.roll(base, 7 * c) if c else base
                         for c in range(channels)], axis=1)

    yield "zeros", np.zeros((n, channels), np.int64)
    yield "constant", np.full((n, channels), -scale, np.int64)
    alt = np.tile([full, -scale], n // 2 + 1)[:n]
    yield "nyquist_fullscale", ch(alt)
    imp = np.zeros(n, np.int64)
    imp[:: max(n // 7, 1)] = full
    yield "impulses", ch(imp)
    yield "staircase_wasted", ch(
        (np.arange(n, dtype=np.int64) % 37 - 18) << max(bits - 8, 0))
    yield "white_fullscale", np.clip(
        np.round(rng.normal(0.0, scale / 2, (n, channels))),
        -scale, full).astype(np.int64)
    ramp = np.linspace(-scale, full, n).astype(np.int64)
    yield "ramp", ch(ramp)


def roundtrip(tmp_path, q, bits, blocksize, use_native):
    p = tmp_path / f"f{bits}_{blocksize}_{int(use_native)}.flac"
    if use_native:
        blob = native.flac_encode(q.astype(np.int32), 8000, bits,
                                  blocksize, 8)
        if blob is None:
            pytest.skip("no native encoder")
        p.write_bytes(blob)
    else:
        # force the Python reference encoder
        import unittest.mock as mock

        with mock.patch.object(native, "flac_encode",
                               lambda *a, **k: None):
            flac.write_flac(p, q.astype(np.int32), 8000, bits=bits,
                            blocksize=blocksize)
    flac._OPEN.clear()
    ff = flac._FlacFile(p)
    np.testing.assert_array_equal(ff.read(0, len(q)), q)
    # pure-Python frame decode agrees (native decoder covered via read)
    if len(ff.offsets):
        fr, _pos, _end = flac._decode_frame(ff.buf, int(ff.offsets[0]),
                                            ff.sinfo)
        np.testing.assert_array_equal(fr, q[: len(fr)])
    if native.ffm_available() and bits <= 24:
        dec, _rate, dbits = native.ff_flac_decode(p)
        assert dbits == bits
        np.testing.assert_array_equal(dec.astype(np.int64), q)


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("bits,channels", [(16, 2), (24, 1), (8, 3)])
def test_adversarial_corpus(rng, tmp_path, bits, channels, use_native):
    n = 5000
    for name, q in adversarial_signals(rng, n, channels, bits):
        roundtrip(tmp_path, q, bits, 4096, use_native)


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("n", [1, 2, 3, 17, 4095, 4096, 4097])
def test_boundary_lengths(rng, tmp_path, n, use_native):
    q = np.clip(np.round(3000 * rng.normal(size=(n, 2))),
                -32768, 32767).astype(np.int64)
    roundtrip(tmp_path, q, 16, 4096, use_native)


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("blocksize", [192, 576, 1000, 2048, 4608])
def test_blocksizes(rng, tmp_path, blocksize, use_native):
    """Non-pow2 and uncommon blocksizes force the 16-bit
    blocksize-at-end header path and odd partition limits."""
    q = np.clip(np.round(2000 * rng.normal(size=(9001, 2))),
                -32768, 32767).astype(np.int64)
    roundtrip(tmp_path, q, 16, blocksize, use_native)


def test_quiet_correlated_stereo_stays_decorrelated(rng, tmp_path):
    """Identical quiet channels must encode near the mono size: the
    stereo-mode ESTIMATOR special-cases a constant (zero) side channel
    (review regression — a flat 1-bit/sample floor made independent
    mode win and doubled the size on quiet correlated content)."""
    n = 48000
    s = np.round(80 * np.sin(2 * np.pi * 440 * np.arange(n) / 48000.0)
                 ).astype(np.int64)
    stereo = np.stack([s, s], axis=1)
    blob2 = native.flac_encode(stereo.astype(np.int32), 48000, 16)
    blob1 = native.flac_encode(s[:, None].astype(np.int32), 48000, 16)
    if blob2 is None:
        pytest.skip("no native encoder")
    assert len(blob2) < 1.15 * len(blob1), (len(blob2), len(blob1))
    # and the stream still decodes bit-exact everywhere
    p = tmp_path / "quiet.flac"
    p.write_bytes(blob2)
    flac._OPEN.clear()
    np.testing.assert_array_equal(flac._FlacFile(p).read(0, n), stereo)
    if native.ffm_available():
        dec, _r, _b = native.ff_flac_decode(p)
        np.testing.assert_array_equal(dec.astype(np.int64), stereo)


def test_random_geometry_sweep(rng, tmp_path):
    """Randomized (depth, channels, length, blocksize) sweep through
    the native encoder."""
    for trial in range(12):
        bits = int(rng.choice([8, 12, 16, 20, 24, 32]))
        channels = int(rng.integers(1, 9))
        n = int(rng.integers(1, 9000))
        blocksize = int(rng.choice([256, 1024, 1152, 4096]))
        scale = 1 << (bits - 1)
        q = np.clip(np.round(rng.normal(0, scale / 3, (n, channels))),
                    -scale, scale - 1).astype(np.int64)
        roundtrip(tmp_path, q, bits, blocksize, True)
