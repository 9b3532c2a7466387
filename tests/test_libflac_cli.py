"""Interop against the reference ``flac`` binary (libFLAC).

Runs wherever the `flac` CLI is installed — locally when available and
in the CI ``flac-interop`` job (`.github/workflows/tests.yml`), which
apt-installs it.  Complements `tests/test_flac_interop.py` (FFmpeg
oracle + committed golden assets): libFLAC is the normative
implementation, and ``flac -t`` additionally verifies the encoder's
STREAMINFO MD5 and frame CRCs end-to-end.

Reference parity: the reference's FLAC support is libsndfile, which
embeds libFLAC (`/root/reference/pyproject.toml:17`).
"""

import shutil
import subprocess

import numpy as np
import pytest

from signals import correlated_signal
from audian_tpu.data import flac, wavio

needs_flac = pytest.mark.skipif(shutil.which("flac") is None,
                                reason="flac binary not installed")


def run_flac(*args):
    subprocess.run(["flac", "--silent", *map(str, args)], check=True,
                   capture_output=True)


def write_wav(path, q, rate, bits):
    enc = {16: "PCM_16", 24: "PCM_24", 32: "PCM_32"}[bits]
    wavio.write_audio(path, q.astype(np.float64) / (1 << (bits - 1)),
                      rate, encoding=enc)


def read_wav(path, bits):
    rate, channels, frames, _enc, _off = wavio.wav_info(path)
    data = wavio.read_frames(path, 0, frames)
    return np.round(data * (1 << (bits - 1))).astype(np.int64)


@needs_flac
@pytest.mark.parametrize("level", range(0, 9))
def test_libflac_encodes_we_decode(rng, tmp_path, level):
    """flac -0..-8 output (all LPC orders/block strategies the presets
    use) must decode bit-exact in both repo decoders."""
    bits = 24 if level % 2 else 16
    ch = 1 + level % 3
    q = correlated_signal(rng, 7000 + 41 * level, 48000, ch, bits)
    wav = tmp_path / "in.wav"
    out = tmp_path / "in.flac"
    write_wav(wav, q, 48000, bits)
    run_flac(f"-{level}", "-o", out, wav)
    flac._OPEN.clear()
    ff = flac._FlacFile(out)
    assert ff.sinfo["bits"] == bits
    np.testing.assert_array_equal(ff.read(0, len(q)), q)
    # pure-Python frame decoder agrees
    chunks = [flac._decode_frame(ff.buf, int(off), ff.sinfo)[0]
              for off in ff.offsets]
    np.testing.assert_array_equal(
        np.concatenate(chunks)[: len(q)], q)


@needs_flac
@pytest.mark.parametrize("bits", [16, 24, 32])
def test_we_encode_libflac_verifies_and_decodes(rng, tmp_path, bits):
    """`flac -t` (MD5 + CRC verification) must pass on repo-encoded
    streams, and `flac -d` must reproduce the exact PCM.  32-bit needs
    libFLAC >= 1.4 (the CI version); older binaries skip it."""
    ch = 2 if bits == 16 else 1
    q = correlated_signal(rng, 9001, 44100, ch, bits)
    ours = tmp_path / "ours.flac"
    flac.write_flac(ours, q.astype(np.int32), 44100, bits=bits)
    try:
        run_flac("-t", ours)
    except subprocess.CalledProcessError:
        if bits == 32:
            pytest.skip("this flac binary predates 32-bit FLAC")
        raise
    dec = tmp_path / "dec.wav"
    run_flac("-d", "-o", dec, ours)
    np.testing.assert_array_equal(read_wav(dec, bits), q)


@needs_flac
def test_we_encode_libflac_verifies_stereo_modes(rng, tmp_path):
    n = 5000
    t = np.arange(n) / 48000.0
    base = np.round(12000 * np.sin(2 * np.pi * 300 * t)).astype(np.int64)
    noise = np.round(50 * rng.normal(size=n)).astype(np.int64)
    for name, q in {
        "mid_side": np.stack([base + noise, base - noise], 1),
        "left_side": np.stack([base, base + noise], 1),
        "right_side": np.stack([base + noise, base], 1),
    }.items():
        q = np.clip(q, -32768, 32767)
        p = tmp_path / f"{name}.flac"
        flac.write_flac(p, q.astype(np.int16), 48000)
        run_flac("-t", p)
        dec = tmp_path / f"{name}.wav"
        run_flac("-d", "-o", dec, p)
        np.testing.assert_array_equal(read_wav(dec, 16), q,
                                      err_msg=name)


@needs_flac
def test_size_within_bar_of_libflac_minus_5(rng, tmp_path):
    """VERDICT r3 acceptance: repo encoder within 1.3x of `flac -5`."""
    q = correlated_signal(rng, 48000, 48000, 2, 16)
    wav = tmp_path / "in.wav"
    ext = tmp_path / "ext.flac"
    ours = tmp_path / "ours.flac"
    write_wav(wav, q, 48000, 16)
    run_flac("-5", "-o", ext, wav)
    flac.write_flac(ours, q.astype(np.int16), 48000)
    assert ours.stat().st_size <= 1.3 * ext.stat().st_size
