"""Byte-mutation fuzz for the FFmpeg container fallback.

The fallback hands arbitrary non-WAV/FLAC bytes to libavformat; our
wrapper contract is: every outcome is either a successful decode or a
clean :class:`WavError` / ``ValueError`` — never a crash, hang, or an
unraised garbage result shape.  (FFmpeg's decoder robustness is
FFmpeg's own; this pins OUR error funneling around it, the same
contract the WAV/FLAC/cache fuzzers pin for the in-repo parsers.)
"""

import numpy as np
import pytest

from audian_tpu import native
from audian_tpu.data import wavio
from test_ffmpeg_fallback import write_aiff

needs_ffm = pytest.mark.skipif(not native.ffm_available(),
                               reason="FFmpeg dev files unavailable")


@needs_ffm
def test_mutated_aiff_never_crashes(rng, tmp_path, monkeypatch):
    monkeypatch.setattr(wavio, "_SF", None)
    q = np.clip(np.round(3000 * rng.normal(size=(2000, 2))),
                -32768, 32767).astype(np.int16)
    base = tmp_path / "base.aiff"
    write_aiff(base, q, 44100)
    raw = bytearray(base.read_bytes())
    for trial in range(40):
        buf = bytearray(raw)
        for _ in range(int(rng.integers(1, 8))):
            buf[int(rng.integers(0, len(buf)))] = int(
                rng.integers(0, 256))
        p = tmp_path / f"mut{trial}.aiff"
        p.write_bytes(bytes(buf))
        wavio._FF_CACHE.clear()
        try:
            info = wavio.wav_info(p)
        except (wavio.WavError, ValueError):
            continue  # clean rejection
        rate, channels, frames, enc, off = info
        assert rate > 0 and channels > 0 and frames >= 0
        data = wavio.read_frames(p, 0, min(frames, 500))
        assert data.shape[1] == channels


@needs_ffm
def test_truncations_never_crash(rng, tmp_path, monkeypatch):
    monkeypatch.setattr(wavio, "_SF", None)
    q = np.clip(np.round(3000 * rng.normal(size=(2000, 1))),
                -32768, 32767).astype(np.int16)
    base = tmp_path / "base.aiff"
    write_aiff(base, q, 8000)
    raw = base.read_bytes()
    for cut in (0, 3, 11, 12, 40, len(raw) // 2, len(raw) - 3):
        p = tmp_path / f"cut{cut}.aiff"
        p.write_bytes(raw[:cut])
        wavio._FF_CACHE.clear()
        try:
            info = wavio.wav_info(p)
            wavio.read_frames(p, 0, min(info[2], 100))
        except (wavio.WavError, ValueError):
            pass
