"""System-FFmpeg fallback for non-WAV/FLAC containers.

The reference reads every libsndfile container because SoundFile is a
hard dependency (`/root/reference/pyproject.toml:17`).  Here WAV and
FLAC decode natively; other containers used to require the optional
``soundfile`` extra.  `data/wavio.py` now falls back to the system
FFmpeg libraries (``native/ffflac.cc:ffp_audio_decode``) when
soundfile is absent, so e.g. an AIFF or OGG recording opens on a bare
install of any host with libavcodec/libavformat present.

The AIFF asset is hand-written here (big-endian PCM-16, 80-bit
extended rate) so the test needs no external encoder.
"""

import struct

import numpy as np
import pytest

from audian_tpu import native
from audian_tpu.data import wavio

needs_ffm = pytest.mark.skipif(not native.ffm_available(),
                               reason="FFmpeg dev files unavailable")


def _f80(x):
    """IEEE 754 80-bit extended float (AIFF's sample-rate encoding)."""
    x = int(x)
    e = x.bit_length() - 1
    return struct.pack(">HQ", 16383 + e, x << (63 - e))


def write_aiff(path, q16, rate):
    n, ch = q16.shape
    comm = struct.pack(">hLh", ch, n, 16) + _f80(rate)
    ssnd = struct.pack(">LL", 0, 0) + q16.astype(">i2").tobytes()
    chunks = b"COMM" + struct.pack(">L", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
    form = b"AIFF" + chunks
    with open(path, "wb") as f:
        f.write(b"FORM" + struct.pack(">L", len(form)) + form)


@pytest.fixture()
def aiff(rng, tmp_path):
    q = np.clip(np.round(3000 * rng.normal(size=(5000, 2))),
                -32768, 32767).astype(np.int16)
    p = tmp_path / "t.aiff"
    write_aiff(p, q, 44100)
    return p, q


@needs_ffm
def test_direct_decode(aiff):
    p, q = aiff
    samples, rate = native.ff_audio_decode(p)
    assert rate == 44100
    np.testing.assert_array_equal(
        np.round(samples * 32768.0).astype(np.int16), q)


@needs_ffm
def test_wavio_routes_aiff(aiff, monkeypatch):
    # force the no-soundfile branch even where soundfile is installed
    monkeypatch.setattr(wavio, "_SF", None)
    p, q = aiff
    rate, channels, frames, enc, off = wavio.wav_info(p)
    assert (rate, channels, frames, enc, off) == (
        44100.0, 2, 5000, "FFMPEG", None)
    got = wavio.read_frames(p, 100, 200)
    np.testing.assert_allclose(got, q[100:300] / 32768.0, atol=1e-7)


@needs_ffm
def test_loader_and_browser_on_aiff(aiff, monkeypatch):
    monkeypatch.setattr(wavio, "_SF", None)
    from audian_tpu.app import DataBrowser
    from audian_tpu.data.loader import AudioLoader

    p, q = aiff
    al = AudioLoader(str(p))
    assert (al.rate, al.frames, al.channels) == (44100.0, 5000, 2)
    assert not al.raw16_capable  # whole-decode fallback, no raw16
    b = DataBrowser(str(p)).open()
    try:
        b.set_times(0.0, 0.1)
        raw = np.asarray(b.data.data[0:300, :])
        np.testing.assert_allclose(raw, q[:300] / 32768.0, atol=1e-6)
    finally:
        b.close()


@needs_ffm
def test_full_read_path(aiff, monkeypatch):
    monkeypatch.setattr(wavio, "_SF", None)
    p, q = aiff
    data, rate, md, locs, labels = wavio.load_wav(p)
    assert rate == 44100.0
    assert md == {} and len(locs) == 0
    np.testing.assert_allclose(data, q / 32768.0, atol=1e-7)


needs_ffmpeg_cli = pytest.mark.skipif(
    __import__("shutil").which("ffmpeg") is None,
    reason="ffmpeg CLI not installed")


@needs_ffm
@needs_ffmpeg_cli
@pytest.mark.parametrize("fmt,codec,lossy", [
    ("ogg", "libvorbis", True),
    ("mp3", "libmp3lame", True),
    ("caf", "pcm_s16le", False),
])
def test_real_world_containers(rng, tmp_path, monkeypatch, fmt, codec,
                               lossy):
    """Real encoder output (CI installs the ffmpeg CLI): OGG/Vorbis and
    MP3 decode through the fallback with plausible audio; lossless CAF
    round-trips bit-exact."""
    import subprocess

    monkeypatch.setattr(wavio, "_SF", None)
    n = 32000
    t = np.arange(n) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    q = np.round(x * 32767).astype(np.int16)[:, None]
    src = tmp_path / "src.wav"
    wavio.write_audio(src, x[:, None], 16000, encoding="PCM_16")
    out = tmp_path / f"enc.{fmt}"
    r = subprocess.run(
        ["ffmpeg", "-y", "-v", "error", "-i", str(src), "-c:a", codec,
         str(out)], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"ffmpeg cannot encode {codec}: "
                    f"{r.stderr.decode()[:120]}")
    wavio._FF_CACHE.clear()
    rate, channels, frames, enc, _ = wavio.wav_info(out)
    assert enc == "FFMPEG" and channels == 1 and rate == 16000.0
    data = wavio.read_frames(out, 0, frames)
    if lossy:
        # codec delay shifts lossy streams: correlate to align, then
        # require a strong match on the tone
        assert frames > 0.9 * n
        mid = data[len(data) // 4 : len(data) // 2, 0]
        ref = x[: len(mid) + 2000]
        lags = np.correlate(ref, mid, "valid")
        k = int(np.argmax(lags))
        r = np.corrcoef(mid, ref[k : k + len(mid)])[0, 1]
        assert r > 0.95, r
    else:
        assert frames == n
        np.testing.assert_allclose(
            data[:, 0], q[:, 0] / 32768.0, atol=1e-7)


@needs_ffm
def test_unreadable_still_raises(tmp_path, monkeypatch):
    monkeypatch.setattr(wavio, "_SF", None)
    p = tmp_path / "junk.xyz"
    p.write_bytes(b"\x01\x02\x03" * 100)
    with pytest.raises(wavio.WavError):
        wavio.wav_info(p)


@needs_ffm
def test_decode_failure_surfaces_real_cause(tmp_path, monkeypatch):
    """A corrupt-but-recognized container must report the FFmpeg decode
    failure, not the misleading 'install soundfile' hint (advisor r4)."""
    monkeypatch.setattr(wavio, "_SF", None)
    p = tmp_path / "bad.ogg"
    p.write_bytes(b"OggS" + b"\x00" * 400)
    wavio._FF_CACHE.clear()
    with pytest.raises(wavio.WavError, match="FFmpeg failed to decode"):
        wavio.wav_info(p)


@needs_ffm
def test_oversized_decode_not_pinned_in_cache(aiff, monkeypatch):
    """A single decode larger than the byte cap is served uncached so it
    cannot pin host RAM until the next miss (advisor r4)."""
    p, q = aiff
    monkeypatch.setattr(wavio, "_SF", None)
    monkeypatch.setattr(wavio, "_FF_CACHE_BYTES", 1024)
    wavio._FF_CACHE.clear()
    samples, rate = wavio._ff_decode_cached(p)
    assert samples.nbytes > 1024 and rate == 44100
    assert not wavio._FF_CACHE  # not inserted
    # under-cap decodes still cache
    monkeypatch.setattr(wavio, "_FF_CACHE_BYTES", 1 << 30)
    wavio._ff_decode_cached(p)
    assert len(wavio._FF_CACHE) == 1
