"""FFmpeg-backed export (OGG/AIFF/MP3/Opus) — VERDICT r4 #6.

The reference's save dialog offers every ``datawriter`` format through
libsndfile (`/root/reference/src/audian/databrowser.py:1875-1880`).
audian-tpu writes WAV/RF64/FLAC natively and reaches the rest through
the system FFmpeg libraries (``native/ffflac.cc:ffp_audio_encode``);
round trips are validated through the independent FFmpeg oracle reader
(exact for the lossless AIFF leg, spectral tolerance for lossy codecs).
"""

import numpy as np
import pytest

from audian_tpu import native
from audian_tpu.data import wavio

needs_ffm = pytest.mark.skipif(not native.ffm_available(),
                               reason="FFmpeg dev files unavailable")


def _tone(rng, n, channels, rate, f=880.0):
    t = np.arange(n) / rate
    x = 0.4 * np.sin(2 * np.pi * f * t)[:, None] * np.ones((1, channels))
    return (x + 0.005 * rng.standard_normal((n, channels))).astype(
        np.float32)


def _lossy_matches(decoded, ref, channel=0):
    """Codec-delay-tolerant spectral match for lossy round trips."""
    n = min(len(decoded), len(ref))
    mid = np.asarray(decoded[n // 4 : n // 2, channel], np.float64)
    lags = np.correlate(ref[: len(mid) + 4000, channel], mid, "valid")
    k = int(np.argmax(lags))
    r = np.corrcoef(mid, ref[k : k + len(mid), channel])[0, 1]
    return r


def test_available_formats_lists_ffmpeg_exports():
    fmts = wavio.available_formats()
    assert fmts[:3] == ["WAV", "FLAC", "RF64"]
    if native.ffm_available():
        for f in ("OGG", "AIFF", "MP3"):
            assert f in fmts


@needs_ffm
@pytest.mark.parametrize("fmt,ext,lossy", [
    ("OGG", ".ogg", True),
    ("AIFF", ".aiff", False),
    ("MP3", ".mp3", True),
])
def test_export_round_trips_through_oracle(rng, tmp_path, fmt, ext,
                                           lossy):
    rate = 48000.0
    x = _tone(rng, int(2 * rate), 2, rate)
    p = tmp_path / ("t" + ext)
    # explicit format AND suffix-only routing must both work
    wavio.write_audio(p, x, rate, format=fmt)
    p2 = tmp_path / ("sfx" + ext)
    wavio.write_audio(p2, x, rate)
    for q in (p, p2):
        got = native.ff_audio_decode(q)
        assert got is not None
        samples, r = got
        assert r == rate and samples.shape[1] == 2
        if lossy:
            assert _lossy_matches(samples, x) > 0.9
        else:
            assert len(samples) == len(x)
            np.testing.assert_allclose(
                samples[:, 0], x[:, 0], atol=1.01 / 32768)


@needs_ffm
def test_export_reads_back_through_wavio(rng, tmp_path):
    """The exported container re-opens through the repo's own fallback
    reader (wav_info/read_frames), closing the produce->consume loop."""
    rate = 16000.0
    x = _tone(rng, 8000, 1, rate)
    p = tmp_path / "t.ogg"
    wavio.write_audio(p, x, rate, format="OGG")
    wavio._FF_CACHE.clear()
    info = wavio.wav_info(p)
    assert info[0] == rate and info[1] == 1 and info[3] == "FFMPEG"
    d = wavio.read_frames(p, 0, min(info[2], 4000))
    assert len(d) and np.all(np.isfinite(d))


@needs_ffm
def test_export_integer_pcm_codes(rng, tmp_path):
    """Integer input is PCM codes at the dtype width (the _encode
    convention), not floats to clip."""
    rate = 16000.0
    q = np.clip(np.round(_tone(rng, 8000, 1, rate) * 32768), -32768,
                32767).astype(np.int16)
    p = tmp_path / "i.aiff"
    wavio.write_audio(p, q, rate, format="AIFF")
    samples, r = native.ff_audio_decode(p)
    np.testing.assert_allclose(
        np.round(samples[:, 0] * 32768), q[:, 0], atol=1.01)
    with pytest.raises(wavio.WavError, match="unsigned"):
        wavio.write_audio(tmp_path / "u.aiff",
                          q.astype(np.uint16), rate, format="AIFF")


@needs_ffm
def test_export_markers_rejected_loudly(rng, tmp_path):
    rate = 16000.0
    x = _tone(rng, 4000, 1, rate)
    with pytest.raises(ValueError, match="marker"):
        wavio.write_audio(tmp_path / "m.ogg", x, rate, format="OGG",
                          locs=np.array([[10, 0]]),
                          labels=np.array([["a", ""]], dtype=object))


@needs_ffm
def test_save_region_to_ogg(rng, tmp_path):
    """The browser's region export verb writes an .ogg target through
    the FFmpeg path end-to-end."""
    from audian_tpu.app import DataBrowser

    rate = 16000.0
    x = _tone(rng, int(3 * rate), 2, rate, f=700.0)
    src = tmp_path / "rec.wav"
    wavio.write_audio(src, x, rate, encoding="PCM_16")
    b = DataBrowser(src).open()
    try:
        out = b.save_region(0.5, 1.5, file_path=tmp_path / "cut.ogg")
        assert out.exists() and out.suffix == ".ogg"
        samples, r = native.ff_audio_decode(out)
        assert r == rate
        assert abs(len(samples) - rate) < 0.1 * rate  # ~1 s region
        assert _lossy_matches(samples, x[int(0.5 * rate):]) > 0.85
    finally:
        b.close()


def test_unknown_format_still_raises(rng, tmp_path):
    x = _tone(rng, 1000, 1, 8000.0)
    with pytest.raises(ValueError, match="unsupported format"):
        wavio.write_audio(tmp_path / "x.wav", x, 8000.0, format="XYZ")


@needs_ffm
def test_export_many_channels_planar(rng, tmp_path):
    """>8 channels through a planar codec (Vorbis/FLTP) — regression
    for the extended_data indexing SIGSEGV (AVFrame.data has 8 slots)."""
    rate = 48000.0
    x = _tone(rng, 16000, 16, rate)
    p = tmp_path / "wide.ogg"
    wavio.write_audio(p, x, rate, format="OGG")
    samples, r = native.ff_audio_decode(p)
    assert r == rate and samples.shape[1] == 16
    assert _lossy_matches(samples, x) > 0.85


@needs_ffm
def test_export_metadata_lands_in_container(rng, tmp_path):
    """Metadata rides into the muxer's tag dictionary (vorbis comments
    here) instead of being silently dropped."""
    rate = 16000.0
    x = _tone(rng, 8000, 1, rate)
    p = tmp_path / "m.ogg"
    wavio.write_audio(p, x, rate, format="OGG",
                      metadata={"Artist": "the-artist-tag",
                                "BEXT": {"Description": "bext-desc"}})
    raw = p.read_bytes()
    assert b"the-artist-tag" in raw
    assert b"bext-desc" in raw


@needs_ffm
def test_export_multiline_metadata_survives(rng, tmp_path):
    """Multi-line values (legal in BWF/INFO comments) must reach the
    container intact — the wire format to the C shim is 0x1E-separated,
    so an embedded newline is content, not a record boundary."""
    rate = 16000.0
    x = _tone(rng, 8000, 1, rate)
    p = tmp_path / "ml.ogg"
    wavio.write_audio(p, x, rate, format="OGG",
                      metadata={"Comment": "first-line\nsecond-line"})
    raw = p.read_bytes()
    # vorbis comments store the value as raw UTF-8: both lines AND the
    # newline between them must be present contiguously
    assert b"first-line\nsecond-line" in raw


@needs_ffm
def test_export_ogg_at_field_recorder_rates(rng, tmp_path):
    """OGG/Vorbis export must work at 96/192 kHz — the rates this tool
    lives at (libvorbis' managed-bitrate floor rejects 64 kbps/ch
    there; the shim uses quality mode like libsndfile does for the
    reference's exports)."""
    for rate in (96000.0, 192000.0):
        x = _tone(rng, int(rate // 4), 2, rate)
        p = tmp_path / f"r{int(rate)}.ogg"
        wavio.write_audio(p, x, rate, format="OGG")
        samples, r = native.ff_audio_decode(p)
        assert r == rate and samples.shape[1] == 2
        assert _lossy_matches(samples, x) > 0.85


def test_export_without_ffmpeg_names_real_cause(rng, tmp_path,
                                                monkeypatch):
    """When the FFmpeg libraries are absent the suffix-routed export
    must say so, not claim WAV is unsupported."""
    monkeypatch.setattr(native, "ff_audio_encode",
                        lambda *a, **k: False)
    x = _tone(rng, 1000, 1, 8000.0)
    with pytest.raises(wavio.WavError, match="FFmpeg"):
        wavio.write_audio(tmp_path / "cut.ogg", x, 8000.0)


def test_available_formats_probe_is_cheap(monkeypatch):
    """available_formats must not trigger the on-demand g++ build."""
    import audian_tpu.native as native_mod

    def boom():
        raise AssertionError("listing must not build the FFmpeg shim")

    monkeypatch.setattr(native_mod, "get_ffm", boom)
    fmts = wavio.available_formats()
    assert fmts[:3] == ["WAV", "FLAC", "RF64"]
