"""WAV I/O roundtrip tests: encodings, metadata, markers, helpers."""

import numpy as np
import pytest

from audian_tpu.data import wavio


@pytest.fixture
def signal(rng):
    return (0.4 * rng.standard_normal((2000, 2))).clip(-1, 1)


@pytest.mark.parametrize("encoding,atol", [
    ("PCM_16", 2 ** -15), ("PCM_24", 2 ** -23), ("PCM_32", 2 ** -30),
    ("FLOAT", 1e-7), ("DOUBLE", 0),
])
def test_roundtrip_encodings(tmp_path, signal, encoding, atol):
    p = tmp_path / "x.wav"
    wavio.write_audio(p, signal, 44100, encoding=encoding)
    data, rate = wavio.load_audio(p)
    assert rate == 44100
    assert data.shape == signal.shape
    np.testing.assert_allclose(data, signal, atol=atol * 1.01 + 1e-12)


def test_roundtrip_mono(tmp_path, signal):
    p = tmp_path / "m.wav"
    wavio.write_audio(p, signal[:, 0], 8000, encoding="FLOAT")
    data, rate = wavio.load_audio(p)
    assert data.shape == (len(signal), 1)


def test_metadata_roundtrip(tmp_path, signal):
    p = tmp_path / "md.wav"
    md = {
        "Title": "cricket song",
        "Comment": "field recording",
        "BEXT": {
            "Description": "audian-tpu test",
            "Originator": "pytest",
            "OriginationDate": "2026-08-16",
            "OriginationTime": "05:00:00",
            "TimeReference": 12345,
            "CodingHistory": "A=PCM,F=44100,W=16,M=stereo",
        },
    }
    wavio.write_audio(p, signal, 44100, metadata=md, encoding="PCM_16")
    got = wavio.metadata(p)
    assert got["Title"] == "cricket song"
    assert got["Comment"] == "field recording"
    assert got["BEXT"]["OriginationDate"] == "2026-08-16"
    assert got["BEXT"]["TimeReference"] == 12345
    assert "A=PCM" in got["BEXT"]["CodingHistory"]


def test_markers_roundtrip(tmp_path, signal):
    p = tmp_path / "mk.wav"
    locs = np.array([[100, 0], [500, 250], [1500, 0]])
    labels = np.array([["start", ""], ["song", "nice one"], ["end", ""]],
                      dtype=object)
    wavio.write_audio(p, signal, 44100, locs=locs, labels=labels)
    glocs, glabels = wavio.markers(p)
    np.testing.assert_array_equal(glocs, locs)
    assert list(glabels[:, 0]) == ["start", "song", "end"]
    assert glabels[1, 1] == "nice one"


def test_wav_info_and_partial_read(tmp_path, signal):
    p = tmp_path / "pr.wav"
    wavio.write_audio(p, signal, 48000, encoding="FLOAT")
    rate, channels, frames, enc, off = wavio.wav_info(p)
    assert (rate, channels, frames, enc) == (48000, 2, 2000, "FLOAT")
    part = wavio.read_frames(p, 100, 50)
    np.testing.assert_allclose(part, signal[100:150], atol=1e-7)
    # reads are clamped at EOF
    tail = wavio.read_frames(p, 1990, 100)
    assert tail.shape == (10, 2)


def test_get_datetime_and_starttime_shift():
    md = {"BEXT": {"OriginationDate": "2026-01-02",
                   "OriginationTime": "03:04:05",
                   "TimeReference": 1000}}
    t = wavio.get_datetime(md)
    assert t.hour == 3 and t.second == 5
    wavio.update_starttime(md, 61.0, 100.0)
    t2 = wavio.get_datetime(md)
    assert (t2 - t).total_seconds() == 61
    assert md["BEXT"]["TimeReference"] == 1000 + 6100


def test_history(tmp_path):
    md = {"BEXT": {"CodingHistory": "A=PCM,F=44100,W=16,M=stereo"}}
    code = wavio.bext_history_str("PCM_16", 44100, 2)
    assert code == "A=PCM,F=44100,W=16,M=stereo"
    wavio.add_history(md, code + ",T=cut", "BEXT.CodingHistory")
    assert md["BEXT"]["CodingHistory"].count("A=PCM") == 2


def test_unwrap():
    # a ramp that wraps at +1 -> jumps to -1
    t = np.linspace(0, 4, 1000)
    true = 1.8 * np.sin(2 * np.pi * 0.5 * t)
    wrapped = np.where(true > 1.0, true - 2.0, np.where(true < -1.0, true + 2.0, true))
    fixed = wavio.unwrap(wrapped[:, None], thresh=1.5, clips=False)
    np.testing.assert_allclose(fixed[:, 0], true / 2, atol=1e-9)
    clipped = wavio.unwrap(wrapped[:, None], thresh=1.5, clips=True)
    np.testing.assert_allclose(clipped[:, 0], np.clip(true, -1, 1), atol=1e-9)


# -- optional soundfile fallback for non-WAV containers -----------------------


class _FakeSFFile:
    """Minimal stand-in for soundfile.SoundFile over a stored array."""

    store = {}

    def __init__(self, path):
        self.data, self.rate = self.store[str(path)]
        self.pos = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def seek(self, pos):
        self.pos = int(pos)

    def read(self, n, dtype="float64", always_2d=True):
        out = self.data[self.pos : self.pos + int(n)]
        self.pos += len(out)
        return np.asarray(out, dtype)


class _FakeSF:
    SoundFile = _FakeSFFile

    @staticmethod
    def info(path):
        data, rate = _FakeSFFile.store[str(path)]

        class I:
            samplerate = rate
            channels = data.shape[1]
            frames = data.shape[0]
            subtype = "FAKE"

        return I()

    @staticmethod
    def read(path, always_2d=True, dtype="float64"):
        data, rate = _FakeSFFile.store[str(path)]
        return np.asarray(data, dtype), rate

    @staticmethod
    def available_formats():
        return {"WAV": "WAV", "FLAC": "FLAC", "OGG": "OGG"}


@pytest.fixture
def fake_soundfile(tmp_path, signal, monkeypatch):
    """A .ogg path readable only through the (faked) soundfile module
    (FLAC no longer needs soundfile — it decodes natively)."""
    path = tmp_path / "rec.ogg"
    path.write_bytes(b"OggS not a riff file")
    _FakeSFFile.store = {str(path): (signal, 48000.0)}
    monkeypatch.setattr(wavio, "_SF", _FakeSF)
    yield path
    monkeypatch.setattr(wavio, "_SF", 0)


def test_non_wav_without_soundfile(tmp_path, monkeypatch):
    monkeypatch.setattr(wavio, "_SF", None)
    p = tmp_path / "x.ogg"
    p.write_bytes(b"OggS whatever")
    with pytest.raises(wavio.WavError, match="soundfile"):
        wavio.load_audio(p)
    with pytest.raises(wavio.WavError, match="soundfile"):
        wavio.wav_info(p)
    fmts = wavio.available_formats()
    assert fmts[:3] == ["WAV", "FLAC", "RF64"]
    # without soundfile the rest (if any) comes from the FFmpeg export
    # set, not libsndfile
    from audian_tpu import native

    extra = set(fmts[3:])
    assert extra <= set(native.FF_EXPORT_FORMATS)


def test_soundfile_fallback_load(fake_soundfile, signal):
    data, rate = wavio.load_audio(fake_soundfile)
    assert rate == 48000.0
    assert np.allclose(data, signal)
    assert wavio.metadata(fake_soundfile) == {}
    locs, labels = wavio.markers(fake_soundfile)
    assert len(locs) == 0
    assert "OGG" in wavio.available_formats()


def test_soundfile_fallback_loader(fake_soundfile, signal):
    from audian_tpu.data.loader import AudioLoader

    ld = AudioLoader(fake_soundfile, buffer_time=0.01, back_time=0.0)
    assert ld.frames == len(signal)
    assert ld.encoding == "SF:FAKE"
    assert ld.format_dict()["format"] == "OGG"
    got = ld[100:200]
    assert np.allclose(got, signal[100:200], atol=1e-7)
    # partial reads through wavio.read_frames agree with the array
    part = wavio.read_frames(fake_soundfile, 10, 5)
    assert np.allclose(part, signal[10:15])
    ld.close()


def test_read_frames_raw16_matches_decoded(tmp_path, rng):
    """Raw int16 reads are exactly the decoder's samples times 2**15."""
    x = np.clip(0.3 * rng.standard_normal((5000, 3)), -1, 1)
    p = tmp_path / "raw16.wav"
    wavio.write_audio(p, x, 44100.0, encoding="PCM_16")
    info = wavio.wav_info(p)
    out = np.empty((1200, 3), np.int16)
    got = wavio.read_frames_raw16(p, 345, 1200, info, out)
    assert got == 1200
    dec = wavio.read_frames(p, 345, 1200, info)
    np.testing.assert_array_equal(out, np.round(dec * 32768.0))


def test_read_frames_raw16_rejects_other_encodings(tmp_path, rng):
    x = 0.1 * rng.standard_normal((100, 2))
    p = tmp_path / "f32.wav"
    wavio.write_audio(p, x, 44100.0, encoding="FLOAT")
    out = np.empty((10, 2), np.int16)
    with pytest.raises(wavio.WavError):
        wavio.read_frames_raw16(p, 0, 10, wavio.wav_info(p), out)


def test_loader_read_raw16_across_files(tmp_path, rng):
    """read_raw16_into stitches multi-file recordings and matches the
    decoded read path bit-exactly."""
    from audian_tpu.data.loader import AudioLoader

    paths = []
    xs = []
    for i in range(2):
        x = np.clip(0.2 * rng.standard_normal((3000, 2)), -1, 1)
        p = tmp_path / f"part{i}.wav"
        wavio.write_audio(p, x, 48000.0, encoding="PCM_16")
        paths.append(p)
        xs.append(x)
    ld = AudioLoader(paths, prefetch=False)
    assert ld.raw16_capable
    out = np.empty((2000, 2), np.int16)
    got = ld.read_raw16_into(2000, 2000, out)  # spans the boundary
    assert got.base is out or got is out
    dec = ld._read_direct(2000, 2000)
    np.testing.assert_array_equal(out, np.round(dec * 32768.0))
    # unwrap rescales samples: raw16 must refuse
    ld.set_unwrap(0.5)
    assert not ld.raw16_capable
    with pytest.raises(wavio.WavError):
        ld.read_raw16_into(0, 10, out)
    ld.close()


def test_malformed_files_raise_waverror(tmp_path, rng):
    """Every malformed header fails with WavError (or parses degraded),
    never a raw struct/ValueError/ZeroDivisionError — the shell's
    open-failure path only catches loud, typed errors."""
    import os
    import struct

    x = (0.1 * rng.standard_normal((2000, 2))).astype(np.float32)
    good = tmp_path / "good.wav"
    wavio.write_audio(good, x, 8000.0, encoding="PCM_16")
    blob = good.read_bytes()
    idx = blob.find(b"data")
    cases = {f"trunc_{cut}": blob[:cut]
             for cut in (3, 11, 12, 20, 36, 44, 45, len(blob) // 2)}

    def patched(off, fmt, *vals):
        b = bytearray(blob)
        b[off : off + struct.calcsize(fmt)] = struct.pack(fmt, *vals)
        return bytes(b)

    cases["riff_size_max"] = patched(4, "<I", 0xFFFFFFFF)
    cases["fmt_size_max"] = patched(16, "<I", 0xFFFFFFF0)
    cases["zero_channels"] = patched(22, "<H", 0)
    cases["zero_rate"] = patched(24, "<I", 0)
    cases["data_size_huge"] = patched(idx + 4, "<I", 0x7FFFFFF0)
    cases["bad_format_tag"] = patched(20, "<H", 0x1234)
    cases["garbage"] = os.urandom(200)
    cases["empty"] = b""
    for name, payload in cases.items():
        p = tmp_path / f"{name}.wav"
        p.write_bytes(payload)
        for fn in (wavio.wav_info, wavio.load_audio, wavio.markers,
                   wavio.metadata):
            try:
                fn(p)
            except wavio.WavError:
                pass


def test_truncated_data_reports_honest_frames(tmp_path, rng):
    """wav_info clamps the frame count to the bytes actually present, so
    loaders never promise frames a truncated file cannot deliver."""
    x = (0.1 * rng.standard_normal((8000, 2))).astype(np.float32)
    good = tmp_path / "full.wav"
    wavio.write_audio(good, x, 8000.0, encoding="PCM_16")
    blob = good.read_bytes()
    half = tmp_path / "half.wav"
    half.write_bytes(blob[: len(blob) // 2])
    info = wavio.wav_info(half)
    assert info[2] < 4100
    data, rate = wavio.load_audio(half)
    assert abs(len(data) - info[2]) <= 1


def test_integer_input_is_pcm_codes(tmp_path):
    """Integer arrays passed to write_audio are PCM codes at their dtype
    width (raw16 convention), not floats to clip: an int16 array written
    as PCM_16 round-trips bit-exactly, and a ±20000-code sine must NOT
    come back as a full-scale square wave."""
    rate = 48000.0
    t = np.arange(4800) / rate
    q = (np.sin(2 * np.pi * 800 * t)[:, None] * 20000).astype(np.int16)
    p = tmp_path / "codes.wav"
    wavio.write_audio(p, q, rate)
    y, r = wavio.load_audio(p)
    assert r == rate
    assert np.abs(y).max() == pytest.approx(20000 / 32768, abs=1e-6)
    np.testing.assert_array_equal(
        np.round(y * 32768.0).astype(np.int16), q)
    # int32 codes scale by 2^31
    q32 = (q.astype(np.int64) << 16).astype(np.int32)
    p32 = tmp_path / "codes32.wav"
    wavio.write_audio(p32, q32, rate, encoding="PCM_32")
    y32, _ = wavio.load_audio(p32)
    np.testing.assert_allclose(y32, y, atol=1e-9)
    # unsigned input is ambiguous and refused
    with pytest.raises(wavio.WavError):
        wavio.write_audio(tmp_path / "u.wav", q.astype(np.uint16), rate)


def test_pcm_u8_round_trip_and_windowed_reads(tmp_path, rng):
    """8-bit PCM WAVs (unsigned, 128 offset) read AND write: wav_info
    maps (tag 1, 8 bit) to PCM_U8 so the windowed loader serves them —
    they used to open fine and then crash every read with the
    pseudo-encoding 'tag1/8'."""
    import struct

    x = np.clip(0.5 * rng.standard_normal((500, 2)), -1.0, 0.99)
    p = tmp_path / "u8.wav"
    wavio.write_audio(p, x, 8000.0, encoding="PCM_U8")
    info = wavio.wav_info(p)
    assert info[3] == "PCM_U8" and info[2] == 500
    got = wavio.read_frames(p, 0, 500, info)
    assert np.max(np.abs(got - x)) <= 1.0 / 128 + 1e-9  # 8-bit quantum
    data, rate, *_ = wavio.load_wav(p)
    np.testing.assert_array_equal(data, got)
    from audian_tpu.data.loader import AudioLoader

    ld = AudioLoader(p, buffer_time=0.02, back_time=0.0)
    np.testing.assert_allclose(np.asarray(ld[100:200]), got[100:200],
                               atol=1e-7)
    ld.close()


def test_corrupt_marker_chunk_does_not_fail_open(tmp_path, rng):
    """A truncated cue/adtl body keeps what parsed and skips the rest —
    markers are auxiliary, so a corrupt side chunk must not crash the
    open with a bare struct.error (headers still raise WavError)."""
    import struct

    p = tmp_path / "c.wav"
    wavio.write_audio(p, (0.1 * rng.standard_normal((100, 1)))
                      .astype(np.float32), 8000.0, encoding="PCM_16")
    raw = bytearray(p.read_bytes())
    # append a cue chunk claiming 1000 entries with a 4-byte body, and
    # a labl entry shorter than its 4-byte cue-id
    raw += b"cue " + struct.pack("<I", 4) + struct.pack("<I", 1000)
    raw += b"LIST" + struct.pack("<I", 14) + b"adtl" + b"labl" \
        + struct.pack("<I", 2) + b"ab"
    struct.pack_into("<I", raw, 4, len(raw) - 8)
    p.write_bytes(bytes(raw))
    rate, md, locs, labels = wavio.scan_wav(p)
    assert rate == 8000.0 and len(locs) == 0
    data, _r, _md, locs2, _l = wavio.load_wav(p)
    assert len(data) == 100 and len(locs2) == 0
