"""Large-file WAVE containers: RF64 / BW64 / W64.

The reference reads >4 GB single-file recordings for free through
libsndfile (SoundFile is a hard dependency,
`/root/reference/pyproject.toml:17`); field recorders emit RF64 the
moment a take crosses the 32-bit RIFF cap.  Here `data/wavio.py` parses
the ``ds64`` chunk (RF64/BW64) and Sony Wave64's GUID chunks into the
same windowed loader, so an 11 GB file opens in O(header), and the
writers (`write_audio`, `WavWriter`) promote RIFF -> RF64 automatically
instead of dying in ``struct.pack("<I", ...)``.
"""

import struct
import time

import numpy as np
import pytest

from audian_tpu import native
from audian_tpu.data import wavio
from audian_tpu.data.loader import AudioLoader

needs_ffm = pytest.mark.skipif(not native.ffm_available(),
                               reason="FFmpeg dev files unavailable")


def _tone(rng, n, channels, rate):
    t = np.arange(n) / rate
    x = 0.4 * np.sin(2 * np.pi * 440.0 * t)[:, None] * np.ones(
        (1, channels))
    return (x + 0.01 * rng.standard_normal((n, channels))).astype(
        np.float32)


def write_w64(path, q16, rate, extra_chunks=()):
    """Hand-rolled Sony Wave64 writer (PCM-16) — the repo only reads
    W64, so the tests provide their own encoder.  ``extra_chunks`` is
    ``(fourcc, body)`` pairs inserted between fmt and data (metadata
    tests ride through here so there is exactly ONE W64 framing
    implementation to keep correct)."""
    n, ch = q16.shape
    sfx = bytes.fromhex("f3acd3118cd100c04f8edb8a")
    def chunk(cc, body):
        hdr = cc + sfx + struct.pack("<Q", 24 + len(body))
        pad = b"\x00" * (-(24 + len(body)) % 8)
        return hdr + body + pad
    fmt = struct.pack("<HHIIHH", 1, ch, int(rate), int(rate) * ch * 2,
                      ch * 2, 16)
    body = chunk(b"fmt ", fmt)
    for cc, cbody in extra_chunks:
        body += chunk(cc, cbody)
    body += chunk(b"data", q16.astype("<i2").tobytes())
    riff = (b"riff" + bytes.fromhex("2e91cf11a5d628db04c10000")
            + struct.pack("<Q", 40 + len(body))
            + b"wave" + sfx + body)
    with open(path, "wb") as f:
        f.write(riff)


def test_rf64_round_trip_small(rng, tmp_path):
    """format="RF64" forces the container; all three scanners and the
    windowed reader agree with the plain-WAV copy bit for bit."""
    rate = 48000.0
    x = _tone(rng, 20000, 3, rate)
    md = {"Artist": "a", "BEXT": {"Description": "d",
                                  "OriginationDate": "2026-08-21",
                                  "OriginationTime": "01:02:03"}}
    locs = np.array([[100, 50], [5000, 0]])
    labels = np.array([["s1", "note1"], ["s2", ""]], dtype=object)
    pr = tmp_path / "r.wav"
    pw = tmp_path / "w.wav"
    wavio.write_audio(pr, x, rate, metadata=md, locs=locs, labels=labels,
                      format="RF64")
    wavio.write_audio(pw, x, rate, metadata=md, locs=locs, labels=labels)
    assert pr.read_bytes()[:4] == b"RF64"
    assert pw.read_bytes()[:4] == b"RIFF"
    dr, rr, mdr, lr, br = wavio.load_wav(pr)
    dw, rw, mdw, lw, bw = wavio.load_wav(pw)
    np.testing.assert_array_equal(dr, dw)
    assert rr == rw == rate
    assert mdr == mdw and mdr["Artist"] == "a"
    np.testing.assert_array_equal(lr, lw)
    ir = wavio.wav_info(pr)
    iw = wavio.wav_info(pw)
    assert ir[:4] == iw[:4]  # rate/channels/frames/encoding
    np.testing.assert_array_equal(
        wavio.read_frames(pr, 7000, 512), wavio.read_frames(pw, 7000, 512))
    sr = wavio.scan_wav(pr)
    assert sr[0] == rate and sr[1]["Artist"] == "a"
    np.testing.assert_array_equal(sr[2], lr)


def test_bw64_magic_reads_like_rf64(rng, tmp_path):
    rate = 8000.0
    x = _tone(rng, 4000, 1, rate)
    p = tmp_path / "b.wav"
    wavio.write_audio(p, x, rate, format="RF64")
    raw = bytearray(p.read_bytes())
    raw[:4] = b"BW64"
    p.write_bytes(bytes(raw))
    rate2, ch, frames, enc, off = wavio.wav_info(p)
    assert (rate2, ch, frames, enc) == (rate, 1, 4000, "PCM_16")
    d = wavio.read_frames(p, 0, 4000)
    assert d.shape == (4000, 1)


def test_w64_reads(rng, tmp_path):
    rate = 22050.0
    x = _tone(rng, 9000, 2, rate)
    q = np.clip(np.round(x.astype(np.float64) * 32768), -32768,
                32767).astype(np.int16)
    p = tmp_path / "t.w64"
    write_w64(p, q, rate)
    rate2, ch, frames, enc, off = wavio.wav_info(p)
    assert (rate2, ch, frames, enc) == (rate, 2, 9000, "PCM_16")
    d = wavio.read_frames(p, 1000, 2000)
    np.testing.assert_array_equal(
        np.round(d * 32768).astype(np.int16), q[1000:3000])
    # full parse + header-only scan
    data, r2, md, locs, labels = wavio.load_wav(p)
    assert len(data) == 9000 and r2 == rate
    assert wavio.scan_wav(p)[0] == rate


@needs_ffm
def test_rf64_against_ffmpeg_oracle(rng, tmp_path):
    """FFmpeg's own RF64 demuxer decodes our RF64 output bit-exactly."""
    rate = 16000.0
    x = _tone(rng, 16000, 2, rate)
    p = tmp_path / "o.wav"
    wavio.write_audio(p, x, rate, format="RF64")
    got = native.ff_audio_decode(p)
    assert got is not None
    samples, r2 = got
    assert r2 == rate
    ours, _ = wavio.load_audio(p)
    np.testing.assert_allclose(samples.astype(np.float64), ours,
                               atol=1.0 / 32768)


@needs_ffm
def test_w64_oracle_agrees(rng, tmp_path):
    rate = 16000.0
    x = _tone(rng, 8000, 1, rate)
    q = np.clip(np.round(x.astype(np.float64) * 32768), -32768,
                32767).astype(np.int16)
    p = tmp_path / "t.w64"
    write_w64(p, q, rate)
    got = native.ff_audio_decode(p)
    assert got is not None
    samples, r2 = got
    assert r2 == rate and len(samples) == 8000
    ours, _ = wavio.load_audio(p)
    np.testing.assert_allclose(samples.astype(np.float64), ours,
                               atol=1.0 / 32768)


def test_write_audio_autopromotes(rng, tmp_path, monkeypatch):
    """Payloads past the 32-bit cap switch to RF64 instead of dying in
    struct.pack (cap shrunk so the test runs on bytes, not GBs)."""
    monkeypatch.setattr(wavio, "_RIFF_MAX", 1 << 16)
    rate = 8000.0
    x = _tone(rng, 50000, 1, rate)  # 100 kB payload > 64 kB cap
    p = tmp_path / "auto.wav"
    wavio.write_audio(p, x, rate)
    assert p.read_bytes()[:4] == b"RF64"
    d, r = wavio.load_audio(p)
    assert len(d) == 50000 and r == rate
    # below the cap stays plain RIFF
    p2 = tmp_path / "small.wav"
    wavio.write_audio(p2, x[:1000], rate)
    assert p2.read_bytes()[:4] == b"RIFF"


def test_wavwriter_stays_riff_when_small(rng, tmp_path):
    rate = 8000.0
    x = _tone(rng, 6000, 2, rate)
    p = tmp_path / "s.wav"
    with wavio.WavWriter(p, rate, 2) as w:
        for k in range(0, 6000, 1000):
            w.write(x[k : k + 1000])
    assert p.read_bytes()[:4] == b"RIFF"
    d, r = wavio.load_audio(p)
    q = np.clip(np.round(x.astype(np.float64) * 32768), -32768,
                32767) / 32768.0
    np.testing.assert_allclose(d, q, atol=1e-12)
    # int16 fast path appends the same bytes
    p2 = tmp_path / "i.wav"
    with wavio.WavWriter(p2, rate, 2) as w:
        w.write((q[:3000] * 32768).astype(np.int16))
        w.write((q[3000:] * 32768).astype(np.int16))
    np.testing.assert_array_equal(wavio.load_audio(p2)[0], q)


def test_wavwriter_promotes_to_rf64(rng, tmp_path, monkeypatch):
    monkeypatch.setattr(wavio, "_RIFF_MAX", 1 << 15)
    rate = 8000.0
    x = _tone(rng, 40000, 1, rate)  # 80 kB > 32 kB cap
    p = tmp_path / "p.wav"
    with wavio.WavWriter(p, rate, 1) as w:
        w.write(x)
    assert p.read_bytes()[:4] == b"RF64"
    info = wavio.wav_info(p)
    assert info[2] == 40000
    d, r = wavio.load_audio(p)
    assert len(d) == 40000
    got = wavio.read_frames(p, 39000, 1000, info)
    q = np.clip(np.round(x.astype(np.float64) * 32768), -32768,
                32767) / 32768.0
    np.testing.assert_allclose(got, q[39000:], atol=1e-12)


def test_wavwriter_odd_bpf_pads(rng, tmp_path):
    """PCM_24 mono has an odd bytes-per-frame: the close path must pad
    the data chunk to even length and keep the true size in the header."""
    rate = 8000.0
    x = _tone(rng, 999, 1, rate)
    p = tmp_path / "odd.wav"
    with wavio.WavWriter(p, rate, 1, encoding="PCM_24") as w:
        w.write(x)
    info = wavio.wav_info(p)
    assert info[2:4] == (999, "PCM_24")
    d, r = wavio.load_audio(p)
    np.testing.assert_allclose(d[:, 0], x[:, 0], atol=2.0 / (1 << 23))


def test_sparse_rf64_beyond_4gib(tmp_path):
    """A REAL >4 GiB single-file recording: written sparsely (headers +
    probe regions only touch disk), promoted to RF64 on close, opened in
    O(header), and windowed reads come back exact — the stress corpus
    can be ONE file (VERDICT r4 #1 done-criterion)."""
    rate = 96000.0
    channels = 16
    bpf = channels * 2
    head = (np.arange(4096)[:, None] * np.ones((1, channels))
            ).astype(np.int16)
    tail = -head[::-1].copy()
    p = tmp_path / "big.wav"
    n_mid = (5 * (1 << 30)) // bpf  # ~5 GiB of silence, sparse
    with wavio.WavWriter(p, rate, channels) as w:
        w.write(head)
        w.skip_frames(n_mid)
        w.write(tail)
    total = 4096 + n_mid + 4096
    assert p.stat().st_size == 44 + 36 + total * bpf  # hdr+JUNK+fmt+data
    if p.stat().st_blocks * 512 > 200 * (1 << 20):
        pytest.skip("filesystem does not support sparse files")
    with p.open("rb") as f:
        assert f.read(4) == b"RF64"
    t0 = time.monotonic()
    info = wavio.wav_info(p)
    open_s = time.monotonic() - t0
    assert open_s < 1.0, f"header scan took {open_s:.2f}s"
    assert info[1] == channels and info[2] == total
    assert info[3] == "PCM_16" and info[4] is not None
    # windowed float reads across the head, a mid hole, and the tail
    got = wavio.read_frames(p, 0, 4096, info)
    np.testing.assert_array_equal(
        np.round(got * 32768).astype(np.int16), head)
    mid = wavio.read_frames(p, total // 2, 1000, info)
    assert not mid.any()
    got = wavio.read_frames(p, total - 4096, 4096, info)
    np.testing.assert_array_equal(
        np.round(got * 32768).astype(np.int16), tail)
    # the out-of-core loader (raw16 device-upload path included)
    ld = AudioLoader(p)
    try:
        assert ld.frames == total and ld.raw16_capable
        out = np.empty((4096, channels), np.int16)
        got16 = ld.read_raw16_into(total - 4096, 4096, out)
        np.testing.assert_array_equal(got16, tail)
    finally:
        ld.close()


def test_truncated_and_mutated_rf64_never_crash(rng, tmp_path):
    rate = 8000.0
    x = _tone(rng, 3000, 2, rate)
    base = tmp_path / "base.wav"
    wavio.write_audio(base, x, rate, format="RF64")
    raw = base.read_bytes()
    for cut in (0, 3, 11, 12, 20, 30, 44, 70, len(raw) // 2,
                len(raw) - 1):
        p = tmp_path / f"cut{cut}.wav"
        p.write_bytes(raw[:cut])
        try:
            info = wavio.wav_info(p)
            d = wavio.read_frames(p, 0, min(info[2], 100))
            assert d.shape[1] == info[1]
        except (wavio.WavError, ValueError):
            pass
    for trial in range(30):
        buf = bytearray(raw)
        for _ in range(int(rng.integers(1, 6))):
            buf[int(rng.integers(0, 80))] = int(rng.integers(0, 256))
        p = tmp_path / f"mut{trial}.wav"
        p.write_bytes(bytes(buf))
        try:
            info = wavio.wav_info(p)
            assert info[0] > 0 and info[1] > 0 and info[2] >= 0
            wavio.read_frames(p, 0, min(info[2], 100))
            wavio.scan_wav(p)
        except (wavio.WavError, ValueError, OSError):
            pass


def test_w64_truncations_never_crash(rng, tmp_path):
    rate = 8000.0
    x = _tone(rng, 2000, 1, rate)
    q = np.clip(np.round(x.astype(np.float64) * 32768), -32768,
                32767).astype(np.int16)
    base = tmp_path / "base.w64"
    write_w64(base, q, rate)
    raw = base.read_bytes()
    for cut in (0, 8, 15, 16, 39, 40, 63, 64, 100, len(raw) - 5):
        p = tmp_path / f"cut{cut}.w64"
        p.write_bytes(raw[:cut])
        try:
            info = wavio.wav_info(p)
            wavio.read_frames(p, 0, min(info[2], 50))
        except (wavio.WavError, ValueError):
            pass


def test_streamed_riff_placeholder_size_clamps(rng, tmp_path):
    """A plain-RIFF file whose data size field is the 0xFFFFFFFF
    streaming placeholder (writer died before patching) clamps frames by
    the real file size instead of reporting 4 G frames."""
    rate = 8000.0
    x = _tone(rng, 2000, 1, rate)
    p = tmp_path / "t.wav"
    wavio.write_audio(p, x, rate)
    raw = bytearray(p.read_bytes())
    off = raw.find(b"data")
    raw[off + 4 : off + 8] = b"\xff\xff\xff\xff"
    p.write_bytes(bytes(raw))
    info = wavio.wav_info(p)
    assert info[2] == 2000
    d = wavio.read_frames(p, 0, 2000, info)
    assert len(d) == 2000


def test_wavwriter_crash_recovery_placeholder(rng, tmp_path):
    """A writer that never reaches close() (process died) must leave a
    readable file: the 0xFFFFFFFF placeholder sizes make readers clamp
    the data span by the file size instead of reporting 0 frames."""
    rate = 8000.0
    x = _tone(rng, 5000, 2, rate)
    q = np.clip(np.round(x.astype(np.float64) * 32768), -32768,
                32767).astype(np.int16)
    p = tmp_path / "crashed.wav"
    w = wavio.WavWriter(p, rate, 2)
    w.write(q)
    w._f.flush()
    w._f = None  # simulate the process dying before close()
    info = wavio.wav_info(p)
    assert info[2] == 5000, "crashed writer output must stay readable"
    d, r = wavio.load_audio(p)
    assert r == rate
    np.testing.assert_array_equal(
        np.round(d * 32768).astype(np.int16), q)


def test_compress_cli_on_rf64(rng, tmp_path):
    """audian-compress builds the overview artifact for an RF64 source
    through the real CLI (the >4 GiB stress leg runs this at scale;
    here the container handling is pinned in the default suite)."""
    from audian_tpu.cli import compress

    rate = 8000.0
    x = _tone(rng, int(20 * rate), 2, rate)
    p = tmp_path / "rec.wav"
    wavio.write_audio(p, x, rate, format="RF64", encoding="PCM_16")
    assert p.read_bytes()[:4] == b"RF64"
    assert compress.main([str(p)]) == 0
    art = tmp_path / "rec-fulltrace.wav"
    assert art.exists() and art.stat().st_size > 1000


def test_multifile_recording_mixes_rf64_and_wav(rng, tmp_path):
    """A multi-file recording may mix RIFF and RF64 parts (a recorder
    that crossed 4 GiB mid-take): frames concatenate and reads cross
    the boundary exactly, raw16 path included."""
    rate = 8000.0
    a = _tone(rng, 4000, 2, rate)
    b = _tone(rng, 3000, 2, rate)
    pa = tmp_path / "part1.wav"
    pb = tmp_path / "part2.wav"
    wavio.write_audio(pa, a, rate, encoding="PCM_16")
    wavio.write_audio(pb, b, rate, format="RF64", encoding="PCM_16")
    qa = np.clip(np.round(a.astype(np.float64) * 32768), -32768,
                 32767) / 32768.0
    qb = np.clip(np.round(b.astype(np.float64) * 32768), -32768,
                 32767) / 32768.0
    ld = AudioLoader([pa, pb])
    try:
        assert ld.frames == 7000 and ld.raw16_capable
        got = np.asarray(ld[3900:4100])
        np.testing.assert_allclose(got[:100], qa[3900:], atol=1e-7)
        np.testing.assert_allclose(got[100:], qb[:100], atol=1e-7)
        out = np.empty((200, 2), np.int16)
        g16 = ld.read_raw16_into(3900, 200, out)
        np.testing.assert_allclose(g16 / 32768.0, got, atol=0)
    finally:
        ld.close()


def test_browser_opens_rf64(rng, tmp_path):
    """DataBrowser end-to-end on an RF64 source: open, scroll, tiles."""
    from audian_tpu.app import DataBrowser

    rate = 8000.0
    x = _tone(rng, int(6 * rate), 2, rate)
    p = tmp_path / "r.wav"
    wavio.write_audio(p, x, rate, format="RF64", encoding="PCM_16")
    b = DataBrowser(p, buffer_time=2.0, back_time=0.5).open()
    try:
        b.set_times(0.0, 1.0)
        t, v = b.trace_tile("filtered", 0)
        assert len(v) and np.all(np.isfinite(v))
        b.set_times(4.5, 1.0)  # forces a window slide
        t, v = b.trace_tile("filtered", 1)
        assert len(v)
        img, rect = b.spec_tile(0, quantize=True)
        assert img.size
    finally:
        b.close()


def test_w64_metadata_chunks_parse(rng, tmp_path):
    """W64 carries bext/LIST chunks as GUID chunks with the same
    bodies; the scanners must fold them into metadata like RIFF's."""
    rate = 8000.0
    q = np.clip(np.round(_tone(rng, 2000, 1, rate) * 32768), -32768,
                32767).astype(np.int16)
    bext = (b"a W64 description".ljust(256, b"\x00")
            + b"orig".ljust(32, b"\x00") + b"ref".ljust(32, b"\x00")
            + b"2026-08-21" + b"01:02:03"
            + struct.pack("<II", 12345, 0) + struct.pack("<H", 1)
            + b"\x00" * (64 + 10 + 180))
    p = tmp_path / "m.w64"
    write_w64(p, q, rate, extra_chunks=[(b"bext", bext)])
    rate2, md, locs, labels = wavio.scan_wav(p)
    assert rate2 == rate
    assert md["BEXT"]["Description"] == "a W64 description"
    assert md["BEXT"]["OriginationDate"] == "2026-08-21"
    assert md["BEXT"]["TimeReference"] == 12345
    assert wavio.get_datetime(md) is not None
    # full parse carries the same metadata
    _d, _r, md2, _l, _lb = wavio.load_wav(p)
    assert md2["BEXT"]["Description"] == "a W64 description"
