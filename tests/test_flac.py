"""Native FLAC support (data/flac.py + native/flacdec.cc).

Round trips through the in-repo encoder, plus HAND-BUILT streams for
every decoder feature the subset encoder does not emit — LPC subframes,
all stereo decorrelations, Rice partitions, RICE2, escape codes, wasted
bits, variable blocking, 24-bit — validated against independently
computed expectations (forward math in the test, inverse math in the
decoder).  Where the native C++ decoder is available, every decode is
additionally cross-checked against the pure-Python reference decoder.
"""

import struct

import numpy as np
import pytest

from audian_tpu import native
from audian_tpu.data import flac, wavio
from audian_tpu.data.flac import (FlacError, _BitWriter, _crc8, _crc16,
                                  _utf8_number)


# -- hand-built streams -----------------------------------------------------------


def stream_header(rate, channels, bits, total, max_bs):
    si = _BitWriter()
    si.write(max_bs, 16)
    si.write(max_bs, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    body = si.out + bytes(16)
    return (b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big")
            + bytes(body))


def make_frame(rate, channels, bits, max_bs, blocksize, ca, num,
               write_subframes, variable=False):
    hdr = _BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 1)
    hdr.write(1 if variable else 0, 1)
    hdr.write(7, 4)               # 16-bit blocksize-1 at header end
    hdr.write(0, 4)               # rate from STREAMINFO
    hdr.write(ca, 4)
    hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits], 3)
    hdr.write(0, 1)
    for b in _utf8_number(num):
        hdr.write(b, 8)
    hdr.write(blocksize - 1, 16)
    hdr.align()
    head = bytes(hdr.out)
    frame = bytearray(head)
    frame.append(_crc8(head))
    bw = _BitWriter()
    write_subframes(bw)
    bw.align()
    frame += bw.bytes()
    frame += _crc16(frame).to_bytes(2, "big")
    return bytes(frame)


def verbatim_subframe(bw, x, bps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in x:
        bw.write(int(v), bps)


def rice_residual(bw, res, param, method=0, po=0, order=0,
                  blocksize=None):
    pbits = 4 if method == 0 else 5
    bw.write(method, 2)
    bw.write(po, 4)
    npart = 1 << po
    idx = 0
    for p in range(npart):
        n = (blocksize >> po) - (order if p == 0 else 0)
        bw.write(param, pbits)
        for v in res[idx : idx + n]:
            v = int(v)
            u = (-2 * v - 1) if v < 0 else (2 * v)
            bw.write_unary(u >> param)
            if param:
                bw.write(u & ((1 << param) - 1), param)
        idx += n


def impostor_header(num, blocksize_code=12, channels_code=0,
                    bits_code=4):
    """A CRC-8-valid frame-header byte string with coded number ``num``
    — the sync-scan false positive the index filter must survive."""
    imp = _BitWriter()
    imp.write(0x3FFE, 14)
    imp.write(0, 2)
    imp.write(blocksize_code, 4)
    imp.write(0, 4)
    imp.write(channels_code, 4)
    imp.write(bits_code, 3)
    imp.write(0, 1)
    for b in _utf8_number(num):
        imp.write(b, 8)
    imp.align()
    head = bytes(imp.out)
    return head + bytes([_crc8(head)])


def decode_stream(buf, tmp_path, name="hand.flac"):
    """Decode via the public path (frame index + native when built) AND
    the pure-Python reference decoder; assert they agree."""
    p = tmp_path / name
    p.write_bytes(buf)
    data, rate = flac.read_flac(p)
    ff = flac._open(p)
    bits = ff.sinfo["bits"]
    # python reference, frame by frame
    ref = np.concatenate(
        [flac._decode_frame(ff.buf, int(off), ff.sinfo)[0]
         for off in ff.offsets])[: ff.sinfo["total"]]
    np.testing.assert_array_equal(
        data * (1 << (bits - 1)), ref.astype(np.float64))
    return data * (1 << (bits - 1)), rate


# -- encoder round trips ----------------------------------------------------------


def test_roundtrip_bit_exact(rng, tmp_path):
    rate = 48000.0
    t = np.arange(30000) / rate
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.2 * np.sin(2 * np.pi * 880 * t)
                  + 0.01 * rng.standard_normal(len(t))], axis=1)
    q = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)
    p = tmp_path / "a.flac"
    flac.write_flac(p, q, rate)
    assert p.stat().st_size < q.nbytes  # actually compresses
    assert flac.flac_info(p) == (48000.0, 2, 30000, "FLAC_16", None)
    got, r = flac.read_flac(p)
    assert r == 48000.0
    np.testing.assert_array_equal(got * 32768.0, q.astype(np.float64))
    # random access hits the same samples
    want = q.astype(np.float64) / 32768.0
    np.testing.assert_array_equal(flac.read_frames(p, 12345, 700),
                                  want[12345:13045])
    tail = flac.read_frames(p, 29900, 500)  # clamps at the end
    assert tail.shape == (100, 2)
    np.testing.assert_array_equal(tail, want[29900:])


def test_roundtrip_constant_and_odd_length(tmp_path):
    x = np.zeros((10000, 1), np.int16)
    x[:5000] = 123
    p = tmp_path / "c.flac"
    flac.write_flac(p, x, 8000)
    assert p.stat().st_size < 2000  # constant blocks are tiny
    got, _ = flac.read_flac(p)
    np.testing.assert_array_equal(got * 32768, x.astype(np.float64))
    # non-multiple-of-blocksize length: last partial frame
    x2 = (np.arange(5003) % 251 - 125).astype(np.int16)
    p2 = tmp_path / "odd.flac"
    flac.write_flac(p2, x2, 8000)
    got2, _ = flac.read_flac(p2)
    np.testing.assert_array_equal(got2[:, 0] * 32768,
                                  x2.astype(np.float64))


def test_roundtrip_many_channels(rng, tmp_path):
    q = (rng.integers(-2000, 2000, (9000, 5))).astype(np.int16)
    p = tmp_path / "m.flac"
    flac.write_flac(p, q, 20000)
    got, _ = flac.read_flac(p)
    np.testing.assert_array_equal(got * 32768, q.astype(np.float64))


def test_metadata_vorbis_comments(tmp_path):
    p = tmp_path / "md.flac"
    flac.write_flac(p, np.zeros((100, 1), np.int16), 8000,
                    metadata={"Comment": "hello",
                              "BEXT": {"OriginationDate": "2026-01-01"}})
    md = flac.flac_metadata(p)
    assert md == {"Comment": "hello",
                  "BEXT.OriginationDate": "2026-01-01"}


# -- hand-built decoder-feature streams -------------------------------------------


def test_decode_lpc_subframe(rng, tmp_path):
    """LPC subframes: residual computed forward in the test, the decoder
    must invert it exactly."""
    rate, bits, bs = 16000, 16, 512
    x = np.round(12000 * np.sin(2 * np.pi * 440 *
                                np.arange(bs) / rate)).astype(np.int64)
    order, shift = 3, 10
    coefs = [1536, -512, 64]  # 12-bit precision

    res = []
    for i in range(order, bs):
        pred = sum(coefs[j] * int(x[i - 1 - j]) for j in range(order))
        res.append(int(x[i]) - (pred >> shift))

    def subframes(bw):
        bw.write(0, 1)
        bw.write(32 + (order - 1), 6)  # LPC, order 3
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(int(v), bits)
        bw.write(12 - 1, 4)            # precision
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, 12)
        rice_residual(bw, res, 6, order=order, blocksize=bs)

    buf = stream_header(rate, 1, bits, bs, bs) + make_frame(
        rate, 1, bits, bs, bs, 0, 0, subframes)
    got, _ = decode_stream(buf, tmp_path, "lpc.flac")
    np.testing.assert_array_equal(got[:, 0], x.astype(np.float64))


@pytest.mark.parametrize("ca", [8, 9, 10])
def test_decode_stereo_decorrelation(rng, ca, tmp_path):
    """left/side, side/right, and mid/side reconstruction (including the
    mid/side LSB trick)."""
    rate, bits, bs = 8000, 16, 256
    l = rng.integers(-20000, 20000, bs).astype(np.int64)
    r = rng.integers(-20000, 20000, bs).astype(np.int64)
    side = l - r
    mid = (l + r) >> 1

    def subframes(bw):
        if ca == 8:      # left, side(+1 bit)
            verbatim_subframe(bw, l, bits)
            verbatim_subframe(bw, side, bits + 1)
        elif ca == 9:    # side(+1 bit), right
            verbatim_subframe(bw, side, bits + 1)
            verbatim_subframe(bw, r, bits)
        else:            # mid, side(+1 bit)
            verbatim_subframe(bw, mid, bits)
            verbatim_subframe(bw, side, bits + 1)

    buf = stream_header(rate, 2, bits, bs, bs) + make_frame(
        rate, 2, bits, bs, bs, ca, 0, subframes)
    got, _ = decode_stream(buf, tmp_path, f"stereo{ca}.flac")
    np.testing.assert_array_equal(got[:, 0], l.astype(np.float64))
    np.testing.assert_array_equal(got[:, 1], r.astype(np.float64))


def test_decode_partitions_rice2_and_escape(rng, tmp_path):
    """Fixed-order subframe with 4 Rice partitions: quiet RICE2 parts
    plus an escaped (raw binary) partition."""
    rate, bits, bs = 8000, 16, 256
    order = 1
    res = rng.integers(-40, 40, bs - order).astype(np.int64)
    x = np.empty(bs, np.int64)
    x[0] = 1000
    for i in range(order, bs):
        x[i] = x[i - 1] + res[i - order]

    def subframes(bw):
        bw.write(0, 1)
        bw.write(8 + order, 6)   # FIXED order 1
        bw.write(0, 1)
        bw.write(int(x[0]), bits)
        bw.write(1, 2)           # RICE2 (5-bit params)
        bw.write(2, 4)           # partition order 2 -> 4 partitions
        idx = 0
        for p in range(4):
            n = (bs >> 2) - (order if p == 0 else 0)
            part = res[idx : idx + n]
            if p == 2:           # escaped partition: raw 8-bit residuals
                bw.write(31, 5)
                bw.write(8, 5)
                for v in part:
                    bw.write(int(v), 8)
            else:
                bw.write(5, 5)
                for v in part:
                    v = int(v)
                    u = (-2 * v - 1) if v < 0 else (2 * v)
                    bw.write_unary(u >> 5)
                    bw.write(u & 31, 5)
            idx += n

    buf = stream_header(rate, 1, bits, bs, bs) + make_frame(
        rate, 1, bits, bs, bs, 0, 0, subframes)
    got, _ = decode_stream(buf, tmp_path, "parts.flac")
    np.testing.assert_array_equal(got[:, 0], x.astype(np.float64))


def test_decode_wasted_bits(rng, tmp_path):
    """Subframes with wasted (shifted-out) low bits."""
    rate, bits, bs = 8000, 16, 128
    wasted = 3
    base = rng.integers(-3000, 3000, bs).astype(np.int64)
    x = base << wasted

    def subframes(bw):
        bw.write(0, 1)
        bw.write(1, 6)           # VERBATIM
        bw.write(1, 1)           # wasted-bits flag
        bw.write_unary(wasted - 1)
        for v in base:
            bw.write(int(v), bits - wasted)

    buf = stream_header(rate, 1, bits, bs, bs) + make_frame(
        rate, 1, bits, bs, bs, 0, 0, subframes)
    got, _ = decode_stream(buf, tmp_path, "wasted.flac")
    np.testing.assert_array_equal(got[:, 0], x.astype(np.float64))


def test_decode_variable_blocking_and_24bit(rng, tmp_path):
    """Variable blocking strategy (sample-number coded headers, mixed
    block sizes) at 24 bits per sample."""
    rate, bits = 8000, 24
    sizes = [192, 64, 300]
    xs = [rng.integers(-(1 << 22), 1 << 22, n).astype(np.int64)
          for n in sizes]
    buf = stream_header(rate, 1, bits, sum(sizes), 4096)
    pos = 0
    for x, n in zip(xs, sizes):
        buf += make_frame(rate, 1, bits, 4096, n, 0, pos,
                          lambda bw, x=x: verbatim_subframe(bw, x, bits),
                          variable=True)
        pos += n
    got, _ = decode_stream(buf, tmp_path, "var24.flac")
    np.testing.assert_array_equal(got[:, 0],
                                  np.concatenate(xs).astype(np.float64))


def test_native_matches_python_per_frame(rng, tmp_path):
    if not native.available():
        pytest.skip("no native library")
    q = (rng.integers(-30000, 30000, (20000, 2))).astype(np.int16)
    p = tmp_path / "nat.flac"
    flac.write_flac(p, q, 44100)
    ff = flac._open(p)
    for k in range(len(ff.offsets)):
        nat = native.flac_decode_frame(ff.buf, int(ff.offsets[k]),
                                       ff.sinfo)
        ref, _, _ = flac._decode_frame(ff.buf, int(ff.offsets[k]),
                                       ff.sinfo)
        assert nat is not None
        np.testing.assert_array_equal(nat, ref)


# -- wavio + loader + browser integration -----------------------------------------


def test_wavio_routes_flac(rng, tmp_path):
    rate = 8000.0
    x = (0.2 * rng.standard_normal((4000, 2))).astype(np.float32)
    p = tmp_path / "rec.flac"
    wavio.write_audio(p, x, rate, metadata={"Comment": "c"})
    assert wavio.wav_info(p)[3] == "FLAC_16"
    data, r = wavio.load_audio(p)
    assert r == rate and data.shape == (4000, 2)
    assert wavio.metadata(p) == {"Comment": "c"}
    locs, labels = wavio.markers(p)
    assert len(locs) == 0
    q = np.clip(np.round(x.astype(np.float64) * 32768), -32768,
                32767) / 32768.0
    np.testing.assert_array_equal(data, q)
    np.testing.assert_array_equal(
        wavio.read_frames(p, 100, 50), q[100:150])
    # markers cannot be stored in FLAC: loud error, not silent loss
    with pytest.raises(ValueError, match="marker"):
        wavio.write_audio(tmp_path / "m.flac", x, rate,
                          locs=np.array([[10, 5]]),
                          labels=np.array([["a", "b"]], object))


def test_loader_and_browser_on_flac(rng, tmp_path):
    from audian_tpu.app import DataBrowser
    from audian_tpu.data.loader import AudioLoader

    rate = 8000.0
    t = np.arange(int(12 * rate)) / rate
    x = np.stack([0.4 * np.sin(2 * np.pi * 700 * t)
                  * (np.sin(2 * np.pi * 3 * t) > 0)
                  + 0.02 * rng.standard_normal(len(t)),
                  0.3 * np.sin(2 * np.pi * 350 * t)],
                 axis=1).astype(np.float32)
    q = np.clip(np.round(x.astype(np.float64) * 32768), -32768,
                32767) / 32768.0
    p = tmp_path / "rec.flac"
    wavio.write_audio(p, x, rate)
    ld = AudioLoader([p])
    assert (ld.frames, ld.channels, ld.encoding) == (len(t), 2, "FLAC_16")
    assert ld.raw16_capable  # 16-bit FLAC serves the int16 fast path
    np.testing.assert_allclose(np.asarray(ld[30000:31000]),
                               q[30000:31000], atol=1e-7)
    ld.close()
    b = DataBrowser(str(p))
    b.open()
    try:
        b.set_times(3.0, 2.0)
        i0, i1 = int(3.5 * rate), int(4.0 * rate)
        got = np.asarray(b.data["data"][i0:i1])
        np.testing.assert_allclose(got, q[i0:i1], atol=1e-6)
        times, values = b.trace_tile("filtered", 0)
        assert len(times) > 0
        img, rect = b.spec_tile(0, quantize=True)
        assert img.size > 0
    finally:
        b.close()


# -- robustness -------------------------------------------------------------------


def test_corrupt_flac_raises_not_crashes(rng, tmp_path):
    p = tmp_path / "x.flac"
    flac.write_flac(p, (rng.integers(-100, 100, (5000, 1))
                        ).astype(np.int16), 8000)
    blob = bytearray(p.read_bytes())
    # truncated stream
    (tmp_path / "t.flac").write_bytes(blob[: len(blob) // 3])
    try:
        flac.read_flac(tmp_path / "t.flac")
    except (FlacError, wavio.WavError):
        pass
    # corrupted metadata length
    bad = bytearray(blob)
    bad[5] = 0xFF
    (tmp_path / "b.flac").write_bytes(bad)
    with pytest.raises((FlacError, wavio.WavError)):
        flac.flac_info(tmp_path / "b.flac")
    # random byte flips in the audio region must never crash the
    # decoder (wrong samples are fine; exceptions must be FlacError)
    for seed in range(10):
        r = np.random.default_rng(seed)
        fuzz = bytearray(blob)
        for _ in range(6):
            off = int(r.integers(60, len(fuzz)))
            fuzz[off] = int(r.integers(0, 256))
        (tmp_path / "f.flac").write_bytes(fuzz)
        flac._OPEN.clear()
        try:
            flac.read_flac(tmp_path / "f.flac")
        except (FlacError, wavio.WavError):
            pass


def test_bad_input_errors(tmp_path):
    with pytest.raises(FlacError, match="range"):
        flac.write_flac(tmp_path / "x.flac",
                        np.full(10, 70000, np.int32), 8000, bits=16)
    with pytest.raises(FlacError, match="bit depth"):
        flac.write_flac(tmp_path / "x.flac",
                        np.zeros(10, np.int16), 8000, bits=17)
    with pytest.raises(FlacError, match="channel"):
        flac.write_flac(tmp_path / "x.flac",
                        np.zeros((10, 9), np.int16), 8000)


# -- review-finding regressions ---------------------------------------------------


def test_eof_header_candidate_is_rejected(rng, tmp_path):
    """A valid-looking 5-byte header prefix at EOF must be rejected by
    the index scan, not raise IndexError."""
    p = tmp_path / "eof.flac"
    flac.write_flac(p, (rng.integers(-100, 100, (3000, 1))
                        ).astype(np.int16), 8000)
    blob = p.read_bytes() + b"\xff\xf8\xc9\x08\x00"
    p2 = tmp_path / "eof2.flac"
    p2.write_bytes(blob)
    got, _ = flac.read_flac(p2)
    assert got.shape == (3000, 1)


def test_false_positive_sync_does_not_poison_index(rng, tmp_path):
    """An impostor frame header with a huge coded number embedded in the
    payload must not make the index drop every later real frame."""
    q = (rng.integers(-20000, 20000, (20000, 1))).astype(np.int16)
    p = tmp_path / "base.flac"
    flac.write_flac(p, q, 8000)
    ff = flac._open(p)
    assert len(ff.offsets) >= 4
    # craft a CRC-valid header claiming an absurd frame number and
    # insert it between two real frames
    blob = bytearray(p.read_bytes())
    cut = int(ff.offsets[2])
    blob[cut:cut] = impostor_header(10_000_000)
    p2 = tmp_path / "poisoned.flac"
    p2.write_bytes(bytes(blob))
    got, _ = flac.read_flac(p2)
    want = q.astype(np.float64) / 32768.0
    np.testing.assert_array_equal(got, want)


def test_unknown_length_stream(rng, tmp_path):
    """STREAMINFO total_samples = 0 is legal ('unknown'); the length
    comes from the frame index."""
    q = (rng.integers(-5000, 5000, (9000, 1))).astype(np.int16)
    p = tmp_path / "u.flac"
    flac.write_flac(p, q, 8000)
    blob = bytearray(p.read_bytes())
    # zero the 36-bit total_samples field (bytes 21..25 of STREAMINFO,
    # low nibble of byte 21): STREAMINFO body starts at offset 8
    blob[8 + 13] &= 0xF0
    for k in range(14, 18):
        blob[8 + k] = 0
    p2 = tmp_path / "u0.flac"
    p2.write_bytes(bytes(blob))
    assert flac.flac_info(p2)[2] == 9000
    got, _ = flac.read_flac(p2)
    np.testing.assert_array_equal(got * 32768, q.astype(np.float64))


def test_invalid_subframes_raise_flacerror(tmp_path):
    """Predictor order > blocksize and wasted bits >= bps must raise
    FlacError (a WavError), never IndexError/ValueError."""
    rate, bits, bs = 8000, 16, 16

    def lpc_order_too_big(bw):
        bw.write(0, 1)
        bw.write(32 + 31, 6)  # LPC order 32 > blocksize 16
        bw.write(0, 1)
        for _ in range(32):
            bw.write(0, bits)

    def too_many_wasted(bw):
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(1, 1)
        bw.write_unary(bits)  # wasted = bits+1 > bps

    for name, sub in (("order.flac", lpc_order_too_big),
                      ("wasted.flac", too_many_wasted)):
        buf = stream_header(rate, 1, bits, bs, bs) + make_frame(
            rate, 1, bits, bs, bs, 0, 0, sub)
        p = tmp_path / name
        p.write_bytes(buf)
        flac._OPEN.clear()
        with pytest.raises(wavio.WavError):
            flac.read_flac(p)
    assert issubclass(FlacError, wavio.WavError)


def test_write_empty_and_format_none(tmp_path):
    p = tmp_path / "empty.flac"
    flac.write_flac(p, np.zeros((0, 2), np.int16), 8000)
    got, rate = flac.read_flac(p)
    assert got.shape == (0, 2) and rate == 8000.0
    assert flac.flac_info(p)[2] == 0
    # audioio convention: format=None means "infer" — WAV by default
    pw = tmp_path / "fmt.wav"
    wavio.write_audio(pw, np.zeros((10, 1), np.float32), 8000,
                      format=None)
    assert wavio.wav_info(pw)[3] == "PCM_16"


def test_duplicate_position_impostor_keeps_real_frame(rng, tmp_path):
    """A CRC-valid impostor header DUPLICATING a real frame's position
    must not displace the real frame from the index (LIS tie rule:
    first occurrence wins)."""
    q = (rng.integers(-20000, 20000, (20000, 1))).astype(np.int16)
    p = tmp_path / "dup.flac"
    flac.write_flac(p, q, 8000)
    ff = flac._open(p)
    assert len(ff.offsets) >= 3
    blob = bytearray(p.read_bytes())
    cut = int(ff.offsets[1])  # after the real frame 0
    blob[cut:cut] = impostor_header(0)  # duplicates frame 0's position
    p2 = tmp_path / "dup2.flac"
    p2.write_bytes(bytes(blob))
    got, _ = flac.read_flac(p2)
    np.testing.assert_array_equal(got * 32768, q.astype(np.float64))


def test_float_recording_region_saves_to_flac(rng, tmp_path):
    """Region export of a FLOAT-encoded recording to a .flac target
    quantizes at 24 bits instead of raising (review regression: the
    FLAC branch's float-encoding rejection must not break the GUI save
    path; write_audio itself stays strict)."""
    from audian_tpu.app import DataBrowser

    rate = 8000.0
    x = (0.1 * rng.standard_normal((int(4 * rate), 2))
         ).astype(np.float32)
    p = tmp_path / "src.wav"
    wavio.write_audio(p, x, rate, encoding="FLOAT")
    b = DataBrowser(str(p)).open()
    try:
        out = b.save_region(1.0, 2.0, tmp_path / "sel.flac")
        info = wavio.wav_info(out)
        assert info[3] == "FLAC_24"
        got = wavio.read_frames(out, 0, info[2])
        np.testing.assert_allclose(
            got, x[int(rate) : 2 * int(rate)], atol=1.0 / (1 << 23))
    finally:
        b.close()
    # the API itself still refuses float encodings loudly
    with pytest.raises(ValueError, match="integer-only"):
        wavio.write_audio(tmp_path / "x.flac", x, rate,
                          encoding="FLOAT")


def test_python_encoder_fallback_matches_native(rng, tmp_path,
                                                monkeypatch):
    """write_flac routes through the C++ encoder when built; the pure
    Python encoder is the reference/fallback and must stay live: force
    the fallback and require identical decoded PCM (and that BOTH
    streams carry tags + a true MD5)."""
    q = np.clip(np.round(3000 * rng.normal(size=(9000, 2))),
                -(1 << 23), (1 << 23) - 1).astype(np.int32)
    pn = tmp_path / "native.flac"
    flac.write_flac(pn, q, 48000, bits=24, metadata={"K": "v"})
    monkeypatch.setattr(native, "flac_encode", lambda *a, **k: None)
    pp = tmp_path / "python.flac"
    flac.write_flac(pp, q, 48000, bits=24, metadata={"K": "v"})
    for p in (pn, pp):
        flac._OPEN.clear()
        np.testing.assert_array_equal(flac._open(p).read(0, len(q)), q)
        assert flac.flac_metadata(p) == {"K": "v"}
        raw = p.read_bytes()
        import hashlib

        le = np.ascontiguousarray(q.astype("<i4"))
        pcm = le.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
        assert raw[8 + 18 : 8 + 34] == hashlib.md5(pcm).digest()


def test_flac_raw16_loader_path(rng, tmp_path):
    """16-bit FLAC serves the loader's int16-upload fast path
    (`loader.read_raw16_into`) bit-exact — no float round trip — also
    across a mixed WAV+FLAC multi-file recording."""
    from audian_tpu.data.loader import AudioLoader

    q = np.clip(np.round(3000 * rng.normal(size=(5000, 3))),
                -32768, 32767).astype(np.int16)
    fp = tmp_path / "r16.flac"
    flac.write_flac(fp, q, 48000)
    wp = tmp_path / "r16.wav"
    wavio.write_audio(wp, q.astype(np.float64) / 32768.0, 48000,
                      encoding="PCM_16")
    al = AudioLoader([str(wp), str(fp)])
    assert al.raw16_capable
    out = np.empty((2000, 3), np.int16)
    al.read_raw16_into(4000, 2000, out)
    np.testing.assert_array_equal(
        out, np.concatenate([q[4000:], q[:1000]]))
    # 24-bit FLAC is not raw16-servable
    fp24 = tmp_path / "r24.flac"
    flac.write_flac(fp24, q.astype(np.int32) << 8, 48000, bits=24)
    assert not AudioLoader(str(fp24)).raw16_capable


def test_compress_cli_on_flac(rng, tmp_path):
    """audian-compress writes the overview artifact for FLAC sources
    (no data-chunk byte offset: the loader-decode fallback path)."""
    from audian_tpu.cli import compress

    rate = 8000.0
    x = (0.3 * rng.standard_normal((int(30 * rate), 2))
         ).astype(np.float32)
    p = tmp_path / "rec.flac"
    wavio.write_audio(p, x, rate)
    assert compress.main([str(p)]) == 0
    art = tmp_path / "rec-fulltrace.wav"
    assert art.exists() and art.stat().st_size > 1000


def test_multifile_recording_mixes_wav_and_flac(rng, tmp_path):
    """A multi-file recording may mix containers: frames concatenate
    and reads cross the file boundary exactly."""
    from audian_tpu.data.loader import AudioLoader

    rate = 8000.0
    a = (0.2 * rng.standard_normal((4000, 2))).astype(np.float32)
    b = (0.2 * rng.standard_normal((3000, 2))).astype(np.float32)
    pa = tmp_path / "part1.wav"
    pb = tmp_path / "part2.flac"
    wavio.write_audio(pa, a, rate, encoding="PCM_16")
    wavio.write_audio(pb, b, rate)
    qa = np.clip(np.round(a.astype(np.float64) * 32768), -32768,
                 32767) / 32768.0
    qb = np.clip(np.round(b.astype(np.float64) * 32768), -32768,
                 32767) / 32768.0
    ld = AudioLoader([pa, pb])
    assert ld.frames == 7000
    got = np.asarray(ld[3900:4100])
    np.testing.assert_allclose(got[:100], qa[3900:], atol=1e-7)
    np.testing.assert_allclose(got[100:], qb[:100], atol=1e-7)
    ld.close()


def test_write_flac_rejects_illegal_blocksize(rng, tmp_path):
    """Blocksize outside the FLAC-legal 16..65535 must raise instead of
    silently writing masked (corrupt) STREAMINFO/frame headers through
    the pure-Python fallback encoder (advisor r4)."""
    x = (0.1 * rng.standard_normal((256, 1))).astype(np.float32)
    for bs in (0, 8, 15, 65536, 1 << 20):
        with pytest.raises(flac.FlacError, match="blocksize"):
            flac.write_flac(tmp_path / "bad.flac", x, 8000.0,
                            blocksize=bs)
    flac.write_flac(tmp_path / "ok.flac", x, 8000.0, blocksize=16)


def test_fixed_strategy_rejected_when_streaminfo_variable(rng, tmp_path):
    """A fixed-blocking frame inside a stream whose STREAMINFO says
    min != max blocksize positions itself meaninglessly; both decoders
    must reject the frame loudly instead of mis-seeking (advisor r4)."""
    x = (0.1 * rng.standard_normal((3000, 1))).astype(np.float32)
    p = tmp_path / "t.flac"
    flac.write_flac(p, x, 8000.0, blocksize=256)
    raw = bytearray(p.read_bytes())
    # STREAMINFO: min_blocksize is bytes 8..10, max at 10..12
    assert raw[8:10] == raw[10:12] == (256).to_bytes(2, "big")
    raw[8:10] = (64).to_bytes(2, "big")  # now min != max, frames fixed
    bad = tmp_path / "bad.flac"
    bad.write_bytes(bytes(raw))
    with pytest.raises(flac.FlacError):
        flac.read_flac(bad)
