"""Lazy FLAC frame index (bisection seek + SEEKTABLE) vs the eager
sync-scan oracle.

The reference opens FLAC through libsndfile/libFLAC, which reads only
the metadata blocks at open and seeks by bisection — never a whole-file
scan (`/root/reference/pyproject.toml:17`).  `_FlacFile(index="lazy")`
reproduces that: open() is O(metadata), random access decode-verifies
bisection probes, SEEKTABLE points seed the search, and sequential
reads chain frame-to-frame through each frame's end offset.  The eager
index (exhaustive scan + LIS impostor filter) stays as the small-file
path and the oracle these tests compare against.
"""

import struct
from unittest import mock

import numpy as np
import pytest

from audian_tpu import native
from audian_tpu.data import flac


@pytest.fixture
def rng():
    return np.random.default_rng(20260821)


def _noise_flac(rng, path, n, channels=1, rate=48000, bits=16,
                blocksize=4096, **kw):
    lim = 1 << (bits - 1)
    q = rng.integers(-lim // 2, lim // 2, (n, channels))
    q = q.astype(np.int32 if bits > 16 else np.int16)
    flac.write_flac(path, q, rate, bits=bits, blocksize=blocksize, **kw)
    return q


def _both(path):
    return (flac._FlacFile(path, index="lazy"),
            flac._FlacFile(path, index="eager"))


def test_lazy_matches_eager_random_geometry(rng, tmp_path):
    """Random access + sequential reads agree with the eager oracle
    across bit depths, channel counts, block sizes, and odd lengths."""
    cases = [
        dict(n=10_001, channels=1, bits=16, blocksize=1024),
        dict(n=50_000, channels=2, bits=16, blocksize=4096),
        dict(n=30_000, channels=3, bits=24, blocksize=2048),
        dict(n=17_111, channels=1, bits=8, blocksize=576),
        dict(n=65_536, channels=2, bits=32, blocksize=4096),
    ]
    for i, c in enumerate(cases):
        p = tmp_path / f"g{i}.flac"
        _noise_flac(rng, p, **c)
        lazy, eager = _both(p)
        n = c["n"]
        for _ in range(8):
            s = int(rng.integers(0, n))
            m = int(rng.integers(1, n // 2))
            np.testing.assert_array_equal(lazy.read(s, m),
                                          eager.read(s, m), err_msg=str(c))
        np.testing.assert_array_equal(lazy.read(0, n), eager.read(0, n))


def test_auto_mode_picks_by_size(rng, tmp_path, monkeypatch):
    p = tmp_path / "auto.flac"
    _noise_flac(rng, p, 40_000)
    assert flac._FlacFile(p).index_mode == "eager"  # small file
    monkeypatch.setattr(flac, "_EAGER_INDEX_MAX", 1024)
    assert flac._FlacFile(p).index_mode == "lazy"


def test_seektable_written_and_seeds_the_seek(rng, tmp_path):
    """Both encoders emit a SEEKTABLE whose points land on real frame
    boundaries; a fresh lazy index reaches the tail in a handful of
    probes (seed + slack-bounded bisection, no full scan)."""
    rate, secs = 48000, 40
    n = rate * secs
    p = tmp_path / "seek.flac"
    _noise_flac(rng, p, n, channels=2, rate=rate)
    with p.open("rb") as f:
        info, a0 = flac._read_streaminfo(f)
    span = flac._seektable_layout(n, rate, 4096)[0]
    assert len(info["seekpoints"]) == -(-n // span) >= 3
    eager = flac._FlacFile(p, index="eager")
    offs = set(int(o) for o in eager.offsets)
    pos_of = {int(o): int(s)
              for o, s in zip(eager.offsets, eager.positions)}
    for sample, off in info["seekpoints"]:
        assert a0 + off in offs
        assert pos_of[a0 + off] == sample
    lazy = flac._FlacFile(p, index="lazy")
    got = lazy.read(n - 3000, 3000)
    np.testing.assert_array_equal(got, eager.read(n - 3000, 3000))
    assert lazy.n_probe_scans <= 10


def test_python_encoder_seektable_matches_native_layout(rng, tmp_path):
    pn = tmp_path / "nat.flac"
    pp = tmp_path / "py.flac"
    n, rate = 100_000, 8000
    q = rng.integers(-3000, 3000, (n, 1)).astype(np.int16)
    flac.write_flac(pn, q, rate)
    if native.get_lib() is None:
        pytest.skip("no native library (layouts trivially identical)")
    with mock.patch.object(native, "flac_encode", lambda *a, **k: None):
        flac.write_flac(pp, q, rate, metadata={"k": "v"})
    infos = []
    for p in (pn, pp):
        with p.open("rb") as f:
            info, _ = flac._read_streaminfo(f)
        infos.append(info)
    assert infos[0]["seekpoints"] == infos[1]["seekpoints"]
    assert infos[1]["comments"] == {"k": "v"}
    # fallback-encoded stream fully decodes through the eager index
    ff = flac._FlacFile(pp, index="eager")
    np.testing.assert_array_equal(ff.read(0, n)[:, 0], q[:, 0])


def test_lazy_is_loud_on_midfile_corruption(rng, tmp_path):
    """A flipped payload byte raises FlacError through the lazy chain
    (the CRC-16 contract — the reference's libsndfile path reports
    corrupt frames as read errors); clean regions still read."""
    p = tmp_path / "c.flac"
    n = 60_000
    _noise_flac(rng, p, n)
    eager = flac._FlacFile(p, index="eager")
    k = len(eager.offsets) // 2
    blob = bytearray(p.read_bytes())
    blob[int(eager.offsets[k]) + 24] ^= 0x55
    p2 = tmp_path / "c2.flac"
    p2.write_bytes(bytes(blob))
    lazy = flac._FlacFile(p2, index="lazy")
    mpos = int(eager.positions[k])
    with pytest.raises(flac.FlacError):
        lazy.read(max(mpos - 2000, 0), 6000)
    np.testing.assert_array_equal(lazy.read(0, 4000), eager.read(0, 4000))


def test_corrupt_seektable_degrades_to_bisection(rng, tmp_path):
    """Bogus SEEKTABLE byte offsets must not poison reads: seeds fail
    decode-verification, get dropped, and plain bisection takes over."""
    p = tmp_path / "s.flac"
    n = 80_000
    _noise_flac(rng, p, n)
    blob = bytearray(p.read_bytes())
    pos = 4
    while True:
        hdr = blob[pos]
        size = int.from_bytes(blob[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 3:
            for r in range(size // 18):
                base = pos + 4 + 18 * r + 8
                blob[base : base + 8] = (999 + 7 * r).to_bytes(8, "big")
            break
        assert not hdr & 0x80, "no SEEKTABLE found"
        pos += 4 + size
    p2 = tmp_path / "s2.flac"
    p2.write_bytes(bytes(blob))
    lazy = flac._FlacFile(p2, index="lazy")
    eager = flac._FlacFile(p, index="eager")
    s = n - 5000
    np.testing.assert_array_equal(lazy.read(s, 5000), eager.read(s, 5000))


def test_probe_count_and_anchor_memory_stay_bounded(rng, tmp_path):
    """Structural open-cost guarantee: K random accesses cost O(K log)
    probe scans and the anchor table stays far below the frame count."""
    p = tmp_path / "b.flac"
    n = 400_000
    _noise_flac(rng, p, n, blocksize=1024)  # ~391 frames
    lazy = flac._FlacFile(p, index="lazy")
    for _ in range(25):
        s = int(rng.integers(0, n - 100))
        lazy.read(s, 100)
    assert lazy.n_probe_scans <= 25 * 12
    assert len(lazy._apos) < 400


def test_open_reads_metadata_only(rng, tmp_path, monkeypatch):
    """Lazy open performs NO probe scan and touches no frame bytes —
    the O(metadata) open contract (libFLAC behavior)."""
    p = tmp_path / "o.flac"
    _noise_flac(rng, p, 120_000)
    lazy = flac._FlacFile(p, index="lazy")
    assert lazy.n_probe_scans == 0
    assert lazy._cache == {} and lazy._apos == []


def test_seed_tuple_bisect_edge(rng, tmp_path):
    """Reading exactly AT a seekpoint sample uses that seed."""
    rate = 48000
    n = rate * 25
    p = tmp_path / "e.flac"
    _noise_flac(rng, p, n, rate=rate)
    with p.open("rb") as f:
        info, _ = flac._read_streaminfo(f)
    sample = info["seekpoints"][1][0]
    lazy, eager = _both(p)
    np.testing.assert_array_equal(lazy.read(sample, 2000),
                                  eager.read(sample, 2000))
    assert lazy.n_probe_scans <= 2


def test_concurrent_lazy_reads_are_consistent(rng, tmp_path):
    """_FlacFile instances are shared across threads through the _OPEN
    cache (fulltrace overview thread + UI loader); concurrent lazy
    reads must return exactly what serial reads return and leave the
    anchor table sorted (review finding: unlocked paired-list mutation
    returned silently wrong samples)."""
    import threading

    p = tmp_path / "t.flac"
    n = 300_000
    q = _noise_flac(rng, p, n, blocksize=1024)
    lazy = flac._FlacFile(p, index="lazy")
    want = q.astype(np.int64)
    errors = []

    def worker(seed):
        r = np.random.default_rng(seed)
        try:
            for _ in range(30):
                s = int(r.integers(0, n - 200))
                m = int(r.integers(1, 5000))
                m = min(m, n - s)
                got = lazy.read(s, m)
                if not np.array_equal(got, want[s : s + m]):
                    errors.append((s, m))
        except Exception as e:  # noqa: BLE001 - collect, assert below
            errors.append(repr(e))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:5]
    assert lazy._apos == sorted(lazy._apos)


def test_corruption_before_window_does_not_raise(rng, tmp_path):
    """A corrupt frame wholly BEFORE the requested window must not
    fail the read (the eager path never decodes it); the chain resyncs
    past it.  Corruption OVERLAPPING the window still raises."""
    p = tmp_path / "a.flac"
    n = 120_000
    _noise_flac(rng, p, n, blocksize=1024)
    eager = flac._FlacFile(p, index="eager")
    k = 40
    blob = bytearray(p.read_bytes())
    blob[int(eager.offsets[k]) + 30] ^= 0x55
    p2 = tmp_path / "a2.flac"
    p2.write_bytes(bytes(blob))
    lazy = flac._FlacFile(p2, index="lazy")
    mpos = int(eager.positions[k])
    # anchor just before the corrupt frame, then read clean samples
    # a couple frames past it: approach path crosses the corruption
    lazy.read(max(mpos - 3000, 0), 2000)
    s = mpos + 3 * 1024
    np.testing.assert_array_equal(lazy.read(s, 1500), eager.read(s, 1500))
    with pytest.raises(flac.FlacError):
        lazy.read(mpos, 100)  # overlapping read stays loud


def _write_variable_flac(path, q, rate, sizes, bits=16):
    """A VARIABLE-blocksize stream (blocking-strategy bit set, coded
    number = first-sample index) — spec-legal, emitted by some
    encoders, never produced by the repo's fixed-block encoders, so the
    decoders' variable-position path gets explicit coverage here."""
    from audian_tpu.data.flac import (_BitWriter, _crc8, _crc16,
                                      _utf8_number, _plan_subframe,
                                      _write_subframe, _SS_CODES)
    import hashlib

    n, channels = q.shape
    assert sum(sizes) == n
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(min(sizes), 16)
    si.write(max(sizes), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(int(rate), 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    raw = q.astype("<i2").tobytes()
    body = si.out + hashlib.md5(raw).digest()
    out += b"\x80" + len(body).to_bytes(3, "big") + bytes(body)
    pos = 0
    for bs in sizes:
        block = q[pos : pos + bs]
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(1, 1)  # VARIABLE blocking strategy
        hdr.write(7, 4)  # 16-bit blocksize-1 at header end
        hdr.write(0, 4)
        hdr.write(channels - 1, 4)
        hdr.write(_SS_CODES[bits], 3)
        hdr.write(0, 1)
        for b in _utf8_number(pos):  # sample number, not frame number
            hdr.write(b, 8)
        hdr.write(bs - 1, 16)
        hdr.align()
        head = bytes(hdr.out)
        frame = bytearray(head)
        frame.append(_crc8(head))
        bw = _BitWriter()
        for c in range(channels):
            _write_subframe(bw, _plan_subframe(block[:, c], bits, 8), bs)
        bw.align()
        frame += bw.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        pos += bs
    path.write_bytes(bytes(out))


def test_variable_blocksize_stream_lazy_and_eager(rng, tmp_path):
    """Variable-blocking streams decode identically through both index
    modes, frame positions come from the coded SAMPLE numbers, and the
    external FFmpeg oracle bit-matches."""
    n = 60_000
    q = rng.integers(-12000, 12000, (n, 2)).astype(np.int64)
    sizes = []
    left = n
    r = np.random.default_rng(5)
    while left > 8192:
        bs = int(r.choice([4096, 576, 2048, 1024, 192]))
        sizes.append(bs)
        left -= bs
    sizes.append(left)
    p = tmp_path / "var.flac"
    _write_variable_flac(p, q, 8000, sizes)
    lazy, eager = _both(p)
    assert len(eager.offsets) == len(sizes)
    np.testing.assert_array_equal(eager.positions,
                                  np.cumsum([0] + sizes[:-1]))
    np.testing.assert_array_equal(lazy.read(0, n), q)
    np.testing.assert_array_equal(eager.read(0, n), q)
    for _ in range(10):
        s = int(rng.integers(0, n - 100))
        m = int(rng.integers(1, 9000))
        np.testing.assert_array_equal(lazy.read(s, m), eager.read(s, m))
    if native.ffm_available():
        dec, rate, bits = native.ff_flac_decode(p)
        assert rate == 8000 and bits == 16
        np.testing.assert_array_equal(dec.astype(np.int64), q)


def test_truncated_file_raises_through_lazy_chain(rng, tmp_path):
    """A file cut mid-frame: reads that need the cut region fail
    loudly; earlier regions still read."""
    p = tmp_path / "t.flac"
    n = 100_000
    _noise_flac(rng, p, n, blocksize=1024)
    blob = p.read_bytes()
    p2 = tmp_path / "t2.flac"
    p2.write_bytes(blob[: int(len(blob) * 0.6)])
    lazy = flac._FlacFile(p2, index="lazy")
    eager = flac._FlacFile(p, index="eager")
    np.testing.assert_array_equal(lazy.read(0, 2000), eager.read(0, 2000))
    with pytest.raises(flac.FlacError):
        lazy.read(n - 4000, 4000)


def test_unknown_length_stream_forces_eager(rng, tmp_path):
    """STREAMINFO total=0 needs the full scan to learn the length."""
    p = tmp_path / "u.flac"
    n = 30_000
    _noise_flac(rng, p, n)
    blob = bytearray(p.read_bytes())
    # zero the 36-bit total: low nibble of byte 4+4+13 and bytes 18..21
    base = 8  # start of STREAMINFO body
    blob[base + 13] &= 0xF0
    blob[base + 14 : base + 18] = b"\x00" * 4
    p2 = tmp_path / "u2.flac"
    p2.write_bytes(bytes(blob))
    ff = flac._FlacFile(p2)
    assert ff.index_mode == "eager"
    assert ff.sinfo["total"] == n
