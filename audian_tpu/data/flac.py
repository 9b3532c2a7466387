"""Native FLAC support: decoder (+ a subset encoder) with no external
dependencies.

The reference hard-depends on SoundFile/libsndfile so FLAC recordings
always open (`/root/reference/pyproject.toml:17`); here WAV is decoded
in-repo and everything else used to require the optional ``soundfile``
extra.  This module closes that gap for FLAC — the dominant compressed
format for bioacoustics archives — so ``audian recording.flac`` works on
a bare install:

- **decoder**: the full FLAC subset streams actually use — fixed and
  variable blocking, all block-size/sample-rate/sample-size codes,
  independent + left/side + right/side + mid/side channel assignments,
  CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, wasted bits,
  RICE and RICE2 residuals with partitions and escape codes;
- **random access**: a per-file frame index built by a sync-code scan
  with CRC-8 validated headers, so the out-of-core loader decodes only
  the frames covering a requested window;
- **encoder** (:func:`write_flac`): 16-bit, fixed 4096-sample blocks,
  per-channel best-of CONSTANT / FIXED(0-2) / VERBATIM with Rice
  residuals — a valid stream any FLAC decoder reads, used by
  ``write_audio(..., encoding="FLAC")`` and the round-trip tests.

The hot decode loop also exists in C++ (``audian_tpu.native``); this
Python implementation is the correctness reference and the fallback
when the native library cannot build.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

__all__ = ["is_flac", "flac_info", "read_flac", "write_flac",
           "read_frames", "flac_metadata", "FlacError"]


from .wavio import WavError


class FlacError(WavError):
    """FLAC parse/decode failure — a :class:`wavio.WavError`, so the
    open/read error contracts treat corrupt FLAC like corrupt WAV."""


# -- CRCs (FLAC polynomials) ------------------------------------------------------


def _crc_table(poly, bits):
    table = np.zeros(256, np.uint32)
    top = 1 << (bits - 1)
    mask = (1 << bits) - 1
    for i in range(256):
        c = i << (bits - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if (c & top) else (c << 1)
        table[i] = c & mask
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data):
    c = 0
    for b in data:
        c = int(_CRC8[(c ^ b) & 0xFF])
    return c


def _crc16(data):
    c = 0
    for b in data:
        c = int(_CRC16[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# -- bit I/O ---------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over a bytes buffer."""

    def __init__(self, buf, pos=0):
        self.buf = buf
        self.pos = pos      # byte position
        self.bit = 0        # bits consumed of buf[pos]

    def read(self, nbits):
        v = 0
        while nbits > 0:
            if self.pos >= len(self.buf):
                raise FlacError("truncated FLAC stream")
            avail = 8 - self.bit
            take = min(nbits, avail)
            byte = self.buf[self.pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            nbits -= take
        return v

    def read_signed(self, nbits):
        v = self.read(nbits)
        if v >= (1 << (nbits - 1)):
            v -= 1 << nbits
        return v

    def read_unary(self):
        n = 0
        while True:
            if self.pos >= len(self.buf):
                raise FlacError("truncated FLAC stream")
            byte = self.buf[self.pos]
            avail = 8 - self.bit
            chunk = byte & ((1 << avail) - 1)
            if chunk == 0:
                n += avail
                self.bit = 0
                self.pos += 1
                continue
            lead = avail - chunk.bit_length()
            n += lead
            self.bit += lead + 1
            if self.bit >= 8:
                self.bit -= 8
                self.pos += 1
            return n

    def align(self):
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value, nbits):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, n):
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)

    def align(self):
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self):
        assert self.nacc == 0
        return bytes(self.out)


# -- stream-level parsing ---------------------------------------------------------


def is_flac(path):
    try:
        with Path(path).open("rb") as f:
            return f.read(4) == b"fLaC"
    except OSError:
        return False


def _read_streaminfo(f):
    """Parse the metadata blocks; returns (info dict, first audio byte)."""
    if f.read(4) != b"fLaC":
        raise FlacError("not a FLAC stream")
    info = None
    comments = {}
    while True:
        hdr = f.read(4)
        if len(hdr) < 4:
            raise FlacError("truncated FLAC metadata")
        last = bool(hdr[0] & 0x80)
        btype = hdr[0] & 0x7F
        size = int.from_bytes(hdr[1:4], "big")
        body = f.read(size)
        if len(body) < size:
            raise FlacError("truncated FLAC metadata block")
        if btype == 4:  # VORBIS_COMMENT ("KEY=value" pairs)
            try:
                (vlen,) = struct.unpack_from("<I", body, 0)
                pos = 4 + vlen
                (ncom,) = struct.unpack_from("<I", body, pos)
                pos += 4
                for _ in range(ncom):
                    (clen,) = struct.unpack_from("<I", body, pos)
                    pos += 4
                    entry = body[pos : pos + clen].decode(
                        "utf-8", "replace")
                    pos += clen
                    key, _, value = entry.partition("=")
                    if key:
                        comments[key] = value
            except (struct.error, IndexError):
                pass  # malformed comment block: audio still decodes
        if btype == 0:
            br = _BitReader(body)
            min_bs = br.read(16)
            max_bs = br.read(16)
            br.read(24)  # min frame size
            br.read(24)  # max frame size
            rate = br.read(20)
            channels = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
            info = dict(min_blocksize=min_bs, max_blocksize=max_bs,
                        rate=rate, channels=channels, bits=bits,
                        total=total)
        if last:
            break
    if info is None:
        raise FlacError("FLAC stream without STREAMINFO")
    info["comments"] = comments
    return info, f.tell()


def flac_info(path):
    """``(rate, channels, frames, encoding, None)`` — the
    :func:`audian_tpu.data.wavio.wav_info` tuple shape (no byte offset:
    FLAC frames are found through the frame index)."""
    with Path(path).open("rb") as f:
        info, _ = _read_streaminfo(f)
    if info["total"] == 0:
        # "unknown length" streams: the frame index knows the truth
        try:
            info = _open(path).sinfo
        except FlacError:
            pass  # no frames at all: report the declared zero
    return (float(info["rate"]), int(info["channels"]),
            int(info["total"]), f"FLAC_{info['bits']}", None)


# -- frame header parsing ---------------------------------------------------------

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _parse_frame_header(buf, pos, sinfo):
    """Parse and CRC-validate a frame header at byte ``pos``.

    Returns ``(reader, blocksize, channel_assignment, bits, position)``
    where ``position`` is the frame's first-sample index, or ``None``
    when the bytes are not a valid frame header (sync-scan rejection).
    """
    br = _BitReader(buf, pos)
    try:
        if br.read(14) != 0x3FFE or br.read(1) != 0:
            return None
        variable = br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        ss_code = br.read(3)
        if br.read(1) != 0 or bs_code == 0 or ca > 10 or ss_code == 3:
            return None
        # UTF-8-style coded frame/sample number (up to 36/31 bits)
        first = br.read(8)
        if first < 0x80:
            num = first
        else:
            nbytes = 0
            probe = first
            while probe & 0x40:
                nbytes += 1
                probe <<= 1
            if not (probe & 0x80) or nbytes < 1 or nbytes > 6:
                return None
            num = first & (0x3F >> nbytes)
            for _ in range(nbytes):
                cont = br.read(8)
                if (cont & 0xC0) != 0x80:
                    return None
                num = (num << 6) | (cont & 0x3F)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            rate = sinfo["rate"]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        elif sr_code == 15:
            return None
        else:
            rate = _RATE_CODES[sr_code]
        bits = sinfo["bits"] if ss_code == 0 else _SIZE_CODES[ss_code]
        if br.bit != 0 or br.pos >= len(buf):
            # header always ends byte-aligned before CRC-8; a candidate
            # ending exactly at EOF is not a frame
            return None
        crc = buf[br.pos]
        if _crc8(buf[pos : br.pos]) != crc:
            return None
        br.pos += 1
        nch = (ca + 1) if ca < 8 else 2
        if nch != sinfo["channels"] or rate != sinfo["rate"] \
                or bits != sinfo["bits"]:
            return None
        position = num if variable else num * sinfo["max_blocksize"]
        return br, blocksize, ca, bits, position
    except FlacError:
        return None


# -- frame decoding ---------------------------------------------------------------


def _decode_residual(br, blocksize, order):
    method = br.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    npart = 1 << po
    if blocksize % npart or (blocksize >> po) < order:
        raise FlacError("invalid partition order")
    out = np.empty(blocksize - order, np.int64)
    idx = 0
    for p in range(npart):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(n):
                out[idx + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += n
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _decode_subframe(br, blocksize, bps):
    if br.read(1) != 0:
        raise FlacError("invalid subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps = bps - wasted
    if bps <= 0 or bps > 33:
        raise FlacError("invalid wasted-bits count")
    if stype == 0:  # CONSTANT
        x = np.full(blocksize, br.read_signed(bps), np.int64)
    elif stype == 1:  # VERBATIM
        x = np.fromiter((br.read_signed(bps) for _ in range(blocksize)),
                        np.int64, blocksize)
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        if order > blocksize:
            raise FlacError("predictor order exceeds block size")
        x = np.empty(blocksize, np.int64)
        for i in range(order):
            x[i] = br.read_signed(bps)
        res = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            acc = res[i - order]
            for j, c in enumerate(coefs):
                acc += c * x[i - 1 - j]
            x[i] = acc
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        if order > blocksize:
            raise FlacError("predictor order exceeds block size")
        x = np.empty(blocksize, np.int64)
        for i in range(order):
            x[i] = br.read_signed(bps)
        precision = br.read(4)
        if precision == 15:
            raise FlacError("invalid LPC precision code")
        precision += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(x[i - 1 - j])
            x[i] = (acc >> shift) + res[i - order]
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        x = x << wasted
    return x


def _decode_frame(buf, pos, sinfo):
    parsed = _parse_frame_header(buf, pos, sinfo)
    if parsed is None:
        raise FlacError(f"no valid frame header at byte {pos}")
    br, blocksize, ca, bits, position = parsed
    nch = sinfo["channels"]
    chans = []
    for c in range(nch):
        bps = bits
        if (ca == 8 and c == 1) or (ca == 9 and c == 0) \
                or (ca == 10 and c == 1):
            bps += 1  # the side channel carries one extra bit
        chans.append(_decode_subframe(br, blocksize, bps))
    if ca == 8:      # left/side: right = left - side
        left, side = chans
        chans = [left, left - side]
    elif ca == 9:    # side/right: left = side + right
        side, right = chans
        chans = [side + right, right]
    elif ca == 10:   # mid/side
        mid, side = chans
        m = (mid << 1) | (side & 1)
        chans = [(m + side) >> 1, (m - side) >> 1]
    br.align()
    br.pos += 2  # CRC-16 (frame integrity; headers were CRC-8 checked)
    return np.stack(chans, axis=1), position, br.pos


# -- frame index ------------------------------------------------------------------


def _longest_increasing(values):
    """Indices of the longest strictly-increasing subsequence.

    Ties keep the FIRST occurrence: a later candidate with an equal
    value cannot extend a strict chain any further, and replacing the
    tail would let a sync-scan impostor that duplicates a real frame's
    position displace the real frame from the index."""
    import bisect

    tails = []      # smallest tail value per chain length
    tail_idx = []   # index of that tail
    prev = [-1] * len(values)
    for i, v in enumerate(values):
        j = bisect.bisect_left(tails, v)
        if j < len(tails) and tails[j] == v:
            continue  # duplicate value: first occurrence stays
        if j == len(tails):
            tails.append(v)
            tail_idx.append(i)
        else:
            tails[j] = v
            tail_idx[j] = i
        prev[i] = tail_idx[j - 1] if j else -1
    out = []
    i = tail_idx[-1] if tail_idx else -1
    while i >= 0:
        out.append(i)
        i = prev[i]
    return out[::-1]


class _FlacFile:
    """Parsed stream + CRC-validated frame index for random access."""

    def __init__(self, path):
        self.path = Path(path)
        buf = self.path.read_bytes()
        self.buf = buf
        with self.path.open("rb") as f:
            self.sinfo, self.audio_start = _read_streaminfo(f)
        # sync-code scan: candidate 0xFF bytes, validated by full header
        # parse + CRC-8 + streaminfo consistency + monotonic positions
        data = np.frombuffer(buf, np.uint8)
        cand = np.nonzero(data[self.audio_start : -1] == 0xFF)[0]
        cand = cand[(data[self.audio_start + cand + 1] & 0xFC) == 0xF8]
        offsets, positions = [], []
        for rel in cand:
            off = self.audio_start + int(rel)
            parsed = _parse_frame_header(buf, off, self.sinfo)
            if parsed is None:
                continue
            offsets.append(off)
            positions.append(parsed[4])
        if not offsets:
            if self.sinfo["total"] == 0:  # valid zero-length stream
                self.offsets = np.zeros(0, np.int64)
                self.positions = np.zeros(0, np.int64)
                self._cache = {}
                return
            raise FlacError(f"{path}: no FLAC frames found")
        # a sync-scan false positive (random payload bytes that parse as
        # a header AND pass CRC-8 + streaminfo consistency) would poison
        # a greedy monotonic filter: one impostor with a huge coded
        # number makes every later REAL frame non-increasing.  Real
        # frames form the longest strictly-increasing position chain;
        # keep that chain (O(n log n) LIS) so isolated impostors drop
        # out instead of the rest of the file.
        keep = _longest_increasing(positions)
        self.offsets = np.asarray([offsets[i] for i in keep], np.int64)
        self.positions = np.asarray([positions[i] for i in keep],
                                    np.int64)
        if self.sinfo["total"] == 0 and len(self.offsets):
            # legal "unknown length" streams (piped encoders): derive
            # the total from the index + the last frame's header
            parsed = _parse_frame_header(buf, int(self.offsets[-1]),
                                         self.sinfo)
            self.sinfo["total"] = int(self.positions[-1]) + parsed[1]
        self._cache = {}  # frame index -> decoded (blocksize, ch) int

    def decode_frame(self, k):
        hit = self._cache.get(k)
        if hit is None:
            from .. import native

            decode = getattr(native, "flac_decode_frame", None)
            hit = decode(self.buf, int(self.offsets[k]),
                         self.sinfo) if decode else None
            if hit is None:  # no native library: Python reference path
                hit, _pos, _end = _decode_frame(self.buf,
                                                int(self.offsets[k]),
                                                self.sinfo)
            if len(self._cache) > 8:
                self._cache.clear()
            self._cache[k] = hit
        return hit

    def read(self, start, nframes):
        """Decoded samples [start, start+nframes) as (n, ch) int64."""
        total = self.sinfo["total"]
        start = max(0, min(int(start), total))
        nframes = max(0, min(int(nframes), total - start))
        out = np.zeros((nframes, self.sinfo["channels"]), np.int64)
        if nframes == 0:
            return out
        k = int(np.searchsorted(self.positions, start, side="right")) - 1
        k = max(k, 0)
        filled = 0
        while filled < nframes and k < len(self.offsets):
            frame = self.decode_frame(k)
            fpos = int(self.positions[k])
            lo = max(start + filled - fpos, 0)
            hi = min(len(frame), start + nframes - fpos)
            if hi > lo:
                out[fpos + lo - start : fpos + hi - start] = frame[lo:hi]
            filled = fpos + max(hi, 0) - start
            k += 1
        return out


_OPEN = {}  # (path, mtime, size) -> _FlacFile (tiny LRU)


def _cache_key(p):
    st = p.stat()
    return (str(p), st.st_mtime_ns, st.st_size)


def _open(path):
    p = Path(path)
    key = _cache_key(p)
    ff = _OPEN.get(key)
    if ff is None:
        if len(_OPEN) > 4:
            _OPEN.clear()
        ff = _FlacFile(p)
        _OPEN[key] = ff
    return ff


def read_frames(path, start, nframes, info=None):
    """Frames [start, start+nframes) as float64 in [-1, 1) — the
    :func:`wavio.read_frames` contract (sample = k / 2**(bits-1))."""
    ff = _open(path)
    bits = ff.sinfo["bits"]
    return ff.read(start, nframes).astype(np.float64) / (1 << (bits - 1))


def read_flac(path):
    """(data, rate): decode a whole FLAC file (float64 in [-1, 1))."""
    ff = _open(path)
    return (read_frames(path, 0, ff.sinfo["total"]),
            float(ff.sinfo["rate"]))


def flac_metadata(path):
    """VORBIS_COMMENT tags as a flat dict (empty when absent).

    Header-only (the scan_wav 'milliseconds' contract): the whole-file
    frame index is reused when already cached but never built here."""
    p = Path(path)
    try:
        ff = _OPEN.get(_cache_key(p))
    except OSError:
        ff = None
    if ff is not None:
        return dict(ff.sinfo["comments"])
    with p.open("rb") as f:
        info, _ = _read_streaminfo(f)
    return dict(info["comments"])


# -- encoder (16-bit subset) ------------------------------------------------------


def _utf8_number(n):
    """FLAC's UTF-8-style coded frame number (1-7 bytes)."""
    if n < 0x80:
        return bytes([n])
    # nbytes continuation bytes carry 6 bits each; the lead byte carries
    # (6 - nbytes) payload bits
    nbytes = 1
    while nbytes < 6 and n >= (1 << ((6 - nbytes) + 6 * nbytes)):
        nbytes += 1
    lead = (0xFF << (7 - nbytes)) & 0xFF
    shift = 6 * nbytes
    out = [lead | (n >> shift)]
    for _ in range(nbytes):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _rice_cost(res, param):
    u = (np.abs(res) << 1) - (res < 0)
    return int(np.sum(u >> param)) + len(res) * (1 + param)


def _best_rice_param(res):
    if len(res) == 0:
        return 0
    mean = float(np.mean(np.abs(res))) + 1e-9
    guess = max(int(np.log2(mean + 1)), 0)
    best, best_cost = 0, None
    for p in range(max(guess - 2, 0), min(guess + 3, 14)):
        cost = _rice_cost(res, p)
        if best_cost is None or cost < best_cost:
            best, best_cost = p, cost
    return best


def _write_residual(bw, res):
    param = _best_rice_param(res)
    bw.write(0, 2)   # RICE (4-bit params)
    bw.write(0, 4)   # partition order 0
    bw.write(param, 4)
    for v in res:
        v = int(v)
        u = (-v * 2 - 1) if v < 0 else (2 * v)
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _encode_subframe(bw, x, bps):
    x = np.asarray(x, np.int64)
    n = len(x)
    if n and np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0, 6)   # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]), bps)
        return
    best_order, best_res, best_cost = None, None, None
    for order, coefs in ((0, []), (1, [1]), (2, [2, -1])):
        if n <= order:
            continue
        res = x[order:].copy()
        for j, c in enumerate(coefs):
            res = res - c * x[order - 1 - j : n - 1 - j]
        cost = order * bps + _rice_cost(res, _best_rice_param(res))
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    if best_cost is None or best_cost >= n * bps:
        bw.write(0, 1)
        bw.write(1, 6)   # VERBATIM
        bw.write(0, 1)
        for v in x:
            bw.write(int(v), bps)
        return
    bw.write(0, 1)
    bw.write(8 + best_order, 6)  # FIXED
    bw.write(0, 1)
    for v in x[:best_order]:
        bw.write(int(v), bps)
    _write_residual(bw, best_res)


def _flatten_md(md, prefix=""):
    out = []
    for key, value in (md or {}).items():
        if isinstance(value, dict):
            out += _flatten_md(value, f"{prefix}{key}.")
        else:
            out.append((f"{prefix}{key}", str(value)))
    return out


def write_flac(path, data, rate, blocksize=4096, metadata=None):
    """Encode ``data`` (float in [-1, 1] or int16; shape (n,) or
    (n, ch)) as a 16-bit FLAC file.  ``metadata`` (a possibly nested
    dict) is stored as VORBIS_COMMENT tags (nested keys dotted)."""
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    if data.dtype == np.int16:
        q = data.astype(np.int64)
    elif np.issubdtype(data.dtype, np.integer):
        raise FlacError("integer FLAC input must be int16")
    else:
        q = np.clip(np.round(np.asarray(data, np.float64) * 32768.0),
                    -32768, 32767).astype(np.int64)
    n, channels = q.shape
    if not 1 <= channels <= 8:
        raise FlacError(f"unsupported channel count {channels}")
    rate = int(round(float(rate)))
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    body = si.out + bytes(16)  # md5 unknown (zeros) is allowed
    tags = _flatten_md(metadata)
    last_flag = 0x00 if tags else 0x80
    out += bytes([last_flag]) + len(body).to_bytes(3, "big") + bytes(body)
    if tags:
        vendor = b"audian-tpu"
        vc = struct.pack("<I", len(vendor)) + vendor
        vc += struct.pack("<I", len(tags))
        for key, value in tags:
            entry = f"{key}={value}".encode("utf-8")
            vc += struct.pack("<I", len(entry)) + entry
        out += bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc
    for fnum, pos in enumerate(range(0, n, blocksize)):
        block = q[pos : pos + blocksize]
        bs = len(block)
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)          # fixed blocking strategy
        full = bs == blocksize and blocksize in (
            256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
        if full:
            hdr.write({256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                       8192: 13, 16384: 14, 32768: 15}[blocksize], 4)
        else:
            hdr.write(7, 4)      # 16-bit blocksize-1 at header end
        hdr.write(0, 4)          # sample rate from STREAMINFO
        hdr.write(channels - 1, 4)
        hdr.write(4, 3)          # 16 bits per sample
        hdr.write(0, 1)
        for b in _utf8_number(fnum):
            hdr.write(b, 8)
        if not full:
            hdr.write(bs - 1, 16)
        hdr.align()
        head = bytes(hdr.out)
        frame = bytearray(head)
        frame.append(_crc8(head))
        bw = _BitWriter()
        for c in range(channels):
            _encode_subframe(bw, block[:, c], 16)
        bw.align()
        frame += bw.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    Path(path).write_bytes(bytes(out))
    return Path(path)
