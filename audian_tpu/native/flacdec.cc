// Native FLAC frame decoder — the hot loop behind audian_tpu.data.flac.
//
// The Python module owns stream parsing, the CRC-validated frame index,
// and the random-access logic; this file decodes ONE frame (bit-level
// Rice/LPC work, ~100x the pure-Python throughput).  The Python decoder
// remains the correctness reference and the fallback when no compiler is
// available; both implement the same subset (CONSTANT / VERBATIM /
// FIXED 0-4 / LPC 1-32 subframes, RICE + RICE2 residuals with partitions
// and escape codes, wasted bits, all stereo decorrelations).

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
    const uint8_t* buf;
    int64_t len;
    int64_t pos;   // byte position
    int bit;       // bits consumed of buf[pos]
    bool bad;

    BitReader(const uint8_t* b, int64_t l, int64_t p)
        : buf(b), len(l), pos(p), bit(0), bad(false) {}

    uint64_t read(int nbits) {
        uint64_t v = 0;
        while (nbits > 0) {
            if (pos >= len) { bad = true; return 0; }
            int avail = 8 - bit;
            int take = nbits < avail ? nbits : avail;
            uint8_t byte = buf[pos];
            v = (v << take) |
                ((byte >> (avail - take)) & ((1u << take) - 1u));
            bit += take;
            if (bit == 8) { bit = 0; pos++; }
            nbits -= take;
        }
        return v;
    }

    int64_t read_signed(int nbits) {
        uint64_t v = read(nbits);
        if (nbits > 0 && (v >> (nbits - 1)))
            return (int64_t)v - ((int64_t)1 << nbits);
        return (int64_t)v;
    }

    int64_t read_unary() {
        int64_t n = 0;
        for (;;) {
            if (pos >= len) { bad = true; return 0; }
            uint8_t chunk = buf[pos] & ((1u << (8 - bit)) - 1u);
            if (chunk == 0) {
                n += 8 - bit;
                bit = 0;
                pos++;
                continue;
            }
            int hi = 31 - __builtin_clz((unsigned)chunk);  // top set bit
            int lead = (8 - bit) - 1 - hi;
            n += lead;
            bit += lead + 1;
            if (bit >= 8) { bit -= 8; pos++; }
            return n;
        }
    }

    void align() { if (bit) { bit = 0; pos++; } }
};

const int kBlocksizeCodes[16] = {0,    192,  576,   1152,  2304, 4608,
                                 -8,   -16,  256,   512,   1024, 2048,
                                 4096, 8192, 16384, 32768};
const int kSizeCodes[8] = {0, 8, 12, -1, 16, 20, 24, 32};

// CRC-16 (poly 0x8005, init 0, MSB-first) over the whole frame: bit
// corruption inside a payload must fail loudly (return -1 → the caller
// surfaces a FlacError), matching the libsndfile error contract.
struct Crc16Table {
    uint16_t t[256];
    Crc16Table() {
        for (unsigned i = 0; i < 256; i++) {
            unsigned c = i << 8;
            for (int k = 0; k < 8; k++)
                c = (c & 0x8000u) ? ((c << 1) ^ 0x8005u) : (c << 1);
            t[i] = (uint16_t)c;
        }
    }
};
const Crc16Table kCrc16;

uint16_t crc16(const uint8_t* p, int64_t n) {
    uint16_t c = 0;
    for (int64_t i = 0; i < n; i++)
        c = (uint16_t)(kCrc16.t[((c >> 8) ^ p[i]) & 0xFF] ^ (c << 8));
    return c;
}

bool decode_residual(BitReader& br, int blocksize, int order,
                     int64_t* res) {
    int method = (int)br.read(2);
    if (method > 1) return false;
    int pbits = method == 0 ? 4 : 5;
    unsigned escape = (1u << pbits) - 1u;
    int po = (int)br.read(4);
    int npart = 1 << po;
    if (blocksize % npart || (blocksize >> po) < order) return false;
    int64_t idx = 0;
    for (int p = 0; p < npart; p++) {
        int n = (blocksize >> po) - (p == 0 ? order : 0);
        unsigned param = (unsigned)br.read(pbits);
        if (param == escape) {
            int raw = (int)br.read(5);
            for (int i = 0; i < n; i++)
                res[idx + i] = raw ? br.read_signed(raw) : 0;
        } else {
            for (int i = 0; i < n; i++) {
                uint64_t q = (uint64_t)br.read_unary();
                uint64_t u = (q << param) | br.read(param);
                res[idx + i] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
            }
        }
        idx += n;
        if (br.bad) return false;
    }
    return true;
}

const int kFixedCoefs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_subframe(BitReader& br, int blocksize, int bps, int64_t* x,
                     int64_t* scratch) {
    if (br.read(1) != 0) return false;
    int stype = (int)br.read(6);
    int wasted = 0;
    if (br.read(1)) wasted = (int)br.read_unary() + 1;
    bps -= wasted;
    if (bps <= 0 || bps > 33) return false;
    if (stype == 0) {  // CONSTANT
        int64_t v = br.read_signed(bps);
        for (int i = 0; i < blocksize; i++) x[i] = v;
    } else if (stype == 1) {  // VERBATIM
        for (int i = 0; i < blocksize; i++) x[i] = br.read_signed(bps);
    } else if (stype >= 8 && stype <= 12) {  // FIXED
        int order = stype - 8;
        if (order > blocksize) return false;  // before any warmup write
        for (int i = 0; i < order; i++) x[i] = br.read_signed(bps);
        if (!decode_residual(br, blocksize, order, scratch)) return false;
        const int* c = kFixedCoefs[order];
        for (int i = order; i < blocksize; i++) {
            int64_t acc = scratch[i - order];
            for (int j = 0; j < order; j++) acc += c[j] * x[i - 1 - j];
            x[i] = acc;
        }
    } else if (stype >= 32) {  // LPC
        int order = (stype & 31) + 1;
        if (order > blocksize) return false;  // before any warmup write
        for (int i = 0; i < order; i++) x[i] = br.read_signed(bps);
        int precision = (int)br.read(4);
        if (precision == 15) return false;
        precision += 1;
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;
        int64_t coefs[32];
        for (int j = 0; j < order; j++)
            coefs[j] = br.read_signed(precision);
        if (!decode_residual(br, blocksize, order, scratch)) return false;
        for (int i = order; i < blocksize; i++) {
            int64_t acc = 0;
            for (int j = 0; j < order; j++)
                acc += coefs[j] * x[i - 1 - j];
            x[i] = (acc >> shift) + scratch[i - order];
        }
    } else {
        return false;
    }
    if (br.bad) return false;
    if (wasted)
        for (int i = 0; i < blocksize; i++) x[i] <<= wasted;
    return true;
}

}  // namespace

extern "C" {

// Decode one frame whose (already CRC-validated) header starts at byte
// `pos`.  `out` receives interleaved int32 samples (blocksize*channels);
// `work` is caller-provided scratch of 3*max_blocksize int64.  When
// `meta` is non-null it receives {first-sample position, end byte
// offset past the frame CRC-16} — the lazy bisection index follows
// frame chains through these.  Returns the blocksize, or -1 on any
// parse error (caller falls back to the Python reference decoder).
int64_t an_flac_decode_frame(const uint8_t* buf, int64_t len, int64_t pos,
                             int rate, int channels, int bits,
                             int max_blocksize, int32_t* out,
                             int64_t* work, int64_t* meta) {
    BitReader br(buf, len, pos);
    if (br.read(14) != 0x3FFE || br.read(1) != 0) return -1;
    int variable = (int)br.read(1);  // blocking strategy
    int bs_code = (int)br.read(4);
    int sr_code = (int)br.read(4);
    int ca = (int)br.read(4);
    int ss_code = (int)br.read(3);
    if (br.read(1) != 0 || bs_code == 0 || ca > 10 || ss_code == 3)
        return -1;
    // UTF-8-style coded frame/sample number
    uint64_t num;
    unsigned first = (unsigned)br.read(8);
    if (first < 0x80u) {
        num = first;
    } else {
        int nbytes = 0;
        unsigned probe = first;
        while (probe & 0x40u) { nbytes++; probe <<= 1; }
        if (!(probe & 0x80u) || nbytes < 1 || nbytes > 6) return -1;
        num = first & (0x3Fu >> nbytes);
        for (int i = 0; i < nbytes; i++) {
            unsigned cont = (unsigned)br.read(8);
            if ((cont & 0xC0u) != 0x80u) return -1;
            num = (num << 6) | (cont & 0x3Fu);
        }
    }
    int blocksize;
    if (bs_code == 6) blocksize = (int)br.read(8) + 1;
    else if (bs_code == 7) blocksize = (int)br.read(16) + 1;
    else blocksize = kBlocksizeCodes[bs_code];
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);
    else if (sr_code == 15) return -1;
    int fbits = ss_code == 0 ? bits : kSizeCodes[ss_code];
    if (fbits <= 0) return -1;
    if (br.bit != 0) return -1;  // header must end byte-aligned
    br.pos += 1;                 // CRC-8 (validated by the indexer)
    if (blocksize <= 0 || blocksize > max_blocksize) return -1;
    int nch = ca < 8 ? ca + 1 : 2;
    if (nch != channels) return -1;

    int64_t* ch0 = work;
    int64_t* ch1 = work + max_blocksize;
    int64_t* scratch = work + 2 * (int64_t)max_blocksize;
    if (ca < 8) {  // independent channels: decode + interleave in turn
        for (int c = 0; c < nch; c++) {
            if (!decode_subframe(br, blocksize, fbits, ch0, scratch))
                return -1;
            for (int i = 0; i < blocksize; i++)
                out[(int64_t)i * channels + c] = (int32_t)ch0[i];
        }
        br.align();
        if (br.pos + 2 > len ||
            crc16(buf + pos, br.pos - pos) !=
                (((uint16_t)buf[br.pos] << 8) | buf[br.pos + 1]))
            return -1;
        if (meta) {
            meta[0] = variable ? (int64_t)num
                               : (int64_t)num * max_blocksize;
            meta[1] = br.pos + 2;
        }
        return blocksize;
    }
    // stereo decorrelation: side channel carries one extra bit
    int bps0 = fbits + (ca == 9 ? 1 : 0);
    int bps1 = fbits + (ca == 8 || ca == 10 ? 1 : 0);
    if (!decode_subframe(br, blocksize, bps0, ch0, scratch)) return -1;
    if (!decode_subframe(br, blocksize, bps1, ch1, scratch)) return -1;
    br.align();
    if (br.pos + 2 > len ||
        crc16(buf + pos, br.pos - pos) !=
            (((uint16_t)buf[br.pos] << 8) | buf[br.pos + 1]))
        return -1;
    for (int i = 0; i < blocksize; i++) {
        int64_t l, r;
        if (ca == 8) {        // left/side
            l = ch0[i];
            r = ch0[i] - ch1[i];
        } else if (ca == 9) { // side/right
            r = ch1[i];
            l = ch0[i] + ch1[i];
        } else {              // mid/side
            int64_t m = (ch0[i] << 1) | (ch1[i] & 1);
            l = (m + ch1[i]) >> 1;
            r = (m - ch1[i]) >> 1;
        }
        out[(int64_t)i * 2] = (int32_t)l;
        out[(int64_t)i * 2 + 1] = (int32_t)r;
    }
    if (meta) {
        meta[0] = variable ? (int64_t)num : (int64_t)num * max_blocksize;
        meta[1] = br.pos + 2;
    }
    return blocksize;
}

}  // extern "C"
