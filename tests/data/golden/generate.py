"""(Re)generate the committed FLAC golden assets.

The assets pin the repo's FLAC decoders to an EXTERNAL implementation:
every ``g*.flac`` here was produced by FFmpeg's libavcodec FLAC encoder
(via ``audian_tpu.native.ff_flac_encode``, ``native/ffflac.cc``) —
except ``ours8.flac``, produced by the repo encoder and then verified
by an FFmpeg decode at generation time — and the matching ``*.npz``
stores the exact PCM (``samples`` int32, ``rate``, ``bits``).  The
local test suite (`tests/test_flac_interop.py`) decodes the .flac with
the repo decoders and bit-compares against the .npz, so decoder
validation against a real-world codec holds even on hosts without the
FFmpeg development files.

Run from the repo root (requires libavcodec/libavformat dev files):

    python tests/data/golden/generate.py

Deterministic: fixed seeds, no timestamps.  Reference parity target:
the reference reads any libsndfile-supported FLAC
(/root/reference/pyproject.toml:17).
"""

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
sys.path.insert(0, str(HERE.parents[1]))  # tests/: the shared corpus
from signals import correlated_signal  # noqa: E402


def signal(rng, n, rate, channels, scale):
    """The shared codec corpus (`tests/signals.py`) at this scale."""
    bits = int(scale).bit_length()  # scale = 2**(bits-1)
    return correlated_signal(rng, n, rate, channels, bits
                             ).astype(np.int32)


def main():
    from audian_tpu import native
    from audian_tpu.data import flac

    if not native.ffm_available():
        raise SystemExit("FFmpeg dev files unavailable: cannot "
                         "regenerate external-oracle golden assets")
    specs = [
        # (name, seed, frames, rate, channels, bits, level)
        ("g16_mono_l0", 10, 9000, 44100, 1, 16, 0),
        ("g16_stereo_l8", 11, 15000, 48000, 2, 16, 8),
        ("g16_4ch_l5", 12, 8191, 96000, 4, 16, 5),
        ("g16_odd_l12", 13, 4111, 22050, 2, 16, 12),
        ("g24_stereo_l5", 14, 10000, 96000, 2, 24, 5),
        ("g24_mono_l8", 15, 7001, 192000, 1, 24, 8),
    ]
    for name, seed, n, rate, ch, bits, level in specs:
        rng = np.random.default_rng(seed)
        q = signal(rng, n, rate, ch, 1 << (bits - 1))
        path = HERE / f"{name}.flac"
        native.ff_flac_encode(path, q, rate, bits=bits, level=level)
        dec, drate, dbits = native.ff_flac_decode(path)
        assert np.array_equal(dec, q) and drate == rate and dbits == bits
        np.savez_compressed(HERE / f"{name}.npz", samples=q,
                            rate=rate, bits=bits)
        print(f"{name}: {path.stat().st_size} bytes, {n}x{ch} {bits}b")

    # repo-encoder-made 8-bit asset (FFmpeg's encoder writes 16/24 only),
    # externally verified by an FFmpeg decode before committing
    rng = np.random.default_rng(16)
    q8 = signal(rng, 6000, 16000, 2, 1 << 7)
    path = HERE / "ours8.flac"
    flac.write_flac(path, q8, 16000, bits=8)
    dec, drate, dbits = native.ff_flac_decode(path)
    assert np.array_equal(dec, q8) and drate == 16000 and dbits == 8
    np.savez_compressed(HERE / "ours8.npz", samples=q8, rate=16000,
                        bits=8)
    print(f"ours8: {path.stat().st_size} bytes (FFmpeg-verified)")


if __name__ == "__main__":
    main()
