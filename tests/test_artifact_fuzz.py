"""Artifact-robustness fuzzing: screenshot PNGs and marker round trips.

Screenshot view checkpoints and marker tables are the two artifacts
users drag back INTO the app, so corrupted or adversarial bytes must be
rejected cleanly: ``parse_view_metadata`` may return None or raise
OSError/ValueError (the contract its GUI/CLI callers guard), never leak
zlib/struct internals; marker labels round-trip through WAV metadata and
CSV export for arbitrary unicode.
"""

import io
import struct
import zlib

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from audian_tpu.app import (parse_view_metadata, read_png_metadata,
                            MarkerData, MarkerLabel)
from audian_tpu.data import wavio


def _png_with_view(tmp_path, compressed=False):
    """A small PNG carrying audian view metadata (tEXt or zTXt)."""
    import matplotlib.pyplot as plt

    p = tmp_path / "view.png"
    fig = plt.figure(figsize=(2, 1))
    fig.savefig(p, metadata={"audian-file": "rec.wav",
                             "audian-toffset": "1.25",
                             "audian-twindow": "2.0",
                             "audian-channels": "0,1"})
    plt.close(fig)
    if compressed:
        # re-pack the tEXt entries as zTXt (compressed text chunks)
        buf = bytearray(p.read_bytes())
        out = bytearray(buf[:8])
        pos = 8
        while pos + 8 <= len(buf):
            (length,) = struct.unpack_from(">I", buf, pos)
            ctype = bytes(buf[pos + 4 : pos + 8])
            body = bytes(buf[pos + 8 : pos + 8 + length])
            if ctype == b"tEXt" and body.startswith(b"audian-"):
                key, _, val = body.partition(b"\x00")
                zbody = key + b"\x00\x00" + zlib.compress(val)
                chunk = b"zTXt" + zbody
                out += struct.pack(">I", len(zbody)) + chunk
                out += struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
            else:
                out += buf[pos : pos + 12 + length]
            pos += 12 + length
        p.write_bytes(bytes(out))
    return p


@pytest.mark.parametrize("compressed", [False, True])
def test_png_metadata_mutation_fuzz(tmp_path, compressed):
    src = _png_with_view(tmp_path, compressed=compressed)
    base = src.read_bytes()
    # sanity: the intact file parses
    view = parse_view_metadata(src)
    assert view == {"file": "rec.wav", "toffset": 1.25, "twindow": 2.0,
                    "channels": [0, 1]}

    rng = np.random.default_rng(9)
    for i in range(120):
        blob = bytearray(base)
        kind = int(rng.integers(0, 3))
        if kind == 0:
            for _ in range(int(rng.integers(1, 6))):
                blob[int(rng.integers(0, len(blob)))] = int(
                    rng.integers(0, 256))
        elif kind == 1:
            blob = blob[: int(rng.integers(8, len(blob)))]
        else:
            off = int(rng.integers(8, max(len(blob) - 8, 9)))
            blob[off : off + 4] = int(rng.integers(0, 1 << 32)).to_bytes(
                4, "little")
        p = tmp_path / f"m{compressed}_{i}.png"
        p.write_bytes(bytes(blob))
        try:
            out = parse_view_metadata(p)
        except (OSError, ValueError):
            continue  # the contract its callers guard
        assert out is None or isinstance(out, dict)


def test_marker_unicode_roundtrip_fuzz(tmp_path, rng):
    """Random unicode labels/texts survive WAV metadata and CSV export."""
    alphabet = list("abcXYZ019 _-ÄöüßλΩ中文🎵\"',;\n\t")
    x = 0.1 * rng.standard_normal((4000, 1))
    for trial in range(10):
        k = int(rng.integers(1, 6))
        locs = np.sort(rng.integers(0, 3500, size=k))[:, None]
        locs = np.concatenate([locs, rng.integers(0, 400, size=(k, 1))],
                              axis=1)
        labels = np.array(
            [["".join(rng.choice(alphabet, size=int(rng.integers(1, 8)))),
              "".join(rng.choice(alphabet, size=int(rng.integers(0, 12))))]
             for _ in range(k)], dtype=object)
        p = tmp_path / f"m{trial}.wav"
        wavio.write_audio(p, x, 8000.0, locs=locs, labels=labels,
                          encoding="PCM_16")
        _, _, _, locs2, labels2 = wavio.load_wav(p)

        def canon(s):
            # cue text rides latin-1-safe chunks: non-encodable chars may
            # be replaced, but structure must survive and nothing raises
            return s if isinstance(s, str) else str(s)

        assert locs2.shape == locs.shape
        np.testing.assert_array_equal(locs2, locs)
        assert labels2.shape == labels.shape

        md = MarkerData([MarkerLabel("start", "s", "yellow")])
        md.set_markers(locs, labels, 8000.0)
        out = tmp_path / f"m{trial}.csv"
        md.save(out)
        text = out.read_text(encoding="utf-8")
        assert len(text.splitlines()) >= 1 + k
