"""Byte-mutation fuzzing of the WAV parser.

Random single/multi-byte corruptions, truncations, and garbage
insertions applied to valid WAV files (PCM-16 with metadata/markers,
float, multi-channel) must always produce either a successful parse with
sane shapes or a :class:`WavError`/`EOFError` — never an unguarded
``struct.error``/``IndexError``/``OverflowError``, a giant allocation
(`MemoryError`), or a hang.  Complements the targeted malformed-header
cases in tests/test_wavio.py (`4d5909c`).
"""

import numpy as np
import pytest

from audian_tpu.data import wavio


@pytest.fixture(scope="module")
def wav_bytes(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("wavfuzz")
    blobs = []
    t = np.arange(2000) / 8000.0
    x2 = np.stack([np.sin(2 * np.pi * 440 * t),
                   np.sin(2 * np.pi * 220 * t)], axis=1)
    p = d / "a.wav"
    locs = np.array([[100, 50], [900, 0]])
    labels = np.array([["s", "one"], ["e", ""]], dtype=object)
    wavio.write_audio(p, x2, 8000.0, encoding="PCM_16",
                      metadata={"BEXT": {"Description": "fuzz seed"}},
                      locs=locs, labels=labels)
    blobs.append(p.read_bytes())
    p = d / "b.wav"
    wavio.write_audio(p, x2[:, :1].astype(np.float32), 8000.0,
                      encoding="FLOAT")
    blobs.append(p.read_bytes())
    return blobs


def _try_parse(tmp_path, i, blob):
    p = tmp_path / f"m{i}.wav"
    p.write_bytes(blob)
    for fn in (wavio.scan_wav, wavio.load_wav):
        try:
            out = fn(p)
        except (wavio.WavError, EOFError):
            continue  # rejected cleanly
        if fn is wavio.load_wav:
            data = out[0]
            # honest shapes: whatever parsed must be materialized and
            # bounded by the payload actually present on disk
            assert data.ndim == 2
            assert data.nbytes <= 16 * len(blob) + (1 << 16), \
                f"mutant {i}: {data.nbytes} bytes from a {len(blob)}B file"
            assert np.all(np.isfinite(np.asarray(data, np.float64))) or \
                data.dtype.kind == "f"  # float files may carry inf/nan


@pytest.mark.parametrize("seed", [1, 2])
def test_wav_parser_mutation_fuzz(wav_bytes, tmp_path, seed):
    rng = np.random.default_rng(seed)
    for i in range(150):
        base = bytearray(wav_bytes[int(rng.integers(0, len(wav_bytes)))])
        kind = int(rng.integers(0, 4))
        if kind == 0:      # flip 1-8 random bytes
            for _ in range(int(rng.integers(1, 9))):
                base[int(rng.integers(0, len(base)))] = int(
                    rng.integers(0, 256))
        elif kind == 1:    # truncate anywhere (including inside headers)
            base = base[: int(rng.integers(0, len(base)))]
        elif kind == 2:    # corrupt a chunk-size field region
            off = int(rng.integers(0, max(len(base) - 8, 1)))
            base[off : off + 4] = int(rng.integers(0, 1 << 32)).to_bytes(
                4, "little")
        else:              # insert garbage mid-file
            off = int(rng.integers(0, len(base)))
            base = (base[:off]
                    + bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
                    + base[off:])
        _try_parse(tmp_path, f"{seed}_{i}", bytes(base))


def test_wav_parser_tiny_and_empty(tmp_path):
    """Degenerate files: empty, sub-header, RIFF-only."""
    for i, blob in enumerate([b"", b"RI", b"RIFF", b"RIFF\x00\x00\x00\x00",
                              b"RIFF\xff\xff\xff\xffWAVE",
                              b"RIFF\x24\x00\x00\x00WAVEfmt "]):
        p = tmp_path / f"t{i}.wav"
        p.write_bytes(blob)
        for fn in (wavio.scan_wav, wavio.load_wav):
            with pytest.raises((wavio.WavError, EOFError)):
                fn(p)
