"""Byte-mutation fuzzing of the fulltrace cache artifacts.

The `-fulltrace.wav` overview artifact and the JSON LRU index are the
two files the cache trusts across sessions (and across audian versions /
killed processes).  Random byte corruptions of either must always leave
the cache functional: ``load_data`` returns True with a sane overview,
or returns False and self-heals (corrupt entries evicted, a recompute
repopulates) — never an unhandled exception.  Complements the targeted
truncation case in tests/test_fulltrace.py.
"""

import json

import numpy as np
import pytest

from audian_tpu.cache.fulltrace import FullTraceData
from audian_tpu.data import wavio
from audian_tpu.data.loader import AudioLoader


@pytest.fixture()
def cached(tmp_path, rng, monkeypatch):
    """A recording with a populated user cache; returns paths."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    p = tmp_path / "rec.wav"
    x = 0.3 * rng.standard_normal((20000, 2))
    wavio.write_audio(p, x, 8000.0, encoding="PCM_16")
    ld = AudioLoader(p)
    ft = FullTraceData(ld)
    ft.start(100, background=False)
    ft.wait()
    ft.short_data = False
    artifact = ft.save_data()
    ft.close()
    ld.close()
    index = artifact.parent / "audian-tpu-fulltrace.json"
    cands = list(artifact.parent.glob("*.json"))
    assert cands, "expected a JSON index next to the cache artifact"
    return p, artifact, cands[0]


def _reload(p):
    ld = AudioLoader(p)
    ft = FullTraceData(ld)
    try:
        ok = ft.load_data()
        if ok:
            assert ft.data is not None and len(ft.data)
            assert np.all(np.isfinite(np.asarray(ft.data)))
        return ok
    finally:
        ft.close()
        ld.close()


def test_artifact_mutation_fuzz(cached, rng):
    p, artifact, index = cached
    base = artifact.read_bytes()
    assert _reload(p) is True  # sanity: intact cache loads

    r = np.random.default_rng(21)
    for i in range(40):
        blob = bytearray(base)
        kind = int(r.integers(0, 3))
        if kind == 0:
            for _ in range(int(r.integers(1, 8))):
                blob[int(r.integers(0, len(blob)))] = int(r.integers(0, 256))
        elif kind == 1:
            blob = blob[: int(r.integers(0, len(blob)))]
        else:
            off = int(r.integers(0, max(len(blob) - 8, 1)))
            blob[off : off + 4] = int(r.integers(0, 1 << 32)).to_bytes(
                4, "little")
        artifact.write_bytes(bytes(blob))
        _reload(p)  # True with sane data, or False + self-heal — no raise
        # restore for the next mutation round (a False may have evicted)
        artifact.write_bytes(base)
        idx = json.loads(index.read_text()) if index.exists() else {}
        if not idx:
            # the eviction removed the entry: recompute repopulates
            ld = AudioLoader(p)
            ft = FullTraceData(ld)
            ft.start(100, background=False)
            ft.wait()
            ft.short_data = False
            ft.save_data()
            ft.close()
            ld.close()
            base = artifact.read_bytes()


def test_index_mutation_fuzz(cached, rng):
    p, artifact, index = cached
    base_index = index.read_text()
    base_artifact = artifact.read_bytes()
    r = np.random.default_rng(22)
    mutants = [
        "",                             # empty file
        "{",                            # truncated JSON
        "[]",                           # wrong top-level type
        "null",
        json.dumps({"bogus": 1}),       # wrong schema
        base_index.replace(":", ";", 1),
        base_index[: len(base_index) // 2],
        base_index + "garbage",
    ]
    for i in range(30):
        blob = bytearray(base_index.encode())
        for _ in range(int(r.integers(1, 6))):
            blob[int(r.integers(0, len(blob)))] = int(r.integers(32, 127))
        mutants.append(blob.decode("utf-8", "replace"))
    for i, m in enumerate(mutants):
        index.write_text(m)
        artifact.write_bytes(base_artifact)
        _reload(p)  # either outcome, but never an exception
        index.write_text(base_index)
