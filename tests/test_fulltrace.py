"""Fulltrace overview + cache artifacts + audian-compress CLI."""

import json

import numpy as np
import pytest

from audian_tpu.data import wavio
from audian_tpu.data.loader import AudioLoader
from audian_tpu.cache.fulltrace import FullTraceData
from audian_tpu.cli import compress
from audian_tpu.ops.minmax import reduceat_like


@pytest.fixture()
def wav(tmp_path, rng):
    x = (0.4 * rng.standard_normal((48000, 2))).clip(-1, 1)
    p = tmp_path / "rec.wav"
    wavio.write_audio(p, x, 48000, encoding="FLOAT")
    return p, x


def test_overview_matches_reduceat(wav):
    p, x = wav
    ld = AudioLoader(p)
    ft = FullTraceData(ld)
    ft.start(100, background=False)
    ft.wait()
    step = ft.step
    want = reduceat_like(x.astype(np.float64), step)
    np.testing.assert_allclose(ft.datas[: len(want)], want, atol=1e-7)
    assert len(ft.times) == len(ft.datas)


def test_local_cache_roundtrip(wav):
    p, x = wav
    ld = AudioLoader(p)
    ft = FullTraceData(ld)
    ft.start(100, background=False)
    ft.wait()
    ft.short_data = False
    path = ft.save_data_local()
    assert path.name == "rec-fulltrace.wav"
    ft2 = FullTraceData(AudioLoader(p))
    assert ft2.load_data()
    np.testing.assert_allclose(ft2.datas, ft.datas, atol=1e-12)
    np.testing.assert_allclose(ft2.times, ft.times, rtol=1e-6)


def test_user_cache_lru(wav, tmp_path, monkeypatch):
    import audian_tpu.cache.fulltrace as mod

    class Dirs:
        user_cache_path = tmp_path / "cache"

    monkeypatch.setattr(mod, "audian_dirs", Dirs)
    p, x = wav
    ld = AudioLoader(p)
    ft = FullTraceData(ld)
    ft.start(100, background=False)
    ft.wait()
    ft.short_data = False
    saved = ft.save_data()
    assert saved.exists()
    index = json.loads((Dirs.user_cache_path / "fulltraces.json").read_text())
    assert len(index) == 1
    props = next(iter(index.values()))
    assert props["first"].endswith("rec.wav")
    ft2 = FullTraceData(AudioLoader(p))
    assert ft2.load_data()
    np.testing.assert_allclose(ft2.datas, ft.datas, atol=1e-12)
    # stale entry is evicted
    saved.unlink()
    ft3 = FullTraceData(AudioLoader(p))
    assert not ft3.load_data()
    index = json.loads((Dirs.user_cache_path / "fulltraces.json").read_text())
    assert len(index) == 0


def test_background_thread(wav):
    p, x = wav
    ld = AudioLoader(p)
    ft = FullTraceData(ld)
    ft.start(100, background=True)
    ft.wait()
    assert not ft.is_busy()
    want = reduceat_like(x.astype(np.float64), ft.step)
    np.testing.assert_allclose(ft.datas[: len(want)], want, atol=1e-7)


def test_compress_cli(wav, capsys):
    p, x = wav
    assert compress.main([str(p), "-p", "200"]) == 0
    out = capsys.readouterr().out
    assert "saved fulltrace" in out
    ftp = p.with_name("rec-fulltrace.wav")
    assert ftp.exists()
    datas, rate = wavio.load_audio(ftp)
    step = max(1, 48000 // 200)
    want = reduceat_like(x.astype(np.float64), step)
    np.testing.assert_allclose(datas[: len(want)], want, atol=1e-9)


def test_compress_cli_kwargs_parse():
    kw = compress.parse_load_kwargs(["rate=100,channels=2", "unit=V"])
    assert kw == {"rate": 100, "channels": 2, "unit": "V"}


def test_background_compute_saves_to_cache(wav, monkeypatch, tmp_path):
    """The background decimator persists on completion so the NEXT
    session loads instead of recomputing."""
    p, x = wav
    ld = AudioLoader(p)
    ft = FullTraceData(ld)
    ft.start(100, background=True)
    ft.wait()
    ft2 = FullTraceData(AudioLoader(p))
    assert ft2.load_data() is True
    np.testing.assert_allclose(ft2.datas, ft.datas, atol=1e-12)


def test_corrupt_cache_artifact_evicted(wav):
    """A truncated cached WAV (e.g. killed mid-write) is evicted on load
    instead of poisoning every later open."""
    p, x = wav
    ld = AudioLoader(p)
    ft = FullTraceData(ld)
    ft.start(100, background=False)
    ft.wait()
    ft.short_data = False
    saved = ft.save_data()
    saved.write_bytes(saved.read_bytes()[:40])  # truncate
    ft2 = FullTraceData(AudioLoader(p))
    assert ft2.load_data() is False
    assert not saved.exists()
    # the index entry is gone too -> a re-save starts clean
    assert ft2.load_data() is False


def test_multifile_overview_global_segments(tmp_path, rng):
    """Multi-file recordings decimate on the CONCATENATED segment grid —
    per-file grids would restart at every boundary and shift the
    overview in time."""
    rate = 48000.0
    x = rng.standard_normal((3000, 1)).astype(np.float32)
    paths = []
    for k, (a, b) in enumerate([(0, 1100), (1100, 2100), (2100, 3000)]):
        p = tmp_path / f"part{k}.wav"
        wavio.write_audio(p, x[a:b], rate, encoding="FLOAT")
        paths.append(p)
    ld = AudioLoader(paths)
    ft = FullTraceData(ld)
    ft.start(10, background=False)  # step = 300 (doesn't divide 1100)
    ft.wait()
    want = reduceat_like(x.astype(np.float64), ft.step)
    np.testing.assert_allclose(ft.datas[: len(want)], want, atol=1e-6)
