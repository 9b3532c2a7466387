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


def test_corrupt_local_artifact_recomputes(wav):
    """A truncated <stem>-fulltrace.wav must not make the recording
    unopenable — load falls back to recomputation (the file stays: it is
    the user's)."""
    p, x = wav
    bad = p.with_name(p.stem + "-fulltrace.wav")
    bad.write_bytes(b"RIFF\x10\x00\x00\x00WAVEjunk")
    ld = AudioLoader(p)
    ft = FullTraceData(ld)
    assert ft.load_data() is False
    assert bad.exists()
    ld.close()


def test_save_data_local_atomic(wav, tmp_path):
    p, x = wav
    ld = AudioLoader(p, buffer_time=0.1, back_time=0.0)
    ft = FullTraceData(ld)
    ft.start(100, background=False)
    ft.wait()
    out = ft.save_data_local()
    assert out is not None and out.exists()
    leftovers = list(p.parent.glob("*-fulltrace.wav.*tmp"))
    assert leftovers == []
    # the artifact decodes and matches the computed overview
    datas, _ = wavio.load_audio(out)
    np.testing.assert_allclose(datas, ft.datas, atol=1e-12)
    ld.close()


def test_close_cancels_background_compute(tmp_path, rng, monkeypatch):
    """Closing the overview mid-compute stops the worker instead of
    letting it stream the rest of the recording (and cache it)."""
    import time

    # two files with an UNALIGNED boundary force the _read_direct block
    # loop (the cancellable path)
    x = (0.2 * rng.standard_normal((40001, 1))).clip(-1, 1)
    paths = []
    for k, sl in enumerate((x[:20001], x[20001:])):
        p = tmp_path / f"c{k}.wav"
        wavio.write_audio(p, sl, 48000, encoding="FLOAT")
        paths.append(p)
    ld = AudioLoader(paths, buffer_time=0.1, back_time=0.0)
    reads = []
    real = AudioLoader._read_direct

    def slow_read(self, start, n, out=None):
        reads.append(start)
        time.sleep(0.05)
        return real(self, start, n, out=out)

    monkeypatch.setattr(AudioLoader, "_read_direct", slow_read)
    ft = FullTraceData(ld)
    # tiny blocks: step=1 -> nblock = 1M frames > recording, so shrink
    # the work by using a small max_pixel (big step, one block per call)
    ft.start(10, background=True)
    ft._stop.set()
    ft.close()
    n0 = len(reads)
    time.sleep(0.3)
    assert not ft.is_busy()
    assert len(reads) <= n0 + 1  # at most the in-flight block finished
    saved = list(tmp_path.glob("*-fulltrace.wav"))
    assert saved == []  # a cancelled compute must not cache its result
    ld.close()


def test_failed_compute_records_error_and_retries(wav, monkeypatch):
    p, x = wav
    ld = AudioLoader(p, buffer_time=0.1, back_time=0.0)
    ft = FullTraceData(ld)
    monkeypatch.setattr(
        "audian_tpu.cache.fulltrace.native.file_minmax",
        lambda *a, **k: (_ for _ in ()).throw(OSError("disk gone")))
    ft.start(100, background=False)
    assert ft.error is not None
    # a later start() retries instead of treating the zeros as final
    monkeypatch.setattr(
        "audian_tpu.cache.fulltrace.native.file_minmax",
        lambda *a, **k: None)  # falls back to the python path
    ft.start(100, background=False)
    assert ft.error is None
    step = ft.step
    want = reduceat_like(x.astype(np.float64), step)
    np.testing.assert_allclose(ft.datas[: len(want)], want, atol=1e-7)
    ld.close()


def test_interleaved_minmax_ragged_tail(rng):
    from audian_tpu.cache.fulltrace import _interleaved_minmax

    for n, step in ((1000, 64), (1000, 1000), (5, 7), (64, 64), (65, 64)):
        buf = rng.standard_normal((n, 3))
        out = _interleaved_minmax(buf, step)
        nseg = -(-n // step)
        assert out.shape == (2 * nseg, 3)
        for s in range(nseg):
            seg = buf[s * step : (s + 1) * step]
            np.testing.assert_array_equal(out[2 * s], seg.min(axis=0))
            np.testing.assert_array_equal(out[2 * s + 1], seg.max(axis=0))


def test_unwrap_continuous_across_compute_blocks(tmp_path):
    """_compute_python unwraps with one sample of left context per
    block: a wrap falling on the 1M-frame block boundary must not
    offset the rest of the block (same contract as the loader's
    _read_direct)."""
    frames = (1 << 20) + 4096
    x = np.zeros((frames, 1), np.float32)
    # wrapped excursion straddling the block boundary at 1<<20
    b = 1 << 20
    x[b - 300 : b + 300, 0] = 0.9
    x[b - 100 : b + 100, 0] = -0.95  # looks wrapped (jump > thresh)
    p = tmp_path / "wrap.wav"
    wavio.write_audio(p, x, 48000, encoding="FLOAT")
    ld = AudioLoader(p, buffer_time=0.05, back_time=0.0)
    ld.set_unwrap(1.5)
    ft = FullTraceData(ld)
    ft.start(frames // 2, background=False)  # step=2: nblock = 1<<20
    assert ft.error is None
    from audian_tpu.cache.fulltrace import _interleaved_minmax

    whole = wavio.unwrap(x.astype(np.float64), 1.5, False, ld.ampl_max)
    want = _interleaved_minmax(whole, ft.step)
    np.testing.assert_allclose(ft.datas[: len(want)], want, atol=1e-7)
    ld.close()


def test_unwrap_continuous_across_blocks_multifile(tmp_path):
    """The MULTI-FILE non-aligned path must thread the cumulative unwrap
    shift across its 1M-frame compute blocks just like _compute_python —
    a wrap still active at a block boundary would otherwise reset to
    shift 0 and mis-level the rest of the block."""
    frames = (1 << 20) + 4096
    x = np.zeros((frames, 1), np.float32)
    b = 1 << 20
    x[b - 300 : b + 300, 0] = 0.9
    x[b - 100 : b + 100, 0] = -0.95  # wrapped excursion over the boundary
    # split into two files so the loader takes the multi-file branch
    cut = frames // 2 + 7
    p1, p2 = tmp_path / "w1.wav", tmp_path / "w2.wav"
    wavio.write_audio(p1, x[:cut], 48000, encoding="FLOAT")
    wavio.write_audio(p2, x[cut:], 48000, encoding="FLOAT")
    ld = AudioLoader([p1, p2], buffer_time=0.05, back_time=0.0)
    ld.set_unwrap(1.5)
    ft = FullTraceData(ld)
    ft.start(frames // 2, background=False)  # step=2: nblock = 1<<20
    assert ft.error is None
    from audian_tpu.cache.fulltrace import _interleaved_minmax

    whole = wavio.unwrap(x.astype(np.float64), 1.5, False, ld.ampl_max)
    want = _interleaved_minmax(whole, ft.step)
    np.testing.assert_allclose(ft.datas[: len(want)], want, atol=1e-7)
    ld.close()


def test_cancelled_compute_recomputes_on_restart(wav):
    """close() mid-compute leaves a zero-filled tail: a later start()
    must treat that as cancelled (recompute), not as finished."""
    p, x = wav
    ld = AudioLoader(p, buffer_time=0.01, back_time=0.0)
    ft = FullTraceData(ld)
    # simulate a cancellation race: the stop flag trips mid-compute
    orig = FullTraceData._compute_body

    def stopping_body(self, step):
        self._stop.set()
        return orig(self, step)

    FullTraceData._compute_body = stopping_body
    try:
        ft.start(len(x) // 4, background=False)
    finally:
        FullTraceData._compute_body = orig
    assert ft._cancelled
    ft.start(len(x) // 4, background=False)  # must NOT early-return
    assert ft.error is None and not ft._cancelled
    from audian_tpu.cache.fulltrace import _interleaved_minmax

    want = _interleaved_minmax(x.astype(np.float64), ft.step)
    np.testing.assert_allclose(ft.datas[: len(want)], want, atol=1e-7)
    ld.close()


def test_compress_cli_fails_loudly_on_compute_error(wav, monkeypatch,
                                                    capsys):
    """A swallowed read error must not persist a zero-filled overview
    and exit 0 (later opens would prefer that artifact forever)."""
    p, x = wav
    monkeypatch.setattr(
        "audian_tpu.cache.fulltrace.native.file_minmax",
        lambda *a, **k: (_ for _ in ()).throw(OSError("disk gone")))
    monkeypatch.setattr(
        FullTraceData, "_compute_python",
        lambda self, k, step: (_ for _ in ()).throw(OSError("disk gone")))
    rc = compress.main([str(p)])
    assert rc == 1
    assert "failed" in capsys.readouterr().err
    assert not p.with_name("rec-fulltrace.wav").exists()


def test_stale_caches_recompute_when_source_changes(wav, tmp_path,
                                                    monkeypatch):
    """Cached overviews of a recording that changed on disk are stale:
    both the local artifact and the user-cache entry must miss when the
    source file is rewritten (the reference matches by path alone,
    `compresseddata.py:223-231`, and would serve the old overview)."""
    import os
    import time

    import audian_tpu.cache.fulltrace as mod

    class Dirs:
        user_cache_path = tmp_path / "cache"

    monkeypatch.setattr(mod, "audian_dirs", Dirs)
    p, x = wav
    ft = FullTraceData(AudioLoader(p))
    ft.start(100, background=False)
    ft.wait()
    ft.short_data = False
    local = ft.save_data_local()
    ft.save_data()
    # rewrite the recording with MORE channels and different content
    y = np.stack([x[:, 0], x[:, 1], 0.5 * x[:, 0]], axis=1)
    wavio.write_audio(p, y, 48000, encoding="FLOAT")
    # push the source mtime safely past the artifact's
    st = os.stat(local)
    os.utime(p, (st.st_atime, st.st_mtime + 10))
    ft2 = FullTraceData(AudioLoader(p))
    assert not ft2.load_data()
    # after removing the outdated local artifact, the user cache must
    # also refuse its (path-matching, stale-stamped) entry
    os.unlink(local)
    ft3 = FullTraceData(AudioLoader(p))
    assert not ft3.load_data()
    # recompute + save refreshes the user cache; a STALE local artifact
    # must fall through to the now-fresh user cache (not force an
    # eternal recompute) — and the entry's stamp is the one captured
    # when the data was read, so a source touched DURING the compute
    # stays stale
    ft3.start(100, background=False)
    ft3.wait()
    ft3.short_data = False
    ft3.save_data()
    ft4 = FullTraceData(AudioLoader(p))
    assert ft4.load_data()          # fresh user-cache hit
    np.testing.assert_allclose(ft4.datas, ft3.datas, atol=1e-12)
    local2 = ft3.save_data_local()
    os.utime(p, (time.time(), time.time() + 30))  # re-export after write
    ft5 = FullTraceData(AudioLoader(p))
    assert not ft5.load_data()      # stale local falls through, stale
    #                                 user-cache stamp refuses too
    ft6 = FullTraceData(AudioLoader(p))
    ft6._read_stamp = None
    ft6.start(100, background=False)
    # the source changes DURING the compute: the recorded stamp must be
    # the at-read one, so the saved entry is immediately stale
    os.utime(p, (time.time(), time.time() + 60))
    ft6.wait()
    ft6.short_data = False
    os.unlink(local2)
    ft6.save_data()
    ft7 = FullTraceData(AudioLoader(p))
    assert not ft7.load_data()


def test_single_file_native_scan_is_sliced_and_cancellable(
        wav, monkeypatch):
    """The single-file native overview runs in step-aligned slices with
    a stop check between them: close() used to be unable to cancel the
    dominant whole-file native call (30 min of disk on a multi-GB
    recording), and the slices must agree with the unsliced scan."""
    import audian_tpu.cache.fulltrace as ftmod

    p, x = wav
    monkeypatch.setattr(ftmod, "_NATIVE_SLICE_BYTES", 4096)
    calls = []
    real = ftmod.native.file_minmax

    def spy(*a, **k):
        calls.append(k.get("start", 0))
        return real(*a, **k)

    monkeypatch.setattr(ftmod.native, "file_minmax", spy)
    ld = AudioLoader(p, buffer_time=0.1, back_time=0.0)
    ft = FullTraceData(ld)
    ft.start(100, background=False)
    assert len(calls) > 1, "scan did not slice"
    want = reduceat_like(x.astype(np.float64), ft.step)
    np.testing.assert_allclose(ft.datas[: len(want)], want, atol=2e-7)

    # cancellation between slices: stop after the first call
    ft2 = FullTraceData(ld)
    calls2 = []

    def stopping(*a, **k):
        calls2.append(k.get("start", 0))
        ft2._stop.set()
        return real(*a, **k)

    monkeypatch.setattr(ftmod.native, "file_minmax", stopping)
    ft2.start(100, background=False)
    assert len(calls2) == 1, "stop flag not honored between slices"
    assert ft2._cancelled
    ld.close()


def test_compress_cli_zero_frame_recording(tmp_path, capsys):
    """audian-compress on an empty recording exits cleanly with nothing
    to persist — the CLI's forced short_data=False used to push a
    zero-sample overview into save_data_local and crash on times[1]."""
    p = tmp_path / "empty.wav"
    wavio.write_audio(p, np.zeros((0, 1), np.float32), 8000.0,
                      encoding="PCM_16")
    rc = compress.main([str(p)])
    assert rc == 0
    assert not p.with_name("empty-fulltrace.wav").exists()
