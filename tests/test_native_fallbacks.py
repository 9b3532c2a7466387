"""Degraded-environment branches of :mod:`audian_tpu.native`.

The native layer must fall back cleanly on hosts without a compiler or
the FFmpeg development files (the coverage baseline flagged these
branches as the package's least-executed region, docs/testing.md).
Every wrapper's "library unavailable" contract is pinned here by
monkeypatching the loaders, and the build-failure path is exercised
with a broken compiler.
"""

import numpy as np
import pytest

from audian_tpu import native


@pytest.fixture()
def no_native(monkeypatch):
    monkeypatch.setattr(native, "get_lib", lambda: None)
    monkeypatch.setattr(native, "get_ffm", lambda: None)


def test_wrappers_degrade_to_none(no_native, tmp_path):
    assert native.read_frames(tmp_path / "x.wav", 44, "PCM_16", 2,
                              0, 10) is None
    assert native.minmax(np.zeros((16, 2), np.float32), 4) is None
    assert native.file_minmax(tmp_path / "x.wav", 44, "PCM_16", 2,
                              100, 10) is None
    assert native.flac_encode(np.zeros((16, 1), np.int32), 8000,
                              16) is None
    assert native.flac_decode_frame(b"\x00" * 64, 0,
                                    dict(rate=8000, channels=1, bits=16,
                                         min_blocksize=16,
                                         max_blocksize=16)) is None
    assert native.ff_audio_decode(tmp_path / "x.ogg") is None
    assert native.ff_flac_decode(tmp_path / "x.flac") is None
    assert native.ff_flac_encode(tmp_path / "x.flac",
                                 np.zeros((8, 1), np.int32),
                                 8000) is False
    assert native.ff_audio_encode(tmp_path / "x.ogg",
                                  np.zeros((8, 1), np.float32),
                                  8000.0) is False


def test_unknown_encoding_degrades(monkeypatch, tmp_path):
    # lib present (or not) — an unknown encoding short-circuits to None
    assert native.read_frames(tmp_path / "x.wav", 44, "ALAW", 1,
                              0, 4) is None
    assert native.file_minmax(tmp_path / "x.wav", 44, "ALAW", 1,
                              8, 2) is None


def test_build_failure_yields_none(monkeypatch, tmp_path):
    """A failing compiler (or missing sources) leaves the loaders
    returning None instead of raising through import-time."""
    import importlib

    mod = importlib.reload(native)
    try:
        monkeypatch.setattr(mod, "_LIB_PATH", tmp_path / "nope.so")
        monkeypatch.setattr(mod, "_FFM_PATH", tmp_path / "nope2.so")
        monkeypatch.setenv("CXX", "/nonexistent-compiler")
        assert mod.get_lib() is None
        assert mod.available() is False
        assert mod.get_ffm() is None
        assert mod.ffm_available() is False
        # the cheap probe answers False after a failed real attempt
        assert mod.ffm_probable() is False
    finally:
        importlib.reload(native)


def test_ffm_probable_without_loading(monkeypatch):
    """The listing probe answers from disk/system state without
    triggering the on-demand build."""
    import importlib

    mod = importlib.reload(native)
    try:
        called = []
        monkeypatch.setattr(mod, "get_ffm",
                            lambda: called.append(1) or None)
        # fresh module state: _ffm None, _ffm_tried False
        got = mod.ffm_probable()
        assert got in (True, False)
        assert not called
    finally:
        importlib.reload(native)


def test_read_frames_out_validation(tmp_path, rng):
    from audian_tpu.data import wavio

    x = (0.1 * rng.standard_normal((256, 2))).astype(np.float32)
    p = tmp_path / "t.wav"
    wavio.write_audio(p, x, 8000.0, encoding="PCM_16")
    info = wavio.wav_info(p)
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    bad = np.empty((10, 2), np.float32)  # wrong shape for 64 frames
    with pytest.raises(ValueError, match="C-contiguous float32"):
        native.read_frames(p, info[4], "PCM_16", 2, 0, 64, out=bad)
    out = np.empty((64, 2), np.float32)
    got = native.read_frames(p, info[4], "PCM_16", 2, 0, 64, out=out)
    assert got is not None and got.shape == (64, 2)
