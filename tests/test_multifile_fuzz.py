"""Randomized scrolling over a multi-file recording with exact oracles.

A three-file recording with deliberately awkward lengths is scrolled,
zoomed, and scrubbed at random — lots of tiny moves so the device-window
delta-update fast path (`Data._try_delta_update`) and the prefetcher see
file-boundary crossings from every direction.  After every step the raw
trace read over the visible window must equal the ground-truth
concatenation of the files EXACTLY (PCM-16 dequantization is bit-exact),
and periodically the filtered/envelope windows must match a fresh
browser at the same parameters (no stale interactive caches).
"""

import numpy as np
import pytest

from audian_tpu.app import DataBrowser
from audian_tpu.analysis import Plugins
from audian_tpu.data import wavio
from audian_tpu.graph import EnvelopeNode

RATE = 8000.0
SECONDS = (0.7, 0.53, 0.91)   # awkward, unequal file lengths


def _plugins():
    plugins = Plugins()
    plugins.add_trace_factory(
        lambda b: b.add_trace(EnvelopeNode("envelope", "filtered")))
    return plugins


@pytest.fixture(scope="module")
def recording(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("multifuzz")
    paths, parts = [], []
    offset = 0
    for i, secs in enumerate(SECONDS):
        n = int(secs * RATE)
        t = (np.arange(n) + offset) / RATE
        offset += n
        am = (np.sin(2 * np.pi * 4.0 * t) > 0).astype(float)
        x = np.stack([0.5 * np.sin(2 * np.pi * 650 * t) * am
                      + 0.02 * rng.standard_normal(n),
                      0.3 * np.sin(2 * np.pi * 333 * t)], axis=1)
        p = d / f"part{i}.wav"
        wavio.write_audio(p, x, RATE, encoding="PCM_16")
        paths.append(p)
        parts.append(wavio.load_audio(p)[0])   # ground truth: decoded back
    return paths, np.concatenate(parts, axis=0)


@pytest.mark.parametrize("seed", [17, 99])
def test_multifile_scroll_fuzz(recording, seed):
    paths, ground = recording
    duration = len(ground) / RATE
    b = DataBrowser(paths, plugins=_plugins()).open()
    try:
        assert b.data.frames == len(ground)
        rng = np.random.default_rng(seed)
        boundaries = np.cumsum([s for s in SECONDS])[:-1]

        def check_raw():
            raw = b.data["data"]
            i0 = int(b.toffset * RATE)
            i1 = min(int((b.toffset + b.twindow) * RATE), len(ground))
            got = np.asarray(raw[i0:i1])
            np.testing.assert_array_equal(
                got, ground[i0:i1],
                err_msg=f"raw read [{i0}:{i1}] diverged from ground truth")

        moves = [
            lambda: b.set_times(float(rng.uniform(-0.1, duration))),
            lambda: b.set_times(b.toffset
                                + float(rng.uniform(-0.25, 0.25))),
            lambda: b.set_times(b.toffset
                                + float(rng.uniform(-0.02, 0.02))),
            lambda: b.set_times(float(rng.choice(boundaries))
                                + float(rng.uniform(-0.1, 0.1))),
            lambda: b.set_times(twindow=float(rng.uniform(0.05, 1.2))),
            lambda: b.time_page_down(),
            lambda: b.time_page_up(),
            lambda: b.time_zoom_in(),
            lambda: b.time_zoom_out(),
            lambda: b.update_filter(
                float(rng.uniform(0.0, 300.0)),
                float(rng.uniform(2000.0, RATE / 2))),
        ]
        for step in range(80):
            move = moves[int(rng.integers(0, len(moves)))]
            try:
                move()
            except Exception as exc:
                raise AssertionError(
                    f"step {step}: move raised {exc!r}") from exc
            assert b.toffset >= 0.0 and b.twindow > 0.0
            check_raw()

        # derived traces: no stale caches after the whole scroll history
        f = b.data["filtered"]
        fresh = DataBrowser(paths, plugins=_plugins()).open()
        try:
            fresh.update_filter(f.highpass_cutoff, f.lowpass_cutoff)
            for t0 in (0.0, float(boundaries[0]) - 0.1,
                       float(boundaries[1]) - 0.1, duration - 0.4):
                b.set_times(t0, 0.3)
                fresh.set_times(t0, 0.3)
                for name in ("filtered", "envelope"):
                    tr, trf = b.data[name], fresh.data[name]
                    i0 = max(int(t0 * tr.rate), 0)
                    i1 = min(int((t0 + 0.3) * tr.rate), len(tr))
                    np.testing.assert_allclose(
                        np.asarray(tr[i0:i1]), np.asarray(trf[i0:i1]),
                        rtol=1e-3, atol=5e-5,
                        err_msg=f"{name} window at t0={t0} diverged "
                                f"after the scroll history")
        finally:
            fresh.close()
    finally:
        b.close()
