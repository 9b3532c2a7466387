"""Randomized interaction fuzzing over the headless controller surface.

Seeded random verb sequences — time scroll/zoom, amplitude/frequency/
power range verbs, filter/envelope/resolution scrubs, the channel state
machine, panel toggles, crosshair/markers, region analysis, readout
probes — drive a :class:`DataBrowser` (and a two-file :class:`Audian`
shell) while structural invariants are checked after every single step.

At the end a FRESH browser is configured with the fuzzed browser's final
parameters and both must produce identical results two ways:

* ``get_region`` (a fresh fused run) — parameter state survived the
  history;
* windowed ``Trace.__getitem__`` reads at the same view — the cached
  device-resident sliding windows and delta-update scroll paths never
  serve stale values after an arbitrary interaction history (the
  interactive-cache analog of ``tests/test_chunk_equivalence.py``).

The reference has no such net; its interaction surface is exercised
manually only (`src/audian/databrowser.py`, `src/audian/audian.py`).
"""

import numpy as np
import pytest

from audian_tpu.app import Audian, DataBrowser
from audian_tpu.analysis import Plugins
from audian_tpu.data import wavio
from audian_tpu.graph import EnvelopeNode


RATE = 8000.0
NCH = 3
DURATION = 1.2


def _plugins():
    plugins = Plugins()
    plugins.add_trace_factory(
        lambda b: b.add_trace(EnvelopeNode("envelope", "filtered")))
    return plugins


@pytest.fixture(scope="module")
def wav3(tmp_path_factory, rng):
    t = np.arange(int(DURATION * RATE)) / RATE
    am = (np.sin(2 * np.pi * 6.0 * t) > 0).astype(float)
    x = np.stack([0.5 * np.sin(2 * np.pi * (600.0 + 200.0 * c) * t) * am
                  + 0.02 * rng.standard_normal(len(t))
                  for c in range(NCH)], axis=1)
    p = tmp_path_factory.mktemp("fuzz") / "fuzz.wav"
    wavio.write_audio(p, x, RATE, encoding="PCM_16")
    return p


def _check_invariants(b):
    """Structural invariants that must hold after EVERY verb."""
    from audian_tpu.view import render

    # interactive caches never exceed their documented bounds (the
    # long-session leak contract of tests/test_browser.py)
    assert len(b.trace_tiler._cache) <= 32
    assert len(b.spec_tiler._cache) <= 8
    assert len(render._extrema_cache) <= 64
    assert len(render._power_block_cache) <= 16
    assert len(b.data._q_staging) <= 4
    assert np.isfinite(b.toffset) and b.toffset >= 0.0
    assert np.isfinite(b.twindow) and b.twindow > 0.0
    nch = b.data.channels
    assert all(0 <= c < nch for c in b.show_channels)
    assert all(0 <= c < nch for c in b.selected_channels)
    assert 0 <= b.current_channel < nch
    assert b.show_channels == sorted(set(b.show_channels))
    assert not b.setting  # the reentrancy flag never leaks
    for letter, r in b.plot_ranges.items():
        if not r.is_used():
            continue
        for c in range(nch):
            lo, hi = r.r0[c], r.r1[c]
            if lo is None and hi is None:
                continue
            assert lo is not None and hi is not None, \
                f"axis {letter!r} channel {c}: half-set range ({lo}, {hi})"
            assert np.isfinite(lo) and np.isfinite(hi), \
                f"axis {letter!r} channel {c}: non-finite range ({lo}, {hi})"
            assert lo < hi, \
                f"axis {letter!r} channel {c}: inverted range ({lo}, {hi})"


def _verb_pool(b, rng):
    """The weighted random verb pool (each entry is a zero-arg thunk)."""
    nyq = b.data.rate / 2
    time_verbs = ("down", "up", "small_down", "small_up", "step_down",
                  "step_up", "zoom_in", "zoom_out", "zoom_in_centered",
                  "zoom_out_centered", "home", "end", "snap")
    ampl_verbs = ("zoom_in", "zoom_out", "reset", "center",
                  "min_down", "min_up", "max_down", "max_up")
    freq_verbs = ("zoom_in", "zoom_out", "up", "down", "home", "end",
                  "reset")
    power_verbs = ("up", "down", "min_up", "min_down", "max_up", "max_down",
                   "reset")

    def rand_channel():
        return int(rng.integers(0, b.data.channels))

    def rand_window():
        t0 = float(rng.uniform(0.0, DURATION * 0.9))
        t1 = t0 + float(rng.uniform(0.02, 0.3))
        return t0, min(t1, DURATION)

    def probe_readouts():
        t = float(rng.uniform(0.0, DURATION))
        b.time_info(t)
        b.hover_readout(t, float(rng.uniform(-1, 1)), kind="trace",
                        channel=rand_channel())
        b.crosshair_readout()

    def probe_tiles():
        c = rand_channel()
        times, values = b.trace_tile("filtered", c)
        assert np.all(np.isfinite(times))
        assert np.all(np.isfinite(values))
        img, rect = b.spec_tile(c)
        assert np.all(np.isfinite(np.asarray(img, np.float64)))
        assert len(rect) == 4

    def probe_power():
        c = rand_channel()
        freqs, db = b.power_spectrum(c)
        assert np.all(np.isfinite(freqs))
        # a window too small to hold one spectrogram frame returns the
        # documented all--inf fill (browser.power_spectrum); otherwise
        # both compute paths clamp at -200 dB and stay finite
        assert np.all(np.isfinite(db)) or np.all(np.isneginf(db))
        b.estimate_power_levels(c)

    def analyze_region():
        t0, t1 = rand_window()
        b.set_region_mode(DataBrowser.analyze_region_mode)
        b.handle_region(rand_channel(), t0, t1)

    def zoom_region():
        t0, t1 = rand_window()
        b.handle_region(rand_channel(), t0, t1,
                        mode=DataBrowser.zoom_region)

    def crosshair():
        c = rand_channel()
        if rng.random() < 0.5:
            b.set_crosshair(c, t=float(rng.uniform(0, DURATION)),
                            amplitude=float(rng.uniform(-1, 1)))
        else:
            b.set_crosshair(c, t=float(rng.uniform(0, DURATION)),
                            frequency=float(rng.uniform(0, nyq)),
                            power=float(rng.uniform(-80, 0)))
        if rng.random() < 0.5:
            b.store_marker(label=str(rng.choice(["start", "end", ""])))

    pool = [
        lambda: b.set_times(float(rng.uniform(-0.2, DURATION * 1.1)),
                            float(rng.uniform(0.01, DURATION * 1.5))),
        lambda: b.apply_time_ranges(str(rng.choice(time_verbs))),
        lambda: b.time_page_down(),
        lambda: b.time_page_up(),
        lambda: b.time_zoom_in(),
        lambda: b.time_zoom_out(),
        lambda: b.apply_ranges(str(rng.choice(ampl_verbs)), "xyu"),
        lambda: b.apply_ranges(str(rng.choice(freq_verbs)), "fw"),
        lambda: b.apply_ranges(str(rng.choice(power_verbs)), "pq"),
        lambda: b.auto_ampl(),
        lambda: b.set_powers(),
        lambda: b.update_filter(
            float(rng.choice([0.0, rng.uniform(20.0, 0.4 * nyq)])),
            float(rng.choice([nyq, rng.uniform(0.5 * nyq, nyq)]))),
        lambda: b.update_envelope(float(rng.uniform(5.0, 500.0))),
        lambda: b.update_envelope(show_envelope=bool(rng.random() < 0.7)),
        lambda: b.set_resolution(
            nfft=int(rng.choice([32, 64, 128, 256, 512])),
            overlap_frac=float(rng.choice([0.0, 0.25, 0.5, 0.75, 0.9]))),
        lambda: b.overlap_frac_up(),
        lambda: b.overlap_frac_down(),
        lambda: b.next_channel(),
        lambda: b.previous_channel(),
        lambda: b.select_next_channel(),
        lambda: b.select_previous_channel(),
        lambda: b.all_channels(),
        lambda: b.toggle_channel(rand_channel()),
        lambda: b.show_channel(rand_channel()),
        lambda: b.hide_deselected_channels(),
        lambda: b.set_channels(
            sorted(rng.choice(NCH, size=int(rng.integers(1, NCH + 1)),
                              replace=False).tolist())),
        lambda: b.toggle_traces(),
        lambda: b.toggle_spectrograms(),
        lambda: b.toggle_powers(),
        lambda: b.toggle_colorbars(),
        lambda: b.toggle_fulldata(),
        lambda: b.toggle_grids(),
        lambda: b.toggle_trace(bool(rng.random() < 0.7), "spectrogram"),
        lambda: b.toggle_trace(bool(rng.random() < 0.7), "envelope"),
        lambda: b.color_map_cycler(),
        lambda: b.set_region_mode(int(rng.integers(0, 5))),
        analyze_region,
        zoom_region,
        crosshair,
        lambda: b.clear_crosshair(),
        lambda: b.auto_scroll(),
        lambda: b.scroll_further(),
        probe_readouts,
        probe_tiles,
        probe_power,
    ]
    return pool


def _final_params(b):
    f = b.data["filtered"]
    e = b.data["envelope"]
    s = b.data["spectrogram"]
    return dict(highpass=f.highpass_cutoff, lowpass=f.lowpass_cutoff,
                envelope=e.envelope_cutoff, nfft=s.nfft,
                overlap=s.overlap_frac)


def _apply_params(b, params):
    b.update_filter(params["highpass"], params["lowpass"])
    b.update_envelope(params["envelope"], show_envelope=True)
    b.set_resolution(nfft=params["nfft"], overlap_frac=params["overlap"])


def _window_reads(b, t0, t1):
    """Windowed Trace.__getitem__ reads (served from interactive caches
    where possible) of every derived trace over [t0, t1]."""
    out = {}
    for name in ("filtered", "envelope", "spectrogram"):
        tr = b.data[name]
        i0 = max(int(t0 * tr.rate), 0)
        i1 = min(int(t1 * tr.rate) + 1, len(tr))
        out[name] = np.asarray(tr[i0:i1])
    return out


def _assert_traces_equal(got, want, where):
    for name in ("filtered", "envelope"):
        np.testing.assert_allclose(
            got[name], want[name], rtol=1e-3, atol=5e-5,
            err_msg=f"{where}: {name} diverged from the fresh browser")
    g, w = got["spectrogram"], want["spectrogram"]
    assert g.shape == w.shape, \
        f"{where}: spectrogram shape {g.shape} != fresh {w.shape}"
    gdb = 10.0 * np.log10(np.maximum(g, 1e-12))
    wdb = 10.0 * np.log10(np.maximum(w, 1e-12))
    np.testing.assert_allclose(
        gdb, wdb, atol=0.1, rtol=0,
        err_msg=f"{where}: spectrogram PSD diverged (dB)")


@pytest.mark.parametrize("seed", [7, 23])
def test_browser_interaction_fuzz(wav3, seed):
    rng = np.random.default_rng(seed)
    b = DataBrowser(wav3, plugins=_plugins()).open()
    try:
        pool = _verb_pool(b, rng)
        for step in range(90):
            verb = pool[int(rng.integers(0, len(pool)))]
            try:
                verb()
            except Exception as exc:  # pragma: no cover - debugging aid
                raise AssertionError(
                    f"seed {seed} step {step}: verb raised {exc!r}") from exc
            _check_invariants(b)

        # every trace visible for the comparisons below
        for name in ("filtered", "envelope", "spectrogram"):
            b.set_trace(True, name)
        params = _final_params(b)
        b.set_times(0.25, 0.5)

        fresh = DataBrowser(wav3, plugins=_plugins()).open()
        try:
            _apply_params(fresh, params)
            fresh.set_times(0.25, 0.5)

            # (a) fused region runs agree (parameter state survived)
            for t0, t1 in ((0.1, 0.35), (0.6, 0.72)):
                got = b.data.get_region(t0, t1, 0)
                want = fresh.data.get_region(t0, t1, 0)
                assert set(got) == set(want)
                _assert_traces_equal(
                    {k: np.asarray(v[-1]) for k, v in got.items()
                     if k in ("filtered", "envelope", "spectrogram")},
                    {k: np.asarray(v[-1]) for k, v in want.items()
                     if k in ("filtered", "envelope", "spectrogram")},
                    f"seed {seed} get_region({t0}, {t1})")

            # (b) windowed cached reads agree (no stale interactive cache)
            got = _window_reads(b, 0.3, 0.6)
            want = _window_reads(fresh, 0.3, 0.6)
            _assert_traces_equal(got, want, f"seed {seed} window reads")
        finally:
            fresh.close()
    finally:
        b.close()


def test_shell_link_fuzz(wav3, tmp_path):
    """Random linked verbs through the two-file shell: linked time
    windows stay equal across browsers, and both stay structurally
    valid."""
    import shutil

    second = tmp_path / "fuzz2.wav"
    shutil.copyfile(wav3, second)
    rng = np.random.default_rng(11)
    sh = Audian([wav3, second], plugins=_plugins())
    sh.load_files()
    try:
        assert len(sh.browsers) == 2
        sh.link_timezoom = True
        sh.link_timescroll = True
        time_verbs = ("down", "up", "zoom_in", "zoom_out", "home", "end")
        ampl_verbs = ("zoom_in", "zoom_out", "reset", "center")
        pool = [
            lambda: sh.apply_time_ranges(str(rng.choice(time_verbs))),
            lambda: sh.apply_ranges(str(rng.choice(ampl_verbs)), "xyu"),
            lambda: sh.apply_power_ranges(
                str(rng.choice(("up", "down", "max_up", "min_down")))),
            lambda: sh.auto_amplitude(),
            lambda: sh.toggle_show_envelope(),
            lambda: sh.next_tab(),
            lambda: sh.previous_tab(),
            lambda: sh.toggle_starttime(),
            lambda: sh.current.update_filter(
                float(rng.uniform(0.0, 500.0)), RATE / 2),
            lambda: sh.current.time_page_down(),
            lambda: sh.current.set_times(
                float(rng.uniform(0.0, DURATION)),
                float(rng.uniform(0.05, DURATION))),
        ]
        for step in range(60):
            verb = pool[int(rng.integers(0, len(pool)))]
            try:
                verb()
            except Exception as exc:  # pragma: no cover - debugging aid
                raise AssertionError(
                    f"step {step}: verb raised {exc!r}") from exc
            for b in sh.browsers:
                _check_invariants(b)
            # linked time: both browsers share the same view window
            b0, b1 = sh.browsers
            assert b0.toffset == pytest.approx(b1.toffset, abs=1e-9), \
                f"step {step}: linked toffset diverged"
            assert b0.twindow == pytest.approx(b1.twindow, abs=1e-9), \
                f"step {step}: linked twindow diverged"
    finally:
        sh.close()
