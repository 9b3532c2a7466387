"""Full DataBrowser verb surface: channel-selection state machine, panel
toggles, color maps, region-mode dispatch, auto scroll, resolution steps,
analysis tables, metadata, and multi-file navigation — behavioral parity
with `src/audian/databrowser.py:197-1926`."""

import numpy as np
import pytest

from audian_tpu.app import Audian, DataBrowser
from audian_tpu.data import wavio


RATE = 8000.0
NCH = 6


@pytest.fixture(scope="module")
def wav6(tmp_path_factory, rng):
    t = np.arange(int(1.0 * RATE)) / RATE
    x = np.stack([0.5 * np.sin(2 * np.pi * (500 + 100 * c) * t)
                  + 0.01 * rng.standard_normal(len(t))
                  for c in range(NCH)], axis=1)
    p = tmp_path_factory.mktemp("verbs") / "six.wav"
    wavio.write_audio(p, x, RATE, encoding="PCM_16")
    return p


@pytest.fixture()
def browser(wav6):
    b = DataBrowser(wav6).open()
    yield b
    b.close()


# -- trace/analyzer management ---------------------------------------------------


def test_trace_management(browser):
    assert browser.name == "six"
    assert browser.get_trace("filtered") is browser.data["filtered"]
    browser.toggle_trace(False, "spectrogram")
    assert not browser.data.is_visible("spectrogram")
    browser.set_trace(True, "spectrogram")
    assert browser.data.is_visible("spectrogram")


def test_analyzer_management(browser):
    assert browser.get_analyzer("PLAIN").name == "plain"
    assert browser.get_analyzer("nope") is None
    n = len(browser.analyzers)
    browser.remove_analyzer("statistics")
    assert len(browser.analyzers) == n - 1
    browser.clear_analyzer()
    assert browser.analyzers == []


def test_metadata_rows(browser):
    rows = browser.metadata_rows()
    keys = [r[1] for r in rows]
    assert "Format" in keys
    # nested section rows carry value None, leaves are strings
    fmt = rows[keys.index("Format")]
    assert fmt[2] is None
    assert any(r[0] > 0 for r in rows)


# -- channel-selection state machine (`databrowser.py:1317-1512`) -----------------


def test_next_previous_channel(browser):
    browser.set_channels(list(range(NCH)))
    browser.current_channel = 0
    browser.next_channel()
    assert browser.current_channel == 1
    assert browser.selected_channels == [1]
    browser.previous_channel()
    assert browser.current_channel == 0


def test_next_channel_scrolls_show_window(browser):
    # show channels 0-2 only; walking past the edge scrolls the window
    browser.set_channels([0, 1, 2], current_channel=0)
    browser.next_channel()
    browser.next_channel()
    assert browser.current_channel == 2
    browser.next_channel()
    assert browser.current_channel == 3
    assert 3 in browser.show_channels
    assert browser.show_channels[0] > 0  # scrolled forward


def test_previous_channel_scrolls_show_window(browser):
    browser.set_channels([3, 4, 5], current_channel=3)
    browser.previous_channel()
    assert browser.current_channel == 2
    assert 2 in browser.show_channels
    assert 5 not in browser.show_channels


def test_select_next_extends_selection(browser):
    browser.set_channels(list(range(NCH)), selected_channels=[2],
                         current_channel=2)
    browser.select_next_channel()
    assert browser.selected_channels == [2, 3]
    browser.select_previous_channel()
    # selection anchored at its lower edge extends downward
    assert 1 in browser.selected_channels


def test_all_channels_two_stage(browser):
    browser.set_channels([0, 1], selected_channels=[0])
    browser.all_channels()
    assert browser.selected_channels == [0, 1]
    browser.all_channels()
    assert browser.selected_channels == list(range(NCH))


def test_toggle_channel(browser):
    browser.set_channels([0, 1, 2], selected_channels=[0, 1, 2])
    browser.toggle_channel(1)
    assert browser.show_channels == [0, 2]
    assert 1 not in browser.selected_channels
    browser.toggle_channel(1)
    assert browser.show_channels == [0, 1, 2]
    # hiding every channel falls back to the next one
    for c in [0, 1, 2]:
        browser.toggle_channel(c)
    assert len(browser.show_channels) >= 1


def test_show_channel_and_hide_deselected(browser):
    browser.set_channels(list(range(NCH)))
    browser.show_channel(4)
    assert browser.show_channels == [4]
    assert browser.current_channel == 4
    browser.show_channel(4)  # second press restores all
    assert browser.show_channels == list(range(NCH))
    browser.select_channels([1, 2])
    browser.hide_deselected_channels()
    assert browser.show_channels == [1, 2]


# -- panels / color maps -----------------------------------------------------------


def test_panel_toggles(browser):
    browser.set_channels(list(range(NCH)))
    assert browser.show_specs == 1
    browser.toggle_spectrograms()
    assert browser.show_specs == 2
    for _ in range(3):
        browser.toggle_spectrograms()
    assert browser.show_specs == 0
    assert browser.show_traces  # hiding all specs forces traces on
    assert not browser.data.is_visible("spectrogram")  # laziness gate
    browser.toggle_spectrograms()
    assert browser.data.is_visible("spectrogram")
    browser.toggle_traces()
    assert not browser.show_traces
    browser.toggle_powers()
    assert browser.show_powers
    browser.toggle_colorbars()
    assert browser.show_cbars
    browser.toggle_fulldata()
    assert not browser.show_fulldata
    browser.set_panels(traces=True, specs=1, powers=False, cbars=False,
                       fulldata=True)


def test_grids_cycle(browser):
    assert browser.grids == 0
    browser.toggle_grids()
    assert browser.grids == 3
    browser.toggle_grids()
    assert browser.grids == 2


def test_color_map_cycler(browser):
    seen = set()
    for _ in range(len(browser.color_maps)):
        seen.add(browser.color_map_name)
        browser.color_map_cycler()
    assert seen == set(browser.color_maps)
    assert browser.color_map == 0  # wrapped around


# -- resolution verbs ---------------------------------------------------------------


def test_resolution_steps(browser):
    spec = browser.data[browser.spectrogram]
    nfft = spec.nfft
    browser.freq_resolution_up()
    assert browser.data[browser.spectrogram].nfft == 2 * nfft
    browser.freq_resolution_down()
    assert browser.data[browser.spectrogram].nfft == nfft
    overlap = spec.overlap_frac
    browser.overlap_frac_up()
    new_overlap = browser.data[browser.spectrogram].overlap_frac
    assert (1 - new_overlap) == pytest.approx((1 - overlap) / 2)
    browser.overlap_frac_down()
    assert browser.data[browser.spectrogram].overlap_frac == \
        pytest.approx(overlap)


def test_set_spectrogram_selects_trace(browser):
    assert browser.spectrogram == "spectrogram"
    browser.set_spectrogram(True, "nope")  # unknown name ignored
    assert browser.spectrogram == "spectrogram"


# -- region modes --------------------------------------------------------------------


def test_region_mode_dispatch(browser, tmp_path):
    assert browser.region_mode == DataBrowser.ask_region
    verb, result = browser.handle_region(0, 0.2, 0.4)
    assert verb == "ask" and result is None
    verb, (t0, tw) = browser.handle_region(0, 0.2, 0.4,
                                           DataBrowser.zoom_region)
    assert verb == "zoom" and t0 == pytest.approx(0.2)
    assert tw == pytest.approx(0.2)
    verb, (play, rate) = browser.handle_region(
        0, 0.2, 0.3, DataBrowser.play_region_mode)
    assert verb == "play" and play.shape[0] == int(0.1 * RATE)
    browser.set_region_mode(DataBrowser.analyze_region_mode)
    verb, traces = browser.handle_region(0, 0.2, 0.3)
    assert verb == "analyze" and "filtered" in traces


# -- auto scroll ---------------------------------------------------------------------


def test_auto_scroll_ticks(browser):
    browser.set_times(0.0, 0.25)
    browser.auto_scroll()
    assert browser.scroll_active and browser.scroll_step == 0.005
    browser.auto_scroll()
    assert browser.scroll_step == 0.01
    t0 = browser.toffset
    browser.scroll_further()
    assert browser.toffset == pytest.approx(t0 + 0.25 * 0.01)
    # space stops the scroll
    verb, _ = browser.play_scroll()
    assert verb == "scroll-stopped" and not browser.scroll_active
    # scrolling at the end stops itself
    browser.scroll_step = 0.5
    browser.scroll_active = True
    browser.set_times(10.0)  # clamps to the end
    browser.scroll_further()
    assert not browser.scroll_active


def test_play_scroll_states(browser):
    browser.set_times(0.0, 0.2)
    verb, (play, rate) = browser.play_scroll()
    assert verb == "play" and play.shape[0] == int(0.2 * RATE)
    assert browser.audio_time >= 0
    verb, _ = browser.play_scroll()  # second press stops audio
    assert verb == "audio-stopped" and browser.audio_time < 0


# -- analysis table -------------------------------------------------------------------


def test_analysis_table_and_save(browser, tmp_path):
    browser.clear_analysis()
    browser.analyze(0.1, 0.3, 0)
    table = browser.get_analysis_table()
    assert len(table) == 1
    keys = list(table[0].keys())
    assert "tstart/s" in keys[0] or "tstart" in keys[0]
    path = browser.save_analysis(tmp_path / "res.csv")
    text = path.read_text()
    assert ";" in text and len(text.splitlines()) == 2
    browser.clear_analysis()
    assert browser.get_analysis_table() == []


# -- multi-file goto ------------------------------------------------------------------


def test_goto_time_multifile(tmp_path, rng):
    t = np.arange(int(0.5 * RATE)) / RATE
    paths = []
    for k in range(2):
        x = 0.1 * rng.standard_normal((len(t), 1))
        p = tmp_path / f"part-{k}.wav"
        wavio.write_audio(p, x, RATE, encoding="PCM_16")
        paths.append(p)
    b = DataBrowser(paths).open()
    try:
        b.set_times(0.0, 0.2)
        assert b.goto_time("part-1.wav", 0.1)
        assert b.toffset == pytest.approx(0.6)
        # stem matching with dashes stripped (`databrowser.py:1117-1123`)
        assert b.goto_time("part0", 0.2)
        assert b.toffset == pytest.approx(0.2)
        assert not b.goto_time("nope.wav", 0.0)
    finally:
        b.close()


# -- shell link dispatch ---------------------------------------------------------------


def test_shell_colormap_and_channel_links(wav6):
    shell = Audian([wav6, wav6])
    shell.load_files()
    try:
        a, b = shell.browsers
        a.color_map_cycler()
        assert b.color_map == a.color_map == 1
        shell.set_current(a)
        shell.select_channels("next_channel")
        assert b.current_channel == a.current_channel == 1
        shell.show_channel(3)
        assert b.show_channels == [3]
        shell.toggle_link_channels()
        shell.select_channels("next_channel")
        assert a.current_channel == 4
        assert b.current_channel == 3  # link off
    finally:
        shell.close()


def test_view_model_built(browser):
    assert set(browser.panels) >= {"trace", "spectrogram",
                                   "spectrogram-power"}
    assert browser.panels["trace"].is_trace()
    assert browser.get_range("t", 0)[0] == 0.0
    lo, hi = browser.get_range("x", 0)
    assert lo < 0 < hi


def test_range_verbs_per_channel(browser):
    browser.set_channels(list(range(NCH)), selected_channels=[0])
    browser.apply_ranges("reset", "x")
    r0, r1 = browser.get_range("x", 0)
    browser.apply_ranges("zoom_in", "x")
    z0, z1 = browser.get_range("x", 0)
    assert (z1 - z0) == pytest.approx((r1 - r0) / 2)
    # other channels untouched (amplitude ranges are per channel)
    assert browser.get_range("x", 1) == (r0, r1)
    browser.apply_ranges("reset", "x")


def test_auto_ampl_and_powers(browser):
    browser.set_times(0.0, 0.5)
    browser.select_channels(list(range(NCH)))
    browser.auto_ampl()
    lo, hi = browser.get_range("x", 0)
    assert 0.3 < hi < 0.7 and -0.7 < lo < -0.3
    browser.set_powers()
    p0, p1 = browser.get_range("p", 0)
    assert p0 is not None and p1 > p0


def test_crosshair_and_stored_marker(browser):
    n0 = len(browser.marker_data)
    browser.set_crosshair(2, t=0.2, amplitude=0.1)
    browser.store_marker("start")
    browser.set_crosshair(2, t=0.45, amplitude=0.3)
    ro = browser.crosshair_readout()
    assert ro["delta_time"] == pytest.approx(0.25)
    assert ro["delta_amplitude"] == pytest.approx(0.2)
    browser.store_marker("end")
    assert len(browser.marker_data) == n0 + 2
    assert browser.marker_data.channels[-1] == 2
    browser.clear_crosshair()
    assert browser.crosshair_readout()["time"] is None


def test_apply_time_ranges(browser):
    browser.set_times(0.0, 0.5)
    browser.apply_time_ranges("zoom_in")
    assert browser.twindow == pytest.approx(0.25)
    browser.apply_time_ranges("end")
    assert browser.toffset + browser.twindow >= 1.0 - 1e-6
    browser.apply_time_ranges("home")
    assert browser.toffset == 0.0


def test_shell_range_links(wav6):
    shell = Audian([wav6, wav6])
    shell.load_files()
    try:
        a, b = shell.browsers
        shell.set_current(a)
        a.select_channels([0])
        shell.apply_ranges("zoom_in", "x")
        assert b.get_range("x", 0) == a.get_range("x", 0)
        # unlink the amplitude letters -> no fan-out
        shell.toggle_link_amplitude()
        shell.apply_ranges("zoom_in", "x")
        assert b.get_range("x", 0) != a.get_range("x", 0)
    finally:
        shell.close()


def test_shell_panel_links(wav6):
    shell = Audian([wav6, wav6])
    shell.load_files()
    try:
        a, b = shell.browsers
        shell.set_current(a)
        a.toggle_spectrograms()
        assert b.show_specs == a.show_specs == 2
        shell.toggle_link_panels()
        a.toggle_powers()
        assert a.show_powers and not b.show_powers
    finally:
        shell.close()


def test_shell_misc_verbs(wav6):
    shell = Audian([wav6, wav6])
    shell.load_files()
    try:
        a, b = shell.browsers
        shell.set_current(a)
        # starttime mode cycles through all browsers' time axes
        shell.toggle_starttime()
        assert shell.starttime_mode == 1
        ax = a.plot_ranges["t"].plots("x", 0)[0]
        assert ax.starttime_mode == 1
        # linked auto amplitude
        a.set_times(0.0, 0.5)
        shell.auto_amplitude()
        assert b.get_range("x", 0) != (-1.0, 1.0)
        # linked trace visibility
        a.toggle_trace(False, "spectrogram")
        assert not b.data.is_visible("spectrogram")
        a.toggle_trace(True, "spectrogram")
        # envelope visibility toggle (no envelope trace here -> no-op)
        shell.toggle_show_envelope()
        # tab cycling
        shell.next_tab()
        assert shell.current is b
        shell.previous_tab()
        assert shell.current is a
    finally:
        shell.close()


def test_apply_ranges_auto_verb(browser):
    """`auto` via the generic verb surface (its broadcast signature
    differs — it needs the visible span) must behave like auto_ampl,
    not TypeError."""
    browser.set_times(0.0, 0.5)
    browser.apply_ranges("reset", "x")
    r0, r1 = browser.get_range("x", 0)
    browser.apply_ranges("auto", "x")
    a0, a1 = browser.get_range("x", 0)
    assert (a0, a1) != (r0, r1), "auto verb did not fit the range"
    browser.auto_ampl("x")
    assert browser.get_range("x", 0) == pytest.approx((a0, a1))


def test_step_filter_clamps_and_lift_off(browser):
    """The shared keyboard filter verb (both frontends bind it): the
    lowpass never runs away past Nyquist (five up-steps then ONE
    down-step must respond immediately), the highpass lifts off the
    0 Hz default at 10 Hz, and stepping it below 10 Hz turns it off."""
    nyq = browser.data.rate / 2
    f = browser.data["filtered"]
    for _ in range(5):
        browser.step_filter(lp_fac=1.25)
    assert f.lowpass_cutoff <= nyq
    browser.step_filter(lp_fac=0.8)
    assert f.lowpass_cutoff == pytest.approx(nyq * 0.8)
    # highpass lift-off and turn-off
    browser.update_filter(highpass_cutoff=0.0)
    browser.step_filter(hp_fac=1.25)
    assert f.highpass_cutoff == pytest.approx(10.0)
    browser.step_filter(hp_fac=0.8)
    assert f.highpass_cutoff == 0.0
    for _ in range(40):
        browser.step_filter(hp_fac=1.25)
    assert f.highpass_cutoff <= nyq
