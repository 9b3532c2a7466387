"""Interactive surface of the matplotlib frontend (Agg, synthesized
events): region modes, crosshair, zoom history, markers, overview nav."""

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from audian_tpu.app import DataBrowser
from audian_tpu.analysis import Plugins
from audian_tpu.data import wavio
from audian_tpu.graph import EnvelopeNode
from audian_tpu.gui.mpl import MplBrowserWindow


@pytest.fixture(scope="module")
def browser(tmp_path_factory, cricket_like):
    x, rate = cricket_like
    p = tmp_path_factory.mktemp("gui") / "rec.wav"
    wavio.write_audio(p, x, rate, encoding="FLOAT")
    plugins = Plugins()
    plugins.add_trace_factory(
        lambda b: b.add_trace(EnvelopeNode("envelope", "filtered")))
    b = DataBrowser(p, plugins=plugins).open()
    yield b
    b.close()


@pytest.fixture()
def win(browser):
    browser.set_times(0.0, 1.0)
    w = MplBrowserWindow(browser)
    yield w
    w.plt.close(w.fig)


class Ev:
    def __init__(self, ax, x, y, key=None):
        self.inaxes = ax
        self.xdata = x
        self.ydata = y
        self.key = key


def test_rect_zoom_and_history(win, browser):
    ax = win.trace_axs[0]
    win.on_press(Ev(ax, 0.2, -0.5))
    win.on_release(Ev(ax, 0.6, 0.5))
    assert browser.toffset == pytest.approx(0.2)
    assert browser.twindow == pytest.approx(0.4)

    class K:
        key = "b"

    win.on_key(K())  # zoom back
    assert browser.twindow == pytest.approx(1.0)
    K.key = "B"
    win.on_key(K())  # forward again
    assert browser.twindow == pytest.approx(0.4)


def test_click_sets_crosshair(win, browser):
    ax = win.trace_axs[0]
    win.on_press(Ev(ax, 0.3, 0.1))
    win.on_release(Ev(ax, 0.3, 0.1))
    assert win.crosshair is not None
    channel, t, y, kind = win.crosshair
    assert channel == 0 and kind == "trace"
    assert t == pytest.approx(0.3, abs=0.01)
    # marker key stores at the crosshair
    class K:
        key = "m"

    n0 = len(browser.marker_data)
    win.on_key(K())
    assert len(browser.marker_data) == n0 + 1
    assert browser.marker_data.times[-1] == pytest.approx(t)


def test_analyze_region_mode(win, browser):
    class K:
        key = "a"

    win.on_key(K())
    assert win.region_mode == "analyze"
    ax = win.trace_axs[1]
    win.on_press(Ev(ax, 0.4, -1.0))
    win.on_release(Ev(ax, 0.5, 1.0))
    plain = browser.analyzers[0]
    assert plain.data.rows[-1][:2] == pytest.approx([0.4, 0.5])
    assert plain.data.rows[-1][3] == 1  # channel


def test_save_region_mode(win, browser, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    class K:
        key = "w"

    win.on_key(K())
    ax = win.trace_axs[0]
    win.on_press(Ev(ax, 0.1, -1.0))
    win.on_release(Ev(ax, 0.2, 1.0))
    assert "saved region" in win.status


def test_overview_click_navigates(win, browser):
    win.on_press(Ev(win.overview_ax, 1.5, 0.0))
    assert browser.toffset == pytest.approx(1.5 - browser.twindow / 2)


def test_spec_click_readout(win, browser):
    ax = win.spec_axs[0]
    win.on_press(Ev(ax, 0.3, 4800.0))
    win.on_release(Ev(ax, 0.3, 4800.0))
    assert "f=4800Hz" in win.status


def test_linked_windows_redraw(tmp_path, cricket_like):
    """Changing one window's browser redraws the linked window too."""
    from audian_tpu.app import Audian
    from audian_tpu.gui.mpl import MplBrowserWindow

    x, rate = cricket_like
    wav_file = tmp_path / "rec.wav"
    wavio.write_audio(wav_file, x, rate, encoding="FLOAT")
    shell = Audian([wav_file, wav_file])
    shell.load_files()
    try:
        wa = MplBrowserWindow(shell.browsers[0])
        wb = MplBrowserWindow(shell.browsers[1])
        drawn = []
        wb._redraw_orig = wb._redraw
        wb._redraw = lambda: drawn.append(1) or wb._redraw_orig()
        wa.browser.update_filter(highpass_cutoff=1500.0)
        assert drawn, "linked window did not redraw"
        assert shell.browsers[1].data["filtered"].highpass_cutoff == 1500.0
    finally:
        shell.close()


def test_amplitude_keys(win, browser):
    class Ev:
        def __init__(self, key):
            self.key = key
            self.inaxes = None

    win.on_key(Ev("v"))
    lo, hi = browser.get_range("x", browser.show_channels[0])
    assert hi is not None and hi < 1.0  # auto-scaled to the data
    win.on_key(Ev("V"))
    lo, hi = browser.get_range("x", browser.show_channels[0])
    assert hi >= 1.0


def test_hover_readout(win, browser):
    """Hover shows the per-mode time rows (`timeplot.py:154-192`)."""
    ax = win.trace_axs[0]
    win.on_motion(Ev(ax, 0.5, 0.1))
    msg = win.hover_text.get_text()
    assert "REC" in msg and "a=" in msg
    ax = win.spec_axs[0]
    win.on_motion(Ev(ax, 0.5, 1000.0))
    assert "f=1000.0 Hz" in win.hover_text.get_text()


def test_crosshair_delta_readout(win, browser):
    """Marker storage anchors delta readouts (`plotranges.py:616-660`)."""
    ax = win.trace_axs[0]
    win.on_press(Ev(ax, 0.4, 0.0))
    win.on_release(Ev(ax, 0.4, 0.0))  # click places the crosshair

    class K:
        key = "m"

    win.on_key(K())  # store as anchor
    win.on_press(Ev(ax, 0.6, 0.0))
    win.on_release(Ev(ax, 0.6, 0.0))
    assert "Δtime=" in win.status
    info = browser.crosshair_readout()
    assert info["delta_time"] == pytest.approx(0.2, abs=1e-3)
    # the readout lands in the rendered figure (suptitle carries status)
    win.redraw()
    assert any("Δtime=" in t.get_text() for t in win.fig.texts)


def test_starttime_cycles_time_axis(win, browser):
    """'t' cycles the time label mode and relabels the axis
    (`timeaxisitem.py:20-26,120-206`)."""

    class K:
        key = "t"

    assert win.starttime_mode == 0
    win.on_key(K())
    assert win.starttime_mode == 1
    # 2 s recording, no start time in the WAV: absolute falls back to REC;
    # only the bottom data panel shows the tick value strings
    ax = win._bottom_data_ax()
    labels = [t.get_text() for t in ax.get_xticklabels()]
    assert labels and all(lbl for lbl in labels)
    win.on_key(K())
    win.on_key(K())
    assert win.starttime_mode == 0
    # only the bottom-most visible data panel carries the label text
    # (repeating it under every panel collides with the panel below);
    # the others keep the ticks but empty value strings and no label
    assert "REC" in ax.get_xlabel()
    assert win.trace_axs[0].get_xlabel() == ""


def test_colorbar_and_power_side_panel(win, browser):
    """Color bars + the live power side plot honor their toggles
    (`spectrogramplot.py:87-92,144-164`)."""
    c = browser.show_channels[0]
    assert not win.cbar_axs[c].get_visible()   # off by default
    assert not win.power_axs[c].get_visible()

    class K:
        key = "c"

    win.on_key(K())
    assert win.cbar_axs[c].get_visible()
    K.key = "z"
    win.on_key(K())
    assert win.power_axs[c].get_visible()
    line = win._artists[("power", c)]["line"]
    db, freqs = line.get_data()
    assert len(db) > 0 and len(freqs) == len(db)
    assert np.all(np.isfinite(db))
    # toggling the spectrograms away hides the side panels too
    browser.show_specs = 0
    win.redraw()
    assert not win.cbar_axs[c].get_visible()
    assert not win.power_axs[c].get_visible()
    browser.show_specs = 1
    K.key = "c"
    win.on_key(K())
    K.key = "z"
    win.on_key(K())


def test_overview_shows_all_channels(win, browser):
    """One stacked min/max band per channel in the overview
    (`fulltraceplot.py:62-292`)."""
    if browser.fulltrace is not None:
        browser.fulltrace.wait()
    win.redraw()
    art = win._artists["overview"]
    assert len(art["fills"]) == len(browser.show_channels)


class K:
    def __init__(self, key):
        self.key = key


def test_r_key_direction_matches_reference(win, browser):
    """Plain 'r' decreases the NFFT resolution, Shift+R increases —
    same direction as the reference (`audian.py:799-805`) and Qt."""
    node = browser.data["spectrogram"]
    n0 = node.nfft
    win.on_key(K("R"))
    assert node.nfft > n0
    win.on_key(K("r"))
    assert node.nfft == n0


def test_channel_change_rebuilds_axes(win, browser):
    """Digit keys / channel verbs can shrink or grow the shown set —
    the subplot grid follows instead of staying frozen."""
    all_ch = list(browser.show_channels)
    win.on_key(K("1"))  # only channel 0
    assert list(win.trace_axs) == [0]
    win.on_key(K("1"))  # restore all
    assert list(win.trace_axs) == all_ch


def test_close_detaches_from_browser(browser):
    w = MplBrowserWindow(browser)
    serial = w._redraw_serial
    w.on_key(K("q"))
    browser.sigFilterChanged.emit()
    assert w._redraw_serial == serial  # no redraw on a dead window
    assert w._conns == []
    assert w._closed


def test_right_button_does_not_select(win, browser):
    ax = win.trace_axs[0]
    t0, tw = browser.toffset, browser.twindow
    ev = Ev(ax, 0.2, -0.5)
    ev.button = 3
    win.on_press(ev)
    assert win._selection is None
    assert (browser.toffset, browser.twindow) == (t0, tw)


def test_release_outside_axes_clamps(win, browser):
    """Dragging past the panel edge zooms to the border instead of
    silently dropping the selection."""
    browser.set_times(0.0, 1.0)
    ax = win.trace_axs[0]
    win.on_press(Ev(ax, 0.4, -0.5))
    out = Ev(None, None, None)
    # pixel coords far right of the axes
    x1, y1 = ax.transData.transform((1.7, 0.0))
    out.x, out.y = x1, y1
    win.on_release(out)
    assert browser.toffset == pytest.approx(0.4, abs=1e-6)
    # clamped to the visible right edge (1.0), not 1.7
    assert browser.toffset + browser.twindow <= 1.0 + 1e-6


def test_resolution_step_mid_warm_snaps_then_swaps(win, browser):
    """R/Shift+R during the background warm: show the nearest warmed
    bucket now, swap to the requested one on a later 50 ms tick once
    the warm thread lands it (VERDICT r3 #4)."""
    b = browser
    nfft0 = b.data[b.spectrogram].nfft

    class AliveThread:
        def is_alive(self):
            return True

    b._warm_thread = AliveThread()
    b._warmed_nffts = {nfft0}
    try:
        win.on_key(K("R"))
        assert b.data[b.spectrogram].nfft == nfft0  # snapped
        assert b._pending_nfft == 2 * nfft0
        win._tick()
        assert b.data[b.spectrogram].nfft == nfft0  # still warming
        b._warmed_nffts.add(2 * nfft0)
        win._tick()
        assert b.data[b.spectrogram].nfft == 2 * nfft0
        assert not b.has_pending_resolution
    finally:
        b._warm_thread = None
        b._warmed_nffts = set()
        b.set_resolution(nfft=nfft0, dispatch=False)


def test_auto_scroll_and_audio_ticks(win, browser):
    browser.set_times(0.0, 0.5)
    win.on_key(K("!"))
    assert browser.scroll_active
    t0 = browser.toffset
    win._tick()
    assert browser.toffset > t0
    win.on_key(K(" "))  # space stops the scroll first
    assert not browser.scroll_active
    import fakesounddevice

    fakesounddevice.install()  # a failed play now DISARMS audio_time
    try:
        win.on_key(K(" "))  # then plays the window
        assert browser.audio_time >= 0
        win._tick()
        marker = win._artists[("trace",
                               browser.show_channels[0])]["audio"]
        assert marker.get_visible()
        # space again stops audio; the next tick hides the marker
        win.on_key(K(" "))
        assert browser.audio_time < 0
        win._tick()
        assert not marker.get_visible()
    finally:
        fakesounddevice.uninstall()


def test_selection_borders_on_spines(win, browser):
    """Selected channels get an emphasized panel border
    (`databrowser.py:367,969-974`)."""
    win.redraw()
    n = browser.data.channels
    assert sorted(browser.selected_channels) == list(range(n))
    for ax in win.trace_axs.values():
        assert ax.spines["top"].get_linewidth() == 2.0
    browser.select_channels([0])
    win.redraw()
    for c, ax in win.trace_axs.items():
        want = 2.0 if c == 0 else 0.8
        assert ax.spines["left"].get_linewidth() == want


def test_analyzer_events_split_across_panels(win, browser):
    """Trace events land on the trace axes, spectrogram-panel events on
    the spectrogram axes (`analyzer.py:186-252`,
    `databrowser.py:243-245`)."""
    from audian_tpu.analysis import Analyzer

    class PeakAnalyzer(Analyzer):
        def __init__(self, b):
            super().__init__(b, "peaks", "filtered")
            self.make_trace_events("peaks", "filtered", "o", "red", 5)
            self.make_panel_events("bands", "spectrogram", "x", "blue", 4)

        def analyze(self, t0, t1, channel, traces):
            self.set_events("peaks", channel, [t0, t1], [0.1, -0.1])
            self.set_events("bands", channel, [t0], [800.0])

    pa = PeakAnalyzer(browser)
    browser.analyze(0.5, 0.7, 0)
    win.redraw()
    tr = win._artists[("trace", 0)]["events"].get_offsets()
    sp = win._artists[("spec", 0)]["events"].get_offsets()
    assert [list(p) for p in tr] == [[0.5, 0.1], [0.7, -0.1]]
    assert [list(p) for p in sp] == [[0.5, 800.0]]
    # other channels' recorders were cleared by set_events(channel=0)
    assert len(win._artists[("trace", 1)]["events"].get_offsets()) == 0
    browser.remove_analyzer("peaks")
    win.redraw()
    assert len(win._artists[("trace", 0)]["events"].get_offsets()) == 0


def test_spec_level_shrinks_trace_rows(win, browser):
    """Cycling the spectrogram level rebuilds the grid with trace rows
    shrunk by the level's height fraction
    (`databrowser.py:118,1050-1052`)."""
    c = browser.show_channels[0]
    try:
        assert browser.show_specs == 1
        win.redraw()
        h1 = win.trace_axs[c].get_position().height
        s1 = win.spec_axs[c].get_position().height
        browser.toggle_spectrograms()  # -> level 2: traces at half height
        assert browser.show_specs == 2
        win.redraw()
        h2 = win.trace_axs[c].get_position().height
        s2 = win.spec_axs[c].get_position().height
        assert h2 < 0.65 * h1
        assert s2 > s1  # the spectrogram rows take the freed space
    finally:
        browser.set_panels(specs=1)
        win.redraw()


def test_spec_level_zero_restores_trace_rows(win, browser):
    """Cycling the level to 0 hides the spectrograms AND collapses their
    rows, giving the figure back to full-height traces — not level-4
    slivers against blank space (`databrowser.py:1050-1052,1116-1126`)."""
    c = browser.show_channels[0]
    try:
        browser.set_panels(specs=4)
        win.redraw()
        h4 = win.trace_axs[c].get_position().height
        browser.set_panels(specs=0)
        win.redraw()
        assert not win.spec_axs[c].get_visible()
        h0 = win.trace_axs[c].get_position().height
        assert h0 > 3 * h4  # traces get the figure back
        assert win.spec_axs[c].get_position().height < 0.01 * h0
    finally:
        browser.set_panels(specs=1)
        win.redraw()


def test_time_tick_values_only_on_the_bottom_panel(win, browser):
    """Stacked panels keep bare tick marks; only the bottom data panel
    shows the tick value strings and the axis label
    (`databrowser.py:994-1008`)."""
    win.redraw()
    axs = [ax for ax in (list(win.trace_axs.values())
                         + list(win.spec_axs.values()))
           if ax.get_visible()]
    bottom = min(axs, key=lambda ax: ax.get_position().y0)
    for ax in axs:
        texts = [t.get_text() for t in ax.get_xticklabels()]
        if ax is bottom:
            assert any(texts)
            assert ax.get_xlabel()
        else:
            assert not any(texts)
            assert not ax.get_xlabel()


def test_browser_driven_crosshair_and_grid_render(win, browser):
    """The headless browser is the source of truth: a crosshair placed
    through ``browser.set_crosshair`` and a grid mask toggled through
    ``browser.toggle_grids`` both render on the next redraw, without a
    click or key press, and the grid mask survives a grid rebuild."""
    try:
        browser.set_crosshair(0, t=0.5, amplitude=0.1)
        win.redraw()
        art = win._artists[("trace", 0)]
        assert art["cx"].get_visible() and art["cy"].get_visible()
        assert art["cx"].get_xdata()[0] == pytest.approx(0.5)
        # and it must actually PAINT: a dense min/max waveform fills the
        # panel, so the cursor lines need a zorder above the data artists
        win.fig.canvas.draw()
        buf = np.asarray(win.fig.canvas.buffer_rgba())
        mask = ((buf[..., 0] >= 190) & (buf[..., 1] >= 190)
                & (buf[..., 2] <= 90))
        assert mask.any(), "crosshair color not present in the render"
        # frequency placement moves it to the spectrogram panel
        browser.set_crosshair(0, t=1.2, frequency=900.0)
        win.redraw()
        assert not win._artists[("trace", 0)]["cx"].get_visible()
        assert win._artists[("spec", 0)]["cx"].get_visible()
        browser.clear_crosshair()
        win.redraw()
        assert not win._artists[("spec", 0)]["cx"].get_visible()

        assert browser.grids == 0
        browser.toggle_grids()
        win.redraw()
        ax = win.trace_axs[0]
        assert any(gl.get_visible() for gl in ax.xaxis.get_gridlines())
        # grid rebuilds (spec level change) keep the mask applied
        browser.set_panels(specs=2)
        win.redraw()
        ax = win.trace_axs[0]
        assert any(gl.get_visible() for gl in ax.xaxis.get_gridlines())
        # cycling back to 0 really turns the grid off (mpl re-enables
        # the grid if the off call carries style kwargs)
        while browser.grids != 0:
            browser.toggle_grids()
        win.redraw()
        assert not any(gl.get_visible() for gl in ax.xaxis.get_gridlines())
    finally:
        while browser.grids != 0:
            browser.toggle_grids()
        browser.clear_crosshair()
        browser.set_panels(specs=1)
        win.redraw()
