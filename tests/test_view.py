"""View-model layer: panels, plot ranges, axis ticks, zoom/selection."""

import datetime as dt

import numpy as np
import pytest

from audian_tpu.view import (
    Panel, Panels, PlotRange, PlotRanges,
    tick_spacing, format_time_ticks, time_label_width,
    REC_TIME, ABS_TIME, FILE_TIME,
    Rect, ZoomHistory, SelectionModel,
)


class FakeAx:
    """Duck-typed plot: records range calls."""

    def __init__(self, channel=0, axspec="tx", rmin=0.0, rmax=100.0,
                 rstep=10.0):
        self.channel = channel
        self.axspec = axspec
        self._range = (rmin, rmax, rstep)
        self.calls = []
        self.limits = {}
        self.visible = True
        self.data_items = []

    def x(self):
        return self.axspec[0]

    def y(self):
        return self.axspec[1]

    def z(self):
        return self.axspec[2] if len(self.axspec) > 2 else ""

    def range(self, axspec):
        if axspec in "xyu":  # amplitude letters get signed limits
            return (-1.0, 1.0, 0.1)
        return self._range

    def setLimits(self, **kw):
        self.limits.update(kw)

    def setXRange(self, r0, r1):
        self.calls.append(("x", r0, r1))

    def setYRange(self, r0, r1):
        self.calls.append(("y", r0, r1))

    def setZRange(self, r0, r1):
        self.calls.append(("z", r0, r1))

    def amplitudes(self, t0, t1):
        return (-0.5, 0.5)

    def isVisible(self):
        return self.visible

    def setVisible(self, v):
        self.visible = v

    def getViewBox(self):
        return self

    def add_item(self, item, is_data=False):
        if is_data:
            self.data_items.append(item)

    def update_plot(self):
        self.calls.append(("update",))

    def showGrid(self, **kw):
        pass


# -- panels -----------------------------------------------------------------


def test_panel_axis_specs():
    p = Panel("trace", "tx", 0)
    assert p.is_time() and p.is_trace() and not p.is_spectrogram()
    s = Panel("spectrogram", "tfp", 1)
    assert s.is_spectrogram() and s.is_zpower()
    pw = Panel("spectrogram-power", "pf", 1)
    assert pw.is_power()


def test_panels_fresh_letters():
    ps = Panels()
    ps.add_trace("trace")
    ps.add_trace("envelope2")
    assert ps["trace"].ax_spec == "tx"
    assert ps["envelope2"].ax_spec == "ty"  # fresh amplitude letter
    ps.add_spectrogram("spectrogram")
    assert ps["spectrogram"].ax_spec == "tfp"
    assert ps["spectrogram-power"].ax_spec == "pf"
    ps.add_spectrogram("spec2")
    assert ps["spec2"].ax_spec == "twq"  # fresh freq + power letters


def test_panels_fill_from_traces():
    class T:
        def __init__(self, panel, ptype):
            self.panel = panel
            self.panel_type = ptype

    class D:
        traces = [T("trace", "trace"), T("pulses", "trace"),
                  T("spectrogram", "spectrogram")]

    ps = Panels()
    ps.fill(D())
    assert set(ps) == {"trace", "pulses", "spectrogram",
                       "spectrogram-power"}


def test_panels_rows_and_spacers():
    ps = Panels()
    ps.add_trace("trace")
    ps.add_spectrogram("spectrogram")
    ps.insert_spacers()
    names = list(ps)
    assert names[0] == "trace"
    assert any(n.startswith("spacer") for n in names)
    # power panel does not get a spacer before it
    i = names.index("spectrogram")
    assert names[i + 1] == "spectrogram-power"


# -- plot ranges ----------------------------------------------------------------


def make_ranges(nch=2, rmax=100.0):
    pr = PlotRanges()
    pr.setup(nch)
    axs = []
    for c in range(nch):
        ax = FakeAx(c, "tx", 0.0, rmax, 10.0)
        pr.add_plot(ax)
        axs.append(ax)
    pr.set_limits()
    return pr, axs


def test_set_limits_and_initial_ranges():
    pr, axs = make_ranges()
    t = pr["t"]
    assert t.rmin == 0.0 and t.rmax == 100.0 and t.rstep == 10.0
    assert t.min_dr == 0.001  # time axes get 1 ms minimum zoom
    assert t.r0[0] == 0.0 and t.r1[0] == 10.0  # 10 s initial time window
    x = pr["x"]
    assert x.r1[0] == 1.0


def test_time_ranges_linked_across_channels():
    pr, axs = make_ranges()
    pr["t"].set_ranges(20.0, 30.0, channels=[1])
    assert pr["t"].r0 == [20.0, 20.0]
    assert pr["t"].r1 == [30.0, 30.0]
    assert ("x", 20.0, 30.0) in axs[0].calls


def test_clamping():
    pr, axs = make_ranges()
    pr["t"].set_ranges(-5.0, 5.0)
    assert pr["t"].r0[0] == 0.0 and pr["t"].r1[0] == 10.0
    pr["x"].set_ranges(0.5, 1.5)
    assert pr["x"].r1[0] == 1.0 and pr["x"].r0[0] == 0.0


def test_zoom_and_pan_verbs():
    pr, axs = make_ranges()
    t = pr["t"]
    assert t.rmin == 0.0
    t.set_ranges(10.0, 20.0)
    t.zoom_in()
    assert t.r1[0] - t.r0[0] == pytest.approx(5.0)
    t.zoom_out()
    assert t.r1[0] - t.r0[0] == pytest.approx(10.0)
    t.up()
    assert t.r0[0] == pytest.approx(15.0)
    t.step_down()
    assert t.r0[0] == pytest.approx(5.0)  # rstep = 10
    t.home()
    assert t.r0[0] == 0.0
    t.end()
    assert t.r1[0] >= 100.0
    t.snap()
    width = t.r1[0] - t.r0[0]
    assert width == 10 * 2 ** round(np.log2(width / 10))


def test_auto_uses_data_amplitudes():
    pr, axs = make_ranges()
    pr["x"].auto(0.0, 1.0)
    assert pr["x"].r0[0] == -0.5 and pr["x"].r1[0] == 0.5
    pr["x"].set_ranges(-0.3, 0.5)
    pr["x"].center()
    assert pr["x"].r0[0] == -0.5 and pr["x"].r1[0] == 0.5
    pr["x"].reset()
    assert pr["x"].r1[0] == 1.0


def test_verb_dispatch_over_axspec():
    pr, axs = make_ranges()
    pr["t"].set_ranges(0.0, 10.0)
    pr["x"].set_ranges(-1.0, 1.0)
    pr.zoom_in("tx")
    assert pr["t"].r1[0] - pr["t"].r0[0] == pytest.approx(5.0)
    # signed amplitude axis zooms around the center
    assert pr["x"].r1[0] - pr["x"].r0[0] == pytest.approx(1.0)
    assert pr["x"].r0[0] == pytest.approx(-0.5)


def test_markers_and_deltas():
    pr, axs = make_ranges()
    pr["t"].set_marker(0, axs[0], 5.0)
    axspec, pos = pr.marker_time()
    assert axspec == "t" and pos == 5.0
    pr["t"].stored_marker_pos = 3.0
    axspec, d = pr.marker_delta_time()
    assert d == pytest.approx(2.0)
    pr.clear_marker()
    assert pr.marker_time() == (None, None)


# -- axis ticks -------------------------------------------------------------------


def test_tick_spacing_125():
    major, minor = tick_spacing(0.0, 10.0, 1000, 50)
    mant = major / 10 ** np.floor(np.log10(major))
    assert round(mant, 6) in (1.0, 2.0, 5.0)
    assert minor <= major
    # narrow widget -> coarser ticks
    major2, _ = tick_spacing(0.0, 10.0, 100, 50)
    assert major2 >= major
    assert tick_spacing(5.0, 5.0, 100, 10) is None


def test_format_time_ticks_modes():
    # seconds mode always renders milliseconds (timeaxisitem.py:166-170)
    label, units, strs, _ = format_time_ticks([0.0, 30.0], 30.0)
    assert (label, units) == ("REC", "s")
    assert strs == ["0.000", "30.000"]
    label, units, strs, _ = format_time_ticks([0.0, 90.0], 30.0)
    assert units == "m:s" and strs == ["0:00", "1:30"]
    label, units, strs, _ = format_time_ticks([4000.0], 1000.0)
    assert units == "h:m:s" and strs == ["1:06:40"]
    # sub-second spacing appends fractions
    _, units, strs, _ = format_time_ticks([1.25], 0.25)
    assert strs == ["1.250"]
    # absolute mode adds the start time
    st = dt.datetime(2026, 1, 1, 10, 30, 0)
    label, units, strs, _ = format_time_ticks([90.0], 30.0, mode=ABS_TIME,
                                              starttime=st)
    assert label == "Time" and strs == ["10:31:30"]
    # per-file mode restarts at file boundaries
    label, units, strs, fn = format_time_ticks(
        [50.0, 130.0], 10.0, mode=FILE_TIME,
        file_times=[0.0, 100.0], file_paths=["a.wav", "b.wav"])
    assert label == "File" and fn == "a.wav"
    assert strs == ["50.000", "30.000"]  # restarts at file boundary


def test_time_label_width_grows_with_precision():
    assert time_label_width(10.0, 1.0) < time_label_width(10.0, 1e-5)
    assert time_label_width(4000.0, 1.0) > time_label_width(30.0, 1.0)


# -- zoom history / selection --------------------------------------------------------


def test_zoom_history():
    z = ZoomHistory()
    z.init(Rect(0, 0, 100, 1))
    z.add(Rect(10, 0, 20, 1))
    z.add(Rect(12, 0, 14, 1))
    assert z.back().x0 == 10
    z.add(Rect(11, 0, 13, 1))  # truncates forward branch
    assert z.forward() is None  # already at the top after add
    assert z.current().x0 == 11
    assert z.home().x0 == 0
    assert z.forward().x0 == 10


def test_selection_model():
    got = []
    sel = SelectionModel(1, on_selected=lambda c, v, r: got.append((c, r)))
    sel.begin(5.0, 1.0)
    sel.drag(8.0, -1.0)
    rect = sel.finish(8.0, -1.0)
    assert rect.left() == 5.0 and rect.top() == 1.0
    assert got[0][0] == 1
    sel.begin(1, 1)
    sel.cancel()
    assert sel.finish(2, 2) is None


def test_plot_range_none_limits_safe():
    """Axes that report no data limits (None) must not crash the
    limit/verb machinery."""
    from audian_tpu.view.plotranges import PlotRange

    class Ax:
        def range(self, spec):
            return None, None, None

        def setLimits(self, **kw):
            pass

        def setXRange(self, a, b):
            self.r = (a, b)

    pr = PlotRange("x", 1)
    ax = Ax()
    pr.add_xaxis(ax, 0)
    pr.set_limits()
    pr.reset()
    pr.zoom_in()
    pr.up()
    assert pr.at_home() in (True, False)
    assert ax.r[0] < ax.r[1]


def test_format_time_ticks_negative_values():
    from audian_tpu.view.axes import format_time_ticks, FILE_TIME, REC_TIME

    for mode in (REC_TIME, FILE_TIME):
        label, units, strings, fn = format_time_ticks(
            [-0.01, 0.0, 1.0], 0.5, mode=mode,
            file_times=[0.0, 10.0], file_paths=["a.wav", "b.wav"])
        assert len(strings) == 3


def test_time_ticks_label_total_elapsed():
    """Relative modes label TOTAL elapsed time — datetime components
    would wrap a 25 h recording back to 1:00:00 and the 3600 s tick of
    an m:s axis to 0:00."""
    from audian_tpu.view.axes import format_time_ticks

    _, units, strs, _ = format_time_ticks([90000.0, 93600.0], 3600.0)
    assert units == "h:m:s"
    assert strs == ["25:00:00", "26:00:00"]
    _, units, strs, _ = format_time_ticks([0.0, 1800.0, 3600.0], 600.0)
    assert strs[-1] == "60:00"
    _, units, strs, _ = format_time_ticks([0.0, 60.0], 10.0)
    assert strs == ["0.000", "60.000"]  # s mode always shows millis
    # fractional spacing still renders the sub-second digits
    _, _, strs, _ = format_time_ticks([0.25], 0.05)
    assert strs == ["0.250"]


def test_zoom_history_boundaries():
    """Empty histories and boundary presses no-op (pyqtgraph
    scaleHistory semantics) instead of desyncing the pointer or
    re-applying the same rect per keypress."""
    from audian_tpu.view.zoom import Rect, ZoomHistory

    z = ZoomHistory()
    assert z.back() is None          # empty: must not clamp -1 -> 0
    r1, r2 = Rect(0, 0, 1, 1), Rect(0, 0, 2, 2)
    z.add(r1)
    z.add(r2)
    assert z.current() is r2         # pointer still in sync
    assert z.back() is r1
    assert z.back() is None          # already at the oldest entry
    assert z.forward() is r2
    assert z.forward() is None       # already at the newest entry
    assert z.home() is r1
    assert z.home() is None


def test_plot_range_verbs_preserve_invariants(rng=None):
    """Any sequence of range verbs keeps every channel's window ordered,
    inside the limits, and no narrower than the minimum zoom — the
    clamp+broadcast engine's contract."""
    import numpy as np

    r = np.random.default_rng(3)
    pr = PlotRanges()
    pr.setup(3)
    axs = [FakeAx(c, "tx", 0.0, 100.0, 10.0) for c in range(3)]
    for ax in axs:
        pr.add_plot(ax)
    pr.set_limits()
    verbs = ["zoom_in", "zoom_out", "zoom_in_centered",
             "zoom_out_centered", "down", "up", "small_down", "small_up",
             "step_down", "step_up", "min_down", "min_up", "max_down",
             "max_up", "home", "end", "snap", "reset", "center"]
    for letter in "tx":
        p = pr[letter]
        for k in range(300):
            getattr(p, str(r.choice(verbs)))()
            for c in range(3):
                lo, hi = p.r0[c], p.r1[c]
                assert lo < hi, (letter, k, lo, hi)
                if p.rmin is not None:
                    assert lo >= p.rmin - 1e-9
                if p.rmax is not None and letter != "t":
                    # time axes deliberately overrun rmax (end() pages
                    # past it; the reference model does the same and
                    # caps the VIEW via setLimits maxXRange)
                    assert hi <= p.rmax + 1e-9
                if p.min_dr:
                    assert hi - lo >= p.min_dr * (1 - 1e-9)


class _FakeAx:
    def __init__(self, visible=True):
        self._vis = visible
        self.data_items = []

    def isVisible(self):
        return self._vis

    def setVisible(self, on):
        self._vis = bool(on)


def _panels_with_axes(*specs):
    """Panels of (name, ax_spec, visible) with one fake axis each."""
    ps = Panels()
    for name, spec, vis in specs:
        ps.add(name, spec)
        ps[name].add_ax(ps[name].row, _FakeAx(vis))
    return ps


def test_spacer_cascade_follows_visible_panels():
    """show_spacers: a spacer shows iff the panel above it is visible,
    and the spacer trailing the LAST visible panel switches back off
    (coverage-flagged cascade, docs/testing.md)."""
    ps = _panels_with_axes(("trace", "tx", True),
                           ("spectrogram", "tfp", True),
                           ("envelope", "tx", True))
    ps.insert_spacers()
    for sp in (p for p in ps.values() if p.is_spacer()):
        sp.add_ax(sp.row, _FakeAx(False))
    ps.show_spacers(0)
    spacers = [p for p in ps.values() if p.is_spacer()]
    # every spacer sits above a visible panel: both interior, both on
    assert [s.is_visible(0) for s in spacers] == [True, True]
    # hide the LAST panel: its leading spacer is now trailing -> off
    ps["envelope"].set_visible(False)
    ps.show_spacers(0)
    assert [s.is_visible(0) for s in spacers] == [True, False]
    # hide the middle panel too: its leading spacer follows it off and
    # the remaining visible panel (trace) leaves no spacer on
    ps["spectrogram"].set_visible(False)
    ps.show_spacers(0)
    assert [s.is_visible(0) for s in spacers] == [False, False]
    # hide everything: still all off
    ps["trace"].set_visible(False)
    ps.show_spacers(0)
    assert [s.is_visible(0) for s in spacers] == [False, False]


def test_spacer_helpers_no_ops():
    """Spacer panels skip grids and report no traces."""
    ps = _panels_with_axes(("trace", "tx", True),
                           ("spectrogram", "tfp", True))
    ps.insert_spacers()
    sp = next(p for p in ps.values() if p.is_spacer())
    sp.add_ax(sp.row, _FakeAx(False))
    assert not sp.has_visible_traces(0)
    sp.show_grid(3)  # must not touch the fake axis (no showGrid attr)
