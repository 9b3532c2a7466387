"""Thin public-API surface mirrored from the reference.

These entry points exist for parity with the reference's documented
plugin/controller API (`src/audian/analyzer.py:32-77`,
`databrowser.py:1317-1341`, `markerdata.py:211-218,384`) or as public
introspection helpers; nothing in the package calls them internally, so
without tests they could silently rot.
"""

import numpy as np
import pytest

from audian_tpu.app import Audian, DataBrowser
from audian_tpu.app.markers import MarkerLabel, find_label
from audian_tpu.analysis import Analyzer, Plugins
from audian_tpu.data import wavio

RATE = 8000.0


@pytest.fixture(scope="module")
def wav(tmp_path_factory, rng):
    t = np.arange(int(2.0 * RATE)) / RATE
    x = np.stack([0.4 * np.sin(2 * np.pi * 700 * t),
                  0.2 * np.sin(2 * np.pi * 300 * t)], axis=1)
    x += 0.01 * rng.standard_normal(x.shape)
    p = tmp_path_factory.mktemp("api") / "api.wav"
    wavio.write_audio(p, x, RATE, encoding="PCM_16")
    return p


@pytest.fixture()
def browser(wav):
    b = DataBrowser(str(wav))
    b.open()
    yield b
    b.close()


def test_panel_events_and_add_events(browser):
    """make_panel_events targets a panel instead of a trace, and
    add_events accumulates points instead of replacing them
    (`analyzer.py:220-252,284-308`)."""

    class BurstAnalyzer(Analyzer):
        def __init__(self, b):
            super().__init__(b, "bursts", "filtered")
            self.make_column("n", "", "%d")
            self.make_panel_events("bursts", "trace", "x", "blue", 4)

        def analyze(self, t0, t1, channel, traces):
            self.store(1)
            self.add_events("bursts", channel, [t0], [0.0])

    ba = BurstAnalyzer(browser)
    browser.analyze(0.1, 0.2, 0)
    browser.analyze(0.3, 0.4, 0)
    assert len(ba.events["bursts"][0].x) == 2   # accumulated, not reset
    assert len(ba.events["bursts"][1].x) == 0
    browser.analyze(0.5, 0.6, -1)               # all channels
    assert len(ba.events["bursts"][1].x) == 1


def test_add_to_channel_sets(browser):
    """Channel-set extension verbs (`databrowser.py:1317-1341`)."""
    browser.set_channels([0])
    browser.add_to_show_channels([1])
    assert browser.show_channels == [0, 1]
    browser.add_to_selected_channels([1])
    assert 1 in browser.selected_channels


def test_marker_label_helpers():
    labels = [MarkerLabel("song", "s", "red"),
              MarkerLabel("noise", "n", "gray")]
    assert find_label(labels, "n").label == "noise"
    assert find_label(labels, "q") is None


def test_marker_data_set_label_and_text(browser):
    md = browser.marker_data
    md.add_data(0, 0.5, label="a", text="first")
    md.set_label(len(md) - 1, "b")
    md.set_text(len(md) - 1, "edited")
    assert md.labels[-1] == "b"
    assert md.texts[-1] == "edited"


def test_shell_apply_time(wav):
    shell = Audian([str(wav)])
    shell.load_files()
    try:
        b = shell.current
        b.set_times(0.0, 0.5)
        shell.apply_time("time_page_down")
        assert b.toffset > 0.0
    finally:
        shell.close()


def test_data_buffered_region(browser):
    browser.set_times(0.5, 1.0)
    t0, t1 = browser.data.buffered_region()
    assert t0 <= 0.5 and t1 >= 1.4  # interior window covers the view


def test_graph_introspection(browser):
    from audian_tpu.graph import FilterNode
    from audian_tpu.graph.graph import TraceGraph

    g = browser.data.graph
    assert isinstance(g, TraceGraph)
    assert "filtered" in g.get_nodes(FilterNode)
    spec = g.source_of(g["spectrogram"])
    assert spec.rate == RATE


def test_executor_cache_clear(browser):
    ex = browser.data.executor
    assert ex.cache_size > 0          # open() compiled the default chain
    ex.clear_cache()
    assert ex.cache_size == 0
    browser.data.get_region(0.2, 0.4, 0)  # recompiles transparently
    assert ex.cache_size > 0


def test_plot_range_edges(browser):
    r = browser.plot_ranges["t"]
    r.end()
    assert r.at_end()
    r.home()
    assert r.at_home()


def test_spectiler_power_at(browser):
    from audian_tpu.view.render import SpecTiler

    browser.set_times(0.0, 1.0)
    spec = browser.data["spectrogram"]
    tiler = SpecTiler()
    t = 0.5
    f = float(spec.frequencies[5])
    got = tiler.power_at(spec, t, f, 0)
    i = int(t * spec.rate)
    want = float(np.asarray(spec[i, 0, 5]))
    assert got == pytest.approx(want, rel=1e-6)


def test_plugin_registry_clearing():
    p = Plugins()
    p.add_trace_factory(lambda browser: [])
    p.add_analyzer_factory(lambda browser: None)
    assert p.trace_factories and p.analyzer_factories
    p.clear_trace_factories()
    p.clear_analyzer_factories()
    assert not p.trace_factories and not p.analyzer_factories


def test_panel_lookup_and_colorbars(browser):
    from audian_tpu.view.panels import Panel

    panels = browser.panels
    spec_panel = panels.get("spectrogram")
    vb = spec_panel.axs[0].getViewBox()
    assert panels.get_panel(vb) is spec_panel
    assert isinstance(spec_panel.has_visible_traces(0), bool)

    # the colorbar slot is frontend-populated via add_ax(..., axc=...)
    class _Bar:
        def __init__(self):
            self._v = True

        def setVisible(self, v):
            self._v = bool(v)

        def isVisible(self):
            return self._v

    p = Panel("spec2", spec_panel.ax_spec, 0)
    p.add_ax(0, spec_panel.axs[0], axc=_Bar())
    p.set_cbar_visible(False)
    assert p.is_cbar_visible(0) is False
    p.set_cbar_visible(True)
    assert p.is_cbar_visible(0) is True
