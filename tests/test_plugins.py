"""Plugin discovery and the analysis result table."""

import numpy as np
import pytest

from audian_tpu.analysis import Plugins, ResultTable, default_setup_traces


def test_result_table(tmp_path):
    t = ResultTable()
    t.append("time", "s", "%.2f")
    t.append("label")
    t.add([1.234, "song"])
    t.add([5.6789, "end"])
    assert t.shape == (2, 2)
    assert t["time"] == [1.234, 5.6789]
    assert t.formatted(0) == ["1.23", "song"]
    path = t.write(tmp_path / "out.csv")
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "time/s,label"
    assert lines[1] == "1.23,song"
    t.clear_data()
    assert len(t) == 0
    df = t.to_dataframe()
    assert list(df.columns) == ["time", "label"]


def test_plugin_discovery(tmp_path):
    (tmp_path / "audianmyplug.py").write_text(
        "def audian_extra_traces(browser):\n"
        "    browser.added = True\n"
        "def audian_my_analyzer(browser):\n"
        "    browser.analyzed = True\n"
        "def unrelated():\n"
        "    pass\n"
    )
    (tmp_path / "other.py").write_text("def audian_x_traces(b): pass\n")
    p = Plugins()
    p.load_plugins(tmp_path, verbose=False)
    assert "audianmyplug" in p.plugins
    assert len(p.trace_factories) == 2  # default + plugin
    assert len(p.analyzer_factories) == 1

    class B:
        added = False
        analyzed = False

        def add_trace(self, node):
            pass

    b = B()
    p.setup_traces(b)
    p.setup_analyzers(b)
    assert b.added and b.analyzed


def test_default_factory_installs_reference_chain():
    names = []

    class B:
        def add_trace(self, node):
            names.append(node.name)

    default_setup_traces(B())
    # reference parity: filter + spectrogram only (plugins.py:11-13)
    assert names == ["filtered", "spectrogram"]
