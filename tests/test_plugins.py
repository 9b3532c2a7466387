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


def test_example_plugin_file_loads(tmp_path, rng, monkeypatch):
    """The shipped example plugin (`examples/audianplugins.py`) loads
    through CWD discovery and wires both a trace and an analyzer."""
    import shutil
    from pathlib import Path

    from audian_tpu.app import DataBrowser
    from audian_tpu.data import wavio
    from audian_tpu.analysis import Plugins

    repo = Path(__file__).resolve().parents[1]
    shutil.copy(repo / "examples" / "audianplugins.py",
                tmp_path / "audianplugins.py")
    rate = 8000.0
    x = 0.2 * np.sin(2 * np.pi * 440.0 *
                     np.arange(int(1.0 * rate)) / rate)[:, None]
    p = tmp_path / "rec.wav"
    wavio.write_audio(p, x, rate, encoding="PCM_16")
    monkeypatch.chdir(tmp_path)
    plugins = Plugins()
    plugins.load_plugins(verbose=False)
    b = DataBrowser(p, plugins=plugins).open()
    try:
        assert "envelope" in b.data
        names = [a.name for a in b.analyzers]
        assert "zerocrossings" in names
        b.analyze(0.1, 0.6, 0)
        zc = b.get_analyzer("zerocrossings".upper()) or \
            next(a for a in b.analyzers if a.name == "zerocrossings")
        # a 440 Hz tone crosses zero ~440 times/s per direction
        assert zc.data.rows[-1][-1] == pytest.approx(440.0, rel=0.1)
    finally:
        b.close()


def test_plugins_load_by_path_not_stem(tmp_path):
    """Two directories with same-stem plugin files must both load (stem
    imports would return the first one's sys.modules entry), and a
    broken plugin is skipped without aborting discovery."""
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    (d1 / "audianfoo.py").write_text(
        "def audian_first_traces(browser):\n    browser.tag = 'first'\n")
    (d2 / "audianfoo.py").write_text(
        "def audian_second_traces(browser):\n    browser.tag = 'second'\n")
    (d2 / "audianbad.py").write_text("this is not python !!!")
    p = Plugins()
    p.clear_trace_factories()
    p.load_plugins(d1, verbose=False)
    p.load_plugins(d2, verbose=False)  # same stem, different file
    names = [f.__name__ for f in p.trace_factories]
    assert "audian_first_traces" in names
    assert "audian_second_traces" in names  # NOT the cached d1 module
    # the broken plugin was reported and skipped, discovery continued
    assert "audianbad" not in p.plugins
    # a re-scan of the same directory registers nothing twice
    p.load_plugins(d1, verbose=False)
    assert [f.__name__ for f in p.trace_factories].count(
        "audian_first_traces") == 1


def test_broken_plugin_retries_after_fix(tmp_path):
    """A plugin that fails to load is NOT blacklisted for the session:
    a rescan after the user fixes the file loads it."""
    f = tmp_path / "audianfix.py"
    f.write_text("this is not python !!!")
    p = Plugins()
    p.clear_trace_factories()
    p.load_plugins(tmp_path, verbose=False)
    assert not [x for x in p.trace_factories
                if x.__name__ == "audian_fixed_traces"]
    f.write_text("def audian_fixed_traces(browser):\n    pass\n")
    p.load_plugins(tmp_path, verbose=False)
    names = [x.__name__ for x in p.trace_factories]
    assert names.count("audian_fixed_traces") == 1
