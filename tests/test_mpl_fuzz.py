"""Randomized key/mouse fuzzing of the matplotlib frontend (Agg).

Feeds the full `on_key` keyboard surface plus synthesized press/motion/
release sequences on random panels to :class:`MplBrowserWindow` in
random order, checking the underlying browser's structural invariants
(:mod:`tests.test_fuzz_interaction`) after every event.  Unlike the Qt
adapter, mpl event handlers do NOT swallow exceptions — any raise fails
the test directly.
"""

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from audian_tpu.app import DataBrowser
from audian_tpu.analysis import Plugins
from audian_tpu.data import wavio
from audian_tpu.graph import EnvelopeNode
from audian_tpu.gui.mpl import MplBrowserWindow
from test_fuzz_interaction import _check_invariants

RATE = 8000.0
DURATION = 1.5

#: the on_key surface (`gui/mpl.py:695`) minus playback (`p`, space —
#: exercised in tests/test_mix.py) and quit (`q`)
KEYS = ("right", "left", ".", ",", "x", "X", "home", "end",
        "f", "F", "l", "L", "e", "E", "r", "R",
        "o", "y", "a", "b", "B", "C", "v", "V", "i", "g",
        "down", "up", "pagedown", "pageup", "1", "2", "0",
        "!", "m", "t", "c", "z")


class Ev:
    def __init__(self, ax, x, y, key=None, button=1):
        self.inaxes = ax
        self.xdata = x
        self.ydata = y
        self.key = key
        self.button = button
        self.x = 0.0
        self.y = 0.0


@pytest.fixture(scope="module")
def wav(tmp_path_factory, rng):
    t = np.arange(int(DURATION * RATE)) / RATE
    am = (np.sin(2 * np.pi * 5.0 * t) > 0).astype(float)
    x = np.stack([0.5 * np.sin(2 * np.pi * 700 * t) * am,
                  0.3 * np.sin(2 * np.pi * 350 * t)], axis=1)
    x += 0.01 * rng.standard_normal(x.shape)
    p = tmp_path_factory.mktemp("mplfuzz") / "rec.wav"
    wavio.write_audio(p, x, RATE, encoding="PCM_16")
    return p


def test_mpl_event_fuzz(wav, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # region saves land in tmp
    plugins = Plugins()
    plugins.add_trace_factory(
        lambda b: b.add_trace(EnvelopeNode("envelope", "filtered")))
    b = DataBrowser(wav, plugins=plugins).open()
    win = MplBrowserWindow(b)
    try:
        rng = np.random.default_rng(3)

        def rand_ax():
            pools = [list(win.trace_axs.values()),
                     list(win.spec_axs.values()),
                     [win.overview_ax]]
            pool = pools[int(rng.integers(0, len(pools)))]
            return pool[int(rng.integers(0, len(pool)))]

        def key_event():
            win.on_key(Ev(None, None, None,
                          key=str(rng.choice(KEYS))))

        def click():
            ax = rand_ax()
            x = float(rng.uniform(0.0, DURATION))
            y = float(rng.uniform(-1.0, 1.0))
            win.on_press(Ev(ax, x, y))
            win.on_release(Ev(ax, x, y))

        def drag():
            ax = rand_ax()
            x0 = float(rng.uniform(0.0, DURATION * 0.8))
            x1 = x0 + float(rng.uniform(0.01, 0.4))
            y0, y1 = sorted(rng.uniform(-1.0, 1.0, size=2).tolist())
            win.on_press(Ev(ax, x0, y0))
            for f in (0.3, 0.7):
                win.on_motion(Ev(ax, x0 + f * (x1 - x0), y0))
            win.on_release(Ev(ax, x1, y1))

        def hover():
            ax = rand_ax()
            win.on_motion(Ev(ax, float(rng.uniform(0.0, DURATION)),
                             float(rng.uniform(-1.0, 1.0))))

        events = [key_event, key_event, key_event, click, drag, hover]
        for step in range(150):
            ev = events[int(rng.integers(0, len(events)))]
            try:
                ev()
            except Exception as exc:
                raise AssertionError(
                    f"step {step}: {ev.__name__} raised {exc!r}") from exc
            _check_invariants(b)
            assert win.fig is not None
        # the figure still renders after the whole history
        win.fig.canvas.draw()
    finally:
        win.close()
        b.close()
