"""Matplotlib frontend.

A complete keyboard-driven browser over the headless controllers — the
same role the reference's PyQt5/pyqtgraph window plays
(`src/audian/databrowser.py`, `src/audian/audian.py`), with the view
composed of per-channel trace + spectrogram panels above a whole-recording
overview (`src/audian/fulltraceplot.py` analog).  All pixels come from the
device render tiles (:mod:`audian_tpu.view.render`); matplotlib only blits
them.  Runs under any matplotlib backend, including Agg for headless
screenshots; the richer Qt/pyqtgraph frontend lives in
:mod:`audian_tpu.gui.qt`.

Key bindings (subset of the reference's ~60 actions, same keys):
    right/left . page down/up     x/X zoom in/out (time)
    home/end                      f/F highpass up/down  l/L lowpass
    e/E envelope cutoff           r/R frequency resolution (NFFT)
    p play visible window         s save screenshot
    q quit
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..app.browser import DataBrowser
from ..app.screenshot import save_view_screenshot

__all__ = ["MplBrowserWindow", "show"]


class MplBrowserWindow:
    """One figure per recording: overview + per-channel panels."""

    def __init__(self, browser: DataBrowser, figsize=(12, 8), show_spec=True):
        import matplotlib.pyplot as plt

        self.plt = plt
        self.browser = browser
        self.show_spec = show_spec and "spectrogram" in browser.data
        channels = browser.show_channels
        rows = len(channels) * (2 if self.show_spec else 1) + 1
        heights = ([3, 2] if self.show_spec else [3]) * len(channels) + [1]
        self.fig, axs = plt.subplots(
            rows, 1, figsize=figsize, squeeze=False,
            gridspec_kw=dict(height_ratios=heights, hspace=0.35))
        axs = [a[0] for a in axs]
        self.trace_axs = {}
        self.spec_axs = {}
        k = 0
        for c in channels:
            self.trace_axs[c] = axs[k]
            k += 1
            if self.show_spec:
                self.spec_axs[c] = axs[k]
                k += 1
        self.overview_ax = axs[-1]
        self.fig.canvas.mpl_connect("key_press_event", self.on_key)
        self._zlevels = {}
        self.redraw()

    # -- drawing ------------------------------------------------------------------

    def redraw(self):
        b = self.browser
        t0, t1 = b.toffset, b.toffset + b.twindow
        name = "filtered" if "filtered" in b.data else "data"
        for c, ax in self.trace_axs.items():
            ax.clear()
            times, values = b.trace_tile(name, c)
            if len(times) > 1:
                ax.plot(times, values, lw=0.6,
                        color=b.data[name].color if name != "data"
                        else "#0000ee")
            ax.set_xlim(t0, t1)
            ax.set_ylabel(f"ch {c}")
        for c, ax in self.spec_axs.items():
            ax.clear()
            if c not in self._zlevels:
                self._zlevels[c] = b.estimate_power_levels(c)
            zmin, zmax = self._zlevels[c]
            img, rect = b.spec_tile(c, zmin, zmax)
            if img.size:
                ax.imshow(img.T, origin="lower", aspect="auto",
                          extent=(rect[0], rect[0] + rect[2], rect[1],
                                  rect[3]), cmap="magma",
                          interpolation="nearest", vmin=0, vmax=1)
            ax.set_xlim(t0, t1)
            ax.set_ylabel("f/Hz")
        self._draw_overview()
        title = Path(str(b.data.file_path)).name
        f = b.data["filtered"]
        if f is not None and f.design is not None:
            title += (f"   [{f.highpass_cutoff:.0f}-"
                      f"{f.lowpass_cutoff:.0f} Hz]")
        self.fig.suptitle(title)
        self.fig.canvas.draw_idle()

    def _draw_overview(self):
        b = self.browser
        ax = self.overview_ax
        ax.clear()
        ft = b.fulltrace
        if ft is not None and ft.datas is not None:
            c = b.show_channels[0]
            ax.fill_between(ft.times[: len(ft.datas)],
                            ft.datas[0::2, c].repeat(2)[: len(ft.times)],
                            ft.datas[1::2, c].repeat(2)[: len(ft.times)],
                            color="#888888", lw=0)
        ax.axvspan(b.toffset, b.toffset + b.twindow, color="#2255cc",
                   alpha=0.4)
        ax.set_xlim(0, b.data.frames / b.data.rate)
        ax.set_yticks([])
        ax.set_xlabel("time/s")

    # -- interaction --------------------------------------------------------------

    def on_key(self, event):
        b = self.browser
        key = event.key
        actions = {
            "right": b.time_page_down,
            ".": b.time_page_down,
            "left": b.time_page_up,
            ",": b.time_page_up,
            "x": b.time_zoom_in,
            "X": b.time_zoom_out,
            "home": b.time_home,
            "end": b.time_end,
        }
        if key in actions:
            actions[key]()
        elif key in "fF" and "filtered" in b.data:
            f = b.data["filtered"]
            hp = f.highpass_cutoff * (1.25 if key == "f" else 0.8)
            b.update_filter(highpass_cutoff=max(hp, 10.0))
        elif key in "lL" and "filtered" in b.data:
            f = b.data["filtered"]
            lp = (f.lowpass_cutoff or b.data.rate / 2)
            lp *= 0.8 if key == "l" else 1.25
            b.update_filter(lowpass_cutoff=min(lp, b.data.rate / 2))
        elif key in "eE" and "envelope" in b.data:
            cut = b.data["envelope"].envelope_cutoff
            b.update_envelope(cut * (2.0 if key == "E" else 0.5))
        elif key in "rR" and "spectrogram" in b.data:
            nfft = b.data["spectrogram"].nfft
            b.set_resolution(nfft=nfft * 2 if key == "r" else nfft // 2)
            self._zlevels = {}
        elif key == "p":
            play, rate = b.play_visible()
            self._play(play, rate)
        elif key == "s":
            path = Path(str(b.data.file_path)).with_suffix(".view.png")
            save_view_screenshot(self.fig, b, path)
            print(f"saved screenshot to {path}")
        elif key == "q":
            self.plt.close(self.fig)
            return
        else:
            return
        self.redraw()

    def _play(self, data, rate):
        try:
            import sounddevice

            sounddevice.play(np.asarray(data), int(rate), blocking=False)
        except ImportError:
            print("sounddevice not installed; cannot play audio")

    def savefig(self, path, **kwargs):
        save_view_screenshot(self.fig, self.browser, path, **kwargs)
        return path


def show(shell, block=True):
    """Open one window per loaded recording and run the event loop."""
    import matplotlib.pyplot as plt

    windows = [MplBrowserWindow(b) for b in shell.browsers]
    if block:
        plt.show()
    return windows
