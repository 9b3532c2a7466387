"""Qt/pyqtgraph frontend (optional dependency).

The full-fidelity GUI in the reference's own toolkit: a tabbed main window
over the headless shell with per-channel pyqtgraph panels consuming the
device render tiles.  Requires the ``audian-tpu[gui]`` extra (PyQt5 +
pyqtgraph); environments without Qt fall back to the matplotlib frontend
(:mod:`audian_tpu.gui.mpl`).

NOTE: this frontend is not exercised by the CI environment (no Qt there);
the view-model it drives — panels, ranges, tiles, axes, markers — is fully
covered by the headless tests.
"""

from __future__ import annotations

import sys
from pathlib import Path

try:
    import pyqtgraph as pg
    from PyQt5.QtCore import Qt
    from PyQt5.QtWidgets import (QApplication, QMainWindow, QTabWidget,
                                 QWidget, QVBoxLayout)
    HAVE_QT = True
except ImportError:  # pragma: no cover - exercised only with Qt installed
    HAVE_QT = False

__all__ = ["run_qt", "HAVE_QT"]


if HAVE_QT:  # pragma: no cover - exercised only with Qt installed

    pg.setConfigOption("background", "black")
    pg.setConfigOption("foreground", "white")

    class BrowserTab(QWidget):
        """Per-recording tab: stacked per-channel trace + spectrogram
        plots fed by device tiles, overview region at the bottom."""

        def __init__(self, browser, parent=None):
            super().__init__(parent)
            self.browser = browser
            layout = QVBoxLayout(self)
            self.glw = pg.GraphicsLayoutWidget()
            layout.addWidget(self.glw)
            self.trace_plots = {}
            self.spec_images = {}
            row = 0
            for c in browser.show_channels:
                pt = self.glw.addPlot(row=row, col=0)
                pt.setLabel("left", f"ch {c}")
                self.trace_plots[c] = pt.plot(pen=pg.mkPen("#00ee00", width=1))
                self._trace_axes = pt
                row += 1
                if "spectrogram" in browser.data:
                    ps = self.glw.addPlot(row=row, col=0)
                    ps.setLabel("left", "f/Hz")
                    img = pg.ImageItem()
                    ps.addItem(img)
                    self.spec_images[c] = (ps, img)
                    row += 1
            browser.sigTimesChanged.connect(lambda *a: self.refresh())
            browser.sigFilterChanged.connect(self.refresh)
            browser.sigEnvelopeChanged.connect(self.refresh)
            self.refresh()

        def refresh(self):
            b = self.browser
            name = "filtered" if "filtered" in b.data else "data"
            for c, curve in self.trace_plots.items():
                times, values = b.trace_tile(name, c)
                curve.setData(times, values)
            for c, (ps, img) in self.spec_images.items():
                tile, rect = b.spec_tile(c)
                if tile.size:
                    img.setImage(tile, levels=(0.0, 1.0))
                    img.setRect(pg.QtCore.QRectF(rect[0], rect[1], rect[2],
                                                 rect[3]))

        def keyPressEvent(self, ev):
            b = self.browser
            key = ev.text()
            mapping = {
                ".": b.time_page_down, ",": b.time_page_up,
                "x": b.time_zoom_in, "X": b.time_zoom_out,
            }
            if key in mapping:
                mapping[key]()
                self.refresh()
            else:
                super().keyPressEvent(ev)

    class AudianWindow(QMainWindow):
        def __init__(self, shell):
            super().__init__()
            self.shell = shell
            self.setWindowTitle("audian-tpu")
            self.tabs = QTabWidget()
            self.setCentralWidget(self.tabs)
            for b in shell.browsers:
                self.tabs.addTab(BrowserTab(b),
                                 Path(str(b.file_path)).name)


def run_qt(shell):  # pragma: no cover - exercised only with Qt installed
    """Start the Qt event loop over a loaded shell."""
    if not HAVE_QT:
        raise ImportError("PyQt5/pyqtgraph are not installed "
                          "(pip install audian-tpu[gui])")
    app = QApplication(sys.argv[:1])
    win = AudianWindow(shell)
    win.resize(1200, 800)
    win.show()
    rc = app.exec_()
    shell.close()
    return rc
