"""Qt/pyqtgraph frontend (optional dependency).

The full-fidelity GUI in the reference's own toolkit
(`src/audian/audian.py`, `src/audian/databrowser.py`): a tabbed main
window over the headless shell, per-channel pyqtgraph trace + spectrogram
panels consuming device render tiles, a whole-recording overview with a
draggable view region (`src/audian/fulltraceplot.py`), rectangle region
selection with the zoom/play/analyze/save modes
(`src/audian/selectviewbox.py`, `databrowser.py:1614-1642`), crosshair
with marker storage, and the keyboard/menu action surface dispatching
through the *headless* controllers — every verb this file wires is
covered by the headless tests; this module only adapts it to Qt.

Requires the ``audian-tpu[gui]`` extra (PyQt5 + pyqtgraph); environments
without Qt fall back to the matplotlib frontend
(:mod:`audian_tpu.gui.mpl`).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

try:  # pragma: no cover - exercised only with Qt installed
    import pyqtgraph as pg
    from PyQt5.QtCore import Qt, QTimer, QRectF
    from PyQt5.QtWidgets import (QApplication, QMainWindow, QTabWidget,
                                 QWidget, QVBoxLayout, QAction, QDialog,
                                 QLabel, QScrollArea, QDialogButtonBox,
                                 QTableWidget, QTableWidgetItem,
                                 QFileDialog, QMessageBox, QHBoxLayout,
                                 QPushButton)
    HAVE_QT = True
except ImportError:
    HAVE_QT = False

__all__ = ["run_qt", "HAVE_QT"]


if HAVE_QT:  # pragma: no cover - exercised only with Qt installed

    pg.setConfigOption("background", "black")
    pg.setConfigOption("foreground", "white")

    class SelectViewBox(pg.ViewBox):
        """Rect-drag region selection (`src/audian/selectviewbox.py`):
        left-drag draws a rectangle and hands it to the browser's region
        mode; plain click places the crosshair."""

        def __init__(self, tab, channel, kind):
            super().__init__()
            self.tab = tab
            self.channel = channel
            self.kind = kind
            self.setMouseMode(pg.ViewBox.RectMode)

        def mouseDragEvent(self, ev, axis=None):
            if ev.button() != Qt.LeftButton:
                return super().mouseDragEvent(ev, axis)
            ev.accept()
            if ev.isFinish():
                p0 = self.mapToView(ev.buttonDownPos())
                p1 = self.mapToView(ev.pos())
                self.rbScaleBox.hide()
                self.tab.region_selected(
                    self.channel, self.kind,
                    min(p0.x(), p1.x()), max(p0.x(), p1.x()),
                    min(p0.y(), p1.y()), max(p0.y(), p1.y()))
            else:
                self.updateScaleBox(ev.buttonDownPos(), ev.pos())

        def mouseClickEvent(self, ev):
            if ev.button() == Qt.LeftButton:
                ev.accept()
                p = self.mapToView(ev.pos())
                self.tab.crosshair_at(self.channel, self.kind,
                                      p.x(), p.y())
            else:
                super().mouseClickEvent(ev)

    class BrowserTab(QWidget):
        """Per-recording tab: per-channel trace + spectrogram rows over
        the device tiles, whole-recording overview with a draggable
        region, crosshair lines, marker dots."""

        def __init__(self, browser, parent=None):
            super().__init__(parent)
            self.browser = browser
            layout = QVBoxLayout(self)
            self.glw = pg.GraphicsLayoutWidget()
            layout.addWidget(self.glw)
            self.trace_plots = {}
            self.env_curves = {}
            self.spec_images = {}
            self.marker_dots = {}
            self.xlines = {}
            row = 0
            b = browser
            for c in b.show_channels:
                vb = SelectViewBox(self, c, "trace")
                pt = self.glw.addPlot(row=row, col=0, viewBox=vb)
                pt.setLabel("left", f"ch {c}")
                curve = pt.plot(pen=pg.mkPen("#00ee00", width=1))
                env = pt.plot(pen=pg.mkPen("#ee8800", width=2))
                dots = pg.ScatterPlotItem(size=8, brush=pg.mkBrush("y"))
                pt.addItem(dots)
                xline = pg.InfiniteLine(angle=90, movable=False,
                                        pen=pg.mkPen("#cccc00"))
                xline.setVisible(False)
                pt.addItem(xline)
                self.trace_plots[c] = (pt, curve)
                self.env_curves[c] = env
                self.marker_dots[c] = dots
                self.xlines[c] = xline
                row += 1
                if b.spectrogram in b.data:
                    vbs = SelectViewBox(self, c, "spec")
                    ps = self.glw.addPlot(row=row, col=0, viewBox=vbs)
                    ps.setLabel("left", "f/Hz")
                    img = pg.ImageItem()
                    ps.addItem(img)
                    self.spec_images[c] = (ps, img)
                    row += 1
            # whole-recording overview (`fulltraceplot.py:62-292`)
            self.overview = self.glw.addPlot(row=row, col=0)
            self.overview.setMaximumHeight(90)
            self.overview.setLabel("bottom", "time", units="s")
            self.ov_curve = self.overview.plot(
                pen=pg.mkPen("#888888", width=1))
            self.region = pg.LinearRegionItem(
                values=(b.toffset, b.toffset + b.twindow), movable=True)
            self.overview.addItem(self.region)
            self.region.sigRegionChangeFinished.connect(self._region_moved)
            self._setting_region = False
            # 500 ms poll of the background decimator
            # (`fulltraceplot.py:157,190`)
            self.poll = QTimer(self)
            self.poll.timeout.connect(self._poll_fulltrace)
            self.poll.start(500)
            # audio position marker ticks (`databrowser.py:1745-1756`)
            self.audio_timer = QTimer(self)
            self.audio_timer.timeout.connect(self._tick_audio)
            self.audio_marks = {
                c: pg.InfiniteLine(angle=90, pen=pg.mkPen("m"))
                for c in b.show_channels}
            for c, (pt, _) in self.trace_plots.items():
                self.audio_marks[c].setVisible(False)
                pt.addItem(self.audio_marks[c])
            b.sigTimesChanged.connect(lambda *a: self.refresh())
            b.sigFilterChanged.connect(self.refresh)
            b.sigEnvelopeChanged.connect(self.refresh)
            b.sigResolutionChanged.connect(self.refresh)
            b.sigColorMapChanged.connect(self.refresh)
            b.sigChannelsChanged.connect(lambda *a: self.refresh())
            b.sigPanelsChanged.connect(self.refresh)
            self.refresh()

        # -- drawing ---------------------------------------------------------

        def refresh(self):
            b = self.browser
            name = "filtered" if "filtered" in b.data else "data"
            t0, t1 = b.toffset, b.toffset + b.twindow
            for c, (pt, curve) in self.trace_plots.items():
                pt.setVisible(c in b.show_channels and b.show_traces)
                times, values = b.trace_tile(name, c)
                curve.setData(times, values)
                if "envelope" in b.data and b.data.is_visible("envelope"):
                    et, ev = b.trace_tile("envelope", c)
                    self.env_curves[c].setData(et, ev)
                else:
                    self.env_curves[c].setData([], [])
                sel = [(tm, 0.0) for tm, ch in zip(b.marker_data.times,
                                                   b.marker_data.channels)
                       if t0 <= tm <= t1 and (ch == c or ch < 0)]
                self.marker_dots[c].setData([s[0] for s in sel],
                                            [s[1] for s in sel])
                pt.setXRange(t0, t1, padding=0)
                lo, hi = b.get_range("x", c)
                if lo is not None:
                    pt.setYRange(lo, hi, padding=0)
            cmap = None
            try:
                cmap = pg.colormap.get(b.color_map_name)
            except Exception:
                pass
            for c, (ps, img) in self.spec_images.items():
                ps.setVisible(c in b.show_channels and b.show_specs > 0)
                if not ps.isVisible():
                    continue
                tile, rect = b.spec_tile(c)
                if tile.size:
                    img.setImage(tile, levels=(0.0, 1.0))
                    img.setRect(QRectF(rect[0], rect[1], rect[2], rect[3]))
                    if cmap is not None:
                        img.setColorMap(cmap)
                ps.setXRange(t0, t1, padding=0)
            self._poll_fulltrace()
            self._setting_region = True
            self.region.setRegion((t0, t1))
            self._setting_region = False

        def _poll_fulltrace(self):
            b = self.browser
            ft = b.fulltrace
            if ft is None or ft.datas is None:
                return
            c = b.show_channels[0]
            n = min(len(ft.times), len(ft.datas))
            self.ov_curve.setData(ft.times[:n], ft.datas[:n, c])

        def _region_moved(self):
            if self._setting_region:
                return
            t0, t1 = self.region.getRegion()
            self.browser.set_times(t0, t1 - t0)

        # -- interaction --------------------------------------------------------

        def region_selected(self, channel, kind, x0, x1, y0, y1):
            b = self.browser
            verb, result = b.handle_region(channel, x0, x1)
            if verb == "play":
                self._play(*result)
            elif verb == "zoom" and kind == "spec":
                b.set_ranges("f", y0, y1)
            elif verb == "ask":
                # the reference pops a context menu (`databrowser.py:1626`)
                verb2, result2 = b.handle_region(channel, x0, x1,
                                                 b.zoom_region)
            self.refresh()

        def crosshair_at(self, channel, kind, x, y):
            b = self.browser
            if kind == "trace":
                b.set_crosshair(channel, t=x, amplitude=y)
            else:
                b.set_crosshair(channel, t=x, frequency=y)
            for c, xline in self.xlines.items():
                xline.setPos(x)
                xline.setVisible(True)

        def _play(self, data, rate):
            try:
                import sounddevice

                sounddevice.play(np.asarray(data), int(rate),
                                 blocking=False)
                self.audio_timer.start(50)
            except Exception as e:  # no module/device, PortAudio errors
                print(f"cannot play audio: {e}")

        def _tick_audio(self):
            t = self.browser.mark_audio()
            for mark in self.audio_marks.values():
                if t is None:
                    mark.setVisible(False)
                else:
                    mark.setPos(t)
                    mark.setVisible(True)
            if t is None:
                self.audio_timer.stop()

    class AudianWindow(QMainWindow):
        """Tabbed multi-recording shell with the reference's menu/action
        surface (`src/audian/audian.py:263-1271`), dispatching through
        the headless :class:`~audian_tpu.app.shell.Audian`."""

        def __init__(self, shell):
            super().__init__()
            self.shell = shell
            self.setWindowTitle("audian-tpu")
            self.tabs = QTabWidget()
            self.setCentralWidget(self.tabs)
            self.tabs.currentChanged.connect(
                lambda i: shell.set_current(i) if 0 <= i < len(shell)
                else None)
            for b in shell.browsers:
                self.tabs.addTab(BrowserTab(b),
                                 Path(str(b.file_path)).name)
            self._build_menus()

        def browser(self):
            return self.shell.current

        def tab(self):
            return self.tabs.currentWidget()

        def _act(self, menu, text, shortcut, fn):
            act = QAction(text, self)
            if shortcut:
                act.setShortcuts([shortcut] if isinstance(shortcut, str)
                                 else shortcut)
            act.triggered.connect(lambda *_: (fn(), self._refresh()))
            menu.addAction(act)
            return act

        def _refresh(self):
            tab = self.tab()
            if tab is not None:
                tab.refresh()

        def _build_menus(self):
            mb = self.menuBar()
            sh = self.shell

            filem = mb.addMenu("&File")
            self._act(filem, "&Screenshot", "Ctrl+Alt+S", self.screenshot)
            self._act(filem, "&Metadata", None, self.show_metadata)
            self._act(filem, "Save &window", "Ctrl+S",
                      lambda: self.browser().save_window())
            self._act(filem, "&Quit", "Ctrl+Q", self.close)

            timem = mb.addMenu("&Time")
            B = self.browser
            self._act(timem, "Page &down", ["Right", "."],
                      lambda: B().time_page_down())
            self._act(timem, "Page &up", ["Left", ","],
                      lambda: B().time_page_up())
            self._act(timem, "Zoom &in", "X", lambda: B().time_zoom_in())
            self._act(timem, "Zoom &out", "Shift+X",
                      lambda: B().time_zoom_out())
            self._act(timem, "&Home", "Home", lambda: B().time_home())
            self._act(timem, "&End", "End", lambda: B().time_end())
            self._act(timem, "&Auto scroll", "!", lambda: B().auto_scroll())
            self._act(timem, "Link time &zoom", "Alt+Z",
                      sh.toggle_link_timezoom)
            self._act(timem, "Link time &scroll", "Alt+T",
                      sh.toggle_link_timescroll)

            ampm = mb.addMenu("&Amplitude")
            self._act(ampm, "Zoom &in", "Shift+Y",
                      lambda: sh.apply_ranges("zoom_in", "xyu"))
            self._act(ampm, "Zoom &out", "Y",
                      lambda: sh.apply_ranges("zoom_out", "xyu"))
            self._act(ampm, "&Auto", "V", lambda: B().auto_ampl())
            self._act(ampm, "&Reset", "Shift+V",
                      lambda: sh.apply_ranges("reset", "xyu"))
            self._act(ampm, "&Center", "C",
                      lambda: sh.apply_ranges("center", "xyu"))

            filtm = mb.addMenu("Fi&lter")
            self._act(filtm, "&Highpass up", "Shift+H",
                      lambda: self._filter(1.25, None))
            self._act(filtm, "Highpass &down", "H",
                      lambda: self._filter(0.8, None))
            self._act(filtm, "&Lowpass up", "Shift+L",
                      lambda: self._filter(None, 1.25))
            self._act(filtm, "Lowpass d&own", "L",
                      lambda: self._filter(None, 0.8))
            self._act(filtm, "Link &filter", "Alt+F",
                      sh.toggle_link_filter)
            self._act(filtm, "&Envelope up", "Shift+E",
                      lambda: self._envelope(2.0))
            self._act(filtm, "Envelope &down", "E",
                      lambda: self._envelope(0.5))

            specm = mb.addMenu("&Spectrogram")
            self._act(specm, "Increase &resolution", "Shift+R",
                      lambda: B().freq_resolution_up())
            self._act(specm, "Decrease r&esolution", "R",
                      lambda: B().freq_resolution_down())
            self._act(specm, "More &overlap", "Shift+O",
                      lambda: B().overlap_frac_up())
            self._act(specm, "Less o&verlap", "O",
                      lambda: B().overlap_frac_down())
            self._act(specm, "&Color map", "Shift+C",
                      lambda: B().color_map_cycler())
            self._act(specm, "Frequency zoom &in", "Shift+F",
                      lambda: sh.apply_ranges("zoom_in", "fw"))
            self._act(specm, "Frequency zoom o&ut", "F",
                      lambda: sh.apply_ranges("zoom_out", "fw"))
            self._act(specm, "Power &up", "Shift+P",
                      lambda: sh.apply_power_ranges("up"))
            self._act(specm, "Power &down", "P",
                      lambda: sh.apply_power_ranges("down"))

            chm = mb.addMenu("&Channels")
            self._act(chm, "&Next channel", "Down",
                      lambda: sh.select_channels("next_channel"))
            self._act(chm, "&Previous channel", "Up",
                      lambda: sh.select_channels("previous_channel"))
            self._act(chm, "Select next", "Shift+Down",
                      lambda: sh.select_channels("select_next_channel"))
            self._act(chm, "Select previous", "Shift+Up",
                      lambda: sh.select_channels("select_previous_channel"))
            self._act(chm, "Select &all", "Ctrl+A",
                      lambda: sh.select_channels("all_channels"))
            self._act(chm, "&Hide deselected", "Ctrl+H",
                      sh.hide_deselected_channels)
            for c in range(10):
                self._act(chm, f"Channel &{c}", str(c),
                          lambda c=c: sh.show_channel(c))
            self._act(chm, "Link &channels", "Alt+C",
                      sh.toggle_link_channels)

            panm = mb.addMenu("&Panels")
            self._act(panm, "Toggle &traces", "Ctrl+T",
                      lambda: B().toggle_traces())
            self._act(panm, "Toggle &spectrograms", "Ctrl+Shift+S",
                      lambda: B().toggle_spectrograms())
            self._act(panm, "Toggle &powers", "Ctrl+P",
                      lambda: B().toggle_powers())
            self._act(panm, "Toggle &colorbars", "Ctrl+B",
                      lambda: B().toggle_colorbars())
            self._act(panm, "Toggle &fulldata", "Ctrl+D",
                      lambda: B().toggle_fulldata())
            self._act(panm, "Toggle &grid", "G",
                      lambda: B().toggle_grids())
            self._act(panm, "Link &panels", "Alt+P", sh.toggle_link_panels)

            regm = mb.addMenu("&Region")
            for label, key, mode in (
                    ("&Zoom", "Z", 0), ("&Play", "Shift+A", 1),
                    ("&Analyze", "A", 2), ("&Save", "S", 3),
                    ("As&k", "K", 4)):
                self._act(regm, label + " mode", key,
                          lambda m=mode: B().set_region_mode(m))
            self._act(regm, "Play &window", "Space", self.play_scroll)
            self._act(regm, "Analysis &results", "Ctrl+R",
                      self.analysis_results)
            self._act(regm, "Save &analysis", None,
                      lambda: B().save_analysis())
            self._act(regm, "&Marker table", "Ctrl+M", self.marker_table)
            self._act(regm, "&Label editor", "Ctrl+L", self.label_editor)

        # -- verbs needing Qt glue --------------------------------------------------

        def _filter(self, hp_fac, lp_fac):
            b = self.browser()
            if "filtered" not in b.data:
                return
            f = b.data["filtered"]
            hp = f.highpass_cutoff * hp_fac if hp_fac else None
            lp = ((f.lowpass_cutoff or b.data.rate / 2) * lp_fac
                  if lp_fac else None)
            b.update_filter(hp, lp)

        def _envelope(self, fac):
            b = self.browser()
            if "envelope" in b.data:
                b.update_envelope(b.data["envelope"].envelope_cutoff * fac)

        def play_scroll(self):
            verb, result = self.browser().play_scroll()
            if verb == "play":
                self.tab()._play(*result)

        def screenshot(self):
            from ..app.screenshot import write_view_metadata

            path, _ = QFileDialog.getSaveFileName(
                self, "Save screenshot", "screenshot.png", "PNG (*.png)")
            if not path:
                return
            pixmap = self.grab()
            pixmap.save(path, "PNG")
            write_view_metadata(path, self.browser())

        def show_metadata(self):
            """Metadata dialog (`databrowser.py:677-724`) rendered from
            the headless rows."""
            rows = self.browser().metadata_rows()
            html = ["<table>"]
            for level, key, value in rows:
                pad = f' style="padding-left: {level * 30}px;"'
                if value is None:
                    html.append(f"<tr><td colspan=2{pad}><b>{key}:</b>"
                                "</td></tr>")
                else:
                    html.append(f"<tr><td{pad}><b>{key}</b></td>"
                                f"<td>{value}</td></tr>")
            html.append("</table>")
            dialog = QDialog(self)
            dialog.setWindowTitle("Meta data")
            vbox = QVBoxLayout(dialog)
            label = QLabel("".join(html))
            label.setTextInteractionFlags(Qt.TextSelectableByMouse)
            area = QScrollArea()
            area.setWidget(label)
            vbox.addWidget(area)
            buttons = QDialogButtonBox(QDialogButtonBox.Close)
            buttons.rejected.connect(dialog.reject)
            vbox.addWidget(buttons)
            dialog.show()

        def analysis_results(self):
            """Analysis table dialog (`databrowser.py:1795-1825`)."""
            table = self.browser().get_analysis_table()
            if not table:
                return
            dialog = QDialog(self)
            dialog.setWindowTitle("Audian analysis table")
            vbox = QVBoxLayout(dialog)
            widget = QTableWidget(len(table), len(table[0]))
            widget.setHorizontalHeaderLabels(list(table[0].keys()))
            for r, row in enumerate(table):
                for c, v in enumerate(row.values()):
                    widget.setItem(r, c, QTableWidgetItem(str(v)))
            vbox.addWidget(widget)
            buttons = QDialogButtonBox(QDialogButtonBox.Close |
                                       QDialogButtonBox.Save |
                                       QDialogButtonBox.Reset)
            buttons.rejected.connect(dialog.reject)
            buttons.button(QDialogButtonBox.Reset).clicked.connect(
                lambda: self.browser().clear_analysis())
            buttons.button(QDialogButtonBox.Save).clicked.connect(
                lambda: self.browser().save_analysis())
            vbox.addWidget(buttons)
            dialog.show()

        def marker_table(self):
            """Marker table dialog (`databrowser.py:944-966`) over the
            headless marker store."""
            md = self.browser().marker_data

            dialog = QDialog(self)
            dialog.setWindowTitle("Audian marker table")
            vbox = QVBoxLayout(dialog)
            widget = QTableWidget(0, len(md.headers))
            widget.setHorizontalHeaderLabels(md.headers)
            vbox.addWidget(widget)

            def fill():
                df = md.data_frame()
                widget.setRowCount(len(df))
                for r in range(len(df)):
                    for c, col in enumerate(df.columns):
                        v = df.iloc[r, c]
                        text = "" if v is None or (
                            isinstance(v, float) and np.isnan(v)) else str(v)
                        widget.setItem(r, c, QTableWidgetItem(text))
                widget.resizeColumnsToContents()

            def save():
                path, _ = QFileDialog.getSaveFileName(
                    self, "Save markers", "markers.csv",
                    "CSV (*.csv);;Excel (*.xlsx)")
                if path:
                    md.save(path)

            fill()
            buttons = QDialogButtonBox(QDialogButtonBox.Close |
                                       QDialogButtonBox.Save |
                                       QDialogButtonBox.Reset)
            buttons.rejected.connect(dialog.reject)
            buttons.button(QDialogButtonBox.Reset).clicked.connect(
                lambda: (md.clear(), fill(), self._refresh()))
            buttons.button(QDialogButtonBox.Save).clicked.connect(save)
            vbox.addWidget(buttons)
            dialog.show()

        def label_editor(self):
            """Marker-label editor (`markerdata.py:269-326`): edit
            name/key/color rows with key-conflict validation."""
            from ..app.markers import MarkerLabel, key_conflicts

            b = self.browser()
            dialog = QDialog(self)
            dialog.setWindowTitle("Audian marker labels")
            vbox = QVBoxLayout(dialog)
            widget = QTableWidget(len(b.marker_labels), 3)
            widget.setHorizontalHeaderLabels(["label", "key", "color"])
            for r, lbl in enumerate(b.marker_labels):
                widget.setItem(r, 0, QTableWidgetItem(lbl.label))
                widget.setItem(r, 1, QTableWidgetItem(lbl.key_shortcut))
                widget.setItem(r, 2, QTableWidgetItem(lbl.color))
            vbox.addWidget(widget)

            def row_text(r, c):
                item = widget.item(r, c)
                return item.text().strip() if item is not None else ""

            def add_row():
                widget.insertRow(widget.rowCount())

            def remove_rows():
                for r in sorted({i.row() for i in widget.selectedIndexes()},
                                reverse=True):
                    widget.removeRow(r)

            def accept():
                labels = []
                for r in range(widget.rowCount()):
                    name = row_text(r, 0)
                    if name:
                        labels.append(MarkerLabel(name, row_text(r, 1),
                                                  row_text(r, 2) or "yellow"))
                conflicts = {k: v for k, v in key_conflicts(labels).items()
                             if k}  # empty shortcuts are fine
                if conflicts:
                    QMessageBox.warning(
                        dialog, "Key conflicts",
                        "\n".join(f"key {k!r} used by {', '.join(v)}"
                                  for k, v in conflicts.items()))
                    return
                b.marker_labels[:] = labels
                dialog.accept()

            hbox = QHBoxLayout()
            for text, fn in (("&Add", add_row), ("&Remove", remove_rows)):
                btn = QPushButton(text)
                btn.clicked.connect(lambda *_, f=fn: f())
                hbox.addWidget(btn)
            vbox.addLayout(hbox)
            buttons = QDialogButtonBox(QDialogButtonBox.Ok |
                                       QDialogButtonBox.Cancel)
            buttons.accepted.connect(accept)
            buttons.rejected.connect(dialog.reject)
            vbox.addWidget(buttons)
            dialog.show()


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
