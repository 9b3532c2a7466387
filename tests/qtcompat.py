"""Dual-backend harness for the Qt frontend tests.

The Qt adapter tests run against TWO backends:

- ``fake`` — :mod:`fakeqt`, always available, records would-be-painted
  state for exact assertions;
- ``real`` — actual PyQt5 + pyqtgraph under ``QT_QPA_PLATFORM=offscreen``
  when importable (the CI ``qt-real`` job installs ``.[gui]``), so
  kwarg/signal/semantic mismatches between the adapter and the real
  toolkit surface as test failures instead of hiding behind the fake
  (VERDICT r2: "fakeqt is a self-referential oracle").

This module holds the backend parametrization plus accessors that read
the same logical state from either toolkit (fake recorder attributes vs
the real pyqtgraph API).
"""

from __future__ import annotations

import importlib
import os

import numpy as np
import pytest

import fakeqt


def _have_real_qt():
    try:
        import PyQt5.QtWidgets  # noqa: F401
        import pyqtgraph  # noqa: F401
    except Exception:
        return False
    return True


def qt_backends():
    return ("fake", "real") if _have_real_qt() else ("fake",)


def setup_backend(backend):
    """Install the backend and (re)import ``audian_tpu.gui.qt`` against
    it.  Returns ``(qtmod, teardown)``."""
    import audian_tpu.gui.qt as qtmod

    if backend == "fake":
        fakeqt.install()
        qtmod = importlib.reload(qtmod)
        assert qtmod.HAVE_QT
        qtmod._backend = "fake"

        def teardown():
            fakeqt.uninstall()
            importlib.reload(qtmod)

        return qtmod, teardown

    os.environ.setdefault("QT_QPA_PLATFORM", "offscreen")
    qtmod = importlib.reload(qtmod)
    if not qtmod.HAVE_QT:
        pytest.skip("real PyQt5/pyqtgraph not importable")
    qtmod._backend = "real"
    # one QApplication per process
    app = qtmod.QApplication.instance()
    if app is None:
        app = qtmod.QApplication(["audian-tests"])
    qtmod._app = app
    # blocking dialogs/popups would hang a headless run: route them
    # through the fake recorders (the adapter reaches all three through
    # module globals / the local QtWidgets import)
    import PyQt5.QtWidgets as QW

    saved = (qtmod.QFileDialog, qtmod.QMessageBox, QW.QMenu)
    qtmod.QFileDialog = fakeqt.QFileDialog
    qtmod.QMessageBox = fakeqt.QMessageBox
    QW.QMenu = fakeqt.QMenu

    def teardown():
        qtmod.QFileDialog, qtmod.QMessageBox, QW.QMenu = saved

    return qtmod, teardown


def is_fake(qtmod):
    return getattr(qtmod, "_backend", "fake") == "fake"


def process_events(qtmod, ms=0):
    """Let the real event loop breathe (no-op on the fake)."""
    if is_fake(qtmod):
        return
    from PyQt5.QtTest import QTest

    if ms:
        QTest.qWait(ms)
    else:
        qtmod._app.processEvents()


def show_window(qtmod, win):
    """Give the window real geometry so viewbox transforms exist."""
    win.resize(1200, 800)
    if not is_fake(qtmod):
        win.show()
        process_events(qtmod, 50)


def flush_single_shots(qtmod):
    """Run queued QTimer.singleShot callbacks: one generation on the
    fake (returns the count), ~150 ms of real event loop otherwise
    (returns None — use :func:`drain_pump` when the count matters)."""
    if is_fake(qtmod):
        return fakeqt.QTimer.flush_single_shots()
    process_events(qtmod, 150)
    return None


def drain_pump(qtmod, win, max_rounds=20):
    """Flush single-shots until the progressive load pump is idle."""
    for _ in range(max_rounds):
        if not win.shell.pending and not win._load_pump_active:
            break
        flush_single_shots(qtmod)


# -- state accessors (fake recorder attrs | real pyqtgraph API) -------------------


def curve_xy(item):
    """x/y arrays of a curve or scatter item."""
    if hasattr(item, "xdata"):
        return np.asarray(item.xdata), np.asarray(item.ydata)
    x, y = item.getData()
    return (np.asarray(x) if x is not None else np.zeros(0),
            np.asarray(y) if y is not None else np.zeros(0))


def xrange_of(pt):
    if getattr(pt, "xrange", None) is not None and not callable(
            getattr(pt, "xrange", None)):
        return tuple(pt.xrange)
    return tuple(pt.getViewBox().viewRange()[0])


def image_of(img):
    return img.image


def image_rect(img):
    if hasattr(img, "rect") and not callable(getattr(img, "rect")):
        return img.rect
    r = img.mapRectToParent(img.boundingRect())
    return (r.x(), r.y(), r.width(), r.height())


def image_levels(img):
    lv = img.levels
    if callable(lv):  # defensive: some versions expose getLevels only
        lv = img.getLevels()
    if lv is None:
        return None
    return tuple(np.asarray(lv).reshape(-1)[:2])


def cbar_levels(cbar):
    lv = getattr(cbar, "levels", None)
    if lv is None:
        lv = cbar.values  # older pyqtgraph keeps the tuple in .values
    return tuple(lv() if callable(lv) else lv)


def cbar_images(cbar):
    if hasattr(cbar, "image_item"):
        return [cbar.image_item]
    return [ref() for ref in getattr(cbar, "img_list", [])]


def cbar_axis_label(cbar, side="right"):
    ax = cbar.getAxis(side)
    lbl = getattr(ax, "label", None)
    if isinstance(lbl, str):
        return lbl
    return getattr(ax, "labelText", "")


def axis_values_shown(ax):
    if hasattr(ax, "values_shown"):
        return ax.values_shown
    return bool(ax.style.get("showValues", True))


def axis_label_shown(ax):
    if hasattr(ax, "label_shown"):
        return ax.label_shown
    return bool(ax.label.isVisible())


def vb_border(vb):
    pen = vb.border
    if pen is None:
        return None
    if hasattr(pen, "style"):  # real QPen: mkPen(None) -> NoPen
        from PyQt5.QtCore import Qt

        return None if pen.style() == Qt.NoPen else pen
    return pen


def row_stretch(layout, row):
    if hasattr(layout, "row_stretch"):
        return layout.row_stretch.get(row)
    return layout.rowStretchFactor(row)


def row_fixed_height(layout, row):
    """Fixed height of a grid row, or None when not pinned."""
    if hasattr(layout, "row_fixed"):
        return layout.row_fixed.get(row)
    lo, hi = layout.rowMinimumHeight(row), layout.rowMaximumHeight(row)
    return lo if lo == hi else None


def plot_items(pt):
    return pt.items  # real PlotItem and the fake both keep .items


def menus_of(win):
    mb = win.menuBar()
    if hasattr(mb, "menus"):
        return list(mb.menus)
    return [a.menu() for a in mb.actions() if a.menu() is not None]


def actions_of(menu):
    acts = menu.actions
    return list(acts) if isinstance(acts, list) else [
        a for a in menu.actions() if not a.isSeparator()]


def all_actions(win):
    return [a for m in menus_of(win) for a in actions_of(m)]


def scatter_symbol(sp):
    return sp.opts["symbol"] if hasattr(sp, "opts") else sp.symbol


def scatter_size(sp):
    return sp.opts["size"] if hasattr(sp, "opts") else sp.size


def act_keys(act):
    return [s.toString() if hasattr(s, "toString") else s
            for s in act.shortcuts()]


def trigger(win, shortcut):
    """Trigger the (enabled) menu action bound to a keyboard shortcut."""
    for act in all_actions(win):
        if shortcut in act_keys(act):
            act.trigger()
            return act
    raise AssertionError(f"no action with shortcut {shortcut!r}")


def timer_active(timer):
    return timer.isActive()


def fire_timer(timer):
    """Simulate one timer tick on either backend."""
    if hasattr(timer, "fire"):
        timer.fire()
    elif timer.isActive():
        timer.timeout.emit()


def stop_timer(timer):
    timer.stop()


# -- synthetic input events -------------------------------------------------------


def _view_point(qtmod, vb, x, y):
    """A point in the ViewBox's ITEM coordinates that maps to view
    coordinates (x, y) — the fake's mapToView is the identity."""
    if is_fake(qtmod):
        return fakeqt.FakePoint(x, y)
    from PyQt5.QtCore import QPointF

    return vb.mapFromView(QPointF(x, y))


def drag_event(qtmod, vb, x0, y0, x1, y1, finish=True):
    return fakeqt.FakeMouseEvent(
        1 if is_fake(qtmod) else _real_left(qtmod),
        _view_point(qtmod, vb, x1, y1),
        _view_point(qtmod, vb, x0, y0), finish=finish)


def click_event(qtmod, vb, x, y):
    return fakeqt.FakeMouseEvent(
        1 if is_fake(qtmod) else _real_left(qtmod),
        _view_point(qtmod, vb, x, y))


def hover_event(qtmod, vb, x=None, y=None, exit=False):
    if exit:
        return fakeqt.FakeHoverEvent(exit=True)
    return fakeqt.FakeHoverEvent(_view_point(qtmod, vb, x, y))


def _real_left(qtmod):
    from PyQt5.QtCore import Qt

    return Qt.LeftButton


def pan_to(qtmod, vb, x0, x1, y0, y1):
    """Simulate a user pan/wheel: set the range, then emit the manual
    range-change signal the way real pyqtgraph would."""
    if hasattr(vb, "pan_to"):
        vb.pan_to(x0, x1, y0, y1)
        return
    vb.setRange(xRange=(x0, x1), yRange=(y0, y1), padding=0)
    vb.sigRangeChangedManually.emit(list(vb.state["mouseEnabled"]))


def drag_region(region, values):
    """Move a LinearRegionItem as a user drag + release would."""
    if hasattr(region, "drag_to"):
        region.drag_to(values)
        return
    region.setRegion(values)
    region.sigRegionChangeFinished.emit(region)


def drag_line(line, pos):
    """Move an InfiniteLine handle as a user drag + release would."""
    if hasattr(line, "drag_to"):
        line.drag_to(pos)
        return
    line.setPos(pos)
    line.sigDragged.emit(line)
    line.sigPositionChangeFinished.emit(line)


def line_value(line):
    v = line.value()
    return v if np.isscalar(v) else float(v)


# -- dialog stubs ----------------------------------------------------------------


def set_save_name(qtmod, path, filter=""):
    """Preselect the next getSaveFileName answer (both backends route
    through the fake QFileDialog — the real one would block)."""
    fakeqt.QFileDialog.save_name = (str(path), filter)


def set_open_names(qtmod, paths, filter=""):
    fakeqt.QFileDialog.open_names = ([str(p) for p in paths], filter)


def message_log(qtmod):
    """Recorded QMessageBox warnings/criticals (both backends)."""
    return fakeqt.QMessageBox.warnings


def set_menu_pick(qtmod, text):
    """Preselect the popup-menu answer for ask-region mode."""
    fakeqt.QMenu.pick = text
