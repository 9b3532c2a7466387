"""A fake PyQt5 + pyqtgraph implementing exactly the API surface
``audian_tpu.gui.qt`` uses, so the Qt adapter runs headless in CI without
Qt installed (the analog of driving the real GUI offscreen with
pytest-qt).

State every widget would paint is instead recorded on the fakes
(`FakeCurve.xdata`, `FakeImageItem.image`, `FakePlotItem.xrange`, …) for
the tests to assert on.  ``install()`` threads the fake modules into
``sys.modules``; ``uninstall()`` removes them again.
"""

from __future__ import annotations

import struct
import sys
import types
import zlib
from pathlib import Path


# -- signals ---------------------------------------------------------------------


class FakeSignal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def disconnect(self, fn):
        self._slots.remove(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            fn(*args)


# -- geometry --------------------------------------------------------------------


class FakePoint:
    def __init__(self, x, y):
        self._x, self._y = x, y

    def x(self):
        return self._x

    def y(self):
        return self._y


class QRectF:
    def __init__(self, x=0.0, y=0.0, w=0.0, h=0.0):
        self.x, self.y, self.w, self.h = x, y, w, h


# -- QtCore ----------------------------------------------------------------------


class _Qt:
    LeftButton = 1
    RightButton = 2
    TextSelectableByMouse = 4
    WA_DeleteOnClose = 55  # real Qt attribute id
    NoPen = 0              # Qt.PenStyle.NoPen


class QTimer:
    """Manual-fire timer: tests call ``fire()`` to simulate a tick."""

    #: queued ``singleShot`` callbacks; tests drain with :func:`flush_single_shots`
    single_shots = []

    def __init__(self, parent=None):
        self.timeout = FakeSignal()
        self.interval = None
        self.active = False

    @classmethod
    def singleShot(cls, ms, fn):
        cls.single_shots.append((ms, fn))

    @classmethod
    def flush_single_shots(cls):
        """Run one generation of queued single-shot callbacks (callbacks
        may queue follow-ups; call again to run those)."""
        shots, cls.single_shots = cls.single_shots, []
        for _ms, fn in shots:
            fn()
        return len(shots)

    def start(self, ms):
        self.interval = ms
        self.active = True

    def stop(self):
        self.active = False

    def isActive(self):
        return self.active

    def fire(self):
        if self.active:
            self.timeout.emit()


# -- widgets ---------------------------------------------------------------------


class QWidget:
    def __init__(self, parent=None):
        self.parent = parent
        self._visible = True
        self._layout = None

    def setVisible(self, visible):
        self._visible = bool(visible)

    def isVisible(self):
        return self._visible

    def show(self):
        self._visible = True

    def close(self):
        self._visible = False
        return True

    def deleteLater(self):
        self._visible = False

    def setAttribute(self, attr, on=True):
        pass

    def resize(self, w, h):
        self.size = (w, h)

    def isMaximized(self):
        return getattr(self, "_maximized", False)

    def showMaximized(self):
        self._maximized = True
        self._visible = True

    def showNormal(self):
        self._maximized = False
        self._visible = True


class _Layout:
    def __init__(self, parent=None):
        self.items = []
        if parent is not None and hasattr(parent, "_layout"):
            parent._layout = self

    def addWidget(self, w):
        self.items.append(w)

    def addLayout(self, l):
        self.items.append(l)


class QVBoxLayout(_Layout):
    pass


class QHBoxLayout(_Layout):
    pass


class QAction:
    def __init__(self, text, parent=None):
        self._text = text
        self.parent = parent
        self._shortcuts = []
        self._enabled = True
        self._checkable = False
        self._checked = False
        self.triggered = FakeSignal()

    def setCheckable(self, on):
        self._checkable = bool(on)

    def isCheckable(self):
        return self._checkable

    def setChecked(self, on):
        self._checked = bool(on)

    def isChecked(self):
        return self._checked

    def text(self):
        return self._text

    def setText(self, text):
        self._text = text

    def setShortcuts(self, shortcuts):
        self._shortcuts = list(shortcuts)

    def setShortcut(self, shortcut):
        self._shortcuts = [shortcut]

    def shortcuts(self):
        return list(self._shortcuts)

    def setEnabled(self, on):
        self._enabled = bool(on)

    def isEnabled(self):
        return self._enabled

    def trigger(self):
        if self._enabled:
            if self._checkable:  # real Qt flips before emitting
                self._checked = not self._checked
            self.triggered.emit(self._checked)


class _Menu:
    def __init__(self, title):
        self.title = title
        self.actions = []

    def addAction(self, act):
        self.actions.append(act)


class _MenuBar:
    def __init__(self):
        self.menus = []

    def addMenu(self, title):
        menu = _Menu(title)
        self.menus.append(menu)
        return menu


class _StatusBar:
    def __init__(self):
        self.message = ""

    def showMessage(self, text, timeout=0):
        self.message = text

    def currentMessage(self):
        return self.message


#: 1×1 black RGBA PNG assembled chunk by chunk (what QPixmap.save writes)
def _tiny_png():
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body +
                struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    idat = zlib.compress(b"\x00\x00\x00\x00\xff")
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", idat) + chunk(b"IEND", b""))


class FakePixmap:
    def save(self, path, fmt="PNG"):
        Path(path).write_bytes(_tiny_png())
        return True


class QMainWindow(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._menubar = _MenuBar()
        self._statusbar = _StatusBar()
        self.central = None
        self.accept_drops = False

    def setWindowTitle(self, title):
        self.title = title

    def setAcceptDrops(self, on):
        self.accept_drops = bool(on)

    def setCentralWidget(self, w):
        self.central = w

    def menuBar(self):
        return self._menubar

    def statusBar(self):
        return self._statusbar

    def grab(self):
        return FakePixmap()


class QTabWidget(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._tabs = []
        self._names = []
        self._current = -1
        self.currentChanged = FakeSignal()

    def addTab(self, widget, name):
        self._tabs.append(widget)
        self._names.append(name)
        if self._current < 0:
            self._current = 0
        return len(self._tabs) - 1

    def count(self):
        return len(self._tabs)

    def widget(self, i):
        return self._tabs[i]

    def tabText(self, i):
        return self._names[i]

    def currentWidget(self):
        return self._tabs[self._current] if 0 <= self._current < len(
            self._tabs) else None

    def currentIndex(self):
        return self._current

    def setCurrentIndex(self, i):
        self._current = i
        self.currentChanged.emit(i)

    def removeTab(self, i):
        del self._tabs[i]
        del self._names[i]
        self._current = min(self._current, len(self._tabs) - 1)


class QDialog(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.accepted_ = False
        self.rejected_ = False

    def setWindowTitle(self, title):
        self.title = title

    def accept(self):
        self.accepted_ = True

    def reject(self):
        self.rejected_ = True


class QLabel(QWidget):
    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = text

    def text(self):
        return self._text

    def setTextInteractionFlags(self, flags):
        pass


class QScrollArea(QWidget):
    def setWidget(self, w):
        self.inner = w


class _Button:
    def __init__(self):
        self.clicked = FakeSignal()


class QDialogButtonBox(QWidget):
    Close = 1
    Save = 2
    Reset = 4
    Ok = 8
    Cancel = 16

    def __init__(self, flags=0, parent=None):
        super().__init__(parent)
        self.flags = flags
        self.accepted = FakeSignal()
        self.rejected = FakeSignal()
        self._buttons = {}

    def button(self, flag):
        return self._buttons.setdefault(flag, _Button())


class QTableWidgetItem:
    def __init__(self, text=""):
        self._text = text

    def text(self):
        return self._text


class QTableWidget(QWidget):
    def __init__(self, rows=0, cols=0, parent=None):
        super().__init__(parent)
        self._cols = cols
        self._rows = {}
        self._nrows = rows
        self.headers = []

    def setHorizontalHeaderLabels(self, labels):
        self.headers = list(labels)

    def setItem(self, r, c, item):
        self._rows[(r, c)] = item
        self._nrows = max(self._nrows, r + 1)

    def item(self, r, c):
        return self._rows.get((r, c))

    def rowCount(self):
        return self._nrows

    def setRowCount(self, n):
        self._nrows = n

    def insertRow(self, r):
        self._nrows += 1

    def removeRow(self, r):
        self._nrows = max(self._nrows - 1, 0)

    def selectedIndexes(self):
        return []

    def resizeColumnsToContents(self):
        pass


class QPushButton(QWidget):
    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self.text = text
        self.clicked = FakeSignal()


class QFileDialog:
    #: (path, filter) the next getSaveFileName call returns — set by tests
    save_name = ("", "")
    #: (paths, filter) the next getOpenFileNames call returns
    open_names = ([], "")

    @staticmethod
    def getSaveFileName(parent=None, caption="", directory="", filter=""):
        return QFileDialog.save_name

    @staticmethod
    def getOpenFileNames(parent=None, caption="", directory="", filter=""):
        return QFileDialog.open_names


class QMenu(QWidget):
    """Popup menu; tests preselect the returned action by text via
    ``QMenu.pick``."""

    #: text of the action exec_ returns (None = dismissed)
    pick = None

    def __init__(self, parent=None):
        super().__init__(parent)
        self.actions = []

    def addAction(self, text):
        act = QAction(text, self)
        self.actions.append(act)
        return act

    def exec_(self, pos=None):
        for act in self.actions:
            if QMenu.pick and QMenu.pick in act.text():
                return act
        return None


class QCursor:
    @staticmethod
    def pos():
        return FakePoint(0, 0)


class QMessageBox:
    warnings = []

    @staticmethod
    def warning(parent, title, text):
        QMessageBox.warnings.append((title, text))

    @staticmethod
    def critical(parent, title, text):
        QMessageBox.warnings.append((title, text))


class QApplication:
    def __init__(self, argv):
        self.argv = argv

    def exec_(self):
        return 0


# -- pyqtgraph -------------------------------------------------------------------


class FakePen:
    def __init__(self, color=None, width=1):
        self.color, self.width = color, width


def mkPen(color=None, width=1, **kw):
    return FakePen(color, width)


def mkBrush(color=None, **kw):
    return FakePen(color)


class _ScaleBox:
    def __init__(self):
        self.visible = False

    def hide(self):
        self.visible = False

    def show(self):
        self.visible = True


class ViewBox:
    RectMode = 1
    PanMode = 3

    def __init__(self, *a, **kw):
        self.rbScaleBox = _ScaleBox()
        self.mouse_mode = None
        self.sigRangeChangedManually = FakeSignal()
        self._view_range = [[0.0, 1.0], [0.0, 1.0]]
        self.border = None

    def setBorder(self, pen=None):
        self.border = pen

    def viewRange(self):
        return [list(self._view_range[0]), list(self._view_range[1])]

    def pan_to(self, x0, x1, y0=0.0, y1=1.0):
        """Test helper: simulate a user pan/wheel, as real pyqtgraph
        would emit sigRangeChangedManually after translate/scaleBy."""
        self._view_range = [[x0, x1], [y0, y1]]
        self.sigRangeChangedManually.emit((True, True))

    def setMouseMode(self, mode):
        self.mouse_mode = mode

    def mapToView(self, p):
        return p

    def updateScaleBox(self, p0, p1):
        self.rbScaleBox.show()

    def mouseDragEvent(self, ev, axis=None):
        pass

    def mouseClickEvent(self, ev):
        pass


class AxisItem:
    def __init__(self, orientation="bottom", **kw):
        self.orientation = orientation
        self.label_text = ""
        self.label_units = None
        self.label_shown = True
        self.values_shown = True

    def setLabel(self, text=None, units=None):
        self.label_text = text
        self.label_units = units
        # mirror real pyqtgraph: setting a label text shows it
        if text:
            self.label_shown = True

    def showLabel(self, show=True):
        self.label_shown = bool(show)

    def setStyle(self, showValues=None, **kw):
        if showValues is not None:
            self.values_shown = bool(showValues)

    def tickSpacing(self, minVal, maxVal, size):
        return [((maxVal - minVal) / 5.0, 0)]

    def tickStrings(self, values, scale, spacing):
        return [f"{v:g}" for v in values]


class FakeCurve:
    def __init__(self, pen=None):
        self.pen = pen
        self.xdata = []
        self.ydata = []

    def setData(self, x, y=None):
        self.xdata = list(x)
        self.ydata = list(y) if y is not None else []


class ScatterPlotItem:
    def __init__(self, size=5, brush=None, symbol=None, pen=None):
        self.size = size
        self.brush = brush
        self.symbol = symbol
        self.pen = pen
        self.xdata = []
        self.ydata = []
        self._visible = True

    def setData(self, x, y=None):
        self.xdata = list(x)
        self.ydata = list(y) if y is not None else []

    def setVisible(self, v):
        self._visible = bool(v)


class InfiniteLine:
    def __init__(self, pos=0.0, angle=90, movable=False, pen=None):
        self._pos = pos
        self.angle = angle
        self.movable = movable
        self._visible = True
        self._bounds = None
        self.sigPositionChangeFinished = FakeSignal()
        self.sigDragged = FakeSignal()

    def setPos(self, pos):
        self._pos = pos

    def pos(self):
        return self._pos

    def value(self):
        return self._pos

    def setBounds(self, bounds):
        self._bounds = bounds

    def setVisible(self, v):
        self._visible = bool(v)

    def isVisible(self):
        return self._visible

    def drag_to(self, pos):
        """Test helper: move the handle and release it."""
        self.setPos(pos)
        self.sigDragged.emit(self)
        self.sigPositionChangeFinished.emit(self)


class LinearRegionItem:
    def __init__(self, values=(0.0, 1.0), movable=True):
        self._region = tuple(values)
        self.movable = movable
        self.sigRegionChangeFinished = FakeSignal()

    def setRegion(self, region):
        self._region = tuple(region)

    def getRegion(self):
        return self._region

    def drag_to(self, region):
        """Test helper: move the region and release it."""
        self._region = tuple(region)
        self.sigRegionChangeFinished.emit(self)


class FakeImageItem:
    def __init__(self):
        self.image = None
        self.levels = None
        self.rect = None
        self.cmap = None
        self.visible = True

    def setImage(self, image, levels=None):
        self.image = image
        self.levels = levels

    def setRect(self, rect):
        self.rect = rect

    def setColorMap(self, cmap):
        self.cmap = cmap

    def setVisible(self, v):
        self.visible = bool(v)

    def isVisible(self):
        return self.visible


class _BarAxis:
    def __init__(self):
        self.label = ""

    def setLabel(self, text=None, units=None):
        self.label = text


class ColorBarItem:
    def __init__(self, values=(0.0, 1.0), colorMap=None, interactive=True):
        self.levels = tuple(values)
        self.cmap = colorMap
        self.interactive = bool(interactive)
        self.image_item = None
        self.insert_in = None
        self._visible = True
        self._axes = {}

    def getAxis(self, side):
        return self._axes.setdefault(side, _BarAxis())

    def setImageItem(self, img, insert_in=None):
        self.image_item = img
        self.insert_in = insert_in

    def setLevels(self, levels):
        self.levels = tuple(levels)
        # mirror real pyqtgraph: the bar's levels drive the linked image
        if self.image_item is not None:
            self.image_item.levels = self.levels

    def setColorMap(self, cmap):
        self.cmap = cmap

    def setVisible(self, v):
        self._visible = bool(v)

    def isVisible(self):
        return self._visible


class FakePlotItem:
    def __init__(self, viewBox=None, axisItems=None):
        self.vb = viewBox if viewBox is not None else ViewBox()
        self.axes = dict(axisItems or {})
        self.items = []
        self.curves = []
        self.labels = {}
        self._visible = True
        self.xrange = None
        self.yrange = None

    def plot(self, pen=None):
        curve = FakeCurve(pen)
        self.curves.append(curve)
        return curve

    def addItem(self, item):
        self.items.append(item)

    def removeItem(self, item):
        if item in self.items:
            self.items.remove(item)

    def setLabel(self, side, text=None, units=None):
        self.labels[side] = (text, units)

    def setXRange(self, a, b, padding=0):
        self.xrange = (a, b)

    def setYRange(self, a, b, padding=0):
        self.yrange = (a, b)

    def showGrid(self, x=False, y=False, alpha=0.8):
        self.grid = (bool(x), bool(y))

    def setVisible(self, v):
        self._visible = bool(v)

    def isVisible(self):
        return self._visible

    def setMaximumHeight(self, h):
        self.max_height = h

    def setMaximumWidth(self, w):
        self.max_width = w

    def getViewBox(self):
        return self.vb

    def getAxis(self, side):
        if side not in self.axes:
            self.axes[side] = AxisItem(side)
        return self.axes[side]


class _GridLayout:
    """Records the QGraphicsGridLayout row-sizing calls."""

    def __init__(self):
        self.row_stretch = {}
        self.row_fixed = {}
        self.row_min = {}
        self.row_max = {}

    def setRowStretchFactor(self, row, stretch):
        self.row_stretch[row] = stretch

    def setRowFixedHeight(self, row, height):
        self.row_fixed[row] = height

    def setRowMinimumHeight(self, row, height):
        self.row_min[row] = height
        if self.row_fixed.get(row) is not None:
            del self.row_fixed[row]

    def setRowMaximumHeight(self, row, height):
        self.row_max[row] = height
        if self.row_fixed.get(row) is not None:
            del self.row_fixed[row]


class _CentralItem:
    def __init__(self):
        self.layout = _GridLayout()


class GraphicsLayoutWidget(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.plots = {}
        self.ci = _CentralItem()

    def addPlot(self, row=0, col=0, viewBox=None, axisItems=None):
        plot = FakePlotItem(viewBox, axisItems)
        self.plots[(row, col)] = plot
        return plot


class _FakeColorMap:
    def __init__(self, name):
        self.name = name


class _colormap:
    @staticmethod
    def get(name):
        return _FakeColorMap(name)


_config = {}


def setConfigOption(key, value):
    _config[key] = value


# -- event helpers for tests ------------------------------------------------------


class FakeMouseEvent:
    """Drives SelectViewBox.mouseDragEvent / mouseClickEvent."""

    def __init__(self, button, pos, down_pos=None, finish=True):
        self._button = button
        self._pos = pos
        self._down = down_pos if down_pos is not None else pos
        self._finish = finish
        self.accepted = False

    def button(self):
        return self._button

    def pos(self):
        return self._pos

    def buttonDownPos(self):
        return self._down

    def isFinish(self):
        return self._finish

    def accept(self):
        self.accepted = True


class FakeHoverEvent:
    def __init__(self, pos=None, exit=False):
        self._pos = pos
        self._exit = exit

    def isExit(self):
        return self._exit

    def pos(self):
        return self._pos


class FakeUrl:
    def __init__(self, path):
        self.path_ = str(path)

    def toLocalFile(self):
        return self.path_


class FakeMimeData:
    def __init__(self, paths):
        self._urls = [FakeUrl(p) for p in paths]

    def hasUrls(self):
        return bool(self._urls)

    def urls(self):
        return self._urls


class FakeDropEvent:
    def __init__(self, paths):
        self._mime = FakeMimeData(paths)
        self.accepted = False

    def mimeData(self):
        return self._mime

    def acceptProposedAction(self):
        self.accepted = True


# -- module installation -----------------------------------------------------------

_INSTALLED = []


def install():
    """Thread the fakes into sys.modules as PyQt5 + pyqtgraph."""
    QTimer.single_shots = []
    qtcore = types.ModuleType("PyQt5.QtCore")
    qtcore.Qt = _Qt
    qtcore.QTimer = QTimer
    qtcore.QRectF = QRectF
    qtcore.QPointF = FakePoint

    qtwidgets = types.ModuleType("PyQt5.QtWidgets")
    for cls in (QApplication, QMainWindow, QTabWidget, QWidget,
                QVBoxLayout, QHBoxLayout, QAction, QDialog, QLabel,
                QScrollArea, QDialogButtonBox, QTableWidget,
                QTableWidgetItem, QFileDialog, QMessageBox, QPushButton,
                QMenu):
        setattr(qtwidgets, cls.__name__, cls)

    pyqt5 = types.ModuleType("PyQt5")
    pyqt5.QtCore = qtcore
    pyqt5.QtWidgets = qtwidgets

    pgmod = types.ModuleType("pyqtgraph")
    pgmod.setConfigOption = setConfigOption
    pgmod.mkPen = mkPen
    pgmod.mkBrush = mkBrush
    pgmod.ViewBox = ViewBox
    pgmod.AxisItem = AxisItem
    pgmod.ScatterPlotItem = ScatterPlotItem
    pgmod.InfiniteLine = InfiniteLine
    pgmod.LinearRegionItem = LinearRegionItem
    pgmod.ImageItem = FakeImageItem
    pgmod.ColorBarItem = ColorBarItem
    pgmod.GraphicsLayoutWidget = GraphicsLayoutWidget
    pgmod.colormap = _colormap

    for name, mod in (("PyQt5", pyqt5), ("PyQt5.QtCore", qtcore),
                      ("PyQt5.QtWidgets", qtwidgets),
                      ("pyqtgraph", pgmod)):
        _INSTALLED.append((name, sys.modules.get(name)))
        sys.modules[name] = mod


def uninstall():
    while _INSTALLED:
        name, previous = _INSTALLED.pop()
        if previous is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = previous
