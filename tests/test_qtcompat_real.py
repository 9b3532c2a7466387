"""The REAL-backend branches of :mod:`qtcompat`, exercised locally.

The CI ``qt-real`` job runs the Qt suite against actual
PyQt5/pyqtgraph; this environment cannot.  These tests drive every
real-branch accessor against minimal stand-ins that mimic the REAL
toolkit's introspection surface (``getData()``, ``opts`` dicts,
``actions()`` methods, ndarray ``levels``, ``img_list`` weakrefs,
``QPen.style()``, grid-layout getters, signal-emit fallbacks), so a
typo'd method name or wrong attribute in the compat layer fails HERE
instead of only in CI."""

import types
import weakref

import numpy as np
import pytest

import fakeqt
import qtcompat as qtc


@pytest.fixture(autouse=True)
def _fake_pyqt5():
    # the real branches import PyQt5.QtCore for Qt/QPointF
    fakeqt.install()
    yield
    fakeqt.uninstall()


class Sig:
    def __init__(self):
        self.calls = []

    def connect(self, fn):
        self._fn = fn

    def emit(self, *a):
        self.calls.append(a)
        if hasattr(self, "_fn"):
            self._fn(*a)


def test_curve_xy_real():
    class Curve:
        def getData(self):
            return np.array([1.0, 2.0]), np.array([3.0, 4.0])

    x, y = qtc.curve_xy(Curve())
    assert list(x) == [1.0, 2.0] and list(y) == [3.0, 4.0]

    class EmptyCurve:
        def getData(self):
            return None, None

    x, y = qtc.curve_xy(EmptyCurve())
    assert len(x) == 0 and len(y) == 0


def test_xrange_of_real():
    class VB:
        def viewRange(self):
            return [[0.5, 1.5], [-1.0, 1.0]]

    class Plot:
        def getViewBox(self):
            return VB()

    assert qtc.xrange_of(Plot()) == (0.5, 1.5)


def test_image_accessors_real():
    class Rect:
        def x(self):
            return 1.0

        def y(self):
            return 0.0

        def width(self):
            return 2.0

        def height(self):
            return 4000.0

    class Img:
        image = np.zeros((4, 5))
        levels = np.array([0.0, 255.0])

        def boundingRect(self):
            return "br"

        def mapRectToParent(self, br):
            assert br == "br"
            return Rect()

    img = Img()
    assert qtc.image_of(img) is Img.image
    assert qtc.image_rect(img) == (1.0, 0.0, 2.0, 4000.0)
    assert qtc.image_levels(img) == (0.0, 255.0)


def test_cbar_accessors_real():
    class Axis:
        labelText = "-90…-10 dB"
        label = object()  # real: a QGraphicsTextItem, not a str

    class Img:
        pass

    img = Img()

    class CBar:
        img_list = [weakref.ref(img)]
        values = (0, 255)

        def levels(self):
            return self.values

        def getAxis(self, side):
            assert side == "right"
            return Axis()

    cbar = CBar()
    assert qtc.cbar_levels(cbar) == (0, 255)
    assert qtc.cbar_images(cbar) == [img]
    assert qtc.cbar_axis_label(cbar) == "-90…-10 dB"

    class OldCBar:  # pre-0.13: tuple attribute, no levels() method
        values = (-100.0, 0.0)
        levels = None

    assert qtc.cbar_levels(OldCBar()) == (-100.0, 0.0)


def test_axis_accessors_real():
    class Label:
        def __init__(self, vis):
            self._vis = vis

        def isVisible(self):
            return self._vis

    class Axis:
        def __init__(self, show):
            self.style = {"showValues": show}
            self.label = Label(show)

    assert qtc.axis_values_shown(Axis(True))
    assert not qtc.axis_values_shown(Axis(False))
    assert qtc.axis_label_shown(Axis(True))
    assert not qtc.axis_label_shown(Axis(False))


def test_vb_border_real_nopen():
    class Pen:
        def __init__(self, style):
            self._style = style

        def style(self):
            return self._style

    class VB:
        def __init__(self, pen):
            self.border = pen

    # real setBorder(None) stores mkPen(None) == a QPen with NoPen
    assert qtc.vb_border(VB(Pen(0))) is None
    pen = Pen(1)
    assert qtc.vb_border(VB(pen)) is pen
    assert qtc.vb_border(VB(None)) is None


def test_grid_layout_real():
    class Layout:
        def rowStretchFactor(self, r):
            return {0: 1000, 1: 0}[r]

        def rowMinimumHeight(self, r):
            return {0: 0, 1: 0}[r]

        def rowMaximumHeight(self, r):
            return {0: 16777215, 1: 0}[r]

    lay = Layout()
    assert qtc.row_stretch(lay, 0) == 1000
    assert qtc.row_fixed_height(lay, 0) is None  # min != max: not pinned
    assert qtc.row_fixed_height(lay, 1) == 0     # min == max == 0


def test_menu_iteration_real():
    class Act:
        def __init__(self, text, menu=None, sep=False):
            self._menu = menu
            self._sep = sep
            self._text = text

        def text(self):
            return self._text

        def menu(self):
            return self._menu

        def isSeparator(self):
            return self._sep

        def shortcuts(self):
            class KS:
                def toString(self):
                    return "Ctrl+O"

            return [KS()]

    class Menu:
        def actions(self):
            return [Act("a"), Act("sep", sep=True), Act("b")]

    class MenuBar:
        def actions(self):
            return [Act("m", menu=Menu()), Act("plain")]

    class Win:
        def menuBar(self):
            return MenuBar()

    menus = qtc.menus_of(Win())
    assert len(menus) == 1
    acts = qtc.actions_of(menus[0])
    assert [a.text() for a in acts] == ["a", "b"]  # separators dropped
    assert qtc.act_keys(acts[0]) == ["Ctrl+O"]


def test_scatter_opts_real():
    class SP:
        opts = {"symbol": "o", "size": 5}

    assert qtc.scatter_symbol(SP()) == "o"
    assert qtc.scatter_size(SP()) == 5


def test_timer_and_signal_fallbacks():
    fired = []

    class Timer:  # real QTimer: no fire(), but timeout.emit() works
        def __init__(self):
            self.timeout = Sig()
            self.timeout.connect(lambda *a: fired.append(1))
            self._active = True

        def isActive(self):
            return self._active

    t = Timer()
    qtc.fire_timer(t)
    assert fired == [1]
    t._active = False
    qtc.fire_timer(t)
    assert fired == [1]  # inactive timers do not tick


def test_drag_fallbacks_emit_real_signals():
    class Region:  # real LinearRegionItem: no drag_to helper
        def __init__(self):
            self._r = (0.0, 1.0)
            self.sigRegionChangeFinished = Sig()

        def setRegion(self, r):
            self._r = tuple(r)

        def getRegion(self):
            return self._r

    reg = Region()
    qtc.drag_region(reg, (0.25, 0.75))
    assert reg.getRegion() == (0.25, 0.75)
    assert reg.sigRegionChangeFinished.calls == [(reg,)]

    class Line:
        def __init__(self):
            self._pos = 0.0
            self.sigDragged = Sig()
            self.sigPositionChangeFinished = Sig()

        def setPos(self, p):
            self._pos = p

        def value(self):
            return self._pos

    line = Line()
    qtc.drag_line(line, 1234.0)
    assert qtc.line_value(line) == 1234.0
    assert line.sigPositionChangeFinished.calls == [(line,)]


def test_pan_to_real_branch():
    class VB:  # real ViewBox: setRange + state + manual signal
        def __init__(self):
            self.state = {"mouseEnabled": [True, True]}
            self.sigRangeChangedManually = Sig()
            self.ranges = None

        def setRange(self, xRange=None, yRange=None, padding=None):
            self.ranges = (xRange, yRange, padding)

    vb = VB()
    qtc.pan_to(None, vb, 0.5, 1.0, -0.4, 0.4)
    assert vb.ranges == ((0.5, 1.0), (-0.4, 0.4), 0)
    assert vb.sigRangeChangedManually.calls == [([True, True],)]


def test_view_point_and_events_real_branch():
    qtmod = types.SimpleNamespace(_backend="real")
    assert not qtc.is_fake(qtmod)

    class VB:
        def mapFromView(self, p):
            # real: view -> item coordinates; mimic an affine transform
            return fakeqt.FakePoint(p.x() * 2, p.y() * 2)

    vb = VB()
    ev = qtc.drag_event(qtmod, vb, 1.0, 2.0, 3.0, 4.0)
    assert ev.button() == fakeqt._Qt.LeftButton
    assert (ev.buttonDownPos().x(), ev.buttonDownPos().y()) == (2.0, 4.0)
    assert (ev.pos().x(), ev.pos().y()) == (6.0, 8.0)
    assert ev.isFinish()
    click = qtc.click_event(qtmod, vb, 0.5, 0.25)
    assert (click.pos().x(), click.pos().y()) == (1.0, 0.5)
    hov = qtc.hover_event(qtmod, vb, exit=True)
    assert hov.isExit()
