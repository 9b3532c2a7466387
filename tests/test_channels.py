"""ChannelFocus invariants under arbitrary verb sequences.

The browser-level tests pin reference behavior
(`src/audian/databrowser.py:1317-1512`); these hammer the value object
directly so the invariants hold for any interleaving, not just the
scripted flows.
"""

import numpy as np
import pytest

from audian_tpu.app.channels import ChannelFocus


def make(total=8, shown=None, selected=None, current=0):
    shown = list(range(total)) if shown is None else shown
    selected = list(shown) if selected is None else selected
    return ChannelFocus(total, shown, selected, current)


def test_step_walks_shown_channels():
    f = make(total=6, shown=[1, 3, 5], selected=[1], current=1)
    assert f.step(+1) is False
    assert f.current == 3 and f.selected == [3]
    assert f.step(+1) is False
    assert f.current == 5
    # at the edge with nothing beyond: renormalize requested, no move
    assert f.step(+1) is True
    assert f.current == 5


def test_step_scrolls_window_with_overlap():
    f = make(total=10, shown=[0, 1, 2], selected=[2], current=2)
    assert f.step(+1) is True
    # window advanced by len-1 keeping one channel of overlap
    assert f.shown == [2, 3, 4]
    assert f.current == 3 and f.selected == [3]
    f2 = make(total=10, shown=[7, 8, 9], selected=[7], current=7)
    assert f2.step(-1) is True
    assert f2.shown == [5, 6, 7]
    assert f2.current == 6


def test_extend_from_selection_extreme():
    f = make(total=8, shown=list(range(8)), selected=[2, 3], current=2)
    f.extend(+1)
    assert f.selected == [2, 3, 4]
    f.extend(-1)  # anchors at the low end of the shown selection
    assert 1 in f.selected


def test_normalize_invariants_random_walk():
    rng = np.random.default_rng(7)
    f = make(total=12, shown=[0, 1, 2, 3], current=0)
    ops = [lambda: f.step(+1), lambda: f.step(-1),
           lambda: f.extend(+1), lambda: f.extend(-1),
           lambda: f.select_all(),
           lambda: f.conceal(int(rng.integers(12))),
           lambda: f.reveal(int(rng.integers(12))),
           lambda: f.keep_selection(list(rng.integers(0, 12, 3)))]
    for _ in range(300):
        op = ops[int(rng.integers(len(ops)))]
        try:
            op()
        except ValueError:
            pass
        f.normalize()
        # invariants (module docstring)
        assert f.shown, "shown never empties"
        assert all(0 <= c < f.total for c in f.shown)
        visible_sel = set(f.shown) & set(f.selected)
        assert visible_sel, "selection always intersects shown"
        assert f.current in visible_sel


def test_conceal_last_channel_falls_through():
    f = make(total=3, shown=[2], selected=[2], current=2)
    f.conceal(2)
    assert f.shown == [0]   # wraps past the end
    f2 = make(total=3, shown=[1], selected=[1], current=1)
    f2.conceal(1)
    assert f2.shown == [2]  # successor


def test_scroll_never_exceeds_bounds():
    f = make(total=4, shown=[0, 1, 2, 3], selected=[3], current=3)
    assert f.step(+1) is True  # nothing beyond: stays put
    assert f.shown == [0, 1, 2, 3]
    assert f.current == 3
    f.current = 0
    f.selected = [0]
    assert f.step(-1) is True
    assert f.current == 0
