"""Randomized action fuzzing of the Qt frontend (both backends).

Triggers hundreds of random menu actions — the full keyboard surface of
`src/audian/audian.py:263-1271` — on a two-file shell and checks after
every trigger that (a) no slot reported an error through the status bar
(:meth:`AudianWindow._fire` swallows slot exceptions to avoid qFatal, so
the error status is the only observable), and (b) every browser still
satisfies the structural invariants of
:mod:`tests.test_fuzz_interaction`.  A final pass closes every tab and
re-fires actions against the empty window (the None-browser guard of
`gui/qt.py:_fire`).
"""

import importlib
import shutil

import numpy as np
import pytest

import fakeqt  # noqa: F401  (fake backend installed via qtcompat)
import qtcompat as qtc
from audian_tpu.app import Audian
from audian_tpu.data import wavio
from test_fuzz_interaction import _check_invariants

RATE = 8000.0

#: actions that end the session, open file dialogs, or write files —
#: everything else is fair game
SKIP = {"&Quit", "&Open", "&Close tab", "Save &window as", "&Screenshot"}


@pytest.fixture(scope="module", params=qtc.qt_backends())
def qt(request):
    qtmod, teardown = qtc.setup_backend(request.param)
    yield qtmod
    teardown()


@pytest.fixture(scope="module")
def wavs(tmp_path_factory, rng):
    t = np.arange(int(1.5 * RATE)) / RATE
    am = (np.sin(2 * np.pi * 5.0 * t) > 0).astype(float)
    x = np.stack([0.5 * np.sin(2 * np.pi * 700 * t) * am,
                  0.3 * np.sin(2 * np.pi * 350 * t)], axis=1)
    x += 0.01 * rng.standard_normal(x.shape)
    d = tmp_path_factory.mktemp("qtfuzz")
    p0 = d / "one.wav"
    wavio.write_audio(p0, x, RATE, encoding="PCM_16")
    p1 = d / "two.wav"
    shutil.copyfile(p0, p1)
    return [p0, p1]


def test_qt_action_fuzz(qt, wavs):
    shell = Audian(list(wavs))
    shell.load_files()
    win = qt.AudianWindow(shell)
    try:
        errors = []
        original = win.set_status

        def record_status(text):
            if str(text).startswith("error"):
                errors.append(text)
            original(text)

        win.set_status = record_status

        actions = [act for act in qtc.all_actions(win)
                   if act.text() not in SKIP]
        assert len(actions) > 60  # the full reference action surface

        rng = np.random.default_rng(5)
        for step in range(220):
            act = actions[int(rng.integers(0, len(actions)))]
            act.trigger()
            assert not errors, (f"step {step}: action {act.text()!r} "
                                f"reported {errors[0]!r}")
            for b in shell.browsers:
                _check_invariants(b)

        # every checkable action's checkmark mirrors shell/browser state
        win._sync_action_states()
        for act, getter in win._state_acts:
            assert act.isChecked() == bool(getter())

        # empty-window robustness: close all tabs, re-fire everything
        while win.tabs.count():
            win.close_tab()
        assert shell.current is None
        for step in range(60):
            act = actions[int(rng.integers(0, len(actions)))]
            act.trigger()
            assert not errors, (f"empty-window step {step}: action "
                                f"{act.text()!r} reported {errors[0]!r}")
    finally:
        shell.close()
