"""In-memory ``sounddevice`` stand-in (the fakeqt pattern for audio).

The GUI playback branches do a function-local ``import sounddevice``
(`gui/mpl.py:_play/_stop_audio`, `gui/qt.py:_play/play_scroll`) so a
missing PortAudio degrades to a printed notice.  Installing this module
into ``sys.modules`` makes those exact lines execute and records what
reaches the device: the prepared buffer (mix-down/heterodyne/fade from
``ops.prepare_playback``), the sample rate, and stop calls.

Reference behavior being pinned: non-blocking ``PlayAudio.play`` with a
50 ms position marker (`/root/reference/src/audian/databrowser.py:1702-1756`).
"""

import sys
import types

import numpy as np


class Recorder:
    """Captures play()/stop() traffic for assertions."""

    def __init__(self):
        self.calls = []

    @property
    def playing(self):
        """The (data, samplerate) of the latest un-stopped play()."""
        live = None
        for call in self.calls:
            live = (call[1], call[2]) if call[0] == "play" else None
        return live

    def play(self, data, samplerate=None, blocking=False):
        self.calls.append(("play", np.array(data, copy=True),
                           samplerate, blocking))

    def stop(self):
        self.calls.append(("stop",))


def install():
    """Install a fake ``sounddevice`` module; returns its Recorder.
    Remembers any real module so :func:`uninstall` can restore it."""
    rec = Recorder()
    mod = types.ModuleType("sounddevice")
    mod.play = rec.play
    mod.stop = rec.stop
    mod._recorder = rec
    mod._audian_fake = True
    mod._previous = sys.modules.get("sounddevice")
    sys.modules["sounddevice"] = mod
    return rec


def uninstall():
    mod = sys.modules.get("sounddevice")
    if mod is not None and getattr(mod, "_audian_fake", False):
        if mod._previous is not None:
            sys.modules["sounddevice"] = mod._previous
        else:
            del sys.modules["sounddevice"]
