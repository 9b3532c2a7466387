"""Headless per-recording controller — the GUI-independent core of the
reference's ``DataBrowser`` (`src/audian/databrowser.py:53-1926`).

Owns one :class:`audian_tpu.data.Data` (raw loader + device trace graph),
the analyzers, the marker store, the channel-selection state, the region
verbs (zoom/play/analyze/save), and the interactive parameter verbs
(filter cutoffs, NFFT/overlap, envelope cutoff).  GUI frontends (Qt or
matplotlib) subclass or wrap it and subscribe to its signals, which are
plain callback lists here.

The reference's ``self.setting`` reentrancy flag
(`databrowser.py:1127-1136`) is kept with identical semantics to break
signal feedback loops between linked views.
"""

from __future__ import annotations

from copy import deepcopy
from pathlib import Path

import numpy as np

from ..data import Data, wavio
from ..data.data import RAW
from ..ops import prepare_playback
from ..analysis import (Plugins, PlainAnalyzer, StatisticsAnalyzer,
                        EventRecorder)
from ..cache import FullTraceData
from ..view.render import TraceTiler, SpecTiler
from .markers import MarkerData, MarkerLabel


def secs_to_str(time):
    """``1h30m05.25s``-style time formatting
    (`src/audian/fulltraceplot.py:17-59` semantics)."""
    hours = int(time // 3600)
    mins = int((time % 3600) // 60)
    secs = time % 60
    s = ""
    if hours > 0:
        s += f"{hours}h"
    if mins > 0 or hours > 0:
        s += f"{mins:02d}m" if s else f"{mins}m"
    if secs == int(secs):
        s += f"{int(secs):02d}s" if s else f"{secs:.0f}s"
    else:
        sstr = f"{secs:.4g}"
        s += (sstr if not s else sstr.zfill(7 if "." in sstr else 2)) + "s"
    return s


class Signal:
    """Tiny Qt-signal stand-in: a list of callbacks."""

    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def disconnect(self, fn):
        self._slots.remove(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            fn(*args)


class DataBrowser:
    """Headless controller for one (multi-file) recording."""

    # region modes (`src/audian/databrowser.py:67-71`)
    zoom_region = 0
    play_window = 1
    analyze_region = 2
    save_region_mode = 3
    ask_region = 4

    def __init__(self, file_path, channels=None, plugins=None,
                 buffer_time=60.0, back_time=20.0, load_kwargs=None,
                 unwrap=0.0, unwrap_clip=False):
        self.file_path = file_path
        self.load_kwargs = dict(load_kwargs or {})
        self.unwrap = unwrap
        self.unwrap_clip = unwrap_clip
        self.plugins = plugins or Plugins()
        self.data = Data(file_path, buffer_time=buffer_time,
                         back_time=back_time, **self.load_kwargs)
        self._requested_channels = channels
        self.show_channels = []
        self.selected_channels = []
        self.current_channel = 0
        self.analyzers = []
        self.region_mode = DataBrowser.zoom_region
        self.setting = False
        # view window state (the 't' plot range's role for time)
        self.toffset = 0.0
        self.twindow = 2.0
        # audio playback state (`databrowser.py:128-146`)
        self.audio_rate_fac = 1.0
        self.audio_use_heterodyne = False
        self.audio_heterodyne_freq = 0.0
        self.audio_time = -1.0
        self.audio_tmax = 0.0
        # render engines
        self.trace_tiler = TraceTiler()
        self.spec_tiler = SpecTiler()
        self.fulltrace = None
        # marker store
        self.marker_labels = [MarkerLabel("start", "s", "yellow"),
                              MarkerLabel("end", "e", "blue")]
        self.marker_data = MarkerData(self.marker_labels)
        self.save_path = None
        # signals (Qt-free)
        self.sigTimesChanged = Signal()
        self.sigFilenameChanged = Signal()
        self.sigFilterChanged = Signal()
        self.sigResolutionChanged = Signal()
        self.sigEnvelopeChanged = Signal()
        self.sigChannelsChanged = Signal()
        self.sigAudioChanged = Signal()
        self.sigAnalysisChanged = Signal()
        self.plugins.setup_traces(self)
        self.data.setup_traces()

    # -- construction hooks (plugin/analyzer protocol) ---------------------------

    def add_trace(self, node):
        self.data.add_trace(node)

    def add_analyzer(self, analyzer):
        self.analyzers.append(analyzer)

    def make_event_item(self, channel=0, trace_name=None, panel_name=None,
                        symbol=None, color=None, size=None):
        """Event-marker sink factory; GUI subclasses return real plot
        items, the headless core records the data."""
        return EventRecorder(symbol, color, size)

    # -- lifecycle ----------------------------------------------------------------

    def open(self):
        self.data.open(self.unwrap, self.unwrap_clip)
        channels = self._requested_channels
        if channels:
            self.show_channels = [c for c in channels
                                  if 0 <= c < self.data.channels]
        else:
            self.show_channels = list(range(self.data.channels))
        if not self.show_channels:
            self.show_channels = [0]
        self.selected_channels = list(self.show_channels)
        self.current_channel = self.show_channels[0]
        self.twindow = min(2.0, self.data.frames / self.data.rate)
        # markers from file metadata (`databrowser.py:317-324`)
        locs, labels = self.data.data.markers()
        self.marker_data.set_markers(locs, labels, self.data.rate)
        for lbl in np.unique(labels[:, 0]) if len(labels) else []:
            if not any(l.label == lbl for l in self.marker_labels):
                self.marker_labels.append(
                    MarkerLabel(str(lbl), str(lbl)[:1].lower(), "white"))
        # analyzers: plain + statistics + plugins (`databrowser.py:613-615`)
        PlainAnalyzer(self)
        if "filtered" in self.data:
            StatisticsAnalyzer(self)
        self.plugins.setup_analyzers(self)
        # overview
        self.fulltrace = FullTraceData(self.data.data)
        if not self.fulltrace.load_data():
            self.fulltrace.start(6000)
        self.set_times(0.0, self.twindow)
        return self

    def close(self):
        if self.fulltrace is not None:
            self.fulltrace.close()
        self.data.close()

    # -- time window ---------------------------------------------------------------

    def set_times(self, toffset=None, twindow=None):
        """Move/resize the visible window and recompute visible traces
        (`databrowser.py:1126-1136`)."""
        if self.setting:
            return
        self.setting = True
        try:
            if toffset is not None:
                self.toffset = max(0.0, toffset)
            if twindow is not None:
                self.twindow = twindow
            tmax = self.data.frames / self.data.rate
            if self.toffset + self.twindow > tmax:
                self.toffset = max(0.0, tmax - self.twindow)
            fn = self.data.update_times(self.toffset,
                                        self.toffset + self.twindow)
            self.sigFilenameChanged.emit(self, fn)
            self.sigTimesChanged.emit(self.toffset, self.twindow)
        finally:
            self.setting = False

    # time verbs (keyboard surface of the reference)
    def time_page_down(self):
        self.set_times(self.toffset + 0.5 * self.twindow)

    def time_page_up(self):
        self.set_times(self.toffset - 0.5 * self.twindow)

    def time_zoom_in(self):
        self.set_times(twindow=self.twindow / 2)

    def time_zoom_out(self):
        self.set_times(twindow=min(self.twindow * 2,
                                   self.data.frames / self.data.rate))

    def time_home(self):
        self.set_times(0.0)

    def time_end(self):
        self.set_times(self.data.frames / self.data.rate - self.twindow)

    # -- interactive parameters -----------------------------------------------------

    def update_filter(self, highpass_cutoff=None, lowpass_cutoff=None):
        """(`databrowser.py:1264-1288`)"""
        if self.setting or "filtered" not in self.data:
            return
        self.setting = True
        try:
            self.data["filtered"].update(highpass_cutoff=highpass_cutoff,
                                         lowpass_cutoff=lowpass_cutoff)
        finally:
            self.setting = False
        self.sigFilterChanged.emit()

    def set_resolution(self, nfft=None, step_frac=None):
        """NFFT / hop-fraction changes (`databrowser.py:1188-1222`)."""
        if self.setting or "spectrogram" not in self.data:
            return
        self.setting = True
        try:
            overlap = None if step_frac is None else 1.0 - step_frac
            self.data["spectrogram"].update(nfft=nfft, overlap_frac=overlap)
        finally:
            self.setting = False
        self.sigResolutionChanged.emit()

    def update_envelope(self, envelope_cutoff=None, show_envelope=None,
                        dispatch=True):
        """(`databrowser.py:1291-1314`)"""
        if self.setting or "envelope" not in self.data:
            return
        self.setting = True
        try:
            if envelope_cutoff is not None:
                self.data["envelope"].update(envelope_cutoff=envelope_cutoff)
            if show_envelope is not None:
                for name in self.data.keys():
                    if name.startswith("env"):
                        self.data.set_visible(name, show_envelope)
        finally:
            self.setting = False
        if dispatch:
            self.sigEnvelopeChanged.emit()

    # -- channel selection (`databrowser.py:1317-1512`) ------------------------------

    def set_channels(self, channels):
        channels = [c for c in channels if 0 <= c < self.data.channels]
        if channels:
            self.show_channels = sorted(channels)
            self.selected_channels = [c for c in self.selected_channels
                                      if c in channels] or list(channels)
            if self.current_channel not in channels:
                self.current_channel = channels[0]
            self.sigChannelsChanged.emit(self.show_channels)

    def select_channels(self, channels):
        channels = [c for c in channels if c in self.show_channels]
        if channels:
            self.selected_channels = sorted(channels)

    def all_channels(self):
        self.set_channels(list(range(self.data.channels)))

    # -- audio --------------------------------------------------------------------

    def set_audio(self, rate_fac=None, use_heterodyne=None,
                  heterodyne_freq=None, dispatch=True):
        if rate_fac is not None:
            self.audio_rate_fac = float(rate_fac)
        if use_heterodyne is not None:
            self.audio_use_heterodyne = bool(use_heterodyne)
        if heterodyne_freq is not None:
            self.audio_heterodyne_freq = float(heterodyne_freq)
        if dispatch:
            self.sigAudioChanged.emit(self.audio_rate_fac,
                                      self.audio_use_heterodyne,
                                      self.audio_heterodyne_freq)

    def play_region(self, t0, t1):
        """Build the playback buffer on device: mean mix-down of shown
        channels, optional heterodyne + AA-decimation, fades
        (`databrowser.py:1702-1742`).  Returns (buffer, rate); the GUI
        layer hands it to the sound device."""
        trace = self.data["filtered"] if "filtered" in self.data else \
            self.data[RAW]
        rate = trace.rate
        i0 = max(int(np.round(t0 * rate)), 0)
        i1 = min(int(np.round(t1 * rate)), len(trace))
        if i1 <= i0:
            return np.zeros((0, 2)), rate
        data = np.asarray(trace[i0:i1, :])
        play, prate = prepare_playback(
            data, rate, channels=self.show_channels,
            use_heterodyne=self.audio_use_heterodyne,
            heterodyne_freq=self.audio_heterodyne_freq,
            rate_fac=self.audio_rate_fac,
        )
        self.audio_time = i0 / rate
        self.audio_tmax = i1 / rate
        return np.asarray(play), prate

    def play_visible(self):
        return self.play_region(self.toffset, self.toffset + self.twindow)

    def mark_audio(self, dt=0.05):
        """Advance the playback position marker one GUI tick (the
        reference's 50 ms timer, `src/audian/databrowser.py:1745-1756`).
        Returns the marker time or None when playback finished."""
        if self.audio_time < 0:
            return None
        self.audio_time += dt / self.audio_rate_fac
        if self.audio_time > self.audio_tmax:
            self.audio_time = -1.0
            return None
        return self.audio_time

    def time_info(self, t):
        """Hover time rows: recording-relative, absolute, and per-file
        times of ``t`` (`src/audian/timeplot.py:154-192` hover table)."""
        from ..view.axes import format_time_ticks, REC_TIME, ABS_TIME

        rows = []
        _, units, strs, _ = format_time_ticks([t], 0.001)
        rows.append(("REC", units, strs[0]))
        if self.data.start_time is not None:
            _, units, strs, _ = format_time_ticks(
                [t], 0.001, mode=ABS_TIME, starttime=self.data.start_time,
                add_date=True)
            rows.append(("Time", units, strs[0]))
        if len(self.data.data.file_paths) > 1:
            fp, local = self.data.data.get_file_index(
                int(t * self.data.rate))
            rows.append(("File", str(fp.name), f"{local / self.data.rate:.4f}"))
        return rows

    # -- regions ------------------------------------------------------------------

    def analyze(self, t0, t1, channel):
        """Run all analyzers over the selected region
        (`databrowser.py:1759-1774`)."""
        traces = self.data.get_region(t0, t1, channel)
        for a in self.analyzers:
            a.analyze(t0, t1, channel, traces)
        self.sigAnalysisChanged.emit()
        return traces

    def save_region(self, t0, t1, file_path=None):
        """Export the selected region to a WAV with shifted start time,
        coding history, and the contained markers
        (`databrowser.py:1860-1921`)."""
        rate = self.data.rate
        i0 = max(int(np.round(t0 * rate)), 0)
        i1 = min(int(np.round(t1 * rate)), len(self.data.data))
        t0 = i0 / rate
        name = Path(self.data.file_path).stem
        if file_path is None:
            file_path = Path(self.data.file_path).with_name(
                f"{name}-{secs_to_str(t0)}-{secs_to_str(i1 / rate)}.wav")
        md = deepcopy(self.data.meta_data)
        md.pop("Format", None)
        wavio.update_starttime(md, t0, rate)
        hkey = "CodingHistory"
        if "BEXT" in md:
            hkey = "BEXT.CodingHistory"
        encoding = self.data.data.encoding
        bext_code = wavio.bext_history_str(encoding, rate,
                                           self.data.channels)
        wavio.add_history(
            md,
            bext_code + f",T=cut out {secs_to_str(t0)}-"
            f"{secs_to_str(i1 / rate)}: {Path(file_path).name}",
            hkey,
            bext_code + f",T={self.data.file_path}",
        )
        locs, labels = self.marker_data.get_markers(rate)
        if len(locs):
            sel = (locs[:, 0] + locs[:, 1] >= i0) & (locs[:, 0] <= i1)
            locs = locs[sel].copy()
            labels = labels[sel]
            locs[:, 0] -= i0
        raw = np.asarray(self.data.data[i0:i1, self.selected_channels])
        wavio.write_audio(file_path, raw, rate, metadata=md, locs=locs,
                          labels=labels, encoding=encoding
                          if encoding in wavio.available_encodings()
                          else "PCM_16")
        self.save_path = Path(file_path).parent
        return Path(file_path)

    # -- render tiles (GUI pull interface) --------------------------------------------

    def trace_tile(self, name, channel, t0=None, t1=None):
        if t0 is None:
            t0, t1 = self.toffset, self.toffset + self.twindow
        return self.trace_tiler.tile(self.data[name], t0, t1, channel)

    def spec_tile(self, channel, zmin=None, zmax=None, quantize=False):
        trace = self.data["spectrogram"]
        if zmin is None or zmax is None:
            azmin, azmax = self.estimate_power_levels(channel)
            zmin = azmin if zmin is None else zmin
            zmax = azmax if zmax is None else zmax
        return self.spec_tiler.tile(trace, channel, zmin, zmax,
                                    quantize=quantize)

    def power_spectrum(self, channel, t0=None, t1=None):
        """Mean power spectrum (dB) over the visible window — the data
        behind the reference's per-spectrogram power side plot
        (`src/audian/spectrogramplot.py:144-164`).

        Returns ``(freqs, dB)``.
        """
        trace = self.data["spectrogram"]
        if t0 is None:
            t0, t1 = self.toffset, self.toffset + self.twindow
        i0 = max(int(t0 * trace.rate) - trace.offset, 0)
        i1 = min(int(t1 * trace.rate + 1) - trace.offset, len(trace.buffer))
        if i1 <= i0:
            return trace.frequencies, np.full(trace.spec.more_shape[0],
                                              -np.inf)
        part = np.asarray(trace.buffer[i0:i1, channel, :])
        mean = part.mean(axis=0)
        db = 10 * np.log10(np.maximum(mean, 1e-20))
        return trace.frequencies, db

    def estimate_power_levels(self, channel):
        """Noise-floor based auto color levels
        (`src/audian/bufferedspectrogram.py:109-126` via
        `plotranges.py:461-478`)."""
        trace = self.data["spectrogram"]
        buf = np.asarray(trace.buffer)
        if buf.size == 0:
            return (-100.0, 0.0)
        node = trace._node
        nf = max(buf.shape[2] // 16, 1)
        with np.errstate(all="ignore"):
            db_tail = 10 * np.log10(np.maximum(buf[:, channel, -nf:], 1e-20))
            db_all = 10 * np.log10(np.maximum(buf[:, channel, :], 1e-20))
        zmin, zmax = node.estimate_noiselevels(db_tail, db_all)
        if zmin is None:
            return (-100.0, 0.0)
        return zmin, zmax
