"""Whole-recording min/max overview with persistent cache.

TPU-native rebuild of the reference's ``CompressedData``
(`src/audian/compresseddata.py:25-305`): the min/max pyramid over the whole
(out-of-core) recording for the overview plot, computed in the background,
persisted either next to the data as ``<stem>-fulltrace.wav`` or in a
JSON-indexed LRU user cache — artifact-format compatible (double-encoded
WAV with the rate scaled by 1e6/1e3 to dodge WAV's rate limits,
`src/audian/compresseddata.py:147-155,198-202`).

Compute backends, replacing the fork-server process pool over a locked
shared array (`compresseddata.py:104-122`):

- C++ threads (``audian_tpu.native.file_minmax``, lock-free block stripes)
  for out-of-core single files;
- the in-memory reshape-reduce for short recordings;
- optionally the device minmax of the sharded pipeline when data is
  already flowing through TPU (batch CLIs).
"""

from __future__ import annotations

import json
import os
import threading
from datetime import datetime
from pathlib import Path

import numpy as np

from ..version import audian_dirs
from ..data import wavio
from .. import native

__all__ = ["FullTraceData"]



def _read_index(index_path):
    """The cache index, tolerating a missing or corrupt file (a killed
    writer must not poison every later open)."""
    try:
        return json.loads(index_path.read_text())
    except (OSError, ValueError):
        return {}


def _write_index(index_path, files):
    """Atomic index write (temp + rename)."""
    tmp = index_path.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(files, indent=4))
    os.replace(tmp, index_path)

class FullTraceData:
    """Background-computed min/max overview of one recording."""

    fulltraces_file = "fulltraces.json"
    max_files = 1000

    def __init__(self, data):
        """``data`` is an :class:`audian_tpu.data.AudioLoader` (or the raw
        trace of a :class:`audian_tpu.data.Data`)."""
        self.data = data
        self.times = None
        self.datas = None
        self.step = None
        self.short_data = True
        self._thread = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def close(self):
        if self._thread is not None and self._thread.is_alive():
            self._thread.join(timeout=0.1)
        self._thread = None

    # -- compute -----------------------------------------------------------------

    def start(self, max_pixel, do_short=True, background=True):
        """Begin computing the overview at ``<= 2*max_pixel`` columns
        (`src/audian/compresseddata.py:79-122` semantics: step =
        frames//max_pixel, interleaved min/max, times at half steps)."""
        if self.times is not None and self.datas is not None:
            return
        frames = self.data.frames
        step = max(1, frames // max_pixel)
        self.step = step
        nseg = -(-frames // step)
        self.times = (np.arange(2 * nseg) * (step / 2)
                      + 0.0) / self.data.rate
        if len(self.data.buffer) == frames:
            # short file: data is fully in memory, no background needed
            self.short_data = True
            if do_short:
                buf = np.asarray(self.data.buffer)
                self.datas = _interleaved_minmax(buf, step)
            return
        self.short_data = False
        self.datas = np.zeros((2 * nseg, self.data.channels))
        if background:
            self._thread = threading.Thread(
                target=self._compute, args=(step,), daemon=True)
            self._thread.start()
        else:
            self._compute(step)

    def _compute(self, step):
        out = self.datas
        if len(self.data.file_paths) == 1:
            info = self.data._infos[0]
            rate, channels, frames, enc, data_off = info
            part = None
            if self.data.unwrap_thresh <= 1e-3 and data_off is not None:
                part = native.file_minmax(self.data.file_paths[0], data_off,
                                          enc, channels, frames, step)
            if part is None:
                part = self._compute_python(0, step)
            n = min(len(part), len(out))
            out[:n] = part[:n]
        else:
            # multi-file recordings: segments belong to the CONCATENATED
            # stream — per-file decimation would restart the segment grid
            # at every file boundary and shift the overview in time.
            # When every boundary falls ON the segment grid, the per-file
            # C++ fast path still produces the global grid.
            infos = self.data._infos
            aligned = (self.data.unwrap_thresh <= 1e-3
                       and all(i[4] is not None for i in infos)
                       and all(i[2] % step == 0 for i in infos[:-1]))
            if aligned:
                row = 0
                for k, path in enumerate(self.data.file_paths):
                    info = infos[k]
                    part = native.file_minmax(path, info[4], info[3],
                                              info[1], info[2], step)
                    if part is None:
                        part = self._compute_python(k, step)
                    n = min(len(part), len(out) - row)
                    out[row : row + n] = part[:n]
                    row += n
            else:
                frames = self.data.frames
                nblock = max(step, (1 << 20) // step * step)
                for start in range(0, frames, nblock):
                    n = min(nblock, frames - start)
                    buf = self.data._read_direct(start, n)
                    seg = _interleaved_minmax(buf, step)
                    r = 2 * (start // step)
                    out[r : r + len(seg)] = seg
        # persist as soon as the computation finishes so the NEXT session
        # loads instead of recomputing (the reference saves from its GUI
        # poll, `src/audian/fulltraceplot.py:182` — headless/batch runs
        # here have no poll, so the worker saves directly)
        try:
            self.save_data()
        except Exception:
            pass

    def _compute_python(self, k, step):
        """Fallback: block-strided numpy reduction over one file."""
        info = self.data._infos[k]
        frames = info[2]
        nseg = -(-frames // step)
        out = np.zeros((2 * nseg, info[1]))
        nblock = max(step, (1 << 20) // step * step)
        for start in range(0, frames, nblock):
            n = min(nblock, frames - start)
            buf = wavio.read_frames(self.data.file_paths[k], start, n, info)
            if self.data.unwrap_thresh > 1e-3:
                buf = wavio.unwrap(buf, self.data.unwrap_thresh,
                                   self.data.unwrap_clips,
                                   self.data.ampl_max)
            seg = _interleaved_minmax(buf, step)
            out[2 * (start // step) : 2 * (start // step) + len(seg)] = seg
        return out

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def is_busy(self):
        return self._thread is not None and self._thread.is_alive()

    # -- persistence -----------------------------------------------------------

    @staticmethod
    def _encode_rate(rate):
        rate *= 1e6
        while rate > 2 ** 31:
            rate /= 1e3
        return rate

    def _local_path(self):
        fp = Path(self.data.filepath)
        return fp.with_name(fp.stem + "-fulltrace.wav")

    def save_data_local(self):
        """Persist next to the data file
        (`src/audian/compresseddata.py:147-155`)."""
        if self.short_data or self.datas is None:
            return None
        rate = 1.0 / (self.times[1] - self.times[0])
        path = self._local_path()
        wavio.write_audio(path, self.datas, self._encode_rate(rate),
                          encoding="DOUBLE")
        return path

    def save_data(self):
        """Persist into the JSON-indexed LRU user cache
        (`src/audian/compresseddata.py:157-202`)."""
        if self.short_data or self.datas is None:
            return None
        cache = Path(audian_dirs.user_cache_path)
        cache.mkdir(parents=True, exist_ok=True)
        index_path = cache / self.fulltraces_file
        files = {}
        if index_path.exists():
            files = _read_index(index_path)
        first = os.fspath(Path(self.data.file_paths[0]).absolute())
        last = os.fspath(Path(self.data.file_paths[-1]).absolute())
        # re-saving the same recording updates its entry in place
        name = next((n for n, p in files.items()
                     if p["first"] == first and p["last"] == last), None)
        if name is None:
            for k in range(1, self.max_files + 10):
                name = f"{k:08X}-fulltrace.wav"
                if name not in files:
                    break
        ts = datetime.now().isoformat()
        rate = 1.0 / (self.times[1] - self.times[0])
        files[name] = dict(
            first=first, last=last, rate=rate,
            created=files.get(name, {}).get("created", ts), used=ts,
        )
        # LRU eviction by the `used` stamp
        if len(files) > self.max_files:
            order = sorted(files, key=lambda f: files[f]["used"])
            for f in order[: len(files) - self.max_files]:
                try:
                    (cache / f).unlink()
                except OSError:
                    pass
                files.pop(f)
        # artifact first, atomically (temp + rename), THEN the index —
        # this save can run on a daemon thread that interpreter shutdown
        # kills mid-write, and an indexed truncated WAV would poison
        # every later open of this recording
        tmp = cache / (name + ".tmp")
        wavio.write_audio(tmp, self.datas, self._encode_rate(rate),
                          encoding="DOUBLE")
        os.replace(tmp, cache / name)
        _write_index(index_path, files)
        return cache / name

    def load_data(self):
        """Cache lookup: local ``-fulltrace.wav`` first, then the user
        cache (stale entries evicted, ``used`` stamp refreshed) —
        `src/audian/compresseddata.py:204-248`."""
        self.times = None
        self.datas = None
        local = self._local_path()
        if local.exists():
            datas, rate = wavio.load_audio(local)
            rates = np.array([rate / 1e6, rate / 1e3, rate])
            durations = len(datas) / rates
            rate = rates[np.argmin(
                np.abs(durations - self.data.frames / self.data.rate))]
            self.datas = datas
            self.times = np.arange(len(datas)) / rate
            return True
        cache = Path(audian_dirs.user_cache_path)
        index_path = cache / self.fulltraces_file
        if not index_path.exists():
            return False
        files = _read_index(index_path)
        first = os.fspath(Path(self.data.file_paths[0]).absolute())
        last = os.fspath(Path(self.data.file_paths[-1]).absolute())
        for name, props in list(files.items()):
            if props["first"] == first and props["last"] == last:
                fpath = cache / name
                try:
                    datas, _ = wavio.load_audio(fpath)
                except (OSError, ValueError):
                    datas = None  # missing/corrupt artifact -> evict
                if datas is None or len(datas) == 0:
                    del files[name]
                    try:
                        fpath.unlink()
                    except OSError:
                        pass
                    _write_index(index_path, files)
                    return False
                self.datas = datas
                self.times = np.arange(len(datas)) / props["rate"]
                props["used"] = datetime.now().isoformat()
                _write_index(index_path, files)
                return True
        return False


def _interleaved_minmax(buf, step):
    n = len(buf)
    nseg = -(-n // step)
    pad = nseg * step - n
    if pad:
        mn = np.pad(buf, [(0, pad)] + [(0, 0)] * (buf.ndim - 1),
                    constant_values=np.inf)
        mx = np.pad(buf, [(0, pad)] + [(0, 0)] * (buf.ndim - 1),
                    constant_values=-np.inf)
    else:
        mn = mx = buf
    shape = (nseg, step) + buf.shape[1:]
    out = np.empty((2 * nseg,) + buf.shape[1:])
    out[0::2] = mn.reshape(shape).min(axis=1)
    out[1::2] = mx.reshape(shape).max(axis=1)
    return out
