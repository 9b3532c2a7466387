"""Host-side window prefetching.

The reference's responsiveness trick is the windowed raw buffer with
back-retention (`src/audian/data.py:17-18,168-174`); scrolling still
stalls on file I/O whenever the cursor leaves the buffer.  This scheduler
adds the layer SURVEY.md section 7 calls ``audian_tpu.stream``: aligned
raw blocks are cached in an LRU and the neighbors of every access are
read ahead on a background thread, so sequential scrolling always finds
the next window already in memory (double-buffered host -> device feed).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ["BlockPrefetcher"]


class BlockPrefetcher:
    """Aligned-block read cache with neighbor read-ahead over an
    :class:`audian_tpu.data.AudioLoader`-like source (needs ``_read``,
    ``frames``, ``channels``)."""

    def __init__(self, source, block_frames=1 << 20, max_blocks=16,
                 read_ahead=1):
        self.source = source
        self.block_frames = int(block_frames)
        self.max_blocks = int(max_blocks)
        self.read_ahead = int(read_ahead)
        self._cache = OrderedDict()  # block index -> np array
        self._lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="audian-prefetch")
        self._pending = set()
        self.hits = 0
        self.misses = 0

    # -- cache core ---------------------------------------------------------------

    def _load_block(self, b):
        with self._lock:
            if b in self._cache:
                self._cache.move_to_end(b)
                return self._cache[b]
        try:
            data = self.source._read(b * self.block_frames,
                                     self.block_frames)
        except Exception:
            # a failed background read must not leave the block marked
            # pending forever (that would disable its read-ahead)
            with self._lock:
                self._pending.discard(b)
            raise
        with self._lock:
            self._cache[b] = data
            self._cache.move_to_end(b)
            while len(self._cache) > self.max_blocks:
                self._cache.popitem(last=False)
            self._pending.discard(b)
        return data

    def _schedule(self, b):
        nblocks = -(-self.source.frames // self.block_frames)
        if not (0 <= b < nblocks):
            return
        with self._lock:
            if b in self._cache or b in self._pending:
                return
            self._pending.add(b)
        self._pool.submit(self._load_block, b)

    def read(self, start, nframes):
        """Read [start, start+nframes) through the cache, scheduling
        read-ahead of the neighboring blocks."""
        start = max(0, min(int(start), self.source.frames))
        nframes = max(0, min(int(nframes), self.source.frames - start))
        if nframes == 0:
            return np.zeros((0, self.source.channels), np.float32)
        b0 = start // self.block_frames
        b1 = (start + nframes - 1) // self.block_frames
        parts = []
        for b in range(b0, b1 + 1):
            with self._lock:
                cached = self._cache.get(b)
                if cached is not None:
                    self._cache.move_to_end(b)
            if cached is None:
                self.misses += 1
                cached = self._load_block(b)
            else:
                self.hits += 1
            parts.append(cached)
        for k in range(1, self.read_ahead + 1):
            self._schedule(b1 + k)
            self._schedule(b0 - k)
        whole = parts[0] if len(parts) == 1 else np.concatenate(parts)
        lo = start - b0 * self.block_frames
        return whole[lo : lo + nframes]

    def drain(self):
        """Wait for scheduled read-aheads (tests/shutdown)."""
        self._pool.shutdown(wait=True)
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="audian-prefetch")

    def close(self):
        self._pool.shutdown(wait=False)

    def cached_blocks(self):
        with self._lock:
            return sorted(self._cache)
