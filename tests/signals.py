"""Shared codec-test signal corpus.

One definition (the repo convention — see the round-3 dedup of the
impostor-header builder) used by the FFmpeg interop suite, the libFLAC
CLI suite, and the golden-asset generator, so a corpus tweak (e.g. a
transient exercising a new subframe type) cannot silently diverge
between what the suites validate.
"""

import numpy as np


def correlated_signal(rng, n, rate, channels, bits):
    """Correlated tonal + noise multichannel signal quantized at
    ``bits`` (LPC-friendly with a noisy floor, so CONSTANT / FIXED /
    LPC / VERBATIM subframes and the stereo decorrelations all get
    exercised)."""
    t = np.arange(n) / rate
    base = (0.45 * np.sin(2 * np.pi * 440.0 * t)
            + 0.12 * np.sin(2 * np.pi * 1873.0 * t)
            + 0.02 * rng.normal(size=n))
    chans = [(1.0 - 0.35 * c / max(channels - 1, 1)) * base
             + 0.01 * rng.normal(size=n) for c in range(channels)]
    scale = 1 << (bits - 1)
    q = np.clip(np.round(np.stack(chans, axis=1) * scale),
                -scale, scale - 1)
    return q.astype(np.int64)
