"""Batch song-detection envelope: fused decimating path vs the unfused
chunk program (device compute, device-resident chunks — the tunneled
host link would otherwise dominate; see docs/performance.md).

The workload is detect()'s front half over 1 h x 16 ch x 96 kHz with the
default config (1-10 kHz band, 500 Hz envelope cutoff -> step 19):
per chunk, the unfused path materializes every full-rate intermediate in
HBM (forward+backward filter, squared stream, smoothed envelope) before
a strided gather keeps 1 sample in 19; the fused path
(audian_tpu.ops.envdet.EnvDet) writes only the filtered stream once and
the decimated envelope.

Run: python benchmarks/detect_bench.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

import scipy.signal as sps

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audian_tpu.ops import FilterDesign
from audian_tpu.analysis import events

RATE = 96000.0
CHANNELS = 16
HOURS = 1.0
HP, LP, ENVF = 1000.0, 10000.0, 500.0


def setup():
    fdesign = FilterDesign.from_sos(
        sps.butter(1, (HP, LP), "bandpass", fs=RATE, output="sos"))
    edesign = FilterDesign.from_sos(
        sps.butter(1, ENVF, "lowpass", fs=RATE, output="sos"))
    step = int(np.round(RATE / min(ENVF * 10, RATE)))
    halo = int(fdesign.fir.length + edesign.fir.length
               + fdesign.padlen + edesign.padlen)
    halo = 1 << max(halo - 1, 2047).bit_length()
    return fdesign, edesign, step, halo


def chunks_int16(W, n=3):
    @jax.jit
    def make(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        t = (jnp.arange(W, dtype=jnp.float32) / RATE)[:, None]
        tone = jnp.sin(2 * jnp.pi * 6500.0 * t) * (
            jnp.sin(2 * jnp.pi * 1.0 * t) > 0)
        x = 0.4 * tone + 0.05 * jax.random.normal(key, (W, CHANNELS))
        return jnp.clip(jnp.round(x * 32768.0), -32768, 32767
                        ).astype(jnp.int16)

    out = [make(i) for i in range(n)]
    _ = [np.asarray(c[0, 0]) for c in out]
    return out


def bench(fn, chunks, nchunks, reps=3):
    _ = np.asarray(fn(chunks[0]))  # compile
    best = float("inf")
    for _rep in range(reps):
        t0 = time.perf_counter()
        out = None
        for i in range(nchunks):
            out = fn(chunks[i % len(chunks)])
        _ = np.asarray(out)  # fences the in-order queue
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import audian_tpu
    audian_tpu.enable_compilation_cache()

    fdesign, edesign, step, halo = setup()
    Lc = events._CHUNK
    W = Lc + 2 * halo
    total = int(HOURS * 3600 * RATE)
    chunks = chunks_int16(W)

    made = events._make_envdet(fdesign, edesign, step, halo)
    assert made is not None, "detect geometry not coverable by the fused path"
    envdet, chunk_f = made
    nchunks = -(-total // chunk_f)
    print(f"chunk W={W} step={step} halo={halo} nchunks={nchunks} "
          f"kernel={type(envdet).__name__}")

    def fused(xw):
        return jnp.sum(envdet(xw, halo))

    @jax.jit
    def unfused(xw):
        _y, env = events._band_env_device(fdesign, edesign, xw)
        return jnp.sum(events._strided_at(env, 0, step))

    t_unfused = bench(unfused, chunks, nchunks)
    print(f"unfused: {t_unfused:.3f} s "
          f"({total / RATE / t_unfused:.0f}x real time)")
    t_fused = bench(fused, chunks, nchunks)
    print(f"fused:   {t_fused:.3f} s "
          f"({total / RATE / t_fused:.0f}x real time)")
    print(f"speedup: {t_unfused / t_fused:.2f}x")


if __name__ == "__main__":
    main()
