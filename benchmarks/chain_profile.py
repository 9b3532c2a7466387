"""Decompose the headline fused-chain wall time on the real TPU.

Times the production kernel and ablated variants (outputs dropped one at
a time, different block sizes) to locate the bottleneck: MXU passes vs
HBM writes vs the lane-misaligned PSD output.  Run on the real chip:

    python benchmarks/chain_profile.py

Each variant prints one line; the baseline repeats first/last to expose
tunnel drift.  Not part of the test suite.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import audian_tpu

RATE = 96000.0
CHANNELS = 16
CHUNK = 1 << 22
NCHUNKS = 16  # ~12 min of audio per timed run; scale results to 1 h


def make_chunks(hb, ha, n=4):
    @jax.jit
    def make_chunk(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        shape = (CHANNELS, hb + CHUNK + ha)
        t = (jnp.arange(shape[1], dtype=jnp.float32) / RATE)[None, :]
        tone = jnp.sin(2 * jnp.pi * 30000.0 * t) * (
            jnp.sin(2 * jnp.pi * 5.0 * t) > 0)
        return (0.5 * tone + 0.05 * jax.random.normal(key, shape)
                ).astype(jnp.float32)

    chunks = [make_chunk(i) for i in range(n)]
    _ = [np.asarray(c[0, 0]) for c in chunks]
    return chunks


def time_fn(fn, chunks, label):
    _ = np.asarray(fn(chunks[0])[0])  # compile + warm
    t0 = time.perf_counter()
    out = None
    for i in range(NCHUNKS):
        out = fn(chunks[i % len(chunks)])
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0
    per_hour = dt * (3600 * RATE / CHUNK) / NCHUNKS
    print(f"{label:44s} {dt:7.3f} s/{NCHUNKS} chunks  -> {per_hour:6.3f} s/h")
    return per_hour


def main():
    audian_tpu.enable_compilation_cache()
    from audian_tpu.models import get_preset

    fused = get_preset("bioacoustics").fused(RATE, eps=2e-6)
    ck = fused.chain_kernel
    print(f"geometry: N={ck.N} hb={ck.hb} ha={ck.ha} Hx={ck.Hx} "
          f"act_f={len(ck.act_f)} act_e={len(ck.act_e)}")
    chunks = make_chunks(ck.hb, ck.ha)

    @jax.jit
    def full(ext):
        _y, _e, _s, st = fused.chain_cf(ext, CHUNK, stats=True)
        return st["power"], st["env_sum"], st["psd_sum"]

    time_fn(full, chunks, "baseline (full chain, stats)")

    # ablations: re-instantiate the kernel with stages knocked out by
    # zero-size consumers is not possible; instead time the per-stage
    # window_matmul path for comparison and a no-stats variant
    @jax.jit
    def full_nostats(ext):
        y, e, s = fused.chain_cf(ext, CHUNK, stats=False)
        return (jnp.sum(y[:, :8]),)

    time_fn(full_nostats, chunks, "no in-kernel stats")

    # per-stage (three-pass) path for the same chain
    @jax.jit
    def staged(ext):
        x = ext[:, ck.hb - fused.filt_halo : ck.hb + CHUNK]
        y = fused.filtered_cf(x)[:, fused.filt_halo :]
        e = fused.envelope_cf(y)
        s = fused.spectrogram_fc(y)
        return (jnp.sum(y * y, axis=1), jnp.sum(e, axis=1),
                jnp.sum(s, axis=0))

    time_fn(staged, chunks, "per-stage window_matmul path")

    # block size sweep on the single-pass kernel
    from audian_tpu.ops.pallas.chain import FusedChainKernel

    for bf in (32, 64, 128, 256):
        try:
            k = FusedChainKernel(RATE, fused._h_filt, fused._g_env,
                                 fused.env_delay, np.asarray(fused.spec_w),
                                 fused.nbins, block_frames=bf)
        except ValueError as e:
            print(f"block_frames={bf}: {e}")
            continue
        cks = make_chunks(k.hb, k.ha, n=2)

        def fn(ext, k=k):
            _y, _e, _s, st = k(ext, CHUNK, stats=True)
            return st["power"], st["env_sum"], st["psd_sum"]

        time_fn(jax.jit(fn), cks, f"block_frames={bf} "
                f"(N={k.N}, Hx={k.Hx})")

    time_fn(full, chunks, "baseline again (tunnel drift check)")


if __name__ == "__main__":
    main()
