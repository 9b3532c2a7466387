"""Block-size sweep of the single-pass fused chain kernel.

The stage ablations (benchmarks/chain_ablate.py) show an ~8 us/program
floor that is neither MXU passes nor bank-block count (DMA + concat +
grid overhead).  If part of that floor is fixed per grid program,
raising ``block_frames`` (N = 128*block_frames) amortizes it and also
shrinks the halo read amplification (Hx/N).  Run on the real chip:

    python benchmarks/chain_block_sweep.py

Result (2026-08-18, v5e): block_frames=64 is already optimal —
64: 1.007 s/h, 128: 1.029, 192: 1.285, 256: 1.090.  The halo-read
saving at larger N is fully offset by worse VMEM residency / DMA
pipelining, so the per-program floor is NOT amortizable this way.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import audian_tpu
from audian_tpu.ops.pallas.chain import FusedChainKernel

RATE = 96000.0
CHANNELS = 16
CHUNK = 1 << 22
NCHUNKS = 16


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
    _ = np.asarray(fn(chunks[0])[0])
    t0 = time.perf_counter()
    out = None
    for i in range(NCHUNKS):
        out = fn(chunks[i % len(chunks)])
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0
    per_hour = dt * (3600 * RATE / CHUNK) / NCHUNKS
    print(f"{label:40s} {dt:7.3f} s/{NCHUNKS}  -> {per_hour:6.3f} s/h",
          flush=True)
    return per_hour


def main():
    audian_tpu.enable_compilation_cache()
    from audian_tpu.models import get_preset

    fused = get_preset("bioacoustics").fused(RATE, eps=2e-6)
    base = fused.chain_kernel
    chunks = make_chunks(base.hb, base.ha + 512 * 128)

    results = {}
    for bf in (64, 128, 192, 256):
        try:
            ck = FusedChainKernel(
                RATE, fused._h_filt, fused._g_env, fused.env_delay,
                np.asarray(fused.spec_w), fused.nbins,
                env_clamp=fused.env_clamp, nfft=fused.nfft,
                block_frames=bf)
        except ValueError as exc:
            print(f"block_frames={bf}: {exc}")
            continue

        def fn(ext, ck=ck):
            _y, _e, _s, st = ck(ext[:, : ck.hb + CHUNK + ck.ha], CHUNK,
                                stats=True)
            return st["power"], st["env_sum"], st["psd_sum"]

        label = (f"block_frames={bf} (N={ck.N} Hx={ck.Hx} "
                 f"amp={1 + ck.Hx / ck.N:.3f})")
        results[bf] = time_fn(fn, chunks, label)
    # drift check
    bf0 = sorted(results)[0]
    ck = FusedChainKernel(
        RATE, fused._h_filt, fused._g_env, fused.env_delay,
        np.asarray(fused.spec_w), fused.nbins,
        env_clamp=fused.env_clamp, nfft=fused.nfft, block_frames=bf0)

    def fn(ext, ck=ck):
        _y, _e, _s, st = ck(ext[:, : ck.hb + CHUNK + ck.ha], CHUNK,
                            stats=True)
        return st["power"], st["env_sum"], st["psd_sum"]

    time_fn(fn, chunks, f"block_frames={bf0} again (drift check)")


if __name__ == "__main__":
    main()
