"""Sweep the batch chunk size of the fused chain (per-call overhead).

benchmarks/call_scaling_bench.py showed a ~4.3 ms FIXED per-call cost on
the tunneled runtime with near-spec marginal HBM bandwidth behind it —
so the headline's 83 x 4M-sample chunk calls pay ~0.36 s of pure call
overhead.  Sweep CHUNK to find the memory-feasible optimum:

    python benchmarks/chunk_size_sweep.py
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
HOURS = 1.0


def main():
    audian_tpu.enable_compilation_cache()
    from audian_tpu.models import get_preset

    fused = get_preset("bioacoustics").fused(RATE, eps=2e-6)
    ck = fused.chain_kernel
    hb, ha = ck.hb, ck.ha
    total_frames = int(HOURS * 3600 * RATE)

    for p in (22, 23, 24):
        chunk = 1 << p
        nchunks = -(-total_frames // chunk)

        @jax.jit
        def make_chunk(seed, chunk=chunk):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
            shape = (CHANNELS, hb + chunk + ha)
            t = (jnp.arange(shape[1], dtype=jnp.float32) / RATE)[None, :]
            tone = jnp.sin(2 * jnp.pi * 30000.0 * t) * (
                jnp.sin(2 * jnp.pi * 5.0 * t) > 0)
            return (0.5 * tone + 0.05 * jax.random.normal(key, shape)
                    ).astype(jnp.float32)

        @jax.jit
        def chain(ext, chunk=chunk):
            _y, _e, _s, st = fused.chain_cf(ext, chunk, stats=True)
            return st["power"], st["env_sum"], st["psd_sum"]

        try:
            nbuf = 2
            chunks = [make_chunk(i) for i in range(nbuf)]
            _ = [np.asarray(c[0, 0]) for c in chunks]
            _ = np.asarray(chain(chunks[0])[0])
            t0 = time.perf_counter()
            out = None
            for i in range(nchunks):
                out = chain(chunks[i % nbuf])
            _ = np.asarray(out[0])
            dt = time.perf_counter() - t0
            print(f"CHUNK=2^{p} ({chunk / RATE:6.1f} s audio, "
                  f"{nchunks:3d} calls): {dt:6.3f} s/h", flush=True)
        except Exception as exc:
            print(f"CHUNK=2^{p} FAILED: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
