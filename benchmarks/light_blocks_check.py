"""Validate + time the per-block light-precision assignment on device.

Compares the production kernel (light blocks at 1-pass DEFAULT) against
an all-full variant (every active block at the stage precision) and an
all-HIGHEST oracle, on the headline design:

    python benchmarks/light_blocks_check.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import audian_tpu
from audian_tpu.ops.pallas.chain import _chain_call

RATE = 96000.0
CHANNELS = 16
CHUNK = 1 << 22
NCHUNKS = 16


def main():
    audian_tpu.enable_compilation_cache()
    from audian_tpu.models import get_preset

    fused = get_preset("bioacoustics").fused(RATE, eps=2e-6)
    ck = fused.chain_kernel
    print(f"act_f={ck.act_f}")
    print(f"act_e={ck.act_e}")

    @jax.jit
    def make_chunk(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        shape = (CHANNELS, ck.hb + CHUNK + ck.ha)
        t = (jnp.arange(shape[1], dtype=jnp.float32) / RATE)[None, :]
        tone = jnp.sin(2 * jnp.pi * 30000.0 * t) * (
            jnp.sin(2 * jnp.pi * 5.0 * t) > 0)
        return (0.5 * tone + 0.05 * jax.random.normal(key, shape)
                ).astype(jnp.float32)

    chunks = [make_chunk(i) for i in range(4)]
    _ = [np.asarray(c[0, 0]) for c in chunks]

    H = lax.Precision.HIGHEST

    def run(precision, act_f, act_e, ext):
        return _chain_call(ext, ck.wf, ck.we, ck.ws, CHUNK, ck.N, ck.hb,
                           ck.Hx, ck.gy, ck.lead, ck.offe, ck.nbins,
                           ck.env_clamp, precision, act_f, act_e, False)

    all_full_f = tuple((kb, True) for kb, _ in ck.act_f)
    all_full_e = tuple((kb, True) for kb, _ in ck.act_e)

    # accuracy vs all-HIGHEST all-full oracle on one chunk
    yo, eo, so = run((H, H, H), all_full_f, all_full_e, chunks[0])
    yn, en, sn = run(ck.precision, ck.act_f, ck.act_e, chunks[0])
    dy = float(jnp.max(jnp.abs(yn - yo)))
    de = float(jnp.max(jnp.abs(en - eo)))
    ref = 10 * jnp.log10(jnp.maximum(so, 1e-30))
    new = 10 * jnp.log10(jnp.maximum(sn, 1e-30))
    mask = so > float(jnp.max(so)) * 1e-6  # within 60 dB of peak
    ddb = float(jnp.max(jnp.where(mask, jnp.abs(new - ref), 0.0)))
    print(f"filter max |err| = {dy:.3e}  (budget 1e-5)")
    print(f"envelope max |err| = {de:.3e}  (budget 1e-5)")
    print(f"PSD max |err| (<=60 dB down) = {ddb:.4f} dB")

    def timeit(act_f, act_e, label):
        fn = lambda ext: run(ck.precision, act_f, act_e, ext)
        _ = np.asarray(fn(chunks[0])[0][0, 0])
        t0 = time.perf_counter()
        out = None
        for i in range(NCHUNKS):
            out = fn(chunks[i % len(chunks)])
        _ = np.asarray(out[0][0, 0])
        dt = time.perf_counter() - t0
        per_hour = dt * (3600 * RATE / CHUNK) / NCHUNKS
        print(f"{label:32s} {per_hour:6.3f} s/h", flush=True)
        return per_hour

    timeit(all_full_f, all_full_e, "all-full (old behavior)")
    timeit(ck.act_f, ck.act_e, "light blocks (new)")
    timeit(all_full_f, all_full_e, "all-full again (drift check)")
    timeit(ck.act_f, ck.act_e, "light blocks again")


if __name__ == "__main__":
    main()
