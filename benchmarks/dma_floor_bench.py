"""Microbenchmark: where does the chain kernel's DMA floor come from?

benchmarks/phase_restructure_bench.py measured a no-compute kernel
(512 KB in + 512 KB out per program) at ~8.4 us/program = ~125 GB/s
effective — far below HBM spec.  This script isolates the candidates:

  * per-program fixed overhead vs bandwidth (sweep N for a pure copy)
  * lane-misaligned PSD output: (F, C, 129) vs (F, C, 128) vs (F, C, 256)
  * the full chain output set (y, e, psd, stats) with no compute
  * program-major (contiguous-block) input layout vs channel-major rows

Run on the real chip:

    python benchmarks/dma_floor_bench.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import audian_tpu

C = 16
RATE = 96000.0
TOTAL = 1 << 22  # samples per call, chain-like


def timed(g, x, label, total_samples):
    try:
        _ = np.asarray(g(x))
    except Exception as exc:
        print(f"{label:44s} FAILED: {type(exc).__name__}: "
              f"{str(exc).splitlines()[0][:100]}", flush=True)
        return
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        out = g(x)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    per_hour = dt * 3600 * RATE / total_samples
    print(f"{label:44s} {dt*1e3:8.2f} ms/call  {per_hour:6.3f} s/h-equiv",
          flush=True)


def copy_kernel(xr, yr):
    yr[:, :] = xr[:, :] + 1.0


def run_copy(x, N, label):
    nprog = TOTAL // N
    f = pl.pallas_call(
        copy_kernel,
        grid=(nprog,),
        in_specs=[pl.BlockSpec((C, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, TOTAL), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    g = jax.jit(lambda a: jnp.sum(f(a)[:, ::1024]))
    timed(g, x, label, TOTAL)


def copy_pm_kernel(xr, yr):
    yr[0] = xr[0] + 1.0


def run_copy_pm(xpm, N, label):
    nprog = TOTAL // N
    f = pl.pallas_call(
        copy_pm_kernel,
        grid=(nprog,),
        in_specs=[pl.BlockSpec((1, C, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nprog, C, N), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    g = jax.jit(lambda a: jnp.sum(f(a)[:, :, ::1024]))
    timed(g, xpm, label, TOTAL)


def outputs_kernel(xr, yo, eo, so, po, go, qo):
    x = xr[:, :]
    yo[:, :] = x + 1.0
    eo[:, :] = x + 2.0
    so[0] = jnp.zeros(so.shape[1:], jnp.float32) + x[0, 0]
    po[0, 0, :] = x[:, 0]
    go[0, 0, :] = x[:, 1]
    qo[0] = jnp.zeros(qo.shape[1:], jnp.float32) + x[0, 2]


def run_outputs(x, N, nbins, label):
    nprog = TOTAL // N
    F = N // 128
    outs = [
        pl.BlockSpec((C, N), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, N), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F, C, nbins), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, nbins), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    shapes = [
        jax.ShapeDtypeStruct((C, TOTAL), jnp.float32),
        jax.ShapeDtypeStruct((C, TOTAL), jnp.float32),
        jax.ShapeDtypeStruct((nprog, F, C, nbins), jnp.float32),
        jax.ShapeDtypeStruct((nprog, 1, C), jnp.float32),
        jax.ShapeDtypeStruct((nprog, 1, C), jnp.float32),
        jax.ShapeDtypeStruct((nprog, C, nbins), jnp.float32),
    ]
    f = pl.pallas_call(
        outputs_kernel,
        grid=(nprog,),
        in_specs=[pl.BlockSpec((C, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=outs,
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
        interpret=jax.default_backend() != "tpu",
    )
    g = jax.jit(lambda a: jnp.sum(f(a)[0][:, ::1024]))
    timed(g, x, label, TOTAL)


def main():
    audian_tpu.enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (C, TOTAL), jnp.float32)
    _ = np.asarray(x[0, 0])

    print("-- pure copy, channel-major rows, N sweep --", flush=True)
    for N in (4096, 8192, 16384, 32768, 65536):
        run_copy(x, N, f"copy rows N={N}")

    print("-- pure copy, program-major contiguous blocks --", flush=True)
    for N in (8192, 32768):
        nprog = TOTAL // N
        xpm = x.reshape(C, nprog, N).transpose(1, 0, 2)
        xpm = jax.device_put(jnp.asarray(np.asarray(xpm)))
        _ = np.asarray(xpm[0, 0, 0])
        run_copy_pm(xpm, N, f"copy contiguous N={N}")

    print("-- chain output set (no compute), N=8192 --", flush=True)
    run_outputs(x, 8192, 129, "y+e+psd(129)+stats")
    run_outputs(x, 8192, 128, "y+e+psd(128)+stats")
    run_outputs(x, 8192, 256, "y+e+psd(256)+stats")

    print("-- drift check --", flush=True)
    run_copy(x, 8192, "copy rows N=8192 again")


if __name__ == "__main__":
    main()
