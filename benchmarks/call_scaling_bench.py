"""Does Pallas/XLA HBM throughput scale with call size on this chip?

benchmarks/dma_floor_bench.py showed ~4.4-5.6 ms per 4M-sample call
(~115 GB/s combined) independent of grid block size, block layout, and
even output traffic (1 MB vs 2.2 MB per program cost the same).  Two
hypotheses: (a) a genuine ~115 GB/s effective HBM wall, (b) a fixed
per-call cost (dispatch/fence over the tunneled runtime) dominating
4M-sample calls.  Distinguish them by sweeping the per-call sample count
for a pure Pallas copy and a plain XLA copy:

    python benchmarks/call_scaling_bench.py
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
N = 8192
RATE = 96000.0


def timed(g, x, label, total):
    _ = np.asarray(g(x))
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(x)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    bw = 2 * C * total * 4 / dt / 1e9
    per_hour = dt * 3600 * RATE / total
    print(f"{label:36s} {dt*1e3:8.2f} ms/call  {bw:6.1f} GB/s r+w"
          f"  {per_hour:6.3f} s/h-equiv", flush=True)


def copy_kernel(xr, yr):
    yr[:, :] = xr[:, :] + 1.0


def run_pallas(x, total, label):
    f = pl.pallas_call(
        copy_kernel,
        grid=(total // N,),
        in_specs=[pl.BlockSpec((C, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, total), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    g = jax.jit(lambda a: jnp.sum(f(a)[:, ::1024]))
    timed(g, x, label, total)


def run_xla(x, total, label):
    # optimization_barrier forces the copy to materialize: without it
    # XLA fuses the add into the strided-slice consumer and the "copy"
    # reads ~1/1024 of the elements and writes nothing
    def body(a):
        y = jax.lax.optimization_barrier(a + 1.0)
        return jnp.sum(y[:, ::1024])

    timed(jax.jit(body), x, label, total)


def main():
    audian_tpu.enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    for p in (20, 21, 22, 23, 24):
        total = 1 << p
        x = jax.random.normal(key, (C, total), jnp.float32)
        _ = np.asarray(x[0, 0])
        run_pallas(x, total, f"pallas copy 2^{p} ({C*total*4>>20} MB in)")
        run_xla(x, total, f"xla    copy 2^{p}")


if __name__ == "__main__":
    main()
