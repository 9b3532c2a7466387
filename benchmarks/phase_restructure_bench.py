"""Microbenchmark: in-kernel phase-major restructure options on TPU.

The in-kernel IFIR envelope needs ``u (C, T) -> u_pm (C*M, T/M)`` where
``u_pm[c*M + m, q] = u[c, m + M*q]`` (and the inverse afterwards).  Two
candidate lowerings inside a Pallas kernel:

  a. reshape + transpose (lets Mosaic pick the relayout)
  b. lane-selection matmuls: for each output 128-lane block, 8 matmuls
     against 0/1 selection matrices (exact in one DEFAULT pass per
     source block because one operand of every product is 1.0)

plus a no-op baseline kernel (same DMA, no restructure) to isolate the
restructure cost.  Run on the real chip:

    python benchmarks/phase_restructure_bench.py
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import audian_tpu

C = 16
M = 8
N = 8192          # per-program samples, like the chain kernel
NPROG = 512       # programs per call -> 4M samples, chain-like
RATE = 96000.0


def _selection_mats():
    """S[b][i, o] = 1 where natural sample b*128+i lands at pm lane o.

    Output lane o = m*(128//M) + k maps natural sample m + M*k of the
    1024-sample group; source block b holds samples b*128 .. b*128+127.
    """
    mats = []
    for b in range(M):
        S = np.zeros((128, 128), np.float32)
        for o in range(128):
            m, k = divmod(o, 128 // M)
            t = m + M * k  # natural index within this phase group row
            # here each output block gathers from ONE source block only
            # if we define groups of 128 pm lanes per (phase-contiguous)
            # slice; cross-block gather handled by summing over b
            tt = t - b * 128
            if 0 <= tt < 128:
                S[tt, o] = 1.0
        mats.append(jnp.asarray(S))
    return mats


def k_base(xr, yr):
    yr[:, :] = xr[:, :] + 1.0


def k_reshape(xr, yr):
    x = xr[:, :]
    u = x.reshape(C, N // M, M).transpose(0, 2, 1).reshape(C * M, N // M)
    u = u + 1.0
    back = u.reshape(C, M, N // M).transpose(0, 2, 1).reshape(C, N)
    yr[:, :] = back


def k_matmul(xr, yr, *, mats):
    x = xr[:, :]
    # groups of 1024 natural samples -> 128 pm lanes per phase row set;
    # treat each group as (C, 8, 128) and emit (C, 8, 128) pm blocks
    G = N // (128 * M)  # groups per program
    xg = x.reshape(C * G * M, 128)
    acc = None
    for b in range(M):
        # shift source blocks by b within each group: roll rows
        xs = x.reshape(C, G, M * 128)[:, :, b * 128 : (b + 1) * 128]
        xs = xs.reshape(C * G, 128)
        t = lax.dot_general(
            xs, mats[b],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.DEFAULT,
        )
        acc = t if acc is None else acc + t
    u = acc + 1.0  # (C*G, 128) pm-ish layout (not full pm rows, but the
    # same data movement cost class: every element crossed the MXU)
    yr[:, :] = u.reshape(C, N)
    _ = xg


def run(kernel, name, x, **kw):
    f = pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(NPROG,),
        in_specs=[pl.BlockSpec((C, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, NPROG * N), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    g = jax.jit(lambda a: jnp.sum(f(a)[:, ::1024]))
    try:
        _ = np.asarray(g(x))
    except Exception as exc:
        print(f"{name:24s} FAILED: {type(exc).__name__}: "
              f"{str(exc).splitlines()[0][:120]}", flush=True)
        return None
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        out = g(x)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    per_prog = dt / NPROG * 1e6
    per_hour = dt * 3600 * RATE / (NPROG * N)
    print(f"{name:24s} {dt*1e3:8.2f} ms/call  {per_prog:6.2f} us/prog"
          f"  {per_hour:6.3f} s/h-equiv", flush=True)
    return per_prog


def main():
    audian_tpu.enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (C, NPROG * N), jnp.float32)
    _ = np.asarray(x[0, 0])
    mats = _selection_mats()
    run(k_base, "baseline (DMA only)", x)
    run(k_reshape, "reshape+transpose x2", x)
    run(k_matmul, "selection matmuls x8", x, mats=mats)
    run(k_base, "baseline again", x)


if __name__ == "__main__":
    main()
