"""Micro-benchmarks of the framework's hot strategies.

The reference embeds a min/max-decimation micro-benchmark with recorded
timings (`src/audian/traceitem.py:107-246`, quoted in BASELINE.md); this
is its counterpart across the rebuilt stack: decimation (numpy reduceat vs
C++ vs device tile), IIR strategies (associative scan vs Toeplitz matmul
vs Pallas kernel), and spectrogram paths (VPU FFT vs MXU DFT matmul).

Run on the target hardware:  python benchmarks/microbench.py
Timing is fenced by pulling a small result to the host (this backend's
``block_until_ready`` does not block).
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(fn, *args, repeat=10):
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(repeat):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / repeat


def main():
    import audian_tpu
    audian_tpu.enable_compilation_cache()
    from audian_tpu import native
    from audian_tpu.ops import (design_filter, fir_kernels, sosfilt,
                                sosfilt_fir, spectrogram, hann_window)
    from audian_tpu.ops.minmax import reduceat_like
    from audian_tpu.ops.pallas.window_matmul import window_matmul
    from audian_tpu.view.render import _minmax_tile

    rows = []
    rng = np.random.default_rng(0)

    # --- min/max decimation: 1M samples to 1000 segments -------------------
    x = rng.standard_normal((1 << 20, 2)).astype(np.float32)
    step = len(x) // 1000
    t = timeit(lambda: reduceat_like(x, step), repeat=20)
    rows.append(("minmax 1M x2ch numpy reduceat (host)", t))
    if native.available():
        t = timeit(lambda: native.minmax(x, step), repeat=20)
        rows.append(("minmax 1M x2ch C++ (host)", t))
    xd = jax.device_put(x)
    t = timeit(lambda: _minmax_tile(xd, 0, step, 1000), repeat=20)
    rows.append(("minmax 1M x2ch device tile", t))

    # --- IIR strategies: 10 s x 8 ch @ 96 kHz bandpass ----------------------
    rate = 96000.0
    sos = design_filter(rate, 2000.0, 40000.0)
    k = fir_kernels(sos, eps=1e-7)
    y = rng.standard_normal((int(10 * rate), 8)).astype(np.float32)
    yd = jax.device_put(y)
    scan = jax.jit(lambda v: jnp.sum(sosfilt(jnp.asarray(sos), v) ** 2))
    t = timeit(scan, yd)
    rows.append(("sosfilt 10s x8ch assoc-scan (device)", t))
    fir = jax.jit(lambda v: jnp.sum(
        sosfilt_fir(k, v, return_zf=False) ** 2))
    t = timeit(fir, yd)
    rows.append(("sosfilt 10s x8ch Toeplitz matmul (device)", t))
    from audian_tpu.ops.sos import _toeplitz_bank
    W = jnp.asarray(_toeplitz_bank(jnp.asarray(k.h, jnp.float32), 128).T)
    ycf = jax.device_put(np.ascontiguousarray(y.T))
    pallas = jax.jit(lambda v: jnp.sum(window_matmul(
        jnp.pad(v, [(0, 0), (k.length - 1, 0)]), W, 128,
        v.shape[1] // 128, out_layout="cf") ** 2))
    t = timeit(pallas, ycf)
    rows.append(("sosfilt 10s x8ch Pallas window-matmul (device)", t))

    # --- spectrogram paths ---------------------------------------------------
    win = hann_window(256)
    fft = jax.jit(lambda v: jnp.sum(spectrogram(v, rate, 256, 128,
                                                window=win, method="fft")))
    t = timeit(fft, yd)
    rows.append(("spectrogram NFFT256 rfft/VPU (device)", t))
    mm = jax.jit(lambda v: jnp.sum(spectrogram(v, rate, 256, 128,
                                               window=win, method="matmul")))
    t = timeit(mm, yd)
    rows.append(("spectrogram NFFT256 DFT-matmul/MXU (device)", t))

    # --- single-pass fused chain (filter -> {envelope, PSD}) ------------------
    from audian_tpu.ops import design_envelope_filter
    from audian_tpu.ops.fused import FusedChainCF

    fused = FusedChainCF(rate, filt_sos=sos,
                         env_sos=design_envelope_filter(rate, 500.0),
                         nfft=256, hop=128, eps=2e-6)
    ck = fused.chain_kernel
    n = ycf.shape[1] // 128 * 128
    ext = jnp.pad(ycf[:, :n], [(0, 0), (ck.hb, ck.ha)])
    stages = jax.jit(lambda v: sum(
        jnp.sum(a) for a in (fused.filtered_cf(v),
                             fused.envelope_cf(fused.filtered_cf(v)),
                             fused.spectrogram_fc(fused.filtered_cf(v)))))
    t = timeit(stages, ycf[:, :n])
    rows.append(("full chain 10s x8ch per-stage Pallas (device)", t))
    single = jax.jit(lambda v: sum(jnp.sum(a)
                                   for a in fused.chain_cf(v, n)))
    t = timeit(single, ext)
    rows.append(("full chain 10s x8ch single-pass kernel (device)", t))

    width = max(len(r[0]) for r in rows)
    print(f"# device: {jax.devices()[0]}")
    for name, t in rows:
        print(f"{name:<{width}}  {t * 1e3:9.3f} ms")


if __name__ == "__main__":
    main()
