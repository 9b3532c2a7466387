"""Stage/precision ablations of the single-pass fused chain kernel.

Calls the kernel's jitted entry directly with altered static arguments
(precision triples, truncated active-block lists) to measure the MXU-pass
share of each stage — results are numerically WRONG for truncated
variants; timing only.  Run on the real chip:

    python benchmarks/chain_ablate.py
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
from audian_tpu.ops.pallas.chain import BF16X3, _chain_call

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
    # degenerate ablation combos can crash Mosaic's remote compile
    # (observed: the all-ablated "floor" variant SIGABRTs tpu_compile);
    # keep the sweep alive and report the failure instead
    try:
        return _time_fn(fn, chunks, label)
    except Exception as exc:  # noqa: BLE001 - timing harness only
        print(f"{label:52s} FAILED: {type(exc).__name__}", flush=True)
        return float("nan")


def _time_fn(fn, chunks, label):
    _ = np.asarray(fn(chunks[0])[0])
    t0 = time.perf_counter()
    out = None
    for i in range(NCHUNKS):
        out = fn(chunks[i % len(chunks)])
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0
    per_hour = dt * (3600 * RATE / CHUNK) / NCHUNKS
    print(f"{label:52s} {dt:7.3f} s/{NCHUNKS}  -> {per_hour:6.3f} s/h",
          flush=True)
    return per_hour


def main():
    audian_tpu.enable_compilation_cache()
    from audian_tpu.models import get_preset

    fused = get_preset("bioacoustics").fused(RATE, eps=2e-6)
    ck = fused.chain_kernel
    print(f"geometry: N={ck.N} hb={ck.hb} ha={ck.ha} Hx={ck.Hx} "
          f"act_f={ck.act_f} act_e={ck.act_e} "
          f"wf={ck.wf.shape} we={ck.we.shape} ws={ck.ws.shape}")
    chunks = make_chunks(ck.hb, ck.ha)

    H = lax.Precision.HIGHEST
    D = lax.Precision.DEFAULT

    def variant(precision=None, act_f=None, act_e=None, ablate=()):
        precision = ck.precision if precision is None else precision
        act_f = ck.act_f if act_f is None else act_f
        act_e = ck.act_e if act_e is None else act_e

        def fn(ext):
            _y, _e, _s, st = _chain_call(
                ext, ck.wf, ck.we, ck.ws, CHUNK, ck.N, ck.hb, ck.Hx,
                ck.gy, ck.lead, ck.offe, ck.nbins, ck.env_clamp,
                precision, act_f, act_e, True, ablate=frozenset(ablate))
            return st["power"], st["env_sum"], st["psd_sum"]

        return fn

    time_fn(variant(), chunks, "baseline (H, x3, x3)")
    time_fn(variant(precision=(D, D, D)), chunks, "all DEFAULT (1 pass/stage)")
    time_fn(variant(ablate=["filter"]), chunks, "- filter conv")
    time_fn(variant(ablate=["envelope"]), chunks, "- envelope conv")
    time_fn(variant(ablate=["spectrogram"]), chunks, "- stft conv+psd")
    time_fn(variant(ablate=["transpose"]), chunks, "- psd transpose")
    time_fn(variant(ablate=["stats"]), chunks, "- stats reductions")
    time_fn(variant(ablate=["filter", "envelope", "spectrogram",
                            "transpose", "stats"]),
            chunks, "floor: DMA+concat+abs only")
    time_fn(variant(ablate=["envelope", "spectrogram",
                            "transpose", "stats"]),
            chunks, "floor + filter conv (H)")
    time_fn(variant(ablate=["filter", "spectrogram",
                            "transpose", "stats"]),
            chunks, "floor + envelope conv (x3)")
    time_fn(variant(ablate=["filter", "envelope", "transpose", "stats"]),
            chunks, "floor + stft conv+psd (x3)")
    time_fn(variant(), chunks, "baseline again (drift check)")


if __name__ == "__main__":
    main()
