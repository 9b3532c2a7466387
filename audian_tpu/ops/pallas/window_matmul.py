"""Fused strided-window matmul Pallas kernel.

The two hot ops of the whole framework — FIR filtering (Toeplitz block
matmul) and the STFT (windowed DFT matmul) — are both instances of::

    y[f] = x[:, f*S : f*S + K] @ w        f = 0 .. nframes-1

In plain XLA the overlapped windows must be materialized (a concat of
shifted views), costing 2-4x the input size in HBM traffic and dominating
runtime (measured 10-18 ms per 44 s audio chunk where the MXU work alone
is 2-6 ms).  This kernel streams ``x`` through VMEM via two adjacent
block views (so Pallas double-buffers the loads across grid steps), builds
the overlapped window block in VMEM (on-chip bandwidth), and feeds the MXU
directly: HBM traffic drops to ``read x + write y``.

Layout: channels-first ``x (C, n)`` so the window block ``F`` has shape
``(G*C, K)`` — a fat matmul M dimension regardless of channel count.

Precision: Mosaic supports DEFAULT (single bf16 pass) and HIGHEST (full
f32); HIGHEST is the default here — the framework's 1e-5 oracle contract
needs it.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_matmul"]


from ...utils import round_up as _round_up


def _kernel(xa, xb, w_ref, out_ref, xcat=None, fv=None, *, G, S, K, C,
            precision, premap, out_layout):
    span = xa.shape[1]
    if xcat is not None:
        if premap is None:
            xcat[:, :span] = xa[:, :]
            xcat[:, span:] = xb[:, :]
        else:
            xcat[:, :span] = premap(xa[:, :])
            xcat[:, span:] = premap(xb[:, :])
    O = w_ref.shape[-1]
    if fv is None:
        # Lane-aligned fast path (S == 128, K % 128 == 0): the window
        # matmul decomposes over 128-wide kernel sub-blocks into matmuls
        # on *contiguous reshaped slices* of the two input spans — the
        # overlapped window matrix is never materialized and the spans are
        # never concatenated, removing the in-VMEM copies that set a
        # ~6 ms/pass floor on 44 s chunks.
        #   y[c, g, o] = sum_kb stream[c, (g+kb)*128:(g+kb+1)*128]
        #                       @ w[kb*128:(kb+1)*128, o]
        # where stream columns [0, span) live in xa and [span, 2span) in
        # xb; for sub-block kb, frames [0, G-kb) read xa, the rest xb.
        def mm(xs, kb):
            # fold (C, g) into one fat M dimension for full MXU tiles
            c, g = xs.shape[0], xs.shape[1]
            xs = xs.reshape(c * g, 128)
            if premap is not None:
                xs = premap(xs)
            y2 = jax.lax.dot_general(
                xs, w_ref[kb * 128 : (kb + 1) * 128, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            return y2.reshape(c, g, O)

        y = None
        for kb in range(K // 128):
            ga = max(G - kb, 0)
            parts = []
            if ga:
                parts.append(mm(
                    xa[:, kb * 128 : G * 128].reshape(C, ga, 128), kb))
            if kb:
                parts.append(mm(
                    xb[:, : min(kb, G) * 128].reshape(C, min(kb, G), 128),
                    kb))
            t = parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=1)
            y = t if y is None else y + t
        if out_layout == "fco":
            out_ref[0] = y.transpose(1, 0, 2)
        else:  # (C, G*O) stream; S == O == 128 for Toeplitz banks
            out_ref[:, :] = y.reshape(C, G * O)
        return
    for g in range(G):
        fv[g * C : (g + 1) * C, :] = xcat[:, g * S : g * S + K]
    y = jax.lax.dot_general(
        fv[:, :], w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if out_layout == "fco":
        out_ref[0] = y.reshape(G, C, O)
    else:  # channels-first stream: (C, G*O)
        out_ref[:, :] = y.reshape(G, C, O).transpose(1, 0, 2).reshape(C, G * O)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "nframes", "frames_per_block", "precision",
                     "premap", "out_layout"),
)
def window_matmul(x, w, stride, nframes, frames_per_block=32,
                  precision=lax.Precision.HIGHEST, premap=None,
                  out_layout="fco"):
    """Compute ``y[f] = x[:, f*stride : f*stride + K] @ w`` for all frames.

    Parameters
    ----------
    x : (C, n) float32, channels-first.  ``n`` must cover the last frame
        (the host wrappers pad).
    w : (K, O) float32 analysis matrix (Toeplitz bank or windowed DFT).
    stride : frame hop S (static).
    nframes : number of output frames (static).
    frames_per_block : frames per kernel program; ``G*C`` is the matmul M
        dimension.  Widened automatically until ``K <= (G+1)*S``.
    premap : optional elementwise function applied to ``x`` on-chip while
        building the window block (e.g. rectification for the envelope) —
        fuses a whole HBM round trip away.
    out_layout : "fco" returns (nframes, C, O); "cf" returns the
        channels-first stream (C, nframes*O) — the natural input of a
        following windowed op (no host-side transpose pass).

    Returns (nframes, C, O) or (C, nframes*O) float32.
    """
    C, n = x.shape
    K, O = w.shape
    S = int(stride)
    if out_layout == "cf" and O % 128:
        # the cf kernel's in-VMEM (G, C, O) -> (C, G*O) relayout needs a
        # lane-aligned O on Mosaic; production cf callers are Toeplitz
        # banks with O == 128, so an odd-O cf request (direct API use)
        # takes the fco kernel plus one XLA transpose instead of
        # crashing the backend compiler
        out = window_matmul(x, w, stride, nframes, frames_per_block,
                            precision, premap, "fco")
        return out.transpose(1, 0, 2).reshape(C, nframes * O)
    # lane-aligned fast path: no window materialization (see _kernel)
    fast = S == 128 and (out_layout == "fco" or O == S)
    if K % 128:
        # pad the kernel rows to a full lane tile: Mosaic scratch/blocks
        # want 128-multiples, and the zero rows multiply padded input
        w = jnp.pad(w, [(0, _round_up(K, 128) - K), (0, 0)])
        K = w.shape[0]
    G = int(frames_per_block)
    while (G + 1) * S < K:  # widen blocks until two spans cover a window
        G *= 2
    # Mosaic block-shape rule: the LAST dim of every BlockSpec block must
    # be a 128-multiple (or the whole array dim).  The primary input
    # block is (C, G*S) and the cf output block (C, G*O), so G must make
    # both lane-aligned — 128/gcd(128, S) is the smallest such factor
    # (a power of two, since 128 is), likewise for O.  S=128 (the fast
    # path) and pow2 hops >= 128 leave G untouched; odd hops (e.g. 90 %
    # overlap spectrograms) round G up a little.
    g_align = 128 // np.gcd(128, S)
    if out_layout == "cf":
        g_align = max(g_align, 128 // np.gcd(128, O))
    G = _round_up(G, g_align)
    # stay inside the ~16 MB VMEM budget (F + xcat + double-buffered
    # inputs + W + outputs)
    def _vmem(g):
        return 4 * ((2 * g * C * O if fast else g * C * K)  # F / fast acc
                    + 6 * C * g * S      # xcat + 2x double-buffered spans
                    + K * O              # W
                    + 3 * g * C * O)     # out block (+pipelining)
    while (G > g_align and _vmem(G) > 14 * (1 << 20)
           and (G // 2 + 1) * S >= K):
        G //= 2
    nprog = -(-nframes // G)
    span = G * S
    # program i reads span i in full plus a thin halo block after it: the
    # halo block is the smallest lane-aligned d*S (d | G) covering a
    # window tail, so read traffic is ~(1 + K/span)x the input instead of
    # 2x — this chip is HBM-bound (~140 GB/s effective), so the thin view
    # is pure win.  The 128-multiple condition is the same Mosaic rule as
    # above (span itself is always aligned, so d = G always qualifies).
    bspan = span
    for d in range(1, G + 1):
        if G % d == 0 and d * S >= K - S and (d * S) % 128 == 0:
            bspan = d * S
            break
    need = nprog * span + bspan
    if need > n:
        x = jnp.pad(x, [(0, 0), (0, need - n)])
    else:
        x = x[:, :need]
    if out_layout == "fco":
        out_spec = pl.BlockSpec((1, G, C, O), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nprog, G, C, O), jnp.float32)
    else:
        out_spec = pl.BlockSpec((C, G * O), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, nprog * G * O), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, G=G, S=S, K=K, C=C, precision=precision,
                          premap=premap, out_layout=out_layout),
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((C, span), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bspan),
                         lambda i, r=span // bspan: (0, (i + 1) * r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[] if fast else [
            pltpu.VMEM((C, span + bspan), jnp.float32),
            pltpu.VMEM((G * C, K), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, x, w)
    if out_layout == "fco":
        return out.reshape(nprog * G, C, O)[:nframes]
    return out[:, : nframes * O]
