"""Single-pass fused song-detection envelope kernel.

The two-stage batch path (:mod:`audian_tpu.ops.envdet`) still pays three
full-rate HBM round trips per chunk on a DMA-bound chip: the traced-
offset alignment copy, the filtered stream write, and its read back for
the squared-envelope stage.  This kernel computes the whole detection
front half per grid block while the filtered stream lives in VMEM —
zero-phase band-pass (symmetric kernel), squaring, envelope smoothing,
and the 1-in-``step`` decimation — so HBM traffic drops to ``read x
(int16, + halo block) + write the decimated envelope``.

The price is a STATIC alignment contract: the first decimated output
must sit exactly ``hb`` samples into the window (the chunk driver aligns
chunk starts to the decimation grid, so every interior chunk satisfies
it); the traced-offset two-stage path remains for geometries that don't.

Structure follows :mod:`audian_tpu.ops.pallas.chain`: per-program
primary block + thin following halo block (double-buffered by Pallas),
convolutions decomposed over 128-wide kernel sub-blocks into matmuls on
contiguous VMEM slices, look-back folded into bank column offsets, and
near-zero-mass sub-blocks demoted to one DEFAULT-precision pass.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain import FusedChainKernel, _conv, _round_up, _shift_bank
from ..design import filtfilt_sym_kernel
from ..envdet import _decimating_bank

__all__ = ["EnvDetKernel"]


def _conv_decimate(v, w, gout, C, step, precision, active):
    """``out[c, g*128+o] = sum_r v[c, g*128*step + r] * w[r, o]`` — the
    decimating envelope conv: frame-block ``g`` covers 128 decimated
    outputs whose windows live ``128*step`` samples apart, with the
    smoother's look-back folded into the bank rows (``w[r, o] =
    g_lp[o*step + L-1 - r]``)."""
    parts = []
    for g in range(gout):
        base = g * 128 * step
        acc = None
        for kb, full in active:
            xs = v[:, base + kb * 128 : base + (kb + 1) * 128]
            t = lax.dot_general(
                xs, w[kb * 128 : (kb + 1) * 128, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision if full else lax.Precision.DEFAULT)
            acc = t if acc is None else acc + t
        parts.append(acc)
    return jnp.concatenate(parts, axis=1)  # (C, gout*128)


def _envdet_kernel(xa, xb, w1, w2, eo, *, C, gy, off1, step, q, precision,
                   act1, act2):
    z = jnp.concatenate([xa[:, :], xb[:, :]], axis=1)
    if z.dtype == jnp.int16:  # raw PCM-16: dequantize in VMEM
        z = z.astype(jnp.float32) * (1.0 / 32768.0)
    # stage 1: zero-phase band-pass of the block (+ margins), in VMEM
    y = _conv(z, w1[:, :], off1, gy, C, precision,
              act1).reshape(C, gy * 128)
    # stage 2: squared-RMS envelope, decimated — the square never leaves
    # VMEM and only the decimated envelope is written to HBM
    e = _conv_decimate(y * y, w2[:, :], q, C, step, precision, act2)
    # env = sqrt(2 * (2 * conv)) = 2*sqrt(conv)  (see events.band_env)
    eo[:, :] = 2.0 * jnp.sqrt(jnp.maximum(e, 0.0))


class EnvDetKernel:
    """Precompiled single-pass batch detection envelope.

    Same math and parameters as :class:`audian_tpu.ops.envdet.EnvDet`
    (band-pass + envelope designs with pow2-padded kernel budgets,
    decimation ``step``, ``nout`` outputs per window, window headroom
    ``hb``), but the window's first output must sit EXACTLY at ``hb``
    (static; ``__call__`` rejects other offsets).  Raises ``ValueError``
    when the geometry cannot be covered (callers fall back to the
    two-stage path).
    """

    def __init__(self, fdesign, edesign, step, nout, hb, precision=None):
        self.precision = (lax.Precision.HIGHEST if precision is None
                          else precision)
        g_bp, self.d_bp = filtfilt_sym_kernel(
            fdesign.sos, pad_to=fdesign.fir.length)
        g_lp, self.d_lp = filtfilt_sym_kernel(
            edesign.sos, pad_to=edesign.fir.length)
        self.lb, self.ll = len(g_bp), len(g_lp)
        self.step = int(step)
        self.nout = int(nout)
        self.hb = int(hb)
        lead2 = self.ll - 1 - self.d_lp
        if self.hb < lead2 + self.lb - 1 - self.d_bp:
            raise ValueError("window headroom smaller than the combined "
                             "filter look-back")
        # outputs per program: aim for ~16-32k input samples per block
        # (smaller blocks recompute proportionally more stage-1 margin)
        q = max(1, -(-16384 // (128 * self.step)))
        self.q = q
        self.B = 128 * q * self.step
        # stage-1 geometry: y_block[u] = y[p*B - lead2 + u]
        d1 = self.hb + self.d_bp - lead2
        off1 = 128 * max((d1 - (self.lb - 1)) // 128, 0)
        self.off1 = off1
        b1 = _shift_bank(g_bp, D=d1, off=off1)
        self.w1 = jnp.asarray(b1)
        self.act1 = FusedChainKernel._active(b1)
        b2 = _decimating_bank(g_lp, self.step)
        k2 = _round_up(b2.shape[0], 128)
        b2 = np.pad(b2, [(0, k2 - b2.shape[0]), (0, 0)])
        self.w2 = jnp.asarray(b2)
        self.act2 = FusedChainKernel._active(b2)
        # stage-1 output width: must cover stage 2's last sub-block read
        # (frame q-1 reads v columns up to (q-1)*128*step + k2)
        self.gy = -(-((q - 1) * 128 * self.step + k2) // 128)
        # halo block: reads beyond the primary block must fit B + Hx;
        # Mosaic needs lane-dim blocks in 128-multiples, and the index
        # map needs Hx | B — with B = 128*q*step both hold exactly for
        # Hx = B/d with d | q*step
        need1 = (self.gy - 1) * 128 + off1 + b1.shape[0]
        need = max(need1 - self.B, 1)
        self.Hx = None
        for d in range(q * self.step, 0, -1):
            if (q * self.step) % d == 0 and (hx := self.B // d) >= need:
                self.Hx = hx
                break
        if self.Hx is None:
            raise ValueError("kernel halo exceeds the block span")

    def window_need(self, off0_max):
        """Samples the window must hold (API parity with EnvDet)."""
        return off0_max + self.d_bp + (self.nout - 1) * self.step \
            + self.d_lp + 1

    def __call__(self, xw, off0):
        if int(off0) != self.hb:
            raise ValueError(
                f"single-pass envelope kernel requires the first output "
                f"at exactly hb={self.hb} (got {off0}); use the "
                f"two-stage EnvDet for unaligned windows")
        return _envdet_call(
            xw, self.w1, self.w2, self.hb, self.B, self.Hx, self.gy,
            self.off1, self.step, self.q, self.nout, self.precision,
            self.act1, self.act2)


@functools.partial(jax.jit, static_argnums=tuple(range(3, 14)))
def _envdet_call(xw, w1, w2, hb, B, Hx, gy, off1, step, q, nout,
                 precision, act1, act2):
    x_cf = xw.T  # (C, W) channels-first (one transposing device copy)
    C = x_cf.shape[0]
    nprog = -(-nout // (128 * q))
    # program p covers x_ext[p*B : p*B + B + Hx]; x_ext starts hb
    # samples before the first output's sample
    need = nprog * B + Hx
    if x_cf.shape[1] < need:
        x_cf = jnp.pad(x_cf, [(0, 0), (0, need - x_cf.shape[1])])
    else:
        x_cf = x_cf[:, :need]
    Fo = 128 * q
    env = pl.pallas_call(
        functools.partial(_envdet_kernel, C=C, gy=gy, off1=off1,
                          step=step, q=q, precision=precision,
                          act1=act1, act2=act2),
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((C, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Hx), lambda i, r=B // Hx: (0, (i + 1) * r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, Fo), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nprog * Fo), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
        interpret=jax.default_backend() != "tpu",
    )(x_cf, x_cf, w1, w2)
    return env[:, :nout].T  # (nout, C)
