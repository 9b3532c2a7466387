"""Channels-first fused chain built on the Pallas window-matmul kernel.

The throughput path for whole recordings: bandpass FIR, rectified
zero-phase envelope (symmetric kernel, rectification fused into the window
build), and the STFT PSD — all as strided-window matmuls over a
channels-first stream, so between stages no transpose or window
materialization ever touches HBM.  This is what ``bench.py`` measures and
what the batch CLIs run per chunk.

Layout convention: ``x_cf`` is ``(channels, frames)``; the spectrogram
comes back ``(nframes, channels, nbins)`` (trace-buffer order).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import design
from .sos import _toeplitz_bank_np
from .stft import _dft_matrices, hann_window, one_sided_doubling
from .pallas.window_matmul import window_matmul

__all__ = ["FusedChainCF"]


def _rectify(v):
    """pi/2 rectifier passed as window_matmul's static ``premap`` — must
    be a module-level function: a fresh lambda per call would be a new
    static cache key and recompile the envelope pass every invocation."""
    return (jnp.pi / 2) * jnp.abs(v)


class FusedChainCF:
    """Precompiled fused chain over a fixed design.

    Parameters
    ----------
    rate : sample rate (Hz).
    filt_sos / env_sos : SOS cascades (either may be None).
    nfft, hop : spectrogram geometry (``nfft`` <= a few k; the DFT runs on
        the MXU).
    eps : FIR truncation tolerance.
    block : conv output block size (the Toeplitz O dimension).
    ifir : use the two-stage interpolated-FIR envelope
        (:func:`audian_tpu.ops.design.ifir_factor`).  Default off: on the
        development chip the chain is HBM-bandwidth-bound (~140 GB/s
        effective), so the extra pass + phase transposes cost more than
        the ~2.5x FLOP saving buys; enable on FLOP-bound hardware.
    """

    def __init__(self, rate, filt_sos=None, env_sos=None, env_clamp=True,
                 nfft=256, hop=128, eps=1e-7, block=128, ifir=False,
                 ifir_phase=8, ifir_tol=None):
        self.rate = float(rate)
        self.nfft = int(nfft)
        self.hop = int(hop)
        self.block = int(block)
        self.env_clamp = bool(env_clamp)
        B = self.block
        self._h_filt = None
        self._g_env = None
        self._chain_kernel = None
        if filt_sos is not None:
            h = design.impulse_response(
                filt_sos, design.effective_impulse_length(filt_sos, eps))
            self._h_filt = np.asarray(h)
            self.filt_halo = len(h) - 1
            self.filt_w = jnp.asarray(
                _toeplitz_bank_np(np.asarray(h, np.float32), B).T)
        else:
            self.filt_halo = 0
            self.filt_w = None
        self.env_w = None
        self.env_mode = None
        self.env_delay = 0
        self.env_halo = 0
        if env_sos is not None:
            g, delay = design.filtfilt_sym_kernel(env_sos, eps=eps)
            self._g_env = np.asarray(g)
            self.env_delay = int(delay)
            if ifir_tol is None:
                # L1 kernel error bounds the worst-case output error for
                # unit-peak input; 2e-6 keeps the full chain well inside
                # the 1e-5 scipy-oracle budget regardless of ``eps``
                ifir_tol = 2e-6
            if ifir and len(g) >= 96:
                phases = tuple(dict.fromkeys(
                    m for m in (int(ifir_phase), 8, 4) if B % m == 0))
                fit = design.ifir_factor_auto(g, ifir_tol, phases=phases)
                if fit is not None:
                    ik, gk, M, err = fit
                    lead = (len(ik) - 1) + (len(gk) - 1) * M - delay
                    if lead >= 0:
                        # two-stage interpolated FIR (design.ifir_factor):
                        # short image suppressor at full rate, model filter
                        # on the phase-major stream at stride M
                        self.env_mode = "ifir"
                        self.ifir_M = M
                        self.ifir_Lg = len(gk)
                        self.env_halo = lead
                        self.env_i_w = jnp.asarray(_toeplitz_bank_np(
                            np.asarray(ik, np.float32), B).T)
                        self.env_g_w = jnp.asarray(_toeplitz_bank_np(
                            np.asarray(gk, np.float32), B).T)
            if self.env_mode is None:
                self.env_mode = "dense"
                self.env_halo = len(g) - 1
                self.env_w = jnp.asarray(
                    _toeplitz_bank_np(np.asarray(g, np.float32), B).T)
        nbins = self.nfft // 2 + 1
        # periodic Hann + DFT matrices built host-side in float64 (an
        # eager device op here costs a minutes-long remote compile);
        # ONE window definition shared with stft.spectrogram so the
        # fused chain's PSD cannot silently diverge from it
        win = hann_window(self.nfft, np.float64)
        W = _dft_matrices(self.nfft, nbins, np.float64)
        scale = 1.0 / (self.rate * float(np.sum(win ** 2)))
        dbl = one_sided_doubling(self.nfft)
        # fold window + sqrt(density scaling) into the analysis matrix
        amp = np.sqrt(np.concatenate([dbl * scale, dbl * scale]))
        self.spec_w = jnp.asarray((win[:, None] * W) * amp[None, :],
                                  jnp.float32)
        self.nbins = nbins

    # -- stages ---------------------------------------------------------------

    def filtered_cf(self, x_cf):
        """Causal bandpass of a channels-first stream; same length."""
        if self.filt_w is None:
            return x_cf
        C, n = x_cf.shape
        B = self.block
        xp = jnp.pad(x_cf, [(0, 0), (self.filt_halo, 0)])
        nf = -(-n // B)
        y = window_matmul(xp, self.filt_w, B, nf, out_layout="cf")
        return y[:, :n]

    def envelope_cf(self, y_cf):
        """Rectified symmetric-kernel envelope of a (filtered) stream.

        Rectification happens inside the kernel's window build — no extra
        HBM pass.  Interior matches scipy's pi/2-rectified sosfiltfilt.
        In "ifir" mode the long smoothing kernel runs as two short MXU
        stages (image suppressor, then the model filter on the
        phase-major stream) — ~2.5x fewer FLOPs at the same accuracy.
        """
        if self.env_mode is None:
            return jnp.zeros_like(y_cf)
        if self.env_mode == "ifir":
            return self._envelope_ifir_cf(y_cf)
        C, n = y_cf.shape
        B = self.block
        xp = jnp.pad(y_cf, [(0, 0), (self.env_halo, self.env_delay)])
        nf = -(-(n + self.env_delay) // B)
        e = window_matmul(
            xp, self.env_w, B, nf, out_layout="cf",
            premap=_rectify,
        )
        e = e[:, self.env_delay : self.env_delay + n]
        if self.env_clamp:
            e = jnp.maximum(e, 0.0)
        return e

    def _envelope_ifir_cf(self, y_cf):
        """Two-stage IFIR envelope.

        With u = i * (pi/2)|y| computed from t = delay - (Lg-1)*M onward,
        the model-filter stage is a plain causal convolution along each
        phase row: e[t] = sum_j g[j] u[t + delay - j*M].  Both phase
        transposes ride inside the Pallas kernel ("pm"/"pm2cf" layouts).
        """
        C, n = y_cf.shape
        B = self.block
        M = self.ifir_M
        n_pad = -(-n // M) * M
        # stage A input: the env_halo left pad already folds in the
        # stage-A halo (env_halo = Li-1 + (Lg-1)M - delay)
        xp = jnp.pad(y_cf, [(0, 0),
                            (self.env_halo, self.env_delay + n_pad - n)])
        n_u = n_pad + (self.ifir_Lg - 1) * M
        nf_a = -(-n_u // B)
        u = window_matmul(
            xp, self.env_i_w, B, nf_a, out_layout="cf",
            premap=_rectify,
        )[:, :n_u]
        # phase decomposition (XLA transpose; Mosaic can't split the lane
        # dim in-kernel) — one extra HBM round trip each way, still ~2x
        # cheaper overall than the dense 1.1k-tap convolution
        Q = n_u // M
        u_pm = u.reshape(C, Q, M).transpose(0, 2, 1).reshape(C * M, Q)
        q_out = n_pad // M
        nf_b = -(-q_out // B)
        e_pm = window_matmul(u_pm, self.env_g_w, B, nf_b,
                             out_layout="cf")[:, :q_out]
        e = e_pm.reshape(C, M, q_out).transpose(0, 2, 1).reshape(
            C, n_pad)[:, :n]
        if self.env_clamp:
            e = jnp.maximum(e, 0.0)
        return e

    def spectrogram_fc(self, y_cf, nframes=None):
        """PSD spectrogram of a channels-first stream: (nf, C, nbins)."""
        C, n = y_cf.shape
        if nframes is None:
            nframes = max((n - self.nfft) // self.hop + 1, 0)
        s = window_matmul(y_cf, self.spec_w, self.hop, nframes,
                          out_layout="fco")
        re, im = s[..., : self.nbins], s[..., self.nbins :]
        return re * re + im * im

    @property
    def chain_kernel(self):
        """Single-pass fused kernel for the whole chain (hop == 128 only)
        — see :class:`audian_tpu.ops.pallas.chain.FusedChainKernel`.
        ``None`` when the geometry or design doesn't fit it."""
        if self._chain_kernel is None and self._h_filt is not None and \
                self._g_env is not None and self.hop == 128 and \
                self.nfft % 128 == 0:
            from .pallas.chain import FusedChainKernel

            try:
                self._chain_kernel = FusedChainKernel(
                    self.rate, self._h_filt, self._g_env, self.env_delay,
                    np.asarray(self.spec_w), self.nbins,
                    env_clamp=self.env_clamp, nfft=self.nfft)
            except ValueError:
                # halo exceeds the block span (very long kernels): the
                # per-stage methods handle the design; keep the documented
                # None contract (False = tried and does not fit)
                self._chain_kernel = False
        return self._chain_kernel or None

    def chain_cf(self, x_ext, n, stats=False,
                 outputs=("filtered", "envelope", "spectrogram")):
        """Run the whole chain in ONE device pass over an extended stream
        ``[hb | n | ha]`` (``hb = chain_kernel.hb``,
        ``ha >= chain_kernel.ha``).  Returns ``(filtered, envelope, psd)``
        — the batch throughput path (one HBM round trip instead of
        three).  With ``stats=True`` a fourth element carries in-kernel
        per-chunk statistics (per-channel signal power, envelope mass,
        and PSD column sums — the inputs to noise-floor auto-leveling);
        pulling just those tiny arrays fences the chunk without re-reading
        the three full outputs from HBM.

        ``outputs`` masks the chain statically: stages not requested skip
        their MXU passes and HBM writes (the chain is DMA-bound, so an
        envelope-only batch consumer runs measurably faster); masked
        entries return ``None`` in their tuple positions."""
        ck = self.chain_kernel
        if ck is None:
            raise ValueError(
                "the single-pass chain kernel needs filter + envelope "
                "designs and hop == 128; use the per-stage methods")
        return ck(x_ext, n, stats=stats, outputs=outputs)

    def __call__(self, x_cf, nspec_frames=None,
                 outputs=("filtered", "envelope", "spectrogram")):
        y = self.filtered_cf(x_cf)
        out = {}
        if "filtered" in outputs:
            out["filtered"] = y
        if self.env_mode is not None and "envelope" in outputs:
            out["envelope"] = self.envelope_cf(y)
        if "spectrogram" in outputs:
            out["spectrogram"] = self.spectrogram_fc(y, nspec_frames)
        return out
