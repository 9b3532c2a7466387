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
from .sos import _toeplitz_bank
from .stft import hann_window, _dft_matrices
from .pallas.window_matmul import window_matmul

__all__ = ["FusedChainCF"]


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
    """

    def __init__(self, rate, filt_sos=None, env_sos=None, env_clamp=True,
                 nfft=256, hop=128, eps=1e-7, block=128):
        self.rate = float(rate)
        self.nfft = int(nfft)
        self.hop = int(hop)
        self.block = int(block)
        self.env_clamp = bool(env_clamp)
        B = self.block
        if filt_sos is not None:
            h = design.impulse_response(
                filt_sos, design.effective_impulse_length(filt_sos, eps))
            self.filt_halo = len(h) - 1
            self.filt_w = jnp.asarray(
                _toeplitz_bank(jnp.asarray(h, jnp.float32), B).T)
        else:
            self.filt_halo = 0
            self.filt_w = None
        if env_sos is not None:
            g, delay = design.filtfilt_sym_kernel(env_sos, eps=eps)
            self.env_delay = int(delay)
            self.env_halo = len(g) - 1
            self.env_w = jnp.asarray(
                _toeplitz_bank(jnp.asarray(g, jnp.float32), B).T)
        else:
            self.env_w = None
            self.env_delay = 0
            self.env_halo = 0
        nbins = self.nfft // 2 + 1
        win = np.asarray(hann_window(self.nfft, jnp.float64))
        W = np.asarray(_dft_matrices(self.nfft, nbins, jnp.float64))
        scale = 1.0 / (self.rate * float(np.sum(win ** 2)))
        dbl = np.full(nbins, 2.0)
        dbl[0] = 1.0
        if self.nfft % 2 == 0:
            dbl[-1] = 1.0
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
        """
        if self.env_w is None:
            return jnp.zeros_like(y_cf)
        C, n = y_cf.shape
        B = self.block
        xp = jnp.pad(y_cf, [(0, 0), (self.env_halo, self.env_delay)])
        nf = -(-(n + self.env_delay) // B)
        e = window_matmul(
            xp, self.env_w, B, nf, out_layout="cf",
            premap=lambda v: (jnp.pi / 2) * jnp.abs(v),
        )
        e = e[:, self.env_delay : self.env_delay + n]
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

    def __call__(self, x_cf, nspec_frames=None):
        y = self.filtered_cf(x_cf)
        out = {"filtered": y}
        if self.env_w is not None:
            out["envelope"] = self.envelope_cf(y)
        out["spectrogram"] = self.spectrogram_fc(y, nspec_frames)
        return out
