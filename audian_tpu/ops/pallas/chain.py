"""Single-pass fused chain kernel: bandpass FIR → {envelope, STFT PSD}.

On the development chip the three-stage chain is HBM-bandwidth-bound
(~140 GB/s effective; the MXU runs at full speed).  Executing filter,
envelope, and spectrogram as separate Pallas passes costs three read+write
round trips of the 270 MB/chunk stream; this kernel computes the whole
chain per grid block while the filtered stream lives in VMEM, so HBM
traffic drops to ``read x once (+halo) + write the three outputs`` —
measured ~2x end-to-end on the 1 h × 16 ch × 96 kHz headline benchmark.

All window geometry is kept 128-lane-aligned: convolutions decompose over
128-wide kernel sub-blocks into matmuls on contiguous reshaped slices
(windows are never materialized), with generalized Toeplitz banks that
fold each stage's look-ahead/look-back into a per-stage aligned column
offset.

Reference behavior covered (cited, not copied): the chunked
filter→envelope/spectrogram chain of `src/audian/bufferedfilter.py:31-36`,
`src/audian/bufferedenvelope.py:34-41`, `src/audian/bufferedspectrogram.py:45-66`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedChainKernel"]


from ...utils import round_up as _round_up


def _shift_bank(h, D, off, block=128):
    """Generalized Toeplitz bank ``B[r, o] = h[o + D - off - r]``.

    With it, ``out[g*block + o] = sum_r z[g*block + off + r] * B[r, o]``
    equals ``out[t] = sum_m h[m] z[t + D - m]`` — a convolution with
    look-ahead ``D`` whose per-frame window starts at the aligned column
    ``g*block + off``.  Rows are padded to a multiple of 128 so the
    kernel's sub-block decomposition stays lane-aligned.
    """
    h = np.asarray(h, np.float64)
    L = len(h)
    K = _round_up(D - off + block, 128)
    r = np.arange(K)[:, None]
    o = np.arange(block)[None, :]
    idx = o + D - off - r
    B = np.where((idx >= 0) & (idx < L), h[np.clip(idx, 0, L - 1)], 0.0)
    return B.astype(np.float32)


def _split_bf16(a):
    """``a = hi + lo`` where ``hi = bf16(a)`` is exactly
    bf16-representable and ``lo = a - hi`` is the f32 remainder — lo
    still carries up to ~16 mantissa bits, so the DEFAULT-precision MXU
    pass rounds it to bf16 once more on operand conversion (hence the
    split recovers ~16 of f32's 24 mantissa bits overall, not all 24).

    The ``astype`` round trip is safe HERE but not in plain XLA: the
    algebraic simplifier folds ``f32(bf16(x))`` back to ``x`` outside
    Pallas (docs/performance.md — which is why the pre-Pallas bf16-split
    experiment failed), and ``lax.reduce_precision`` — the fold-proof
    idiom — has no Pallas TPU lowering.  Mosaic keeps the converts
    (validated on-device: the split path's error and runtime both differ
    from DEFAULT and HIGHEST in exactly the predicted way)."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _dot(a, b, precision):
    return lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


#: precision sentinel: split-operand 3-pass bf16 convolution (see _conv)
BF16X3 = "bf16x3"

#: precision sentinel: split-operand 4-pass bf16 convolution.  Keeping
#: the lo*lo cross product halves BF16X3's error (measured 5.8e-6 vs
#: 1e-5 on the headline filter) but no better: the bf16 rounding of the
#: f32 remainders feeding the hi*lo passes contributes the same ~2^-18
#: order as the term the 4th pass restores.  Available for designs that
#: need a middle rung on the precision ladder; not the filter default —
#: on-device it bought only ~2% end-to-end (the chain sits near its
#: DMA/compute balance point) for a 40x worse error floor than HIGHEST.
BF16X4 = "bf16x4"


def _conv(z, w, off, gout, C, precision, active=None):
    """``out[c, g*128+o] = sum_r z[c, g*128+off+r] w[r, o]`` via 128-wide
    sub-block matmuls on contiguous slices (z is a VMEM value); ``active``
    lists ``(kb, full)`` pairs for the sub-blocks with any nonzero bank
    rows (host-computed) so all-zero padding blocks cost nothing; blocks
    flagged ``full=False`` carry negligible coefficient mass (see
    :meth:`FusedChainKernel._active`) and run as a single
    DEFAULT-precision MXU pass regardless of the stage precision.

    ``precision`` may also be :data:`BF16X3`: both operands are split
    into a bf16 hi part plus an f32 remainder and the three significant
    cross products run as DEFAULT-precision MXU passes — half the MXU passes
    of ``Precision.HIGHEST`` (which uses six), dropping only the
    ``lo*lo`` term (≤ 2^-18 relative per product).  Measured on-device
    against HIGHEST over the headline chain: envelope ≤ 1.4e-6 absolute
    (budget 1e-5), PSD ≤ 0.013 dB for bins within 60 dB of the chunk
    peak (u8 display tiles step ~0.3 dB); a full-stage bf16x3 *filter*
    conv measures ~1e-5 on coherent signals — at the scipy-oracle
    budget, which is why DEFAULT_PRECISION keeps the filter at HIGHEST.
    """
    K = w.shape[0]
    split = precision in (BF16X3, BF16X4)
    if active is None:
        active = tuple((kb, True) for kb in range(K // 128))
    y = None
    for kb, full in active:
        xs = z[:, off + kb * 128 : off + (kb + gout) * 128]
        xs = xs.reshape(C * gout, 128)
        wb = w[kb * 128 : (kb + 1) * 128, :]
        if not full:
            t = _dot(xs, wb, lax.Precision.DEFAULT)
        elif split:
            xh, xl = _split_bf16(xs)
            wh, wl = _split_bf16(wb)
            d = lax.Precision.DEFAULT
            t = _dot(xh, wh, d) + (_dot(xh, wl, d) + _dot(xl, wh, d))
            if precision == BF16X4:
                t = t + _dot(xl, wl, d)
        else:
            t = _dot(xs, wb, precision)
        y = t if y is None else y + t
    return y  # (C*gout, O)


def _stage_precisions(precision):
    """Normalize ``precision`` to the per-stage (filter, envelope, stft)
    triple; a single value applies to all three stages."""
    if isinstance(precision, tuple) and len(precision) == 3:
        return precision
    return (precision, precision, precision)


def _chain_kernel(xa, xb, wf, we, ws, yo, eo, so, po, go, qo, *, C, N, offf,
                  gy, lead, offe, nbins, env_clamp, precision, act_f, act_e,
                  n, nf, outputs, ablate=frozenset()):
    # ``ablate`` (timing experiments only — see benchmarks/chain_ablate.py)
    # skips individual kernel phases while keeping every output write and
    # the grid/DMA structure identical, so the cost of each phase can be
    # measured in isolation.  Production callers never set it.
    # ``outputs`` is the static output mask: stages not requested skip
    # both their MXU passes and their full-size HBM writes (the chain is
    # DMA-bound — an envelope-only consumer saves ~2/3 of the write
    # traffic); masked out-buffers shrink to one 128-lane column.
    want_f = "filtered" in outputs
    want_e = "envelope" in outputs
    want_s = "spectrogram" in outputs
    prec_f, prec_e, prec_s = _stage_precisions(precision)
    x = jnp.concatenate([xa[:, :], xb[:, :]], axis=1)
    if x.dtype == jnp.int16:
        # raw PCM-16 input (sample = k/2^15, the loader's raw16
        # convention): it crosses HBM at half the f32 bytes — the chain
        # is DMA-bound, so this is a measured end-to-end win — and
        # dequantizes here, in VMEM, bit-exactly
        x = x.astype(jnp.float32) * (1.0 / 32768.0)
    # stage 1: filtered stream, with lead/tail margins for the consumers
    if "filter" in ablate:
        y_ext = x[:, : gy * 128]
    else:
        y_ext = _conv(x, wf[:, :], offf, gy, C, prec_f,
                      act_f).reshape(C, gy * 128)
    y = y_ext[:, lead : lead + N]
    yo[:, :] = y if want_f else y[:, :128]
    # stage 2: rectified zero-phase envelope (reads y_ext in VMEM)
    if not want_e:
        e = None
        eo[:, :] = y[:, :128]
    elif "envelope" in ablate:
        e = (jnp.pi / 2) * jnp.abs(y_ext)[:, :N]
        eo[:, :] = e
    else:
        v = (jnp.pi / 2) * jnp.abs(y_ext)
        e = _conv(v, we[:, :], offe, N // 128, C, prec_e,
                  act_e).reshape(C, N)
        e = jnp.maximum(e, 0.0) if env_clamp else e
        eo[:, :] = e
    # stage 3: STFT PSD frames (windows start at lead + f*128)
    F = N // 128
    if not want_s:
        psd = None
    elif "spectrogram" in ablate:
        psd = jnp.zeros((C, F, nbins), jnp.float32) + y[0, 0]
    else:
        # ws is lane-packed to exactly nfft = 2*nbins - 2 columns (the
        # identically-zero imaginary parts of bin 0 and the Nyquist bin
        # are dropped): cols [0, half) are re bins 0..half-1, col half is
        # re of the Nyquist bin, cols (half, nfft) are im bins 1..half-1.
        # This keeps the DFT matmul on whole 128-lane MXU tiles (258
        # columns would round up to 3 tiles; nfft is a 128 multiple).
        s = _conv(y_ext, ws[:, :], lead, F, C, prec_s)  # (C*F, nfft)
        sq = s * s
        half = nbins - 1
        sqlo = sq[:, :half]
        sqhi = sq[:, half:]
        keep = lax.broadcasted_iota(jnp.int32, (1, half), 1) > 0
        main = sqlo + jnp.where(keep, sqhi, 0.0)
        psd = jnp.concatenate([main, sqhi[:, :1]], axis=1)
        psd = psd.reshape(C, F, nbins)
    if not want_s:
        so[0] = jnp.zeros((1, C, nbins), jnp.float32)
    elif "transpose" in ablate:
        so[0] = jnp.zeros((F, C, nbins), jnp.float32) + psd[0, 0, 0]
    else:
        so[0] = psd.transpose(1, 0, 2)
    # per-block chunk statistics (signal power, envelope mass, PSD column
    # sums for noise-floor auto-leveling) over the valid region only —
    # these let consumers fence/inspect a chunk without re-reading the
    # three full outputs from HBM
    if n is not None:  # static: the grid extends past n (padded tail)
        i = pl.program_id(0)
        m = (i * N + lax.broadcasted_iota(jnp.int32, (1, N), 1)
             < n).astype(jnp.float32)
        fm = (i * F + lax.broadcasted_iota(jnp.int32, (1, F, 1), 1)
              < nf).astype(jnp.float32)
    else:
        m = 1.0
        fm = 1.0
    if "stats" in ablate:
        po[0, 0, :] = y[:, 0]
        go[0, 0, :] = e[:, 0] if e is not None else y[:, 0]
        qo[0] = psd[:, 0] if psd is not None else jnp.zeros(
            (C, nbins), jnp.float32)
    else:
        # stats cover the REQUESTED stages only: masked stages report
        # zero (y is always computed internally — envelope and PSD hang
        # off it — so the mask, not y's existence, gates the power stat)
        po[0, 0, :] = (jnp.sum(y * y * m, axis=1) if want_f
                       else jnp.zeros((C,), jnp.float32))
        go[0, 0, :] = (jnp.sum(e * m, axis=1) if e is not None
                       else jnp.zeros((C,), jnp.float32))
        qo[0] = (jnp.sum(psd * fm, axis=1) if psd is not None
                 else jnp.zeros((C, nbins), jnp.float32))


class FusedChainKernel:
    """Precompiled single-pass chain over a fixed design.

    Same stage semantics as :class:`audian_tpu.ops.fused.FusedChainCF`
    (which it plugs into): causal FIR bandpass, pi/2-rectified symmetric
    zero-phase envelope, Hann PSD spectrogram at ``hop == 128``.

    Inputs are extended streams ``[hb | n | ha]`` with ``hb = self.hb``
    and ``ha >= self.ha`` (the wrapper pads the tail as needed).
    """

    #: default per-stage (filter, envelope, stft) precisions.  The filter
    #: output feeds every downstream consumer (region export, the scipy
    #: 1e-5 accuracy contract), so it keeps the exact six-pass HIGHEST
    #: decomposition (the 3- and 4-pass split modes measured 1e-5 and
    #: 5.8e-6 on coherent signals — too close to the budget for their
    #: ~2% end-to-end gain); the envelope and PSD stages use the
    #: three-pass split-operand mode (:data:`BF16X3`) — measured
    #: on-device ~2e-6 absolute envelope error and ~0.15 dB at the PSD
    #: noise floor, both far inside their budgets, for ~40% fewer MXU
    #: passes overall.
    DEFAULT_PRECISION = (lax.Precision.HIGHEST, BF16X3, BF16X3)

    #: sub-blocks are flagged light while their AGGREGATE coefficient L1
    #: mass stays below this fraction of the bank total (see
    #: :meth:`_active`) — the summed light contribution is that small, so
    #: even bf16 operand rounding (~2^-9 relative) perturbs the stage
    #: output by < 2e-6 of its scale, far inside the 1e-5 scipy-oracle
    #: budget, no matter how many blocks a long smooth kernel spreads
    #: its tails over.
    LIGHT_MASS_FRAC = 1e-3

    @staticmethod
    def _active(bank):
        """Classify a Toeplitz bank's 128-row sub-blocks: drop all-zero
        padding blocks, and flag the lightest blocks as ``full=False``
        (greedily from the smallest, while their cumulative L1 mass stays
        under LIGHT_MASS_FRAC of the bank total) so ``_conv`` runs them
        at 1-pass DEFAULT precision instead of 6-pass HIGHEST / 3-pass
        bf16x3.  The aggregate cap — not a per-block one — is what bounds
        the worst-case stage error for arbitrary designs.  On the
        headline design this removes ~30% of the conv MXU passes (the
        FIR tails land in nearly-empty edge blocks; aggregate light mass
        7.6e-4 envelope / 1.6e-7 filter)."""
        nb = bank.shape[0] // 128
        mass = [float(np.abs(bank[kb * 128 : (kb + 1) * 128]).sum())
                for kb in range(nb)]
        budget = FusedChainKernel.LIGHT_MASS_FRAC * sum(mass)
        light = set()
        for kb in sorted(range(nb), key=lambda kb: mass[kb]):
            if mass[kb] > budget:
                break
            budget -= mass[kb]
            light.add(kb)
        return tuple((kb, kb not in light)
                     for kb in range(nb) if mass[kb] > 0.0)

    def __init__(self, rate, h_filt, g_env, env_delay, spec_w, nbins,
                 env_clamp=True, nfft=256, block_frames=64,
                 precision=DEFAULT_PRECISION):
        self.rate = float(rate)
        self.nfft = int(nfft)
        self.nbins = int(nbins)
        self.env_clamp = bool(env_clamp)
        self.precision = precision
        self.N = 128 * int(block_frames)
        Tf = len(h_filt)
        L = len(g_env)
        delay = int(env_delay)
        lead = L - 1 - delay  # look-back of the envelope kernel
        self.lead = _round_up(lead, 128)
        self.tail = _round_up(max(delay, self.nfft - 128), 128)
        y0 = _round_up(Tf - 1, 128)
        self.hb = y0 + self.lead
        self.ha = self.tail
        # stage banks (look-ahead D in each stage's own coordinates)
        bf = _shift_bank(np.asarray(h_filt), D=y0, off=0)
        self.wf = jnp.asarray(bf)
        self.act_f = self._active(bf)
        De = self.lead + delay
        offe = 128 * ((De - L + 1) // 128)
        self.offe = offe
        be = _shift_bank(np.asarray(g_env), D=De, off=offe)
        self.we = jnp.asarray(be)
        self.act_e = self._active(be)
        # lane-pack the analysis matrix: for real input and even nfft the
        # imaginary parts of bin 0 and the Nyquist bin are identically
        # zero, so the (nfft, 2*nbins) matrix carries exactly nfft
        # meaningful columns — reorder to [re 0..half-1 | re Nyquist |
        # im 1..half-1] so the DFT matmul runs on whole 128-lane tiles
        # (2*nbins = nfft + 2 would round up to an extra MXU tile pass)
        spec_w = np.asarray(spec_w, np.float32)
        half = self.nbins - 1
        assert spec_w.shape[1] == 2 * self.nbins
        # mathematically zero; numerically ~1e-16*n from sin(pi*n)
        tiny = 1e-9 * float(np.abs(spec_w).max())
        assert float(np.abs(spec_w[:, self.nbins]).max()) <= tiny
        assert float(np.abs(spec_w[:, 2 * self.nbins - 1]).max()) <= tiny
        self.ws = jnp.asarray(np.concatenate(
            [spec_w[:, :half],                       # re bins 0..half-1
             spec_w[:, half : half + 1],             # re Nyquist bin
             spec_w[:, self.nbins + 1 : 2 * self.nbins - 1]],  # im 1..half-1
            axis=1))
        assert self.ws.shape == (self.nfft, self.nfft)
        assert self.ws.shape[0] % 128 == 0
        # per-program geometry
        self.gy = (self.lead + self.N + self.tail) // 128
        # halo block width: smallest 128-multiple dividing N that covers
        # the lookahead reads beyond the primary block (program i's last
        # filter window ends at column i*N + N + hb + tail - 1)
        need = self.hb + self.tail
        self.Hx = None
        for d in range(1, self.N // 128 + 1):
            if (self.N % (d * 128)) == 0 and d * 128 >= need:
                self.Hx = d * 128
                break
        if self.Hx is None:
            # no divisor of N covers the halo: the kernel would read past
            # its block; fail loudly with the remedy instead of a shape
            # mismatch deep inside the first trace
            raise ValueError(
                f"chain kernel halo ({need} frames; filter+envelope "
                f"kernels plus tail) exceeds the block span N={self.N} — "
                f"raise block_frames (N = 128*block_frames) or shorten "
                f"the filter kernels (higher cutoffs / lower order)")

    #: the full output set (and the default ``outputs`` mask)
    ALL_OUTPUTS = ("filtered", "envelope", "spectrogram")

    def __call__(self, x_ext, n, stats=False, outputs=ALL_OUTPUTS):
        """Run the chain over ``x_ext = [hb | n | ha...]`` (channels-first).

        ``x_ext`` may be float32 or int16; int16 is raw PCM-16
        (sample = k/2^15, the loader's raw16 convention) and is
        dequantized inside the kernel — half the HBM read bytes on a
        DMA-bound chain, bit-exact for PCM-16 sources.

        Returns ``(y, e, spec)`` with shapes (C, n), (C, n),
        (n//128, C, nbins).  With ``stats=True`` also returns a dict of
        per-chunk statistics computed inside the kernel (``power`` =
        per-channel sum of the filtered signal squared, ``env_sum`` =
        per-channel envelope mass, ``psd_sum`` = per-channel PSD column
        sums over the chunk's frames) — reading them fences the chunk
        without pulling the three full outputs back out of HBM.

        ``outputs`` is a static mask (any subset of ``ALL_OUTPUTS``):
        stages not requested skip their MXU passes and their full-size
        HBM writes — on this DMA-bound chip an envelope-only consumer
        pays roughly 1/3 of the full chain's write traffic.  Masked
        entries come back as ``None`` (positions preserved) and their
        stats report zero.
        """
        outputs = tuple(outputs)
        bad = set(outputs) - set(self.ALL_OUTPUTS)
        if bad or not outputs:
            raise ValueError(
                f"outputs must be a non-empty subset of "
                f"{self.ALL_OUTPUTS}, got {outputs!r}")
        return _chain_call(
            x_ext, self.wf, self.we, self.ws, int(n), self.N, self.hb,
            self.Hx, self.gy, self.lead, self.offe, self.nbins,
            self.env_clamp, self.precision, self.act_f, self.act_e,
            bool(stats), outputs)


@functools.partial(jax.jit, static_argnums=tuple(range(4, 19)))
def _chain_call(x_ext, wf, we, ws, n, N, hb, Hx, gy, lead, offe, nbins,
                env_clamp, precision, act_f, act_e, stats,
                outputs=FusedChainKernel.ALL_OUTPUTS, ablate=frozenset()):
    C = x_ext.shape[0]
    nprog = -(-n // N)
    nf = n // 128
    want_f = "filtered" in outputs
    want_e = "envelope" in outputs
    want_s = "spectrogram" in outputs
    # program i reads columns [i*N, i*N+N) plus the halo [i*N+N, i*N+N+Hx)
    need = nprog * N + Hx
    if x_ext.shape[1] < need:
        x_ext = jnp.pad(x_ext, [(0, 0), (0, need - x_ext.shape[1])])
    else:
        x_ext = x_ext[:, :need]
    F = N // 128
    partial_tail = n < nprog * N
    # masked outputs shrink to one 128-lane column (filtered/envelope) or
    # one frame row (spectrogram) per program — negligible HBM writes
    Ny = N if want_f else 128
    Ne = N if want_e else 128
    Fs = F if want_s else 1
    y, e, s, p, g, q = pl.pallas_call(
        functools.partial(_chain_kernel, C=C, N=N, offf=0, gy=gy,
                          lead=lead, offe=offe, nbins=nbins,
                          env_clamp=env_clamp, precision=precision,
                          act_f=act_f, act_e=act_e,
                          n=n if partial_tail else None,
                          nf=nf if partial_tail else None,
                          outputs=outputs, ablate=ablate),
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((C, N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Hx), lambda i, r=N // Hx: (0, (i + 1) * r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wf.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(we.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ws.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, Ny), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Ne), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fs, C, nbins), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, nbins), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, nprog * Ny), jnp.float32),
            jax.ShapeDtypeStruct((C, nprog * Ne), jnp.float32),
            jax.ShapeDtypeStruct((nprog, Fs, C, nbins), jnp.float32),
            jax.ShapeDtypeStruct((nprog, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((nprog, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((nprog, C, nbins), jnp.float32),
        ],
        # larger blocks want more than the default 16 MB scoped VMEM; the
        # raised limit lets Mosaic keep double-buffering (measured ~4%)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
        interpret=jax.default_backend() != "tpu",
    )(x_ext, x_ext, wf, we, ws)
    out = (y[:, :n] if want_f else None,
           e[:, :n] if want_e else None,
           s.reshape(nprog * Fs, C, nbins)[:nf] if want_s else None)
    if stats:
        return out + ({"power": jnp.sum(p, axis=(0, 1)),
                       "env_sum": jnp.sum(g, axis=(0, 1)),
                       "psd_sum": jnp.sum(q, axis=0)},)
    return out
