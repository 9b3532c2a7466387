"""Fused channels-first Pallas chain vs scipy oracles (interpret mode on
the CPU mesh; the same code compiles to Mosaic on TPU)."""

import numpy as np
import pytest
import scipy.signal as sps

from audian_tpu.ops import design_filter, design_envelope_filter
from audian_tpu.ops.fused import FusedChainCF


RATE = 48000.0


@pytest.fixture(scope="module")
def signal(rng):
    n = 20000
    t = np.arange(n) / RATE
    x = np.sin(2 * np.pi * 5000.0 * t) * (np.sin(2 * np.pi * 6.0 * t) > 0)
    x = x + 0.05 * rng.standard_normal(n)
    return np.stack([x, 0.5 * x], axis=0).astype(np.float32)  # (C, n)


@pytest.fixture(scope="module")
def chain():
    return FusedChainCF(
        RATE,
        filt_sos=design_filter(RATE, 1000.0, 8000.0),
        env_sos=design_envelope_filter(RATE, 500.0),
        nfft=256, hop=128, eps=1e-8,
    )


def test_filtered_matches_scipy(chain, signal):
    got = np.asarray(chain.filtered_cf(signal))
    want = sps.sosfilt(design_filter(RATE, 1000.0, 8000.0),
                       signal.astype(np.float64), axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_envelope_matches_scipy_interior(chain, signal):
    y = sps.sosfilt(design_filter(RATE, 1000.0, 8000.0),
                    signal.astype(np.float64), axis=1)
    want = sps.sosfiltfilt(design_envelope_filter(RATE, 500.0),
                           (np.pi / 2) * np.abs(y), axis=1)
    want[want < 0] = 0
    got = np.asarray(chain.envelope_cf(jnp_array(y)))
    d = chain.env_delay
    np.testing.assert_allclose(got[:, d:-d], want[:, d:-d], atol=1e-5)


def jnp_array(x):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(x, np.float32))


def test_spectrogram_matches_scipy(chain, signal):
    y = signal.astype(np.float64)
    _, _, want = sps.spectrogram(
        y, fs=RATE, window="hann", nperseg=256, noverlap=128,
        detrend=False, scaling="density", mode="psd", axis=1)
    got = np.asarray(chain.spectrogram_fc(jnp_array(y)))
    # scipy axis=1 -> (C, freq, time); ours (time, C, freq)
    np.testing.assert_allclose(got, want.transpose(2, 0, 1), rtol=1e-5,
                               atol=1e-10)


def test_ifir_envelope_matches_dense(signal):
    """The two-stage IFIR envelope equals the dense symmetric-kernel
    convolution within the fit tolerance (design.ifir_factor docstring)."""
    kw = dict(filt_sos=None,
              env_sos=design_envelope_filter(RATE, 500.0), eps=1e-8)
    ifir = FusedChainCF(RATE, ifir=True, **kw)
    dense = FusedChainCF(RATE, ifir=False, **kw)
    assert ifir.env_mode == "ifir" and dense.env_mode == "dense"
    x = jnp_array(signal)
    got = np.asarray(ifir.envelope_cf(x))
    want = np.asarray(dense.envelope_cf(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-6)


def test_ifir_odd_length_stream(signal):
    """IFIR path pads non-multiple-of-M lengths correctly."""
    chain = FusedChainCF(RATE, env_sos=design_envelope_filter(RATE, 500.0),
                         eps=1e-6)
    x = jnp_array(signal[:, :19997])
    e = np.asarray(chain.envelope_cf(x))
    assert e.shape == (2, 19997)
    e2 = np.asarray(chain.envelope_cf(jnp_array(signal)))
    # the final env_delay samples legitimately differ (they depend on
    # samples beyond the truncated stream, zero-padded here)
    valid = 19997 - chain.env_delay
    np.testing.assert_allclose(e[:, :valid], e2[:, :valid], atol=1e-6)


def test_single_pass_chain_matches_stages(chain, signal):
    """The one-HBM-pass fused kernel (ops/pallas/chain.py) produces the
    same filtered/envelope/PSD values as the per-stage path."""
    import jax.numpy as jnp

    ck = chain.chain_kernel
    assert ck is not None
    C, n_all = signal.shape
    n = 2048  # output region, a multiple of 128
    x = jnp_array(signal)
    # extended stream for the fused kernel
    x_ext = jnp.pad(x, [(0, 0), (ck.hb, 0)])
    y1, e1, s1 = chain.chain_cf(x_ext, n)
    # per-stage oracle over the same stream semantics
    hb = ck.hb
    y_ref = np.asarray(chain.filtered_cf(x))
    e_ref = np.asarray(chain.envelope_cf(jnp_array(y_ref)))
    s_ref = np.asarray(chain.spectrogram_fc(jnp_array(y_ref),
                                            nframes=n // 128))
    np.testing.assert_allclose(np.asarray(y1), y_ref[:, :n], atol=2e-6)
    # envelope interior (edges depend on halo treatment)
    d = chain.env_delay
    np.testing.assert_allclose(np.asarray(e1)[:, d:n - d],
                               e_ref[:, d:n - d], atol=3e-6)
    np.testing.assert_allclose(np.asarray(s1), s_ref, rtol=1e-4,
                               atol=1e-9)


def test_full_chain_shapes(chain, signal):
    out = chain(signal)
    C, n = signal.shape
    assert out["filtered"].shape == (C, n)
    assert out["envelope"].shape == (C, n)
    nf = (n - 256) // 128 + 1
    assert out["spectrogram"].shape == (nf, C, 129)


@pytest.mark.parametrize("nfft,ch", [(512, 4), (128, 1)])
def test_single_pass_chain_geometries(rng, nfft, ch):
    """The fused kernel handles other NFFT buckets and channel counts."""
    import jax.numpy as jnp

    chain = FusedChainCF(RATE,
                         filt_sos=design_filter(RATE, 1000.0, 8000.0),
                         env_sos=design_envelope_filter(RATE, 500.0),
                         nfft=nfft, hop=128, eps=1e-6)
    ck = chain.chain_kernel
    assert ck is not None
    n = 1024
    x = jnp.asarray(rng.standard_normal(
        (ch, ck.hb + n + ck.ha)).astype(np.float32))
    y, e, s = chain.chain_cf(x, n)
    assert y.shape == (ch, n) and e.shape == (ch, n)
    assert s.shape == (n // 128, ch, nfft // 2 + 1)
    y_ref = np.asarray(chain.filtered_cf(x))[:, ck.hb : ck.hb + n]
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-6)
    s_ref = np.asarray(chain.spectrogram_fc(
        jnp.asarray(np.asarray(chain.filtered_cf(x))[:, ck.hb:]),
        nframes=n // 128))
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-4, atol=1e-9)


@pytest.mark.parametrize("n", [2048, 1920])  # exact grid and padded tail
def test_single_pass_chain_stats(chain, rng, n):
    """In-kernel chunk statistics equal reductions of the full outputs,
    including when the grid is padded past ``n``."""
    import jax.numpy as jnp

    ck = chain.chain_kernel
    x = jnp.asarray(rng.standard_normal(
        (2, ck.hb + n + ck.ha)).astype(np.float32))
    y, e, s, st = chain.chain_cf(x, n, stats=True)
    np.testing.assert_allclose(np.asarray(st["power"]),
                               np.sum(np.asarray(y) ** 2, axis=1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st["env_sum"]),
                               np.sum(np.asarray(e), axis=1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st["psd_sum"]),
                               np.sum(np.asarray(s), axis=0),
                               rtol=1e-5, atol=1e-9)


def test_mixed_precision_split_is_live_and_tight(chain, signal):
    """The default per-stage precision runs the 3-pass bf16 split on the
    envelope/PSD stages.  Against an all-HIGHEST kernel the filtered
    stream must be identical (same HIGHEST passes) while envelope and
    PSD differ by a tiny but NONZERO amount — exact equality would mean
    the hi/lo bf16 split got constant-folded back into plain dots (the
    XLA simplifier does exactly that outside Pallas, see
    docs/performance.md), silently degrading device accuracy to
    DEFAULT's ~3.6e-3."""
    from jax import lax
    from audian_tpu.ops.pallas.chain import FusedChainKernel

    ck = chain.chain_kernel
    assert ck.precision == FusedChainKernel.DEFAULT_PRECISION
    hi = FusedChainKernel(
        RATE, chain._h_filt, chain._g_env, chain.env_delay,
        np.asarray(chain.spec_w), chain.nbins,
        env_clamp=chain.env_clamp, nfft=chain.nfft,
        precision=lax.Precision.HIGHEST)
    assert hi.hb == ck.hb and hi.ha == ck.ha
    C, n = signal.shape
    x = jnp_array(np.pad(signal, [(0, 0), (ck.hb, ck.ha)]))
    n_out = n - (n % 128) or 128
    y1, e1, s1 = ck(x, n_out)
    y2, e2, s2 = hi(x, n_out)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    de = np.abs(np.asarray(e1) - np.asarray(e2)).max()
    ds = np.abs(np.asarray(s1) - np.asarray(s2)).max()
    assert 0 < de < 1e-5, de   # split live (nonzero) and inside budget
    assert 0 < ds < 1e-6, ds


def test_active_block_mass_classification():
    """`FusedChainKernel._active` drops all-zero bank sub-blocks and
    flags the lightest blocks (full=False) while their AGGREGATE L1
    mass stays under LIGHT_MASS_FRAC of the bank total; heavy blocks
    stay full."""
    from audian_tpu.ops.pallas.chain import FusedChainKernel

    bank = np.zeros((512, 128), np.float32)
    bank[130:250] = 1.0            # block 1: heavy
    bank[260] = 1e-5               # block 2: light tail
    # block 0 and 3 all-zero: dropped entirely
    act = FusedChainKernel._active(bank)
    assert act == ((1, True), (2, False))

    # many tails each under the per-block threshold must NOT all go
    # light: the budget is aggregate, so only the smallest fit under it.
    # Bulk mass ~49152 -> budget ~49.2; tails of mass 32 each (6.5e-4 of
    # the total individually) sum to 96 — greedy admits exactly one.
    bank = np.zeros((8 * 128, 128), np.float32)
    bank[0 * 128] = 1e-4               # tiny tail: mass 0.0128
    bank[1 * 128] = 0.25               # three near-threshold tails...
    bank[2 * 128] = 0.25
    bank[3 * 128] = 0.25
    bank[4 * 128 : 7 * 128] = 1.0      # heavy bulk
    act = FusedChainKernel._active(bank)
    flags = dict(act)
    assert flags[0] is False
    assert sum(not flags[k] for k in (1, 2, 3)) == 1
    assert flags[4] and flags[5] and flags[6]


def test_bf16x4_filter_tightens_the_x3_split(chain, signal):
    """The 4-pass split mode (BF16X4) keeps the lo*lo cross product the
    3-pass mode drops: against an all-HIGHEST filter it must land at
    least as close as BF16X3 does, and both stay inside the 1e-5
    budget (on-device measurements: x3 ~1e-5, x4 ~5.8e-6, HIGHEST
    ~1e-7 — see chain.py's precision ladder notes)."""
    from jax import lax
    from audian_tpu.ops.pallas.chain import (FusedChainKernel, BF16X3,
                                             BF16X4)

    def mk(prec_f):
        return FusedChainKernel(
            RATE, chain._h_filt, chain._g_env, chain.env_delay,
            np.asarray(chain.spec_w), chain.nbins,
            env_clamp=chain.env_clamp, nfft=chain.nfft,
            precision=(prec_f, BF16X3, BF16X3))

    C, n = signal.shape
    ck = chain.chain_kernel
    x = jnp_array(np.pad(signal, [(0, 0), (ck.hb, ck.ha)]))
    n_out = n - (n % 128) or 128
    y_hi = np.asarray(mk(lax.Precision.HIGHEST)(x, n_out)[0])
    d3 = np.abs(np.asarray(mk(BF16X3)(x, n_out)[0]) - y_hi).max()
    d4 = np.abs(np.asarray(mk(BF16X4)(x, n_out)[0]) - y_hi).max()
    assert 0 < d3 < 1e-5, d3
    assert d4 <= d3, (d4, d3)


def test_single_pass_chain_int16_input(chain, signal):
    """int16 (raw PCM-16) input is dequantized inside the kernel with the
    loader's k/2^15 convention and gives exactly the same outputs as
    feeding the dequantized float32 stream (half the HBM read bytes on a
    DMA-bound chain — docs/performance.md)."""
    import jax.numpy as jnp

    ck = chain.chain_kernel
    n = 2048
    x = jnp.pad(jnp_array(signal), [(0, 0), (ck.hb, 0)])
    q = jnp.clip(jnp.round(x * 32768.0), -32768, 32767).astype(jnp.int16)
    xq = q.astype(jnp.float32) / 32768.0
    y_f, e_f, s_f = chain.chain_cf(xq, n)
    y_q, e_q, s_q = chain.chain_cf(q, n)
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_f))
    np.testing.assert_array_equal(np.asarray(e_q), np.asarray(e_f))
    np.testing.assert_array_equal(np.asarray(s_q), np.asarray(s_f))


def test_single_pass_chain_output_mask(chain, signal):
    """The static ``outputs`` mask returns exactly the requested stages
    with values identical to the full chain (masked positions are None,
    their stats report zero) — the DMA-traffic lever for batch consumers
    that need only one output (e.g. envelope-only song detection)."""
    import itertools

    import jax.numpy as jnp

    ck = chain.chain_kernel
    n = 2048
    x = jnp.pad(jnp_array(signal), [(0, 0), (ck.hb, 0)])
    y0, e0, s0, st0 = chain.chain_cf(x, n, stats=True)
    names = ("filtered", "envelope", "spectrogram")
    refs = dict(zip(names, (y0, e0, s0)))
    for r in (1, 2):
        for outputs in itertools.combinations(names, r):
            got = chain.chain_cf(x, n, stats=True, outputs=outputs)
            *vals, st = got
            for name, val in zip(names, vals):
                if name in outputs:
                    np.testing.assert_array_equal(
                        np.asarray(val), np.asarray(refs[name]),
                        err_msg=f"{name} with outputs={outputs}")
                else:
                    assert val is None, (name, outputs)
            for key, name in (("power", "filtered"),
                              ("env_sum", "envelope"),
                              ("psd_sum", "spectrogram")):
                if name in outputs:
                    np.testing.assert_array_equal(np.asarray(st[key]),
                                                  np.asarray(st0[key]))
                else:
                    assert not np.any(np.asarray(st[key]))


def test_chain_output_mask_rejects_bad_names(chain, signal):
    import jax.numpy as jnp

    ck = chain.chain_kernel
    x = jnp.zeros((2, ck.hb + 256), jnp.float32)
    with pytest.raises(ValueError, match="outputs"):
        chain.chain_cf(x, 128, outputs=("psd",))
    with pytest.raises(ValueError, match="outputs"):
        chain.chain_cf(x, 128, outputs=())


def test_fused_call_output_mask(chain, signal):
    """The per-stage ``FusedChainCF.__call__`` honors the same mask."""
    full = chain(signal)
    env_only = chain(signal, outputs=("envelope",))
    assert set(env_only) == {"envelope"}
    np.testing.assert_array_equal(np.asarray(env_only["envelope"]),
                                  np.asarray(full["envelope"]))
