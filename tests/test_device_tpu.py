"""Real-TPU device-numerics regression suite (opt-in).

The regular suite runs on a forced virtual CPU mesh where Pallas
interprets and every precision mode is exact f32 — it cannot observe
the MXU's bf16 behavior.  This module pins the ON-DEVICE accuracy
contract (device f32 within 1e-5 of scipy float64, CLAUDE.md
"Architecture invariants") and the measured error budgets of the mixed
per-stage / per-sub-block precision scheme.  Run it on the real chip:

    AUDIAN_TPU_TESTS_ON_TPU=1 python -m pytest tests/test_device_tpu.py -q

(the root conftest skips its CPU-mesh forcing under that variable).
Everything here is skipped unless the active jax backend is ``tpu``.
First run in a fresh process compiles over the tunnel (~1-3 min cold;
the persistent compilation cache makes later runs fast — a warm full
run is ~2-5 min).

Tunnel watchdog: the dev tunnel can go down for hours (CLAUDE.md), and
a hung tunnel used to be indistinguishable from a long first compile
(two observed 590 s zero-output hangs).  This module now prints a
per-test progress line, pre-flights the tunnel with a 120 s budget
before the first test, and runs a background heartbeat (a tiny cached
device op, verified to execute concurrently with in-flight remote
compiles) — four consecutive missed heartbeats (~2 min dead) abort the
run loudly instead of hanging silently.
"""

import os
import sys
import threading
import time

import numpy as np
import pytest
import scipy.signal as sig

import jax
import jax.numpy as jnp
from jax import lax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="device-numerics suite runs on the real TPU only "
           "(AUDIAN_TPU_TESTS_ON_TPU=1)")

RATE = 96000.0
C, N = 4, 1 << 17


class _TunnelWatchdog:
    """Background heartbeat distinguishing 'still compiling over the
    tunnel' (heartbeat alive) from 'tunnel hung' (heartbeat dead).
    Device execution of a tiny cached program proceeds concurrently
    with a remote compile (measured: ~50-100 ms heartbeats while a
    fresh chain kernel compiled), so dead heartbeats mean the tunnel
    itself stopped serving."""

    #: consecutive missed heartbeats before aborting (~2 min dead)
    MAX_MISSES = 4

    def __init__(self):
        self.current = "<collection>"
        self.t_test = time.monotonic()
        self._stop = threading.Event()
        self._thread = None
        self._hb = jax.jit(lambda x: jnp.sum(x) * 2.0)

    def _say(self, msg):
        print(f"[device-suite] {msg}", file=sys.stderr, flush=True)

    def _pulse(self, timeout):
        """Run the heartbeat op with a timeout; seconds or None."""
        out = {}

        def run():
            try:
                out["v"] = float(np.asarray(
                    self._hb(jnp.ones((8, 8), jnp.float32))))
            except Exception as e:  # pragma: no cover - backend failure
                out["err"] = e

        th = threading.Thread(target=run, daemon=True)
        t0 = time.monotonic()
        th.start()
        th.join(timeout)
        if th.is_alive() or "err" in out:
            return None
        return time.monotonic() - t0

    def preflight(self):
        self._say("pre-flighting the TPU tunnel (budget 120 s; first "
                  "heartbeat includes one tiny compile) ...")
        dt = self._pulse(120.0)
        if dt is None:
            pytest.exit(
                "TPU tunnel unresponsive: a trivial device op did not "
                "complete within 120 s.  The tunnel is likely DOWN "
                "(CLAUDE.md documents multi-hour outages where every "
                "fresh process hangs) — retry when "
                "`timeout 60 python -c 'import jax; jax.devices()'` "
                "answers.", returncode=3)
        self._say(f"tunnel alive (heartbeat {dt * 1000:.0f} ms)")

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="tunnel-watchdog")
        self._thread.start()

    def stop(self):
        self._stop.set()

    def _loop(self):
        misses = 0
        while not self._stop.wait(10.0):
            dt = self._pulse(20.0)
            in_test = time.monotonic() - self.t_test
            if dt is None:
                misses += 1
                self._say(
                    f"tunnel heartbeat MISSED ({misses}/"
                    f"{self.MAX_MISSES}) during {self.current!r} — a "
                    f"compile would NOT block the heartbeat; the tunnel "
                    f"looks hung")
                if misses >= self.MAX_MISSES:
                    self._say(
                        f"ABORTING: {self.MAX_MISSES} consecutive "
                        f"missed heartbeats (~2 min with the tunnel "
                        f"dead) while in {self.current!r}.  This is a "
                        f"hung TPU tunnel, not a long compile — see "
                        f"CLAUDE.md 'Environment gotchas'.")
                    os._exit(3)
            else:
                if misses:
                    self._say(f"tunnel recovered (heartbeat "
                              f"{dt * 1000:.0f} ms)")
                misses = 0
                if in_test > 45:
                    self._say(
                        f"{self.current!r} still running after "
                        f"{in_test:.0f} s; tunnel alive (heartbeat "
                        f"{dt * 1000:.0f} ms) — a cold first compile "
                        f"can take ~3 min")


@pytest.fixture(scope="module", autouse=True)
def _watchdog():
    wd = _TunnelWatchdog()
    wd.preflight()
    wd.start()
    yield wd
    wd.stop()


@pytest.fixture(autouse=True)
def _progress(request, _watchdog):
    _watchdog.current = request.node.name
    _watchdog.t_test = t0 = time.monotonic()
    print(f"\n[device-suite] {request.node.name} ...", file=sys.stderr,
          flush=True)
    yield
    print(f"[device-suite] {request.node.name} finished in "
          f"{time.monotonic() - t0:.1f} s", file=sys.stderr, flush=True)


@pytest.fixture(scope="module")
def _cache():
    import audian_tpu

    audian_tpu.enable_compilation_cache()


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    t = np.arange(N) / RATE
    tone = 0.4 * np.sin(2 * np.pi * 30000.0 * t) * (
        np.sin(2 * np.pi * 5.0 * t) > 0)
    return (tone[None, :]
            + 0.05 * rng.standard_normal((C, N))).astype(np.float32)


@pytest.fixture(scope="module")
def fused(_cache):
    from audian_tpu.models import get_preset

    return get_preset("bioacoustics").fused(RATE, eps=2e-6)


def test_chain_matches_scipy_float64_on_device(fused, signal):
    """The production fused chain on the real chip vs scipy float64
    oracles — the 1e-5 contract, measured where bf16 is real."""
    from audian_tpu.ops import design_filter, design_envelope_filter

    ck = fused.chain_kernel
    x_ext = np.pad(signal, [(0, 0), (ck.hb, ck.ha)])
    y, e, s = fused.chain_cf(jnp.asarray(x_ext), N)
    y, e, s = np.asarray(y), np.asarray(e), np.asarray(s)

    sos_f = np.asarray(design_filter(RATE, 2000.0, 40000.0), np.float64)
    sos_e = np.asarray(design_envelope_filter(RATE, 500.0), np.float64)
    x64 = np.pad(signal.astype(np.float64), [(0, 0), (ck.hb, ck.ha)])
    y64 = sig.sosfilt(sos_f, x64, axis=1)
    v64 = (np.pi / 2) * np.abs(y64)
    e64 = np.maximum(
        sig.sosfiltfilt(sos_e, v64, axis=1, padtype=None), 0.0)
    y64 = y64[:, ck.hb : ck.hb + N]
    e64 = e64[:, ck.hb : ck.hb + N]

    assert np.max(np.abs(y - y64)) < 1e-5
    assert np.max(np.abs(e - e64)) < 1e-5

    _f, _t, S = sig.spectrogram(
        y64, fs=RATE, window="hann", nperseg=256, noverlap=128,
        detrend=False, mode="psd", axis=1)
    ref = S.transpose(2, 0, 1)[: s.shape[0]]
    got = s[: ref.shape[0]]
    mask = ref > ref.max() * 1e-6  # within 60 dB of the peak
    ddb = np.abs(10 * np.log10(np.maximum(got, 1e-30))
                 - 10 * np.log10(np.maximum(ref, 1e-30)))[mask].max()
    assert ddb < 0.05  # u8 display tiles step ~0.3 dB


def test_light_blocks_within_budget_on_device(fused, signal):
    """The per-sub-block DEFAULT demotion vs an all-full all-HIGHEST
    kernel: errors must stay an order under the 1e-5 budget (measured
    6e-8 filter / 1.6e-6 envelope / 0.011 dB PSD when this landed)."""
    from audian_tpu.ops.pallas.chain import _chain_call

    ck = fused.chain_kernel
    assert any(not full for _kb, full in ck.act_e), \
        "headline design should have light envelope blocks"
    x_ext = jnp.asarray(np.pad(signal, [(0, 0), (ck.hb, ck.ha)]))

    def run(precision, act_f, act_e):
        return _chain_call(
            x_ext, ck.wf, ck.we, ck.ws, N, ck.N, ck.hb, ck.Hx, ck.gy,
            ck.lead, ck.offe, ck.nbins, ck.env_clamp, precision,
            act_f, act_e, False)

    H = lax.Precision.HIGHEST
    all_full_f = tuple((kb, True) for kb, _ in ck.act_f)
    all_full_e = tuple((kb, True) for kb, _ in ck.act_e)
    yo, eo, so = run((H, H, H), all_full_f, all_full_e)
    yn, en, sn = run(ck.precision, ck.act_f, ck.act_e)

    dy = float(jnp.max(jnp.abs(yn - yo)))
    de = float(jnp.max(jnp.abs(en - eo)))
    assert 0 < dy < 1e-6, dy   # nonzero: bf16 demotion is live on MXU
    assert 0 < de < 5e-6, de
    so, sn = np.asarray(so), np.asarray(sn)
    mask = so > so.max() * 1e-6
    ddb = np.abs(10 * np.log10(np.maximum(sn, 1e-30))
                 - 10 * np.log10(np.maximum(so, 1e-30)))[mask].max()
    assert ddb < 0.05, ddb


def test_light_block_boundary_mass_on_device(fused):
    """Adversarial classifier-boundary case (VERDICT r3 #7): a design
    whose light-block aggregate L1 mass sits just UNDER the
    LIGHT_MASS_FRAC demotion budget (the greedy takes every tail
    block), driven by a full-scale signal sign-matched to the demoted
    taps so their bf16 rounding error adds coherently — the worst case
    the aggregate-cap argument (`ops/pallas/chain.py:LIGHT_MASS_FRAC`)
    must bound.  Budgets must hold with NO slack assumptions about
    benign signals."""
    from audian_tpu.ops.pallas.chain import FusedChainKernel, _chain_call

    frac = FusedChainKernel.LIGHT_MASS_FRAC

    def spread(k, nblocks=3):
        # append a flat alternating-sign tail over `nblocks` extra
        # 128-blocks with aggregate mass 0.98x the demotion budget
        mass = float(np.abs(k).sum())
        tail_total = 0.98 * frac * mass / (1.0 - 0.98 * frac)
        tail = np.full(nblocks * 128, tail_total / (nblocks * 128))
        tail[1::2] *= -1.0
        return np.concatenate([np.asarray(k, np.float64), tail])

    h_adv = spread(fused._h_filt)
    g_adv = spread(fused._g_env)
    ck = FusedChainKernel(RATE, h_adv, g_adv, fused.env_delay,
                          np.asarray(fused.spec_w), fused.nbins,
                          env_clamp=fused.env_clamp, nfft=fused.nfft)
    # the greedy demoted the whole tail: light mass sits at the
    # boundary (measured in BANK space, the classifier's own units)
    for bank, act in ((np.asarray(ck.wf), ck.act_f),
                      (np.asarray(ck.we), ck.act_e)):
        mass = {kb: float(np.abs(bank[kb * 128 : (kb + 1) * 128]).sum())
                for kb in range(bank.shape[0] // 128)}
        light = sum(mass[kb] for kb, full in act if not full)
        total = sum(mass.values())
        assert 0.5 * frac < light / total <= frac, (light / total, frac)

    # full-scale Nyquist alternation matches the tail's sign pattern
    # (coherent worst case); the other channels probe DC and noise
    rng = np.random.default_rng(7)
    alt = np.tile([1.0, -1.0], N // 2)
    x = np.stack([
        alt,
        np.ones(N),
        np.clip(rng.standard_normal(N) / 3.0, -1.0, 1.0),
        np.sign(np.sin(2 * np.pi * 30000.0 * np.arange(N) / RATE)),
    ]).astype(np.float32)
    x_ext = jnp.asarray(np.pad(x, [(0, 0), (ck.hb, ck.ha)]))

    def run(precision, act_f, act_e):
        return _chain_call(
            x_ext, ck.wf, ck.we, ck.ws, N, ck.N, ck.hb, ck.Hx, ck.gy,
            ck.lead, ck.offe, ck.nbins, ck.env_clamp, precision,
            act_f, act_e, False)

    H = lax.Precision.HIGHEST
    yo, eo, so = run((H, H, H),
                     tuple((kb, True) for kb, _ in ck.act_f),
                     tuple((kb, True) for kb, _ in ck.act_e))
    yn, en, sn = run(ck.precision, ck.act_f, ck.act_e)
    dy = float(jnp.max(jnp.abs(yn - yo)))
    de = float(jnp.max(jnp.abs(en - eo)))
    assert dy < 1e-5, dy   # the architecture budget, no benign-signal slack
    assert de < 1e-5, de
    so, sn = np.asarray(so), np.asarray(sn)
    mask = so > so.max() * 1e-6
    ddb = np.abs(10 * np.log10(np.maximum(sn, 1e-30))
                 - 10 * np.log10(np.maximum(so, 1e-30)))[mask].max()
    assert ddb < 0.05, ddb


def test_interactive_browser_on_device(_cache, tmp_path):
    """Product-level interactive session on the real chip: open a PCM-16
    recording through the public :class:`DataBrowser`, scroll, scrub the
    filter, pull render tiles — windowed trace reads stay within the
    1e-5 contract of scipy float64 oracles, and once warm the steady
    state compiles nothing (the interactivity contract, on real
    hardware instead of the CPU mesh)."""
    import logging

    from audian_tpu.app import DataBrowser
    from audian_tpu.data import wavio
    from audian_tpu.ops import design_filter

    rate = 48000.0
    rng = np.random.default_rng(3)
    n = int(10.0 * rate)
    t = np.arange(n) / rate
    x = np.stack([
        0.4 * np.sin(2 * np.pi * 9000.0 * t) * (
            np.sin(2 * np.pi * 4.0 * t) > 0)
        + 0.05 * rng.standard_normal(n),
        0.3 * np.sin(2 * np.pi * 5000.0 * t),
    ], axis=1)
    p = tmp_path / "dev.wav"
    wavio.write_audio(p, x, rate, encoding="PCM_16")
    x16, _ = wavio.load_audio(p)  # ground truth after PCM-16 quantization

    b = DataBrowser(str(p))
    b.open()

    def interact(k):
        b.set_times(0.5 + 0.6 * k, 1.0)
        b.update_filter(highpass_cutoff=1500.0 + 100.0 * (k % 3),
                        lowpass_cutoff=20000.0)
        for c in range(2):
            b.trace_tile("filtered", c)
            b.spec_tile(c, quantize=True)
        b.power_spectrum(0)

    for k in range(4):  # warmup: compile every program variant (cached
        interact(k)     # across sessions by the persistent XLA cache)

    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Grab()
    loggers = [logging.getLogger("jax._src.dispatch"),
               logging.getLogger("jax._src.interpreters.pxla")]
    jax.config.update("jax_log_compiles", True)
    try:
        for lg in loggers:
            lg.addHandler(handler)
        for k in range(4, 8):
            interact(k)
    finally:
        jax.config.update("jax_log_compiles", False)
        for lg in loggers:
            lg.removeHandler(handler)
    compiles = [r for r in records if "Compiling" in r or "compilation" in r]
    assert not compiles, f"steady state recompiled on device: {compiles[:4]}"

    # windowed read of the filtered trace vs the scipy float64 oracle
    b.set_times(2.0, 1.0)
    tr = b.data["filtered"]
    i0, i1 = int(2.0 * rate), int(3.0 * rate)
    got = np.asarray(tr[i0:i1])
    sos = np.asarray(design_filter(rate, 1500.0 + 100.0 * (7 % 3),
                                   20000.0), np.float64)
    want = sig.sosfilt(sos, x16.astype(np.float64), axis=0)[i0:i1]
    assert np.max(np.abs(got - want)) < 1e-5
    b.close()


def test_fir_filter_matches_scipy_on_device(_cache, signal):
    """The standalone production FIR path (ops public API) on device."""
    from audian_tpu.ops import design_filter, fir_kernels, sosfilt_fir

    sos = design_filter(RATE, 2000.0, 10000.0)
    y = np.asarray(sosfilt_fir(fir_kernels(sos), jnp.asarray(signal),
                               axis=1))
    y64 = sig.sosfilt(np.asarray(sos, np.float64),
                      signal.astype(np.float64), axis=1)
    # truncated-FIR design tolerance + device f32: the 1e-5 contract
    assert np.max(np.abs(y - y64)) < 1e-5


def test_batch_detect_envelope_on_device(_cache):
    """The single-pass decimating envelope kernel (ops/pallas/envdet.py
    — the ``audian-songdetector`` hot path, otherwise exercised on-chip
    only by the bench) vs the scipy float64 oracle over a just-over-one
    -chunk recording, int16 raw input: pins the 1e-5 contract where the
    Mosaic block shapes and the chunk-edge exact patches are real."""
    import scipy.signal as sps

    from audian_tpu.analysis import events

    rng = np.random.default_rng(7)
    n = (1 << 21) + (1 << 16)  # > one chunk window: device fused path
    t = np.arange(n) / RATE
    tone = 0.4 * np.sin(2 * np.pi * 5000.0 * t) * (
        np.sin(2 * np.pi * 3.0 * t) > 0)
    x = tone[:, None] + 0.03 * rng.standard_normal((n, 2))
    q = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)

    hp, lp, envcut = 1000.0, 10000.0, 500.0
    _f, env, envrate = events.band_env(q, RATE, hp, lp, envcut,
                                       return_filtered=False, fused=True)
    # the same designs band_env builds (sticky pow2 budgets start fresh
    # per process; constructing after the call yields identical lengths)
    fdesign = events.FilterDesign.from_sos(
        sps.butter(1, events._clamp_band(hp, lp, RATE), "bandpass",
                   fs=RATE, output="sos"),
        pad_to=events._KERNEL_BUDGET["filt"] or None)
    edesign = events.FilterDesign.from_sos(
        sps.butter(1, events._clamp_cutoff(envcut, RATE), "lowpass",
                   fs=RATE, output="sos"),
        pad_to=events._KERNEL_BUDGET["env"] or None)
    step = int(np.round(RATE / min(envcut * 10, RATE)))
    assert envrate == RATE / step
    x64 = q.astype(np.float64) / 32768.0
    _y, env64 = events.detect_env_oracle(x64, step, fdesign, edesign)
    assert env.shape == env64.shape
    assert np.max(np.abs(env - env64)) < 1e-5


def test_window_matmul_odd_geometries_on_device(_cache):
    """Non-pow2 hops / kernel rows / output widths compile through REAL
    Mosaic (the CPU mesh interprets Pallas and cannot see the
    block-shape rules): G*S, the halo span, and the padded K must all
    be lane-aligned, and odd-O cf layouts must take the fco fallback.
    Regression for the Mosaic rejection of S=26/20/32 geometries."""
    from audian_tpu.ops.pallas.window_matmul import window_matmul

    rng = np.random.default_rng(11)
    for S, K, O, layout in ((26, 256, 129, "fco"), (32, 64, 32, "cf"),
                            (26, 256, 129, "cf")):
        Cc, n = 3, 4000
        x = jnp.asarray(rng.standard_normal((Cc, n)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((K, O)).astype(np.float32))
        nframes = (n - K) // S + 1
        out = np.asarray(window_matmul(x, w, S, nframes,
                                       out_layout=layout))
        xn = np.asarray(x, np.float64)
        wn = np.asarray(w, np.float64)
        ref = np.stack([xn[:, f * S : f * S + K] @ wn
                        for f in range(nframes)])
        if layout == "cf":
            out = (out[:, : nframes * O].reshape(Cc, nframes, O)
                   .transpose(1, 0, 2))
        scale = max(np.max(np.abs(ref)), 1e-9)
        err = np.max(np.abs(out - ref)) / scale
        assert err < 1e-5, f"S={S} K={K} O={O} {layout}: {err}"


def test_devicewatch_on_device(_cache):
    """The device-loss watchdog's probe and guarded pull on the REAL
    chip: the probe compiles once (warm path) and answers inside the
    tight heartbeat deadline afterwards; a guarded pull of a real
    device reduction completes without flipping the state.  (The loss
    and recovery machinery itself is fault-injection-tested in the CPU
    suite, tests/test_devicewatch.py — here the healthy-path timing
    assumptions are pinned where the tunnel is real.)"""
    import time as _time

    from audian_tpu.utils.devicewatch import DeviceWatch

    w = DeviceWatch()
    t0 = _time.monotonic()
    assert w._probe_alive(), "first (compile-inclusive) probe failed"
    first_s = _time.monotonic() - t0
    assert w._probe_warmed
    # warm probes must answer well inside the 20 s heartbeat deadline
    t0 = _time.monotonic()
    assert w._probe_alive()
    warm_s = _time.monotonic() - t0
    assert warm_s < 5.0, f"warm heartbeat took {warm_s:.1f}s"
    # a guarded pull of a real device op passes through unchanged
    x = jnp.ones((256, 256), jnp.float32)
    got = w.pull(lambda: float(np.asarray(jnp.sum(x))), what="test sum")
    assert got == 65536.0
    assert not w.lost
    print(f"  [devicewatch] first probe {first_s:.2f}s, "
          f"warm {warm_s * 1e3:.0f}ms", flush=True)
