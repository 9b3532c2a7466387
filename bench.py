"""audian-tpu headline benchmarks.

BASELINE.md target: full NFFT-256/50% spectrogram + 2-40 kHz bandpass +
envelope over a 1 hour x 16 channel x 96 kHz recording in under 2 s on one
TPU v5e chip.

Three metrics, one JSON line each:

1. ``io+compute``: the honest end-to-end path — a real two-file PCM-16
   recording on disk read through :class:`audian_tpu.data.AudioLoader`
   (background block prefetch on), int16 host->device upload, the fused
   chain, fenced stats.  ``vs_baseline`` is the real-time factor
   (recording seconds processed per wall second; target 1x).  On this dev
   host the number is dominated by the environment (slow disk, tunneled
   device link) — see docs/performance.md.
2. ``batch song-detect envelope``: detect()'s front half (the
   ``audian-songdetector`` hot loop) on the single-pass fused decimating
   kernel (``ops/pallas/envdet.py``) over device-resident chunks;
   ``vs_baseline`` is the speedup over the unfused chunk program it
   replaced.
3. ``spectrogram+bandpass+envelope ... wall`` (the headline, printed
   LAST): the device compute path with on-device synthesized audio, so
   the tunnel doesn't pollute the kernel numbers.  This is the
   BASELINE.md < 2 s target.  The chunks are device-resident in the
   loader's raw PCM-16 upload format (int16, sample = k/2^15 — what a
   real recording looks like after ``Data._put_raw``); the chain kernel
   dequantizes in VMEM, bit-equal to feeding dequantized float32 but at
   half the HBM read bytes of a DMA-bound kernel.

Timing note: on this backend ``block_until_ready`` does not actually block,
so completion is forced by pulling a (tiny) reduced result to the host —
executions complete in order, so the final pull fences the whole queue.
"""

import json
import os
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp


RATE = 96000.0
CHANNELS = 16
HOURS = 1.0
NFFT, HOP = 256, 128
TARGET_S = 2.0
CHUNK = 1 << 22  # ~43.7 s of audio per device chunk

#: io+compute metric: two PCM-16 files of this many seconds each
IO_FILE_SECONDS = 30.0
IO_CHUNK = 1 << 21


def build_chain():
    from audian_tpu.models import get_preset

    # the headline chain IS the "bioacoustics" preset (2-40 kHz bandpass
    # + 500 Hz envelope + NFFT-256 spectrogram), so the benchmark and the
    # interactive/batch/sharded runs agree by construction.  eps is the
    # FIR truncation tolerance: 2e-6 keeps outputs well inside the 1e-5
    # scipy-oracle budget while shortening the envelope kernel.
    return get_preset("bioacoustics").fused(RATE, eps=2e-6)


def bench_kernel(fused):
    """Device compute path over synthesized chunks (the headline)."""
    ck = fused.chain_kernel
    hb, ha = ck.hb, ck.ha
    total_frames = int(HOURS * 3600 * RATE)
    nchunks = -(-total_frames // CHUNK)

    @jax.jit
    def make_chunk(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        shape = (CHANNELS, hb + CHUNK + ha)
        t = (jnp.arange(shape[1], dtype=jnp.float32) / RATE)[None, :]
        tone = jnp.sin(2 * jnp.pi * 30000.0 * t) * (
            jnp.sin(2 * jnp.pi * 5.0 * t) > 0)
        x = 0.5 * tone + 0.05 * jax.random.normal(key, shape)
        # int16: the chunk is a PCM-16 recording resident on device in
        # the loader's raw16 upload format (sample = k/2^15); the chain
        # kernel dequantizes in VMEM — half the HBM read bytes on a
        # DMA-bound chain, outputs bit-equal to feeding the dequantized
        # f32 stream (tests/test_fused.py::test_single_pass_chain_int16_input)
        return jnp.clip(jnp.round(x * 32768.0), -32768, 32767
                        ).astype(jnp.int16)

    @jax.jit
    def chain(ext):
        # ONE device pass: filter -> {envelope, PSD} while the filtered
        # stream lives in VMEM (the chain is HBM-bound on this chip).
        # All three full outputs are written to HBM by the kernel; the
        # in-kernel chunk statistics (computed from every produced value)
        # fence the chunk without a second read of ~800 MB per chunk —
        # real runtimes likewise consume the stats for auto-leveling and
        # stream the big outputs onward
        _y, _e, _s, st = fused.chain_cf(ext, CHUNK, stats=True)
        return st["power"], st["env_sum"], st["psd_sum"]

    # distinct pre-generated chunks, device-resident
    chunks = [make_chunk(i) for i in range(4)]
    _ = [np.asarray(c[0, 0]) for c in chunks]

    # warm-up / compile
    _ = np.asarray(chain(chunks[0])[0])

    # best of 3 identical passes: the tunneled runtime's dispatch
    # bandwidth varies run-to-run by 20-40% (docs/performance.md), and
    # the chip's actual capability is what the headline tracks
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        out = None
        for i in range(nchunks):
            out = chain(chunks[i % len(chunks)])
        _ = np.asarray(out[0])  # fences the in-order queue
        best = min(best, time.perf_counter() - t0)
    return best


def bench_detect():
    """Batch song-detection envelope (detect()'s front half, the
    ``audian-songdetector`` hot loop) over 1 h x 16 ch x 96 kHz,
    device-resident chunks: the single-pass fused decimating kernel
    (``ops/pallas/envdet.py`` — band-pass, squaring, smoothing, and
    1-in-19 decimation with the full-rate stream VMEM-resident) vs the
    unfused chunk program that materializes every intermediate in HBM.
    Returns (fused_s, unfused_s)."""
    import scipy.signal as sps

    from audian_tpu.ops import FilterDesign
    from audian_tpu.analysis import events

    fdesign = FilterDesign.from_sos(
        sps.butter(1, (1000.0, 10000.0), "bandpass", fs=RATE,
                   output="sos"))
    edesign = FilterDesign.from_sos(
        sps.butter(1, 500.0, "lowpass", fs=RATE, output="sos"))
    step = int(np.round(RATE / min(500.0 * 10, RATE)))
    halo = int(fdesign.fir.length + edesign.fir.length
               + fdesign.padlen + edesign.padlen)
    halo = 1 << max(halo - 1, 2047).bit_length()
    Lc = events._CHUNK
    W = Lc + 2 * halo
    nchunks = None  # set after _make_envdet picks the aligned chunk

    @jax.jit
    def make_chunk(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(2), seed)
        t = (jnp.arange(W, dtype=jnp.float32) / RATE)[:, None]
        tone = jnp.sin(2 * jnp.pi * 6500.0 * t) * (
            jnp.sin(2 * jnp.pi * 1.0 * t) > 0)
        x = 0.4 * tone + 0.05 * jax.random.normal(key, (W, CHANNELS))
        return jnp.clip(jnp.round(x * 32768.0), -32768, 32767
                        ).astype(jnp.int16)

    chunks = [make_chunk(i) for i in range(3)]
    _ = [np.asarray(c[0, 0]) for c in chunks]

    made = events._make_envdet(fdesign, edesign, step, halo)
    assert made is not None, "detect geometry not coverable by the fused path"
    envdet, chunk_f = made
    nchunks = -(-int(HOURS * 3600 * RATE) // chunk_f)

    def fused_fn(xw):
        return jnp.sum(envdet(xw, halo))

    @jax.jit
    def unfused_fn(xw):
        _y, env = events._band_env_device(fdesign, edesign, xw)
        return jnp.sum(events._strided_at(env, 0, step))

    def run(fn, reps):
        _ = np.asarray(fn(chunks[0]))  # compile
        best = float("inf")
        for _rep in range(reps):
            t0 = time.perf_counter()
            out = None
            for i in range(nchunks):
                out = fn(chunks[i % len(chunks)])
            _ = np.asarray(out)  # fences the in-order queue
            best = min(best, time.perf_counter() - t0)
        return best

    # the unfused path is only the comparison point: one rep keeps the
    # benchmark short (it is ~13x the fused wall time)
    unfused_s = run(unfused_fn, 1)
    fused_s = run(fused_fn, 3)
    return fused_s, unfused_s


def _bench_recording():
    """Two cached PCM-16 WAV files (written once, reused across runs)."""
    from audian_tpu.data import wavio

    cache = Path(os.environ.get("XDG_CACHE_HOME",
                                Path.home() / ".cache"))
    cache = cache / "audian-tpu" / "bench"
    cache.mkdir(parents=True, exist_ok=True)
    frames = int(IO_FILE_SECONDS * RATE)
    files = []
    for i in range(2):
        f = cache / f"io_{CHANNELS}ch_{frames}f_{i}.wav"
        files.append(f)
        if f.exists() and f.stat().st_size > frames * CHANNELS * 2:
            continue
        t = (np.arange(frames, dtype=np.float64) + i * frames) / RATE
        tone = np.sin(2 * np.pi * 30000.0 * t) * (
            np.sin(2 * np.pi * 5.0 * t) > 0)
        rng = np.random.default_rng(i)
        x = (0.5 * tone[:, None]
             + 0.05 * rng.standard_normal((frames, CHANNELS))
             ).astype(np.float32)
        wavio.write_audio(f, x, RATE, encoding="PCM_16")
    return files


def bench_io(fused):
    """Disk -> AudioLoader -> int16 upload -> fused chain -> fenced stats
    over a real multi-file PCM-16 recording (the BASELINE "end-to-end"
    framing; compile excluded via one warm-up chunk)."""
    from audian_tpu.data.loader import AudioLoader

    files = _bench_recording()
    ck = fused.chain_kernel
    hb, ha = ck.hb, ck.ha
    ext_frames = hb + IO_CHUNK + ha

    @jax.jit
    def prep(q):
        # transpose on device (int16: half the bytes of an f32 transpose);
        # the host link carries int16 and the chain kernel dequantizes
        # in VMEM (bit-exact for PCM-16 — ops/pallas/chain.py)
        return q.T

    @jax.jit
    def chain(ext):
        _y, _e, _s, st = fused.chain_cf(ext, IO_CHUNK, stats=True)
        return st["power"], st["env_sum"], st["psd_sum"]

    loader = AudioLoader(files)
    assert loader.channels == CHANNELS
    nchunks = loader.frames // IO_CHUNK

    # persistent host staging: first touch of fresh pages is ~100x slower
    # than warm memory on this host, so the read path reuses two
    # alternating int16 upload buffers (two so a device_put still in
    # flight never races the next chunk's rewrite).  PCM-16 sources read
    # their raw quantized samples straight into the upload buffer
    # (loader.read_raw16_into — bit-exact vs decode+requantize, and skips
    # several full host passes); other encodings decode to f32 and
    # quantize.
    qbufs = [np.empty((ext_frames, loader.channels), np.int16)
             for _ in range(2)]
    ext = (None if loader.raw16_capable
           else np.zeros((ext_frames, loader.channels), np.float32))

    def read_ext(k):
        start = k * IO_CHUNK - hb
        lo = max(start, 0)
        hi = min(start + ext_frames, loader.frames)
        q = qbufs[k % 2]
        if ext is None:
            if lo > start:
                q[: lo - start] = 0
            if hi - start < ext_frames:
                q[hi - start :] = 0
            loader.read_raw16_into(lo, hi - lo, q[lo - start : hi - start])
            return q
        if lo > start:
            ext[: lo - start] = 0.0
        if hi - start < ext_frames:
            ext[hi - start :] = 0.0
        loader._read_into(lo, hi - lo, ext[lo - start : hi - start])
        np.multiply(ext, 32768.0, out=ext)
        np.rint(ext, out=ext)
        q[:] = ext  # cast copy into the persistent int16 buffer
        return q

    # warm-up / compile on the first chunk's shapes
    _ = np.asarray(chain(prep(jax.device_put(read_ext(0))))[0])

    # one-chunk read-ahead: disk decode of chunk k+1 overlaps chunk k's
    # upload+compute (device_put snapshots the host buffer before
    # returning on this backend, so the reader may rewrite a buffer as
    # soon as the next put of it has been issued — hence two buffers)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        t0 = time.perf_counter()
        out = None
        fut = pool.submit(read_ext, 0)
        for k in range(nchunks):
            q = fut.result()
            if k + 1 < nchunks:
                fut = pool.submit(read_ext, k + 1)
            out = chain(prep(jax.device_put(q)))
        _ = np.asarray(out[0])  # fences the in-order queue
        elapsed = time.perf_counter() - t0
    loader.close()
    audio_seconds = nchunks * IO_CHUNK / RATE
    return elapsed, audio_seconds


def main():
    import audian_tpu
    audian_tpu.enable_compilation_cache()

    fused = build_chain()

    io_elapsed, audio_seconds = bench_io(fused)
    print(json.dumps({
        "metric": (f"io+compute disk->chain "
                   f"{audio_seconds:.0f}s x {CHANNELS}ch x 96kHz wall"),
        "value": round(io_elapsed, 4),
        "unit": "s",
        "vs_baseline": round(audio_seconds / io_elapsed / 1.0, 3),
    }))

    detect_s, detect_unfused_s = bench_detect()
    print(json.dumps({
        "metric": ("batch song-detect envelope 1h x 16ch x 96kHz wall "
                   "(fused decimating path; vs_baseline = speedup over "
                   "the unfused chunk program)"),
        "value": round(detect_s, 4),
        "unit": "s",
        "vs_baseline": round(detect_unfused_s / detect_s, 3),
    }))

    elapsed = bench_kernel(fused)
    print(json.dumps({
        "metric": "spectrogram+bandpass+envelope 1h x 16ch x 96kHz wall",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(TARGET_S / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
