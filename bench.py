"""audian-tpu headline benchmarks.

BASELINE.md target: full NFFT-256/50% spectrogram + 2-40 kHz bandpass +
envelope over a 1 hour x 16 channel x 96 kHz recording in under 2 s on one
TPU v5e chip.

Four metrics, one JSON line each:

1. ``io+compute``: the honest end-to-end path — a real two-file PCM-16
   recording on disk read through :class:`audian_tpu.data.AudioLoader`
   (background block prefetch on), int16 host->device upload, the fused
   chain, fenced stats.  ``vs_baseline`` is the real-time factor
   (recording seconds processed per wall second; target 1x).  On this dev
   host the number is dominated by the environment (tunneled device
   link) — the ``components`` field breaks the wall into read / upload /
   dispatch / fence so a regression in the overlap machinery is
   distinguishable from disk or tunnel weather (the page cache is
   dropped first when permitted; this host's virtio disk still serves
   guest-cold reads from the hypervisor cache).  See docs/performance.md.
1b. ``io+compute FLAC``: the same pipeline decoding a FLAC container of
   identical PCM at 8 channels (the FLAC spec ceiling) against a
   same-shape WAV baseline: the compressed path wins only where storage
   bandwidth is below ``decode_rate x (1 - flac/wav bytes)`` (~27 MB/s
   for this corpus's 0.81x compression at the native decoder's
   ~150 MB/s PCM; archival recordings compressing 2x+ break even near
   75 MB/s); the components show which regime the host is in.
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


def _bench_recording(container="wav", channels=CHANNELS):
    """Two cached recording files (written once, reused across runs).

    ``container="flac"`` holds the SAME int16 samples FLAC-compressed
    (encoded once by the FFmpeg oracle when available — fast C encode of
    the bench input; the measured path is the repo's own decoder — else
    by the repo encoder).  The FLAC legs run at ``channels<=8`` (the
    FLAC spec's channel ceiling).  Returns None when the FLAC variant
    cannot be produced."""
    from audian_tpu.data import wavio

    cache = Path(os.environ.get("XDG_CACHE_HOME",
                                Path.home() / ".cache"))
    cache = cache / "audian-tpu" / "bench"
    cache.mkdir(parents=True, exist_ok=True)
    frames = int(IO_FILE_SECONDS * RATE)
    files = []
    for i in range(2):
        f = cache / f"io_{channels}ch_{frames}f_{i}.wav"
        files.append(f)
        if f.exists() and f.stat().st_size > frames * channels * 2:
            continue
        t = (np.arange(frames, dtype=np.float64) + i * frames) / RATE
        tone = np.sin(2 * np.pi * 30000.0 * t) * (
            np.sin(2 * np.pi * 5.0 * t) > 0)
        rng = np.random.default_rng(i)
        x = (0.5 * tone[:, None]
             + 0.05 * rng.standard_normal((frames, channels))
             ).astype(np.float32)
        wavio.write_audio(f, x, RATE, encoding="PCM_16")
    if container == "wav":
        return files
    if channels > 8:
        return None  # FLAC stores at most 8 channels
    from audian_tpu import native
    from audian_tpu.data import flac

    flacs = []
    for f in files:
        g = f.with_suffix(".flac")
        flacs.append(g)
        if g.exists() and g.stat().st_size > 0:
            continue
        info = wavio.wav_info(f)
        q16 = np.empty((info[2], info[1]), np.int16)
        wavio.read_frames_raw16(f, 0, info[2], info, q16)
        try:
            if not native.ff_flac_encode(g, q16.astype(np.int32),
                                         int(info[0]), bits=16, level=5):
                flac.write_flac(g, q16, info[0])
        except Exception:
            return None
    return flacs


def _drop_page_cache():
    """Drop the OS page cache (root-only) so the io legs measure COLD
    reads — otherwise the recording written moments ago is served from
    RAM and the disk never shows up.  Returns False (and the metric
    notes warm cache) when not permitted."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
        return True
    except OSError:
        return False


def bench_io(fused, files):
    """Disk -> AudioLoader -> int16 upload -> fused chain -> fenced stats
    over a real multi-file recording (the BASELINE "end-to-end" framing;
    compile excluded via one warm-up chunk).

    Returns ``(wall_s, audio_seconds, components)`` where components
    break the wall down: ``read_s`` (disk + decode on the reader
    thread, which OVERLAPS the device work — components exceed the
    wall when the overlap is healthy), ``upload_s`` (host-side
    device_put time), ``bytes_read`` (container bytes), and
    ``open_s`` (loader open incl. the FLAC frame-index scan)."""
    from audian_tpu.data.loader import AudioLoader

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

    t_open = time.perf_counter()
    loader = AudioLoader(files)
    if loader.raw16_capable:
        # charge per-file open work to open_s by touching the first and
        # last frame (for FLAC that is now the lazy index's bounded
        # bisection, not a whole-file sync scan)
        probe = np.empty((1, loader.channels), np.int16)
        loader.read_raw16_into(0, 1, probe)
        loader.read_raw16_into(loader.frames - 1, 1, probe)
    open_s = time.perf_counter() - t_open
    channels = loader.channels
    nchunks = loader.frames // IO_CHUNK
    comps = {"read_s": 0.0, "upload_s": 0.0, "dispatch_s": 0.0,
             "open_s": round(open_s, 4),
             "bytes_read": int(sum(Path(f).stat().st_size
                                   for f in files))}

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
        t_read = time.perf_counter()
        try:
            return _read_ext(k)
        finally:
            comps["read_s"] += time.perf_counter() - t_read

    def _read_ext(k):
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
        comps["read_s"] = 0.0  # discount the warm-up chunk's read
        t0 = time.perf_counter()
        out = None
        fut = pool.submit(read_ext, 0)
        for k in range(nchunks):
            q = fut.result()
            if k + 1 < nchunks:
                fut = pool.submit(read_ext, k + 1)
            t_put = time.perf_counter()
            dq = jax.device_put(q)
            t_disp = time.perf_counter()
            comps["upload_s"] += t_disp - t_put
            out = chain(prep(dq))
            comps["dispatch_s"] += time.perf_counter() - t_disp
        t_fence = time.perf_counter()
        _ = np.asarray(out[0])  # fences the in-order queue
        elapsed = time.perf_counter() - t0
        comps["fence_s"] = round(time.perf_counter() - t_fence, 4)
    loader.close()
    comps["read_s"] = round(comps["read_s"], 4)
    comps["upload_s"] = round(comps["upload_s"], 4)
    comps["dispatch_s"] = round(comps["dispatch_s"], 4)
    audio_seconds = nchunks * IO_CHUNK / RATE
    return elapsed, audio_seconds, comps


#: stress leg: int16 bytes synthesized = this fraction of HBM (v5e has
#: 16 GB; >1 proves the chunked drivers stream with a bounded device
#: working set — an accumulating buffer would OOM the chip)
STRESS_HBM_FRACTION = 1.05
STRESS_HBM_BYTES = 16 << 30


def bench_stress():
    """Opt-in (``--stress`` / ``AUDIAN_TPU_STRESS=1``): the batch
    drivers over a synthetic recording LARGER than device HBM at int16.

    - ``detect`` (the ``audian-songdetector`` pipeline) streams the
      whole recording through the chunked fused device path; completing
      at all is the bounded-device-memory assertion (the input alone
      exceeds HBM), and three interior windows are re-computed through
      the exact host scipy float64 path and compared (the chunked ==
      whole contract, `tests/test_chunk_equivalence.py`, at stress
      scale).  Reference analog: whole-file batch detection,
      `/root/reference/songdetector.py:745-767`.
    - ``audian-compress`` builds the min/max overview artifact over the
      same recording written as a multi-file WAV set (RIFF caps one
      file at 4 GB), through the real CLI.

    Prints one JSON line: sustained samples/s over the detect leg,
    ``vs_baseline`` = real-time factor, components carrying the compress
    leg and the oracle-check count."""
    import shutil
    import tempfile

    from audian_tpu.analysis import events

    frames = int(STRESS_HBM_FRACTION * STRESS_HBM_BYTES
                 / (CHANNELS * 2))
    frames -= frames % (1 << 21)
    rec_seconds = frames / RATE
    # blockwise int16 synthesis (tone bursts + noise), ~17.6 GB in RAM
    x = np.empty((frames, CHANNELS), np.int16)
    blk = 1 << 22
    rng = np.random.default_rng(0)
    for a in range(0, frames, blk):
        b = min(a + blk, frames)
        t = np.arange(a, b, dtype=np.float64) / RATE
        tone = 0.4 * np.sin(2 * np.pi * 6500.0 * t) * (
            np.sin(2 * np.pi * 1.0 * t) > 0)
        seg = (tone[:, None]
               + 0.05 * rng.standard_normal((b - a, CHANNELS)))
        np.clip(np.round(seg * 32768.0), -32768, 32767, out=seg)
        x[a:b] = seg
    del seg

    t0 = time.perf_counter()
    # envelopefilter="none" keeps res["envelope"] pristine so the
    # oracle windows below compare the actual chunked-path output (the
    # default "apply" rewrites the envelope inside detected songs)
    res = events.detect(x, RATE, verbose=0, return_filtered=False,
                        envelopefilter="none")
    detect_s = time.perf_counter() - t0

    # slice-equality vs the exact host float64 scipy path (small inputs
    # route there automatically): three interior windows, grids aligned
    env = res["envelope"]
    step = int(round(RATE / res["envrate"]))
    # grid-aligned window geometry: the slice's decimation grid must
    # coincide with the whole-recording grid
    ctx = ((1 << 17) // step) * step   # >> the bucketed filter halo
    wlen = ((1 << 19) // step) * step
    checks = 0
    for wstart in (frames // 7, frames // 2, frames - 2 * wlen):
        a = (wstart // step) * step
        lo = a - ctx
        assert lo % step == 0 and lo > 0
        _f, env_ref, er = events.band_env(
            x[lo : a + wlen + ctx], RATE, 1000.0, 10000.0, 500.0,
            return_filtered=False)
        assert er == res["envrate"]
        j0 = ctx // step
        npts = wlen // step
        got = np.asarray(env[a // step : a // step + npts])
        ref = np.asarray(env_ref[j0 : j0 + npts])
        scale = max(float(np.max(np.abs(ref))), 1e-9)
        err = float(np.max(np.abs(got - ref))) / scale
        assert err < 2e-5, (wstart, err)
        checks += 1

    # compress leg: the real CLI over the recording as 4 GB-capped WAVs
    from audian_tpu.cli import compress
    from audian_tpu.data import wavio

    tmp = Path(tempfile.mkdtemp(prefix="audian_stress_"))
    try:
        per_file = 1 << 26  # 67M frames ~ 2.1 GB < the 4 GiB RIFF cap
        files = []
        for k, a in enumerate(range(0, frames, per_file)):
            f = tmp / f"stress_{k}.wav"
            # f32 k/2^15 is exact, so the PCM-16 write is bit-identical
            # to the in-RAM int16 recording
            wavio.write_audio(
                f, x[a : a + per_file].astype(np.float32) / 32768.0,
                RATE, encoding="PCM_16")
            files.append(str(f))
        t0 = time.perf_counter()
        rc = compress.main(files)
        compress_s = time.perf_counter() - t0
        assert rc == 0
        assert (tmp / "stress_0-fulltrace.wav").exists()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({
        "metric": (f"STRESS detect over {rec_seconds / 3600:.2f}h x "
                   f"{CHANNELS}ch x 96kHz int16 "
                   f"({frames * CHANNELS * 2 / 2**30:.1f} GiB > HBM; "
                   "completion = bounded device memory; sustained "
                   "samples/s; vs_baseline = real-time factor)"),
        "value": round(frames * CHANNELS / detect_s / 1e6, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(rec_seconds / detect_s, 2),
        "components": {
            "detect_wall_s": round(detect_s, 2),
            "compress_wall_s": round(compress_s, 2),
            "oracle_windows_checked": checks,
            "songs_found_ch0": len(res["onsets"][0]),
        },
    }))


def main():
    import sys

    import audian_tpu
    audian_tpu.enable_compilation_cache()

    if "--stress" in sys.argv[1:] or os.environ.get("AUDIAN_TPU_STRESS"):
        bench_stress()
        return

    fused = build_chain()

    wav_files = _bench_recording("wav")
    cold = _drop_page_cache()
    io_elapsed, audio_seconds, comps = bench_io(fused, wav_files)
    comps["cold_cache"] = cold
    print(json.dumps({
        "metric": (f"io+compute disk->chain "
                   f"{audio_seconds:.0f}s x {CHANNELS}ch x 96kHz wall"),
        "value": round(io_elapsed, 4),
        "unit": "s",
        "vs_baseline": round(audio_seconds / io_elapsed / 1.0, 3),
        "components": comps,
    }))

    # the FLAC leg runs at 8 channels (the FLAC spec's ceiling) with a
    # matching 8-channel WAV run as its private baseline, so the ratio
    # isolates the container (bytes + decode), not a channel-count change
    flac_files = _bench_recording("flac", channels=8)
    if flac_files is not None:
        cold = _drop_page_cache()
        w8_elapsed, _s8, w8_comps = bench_io(
            fused, _bench_recording("wav", channels=8))
        cold = _drop_page_cache() and cold
        fl_elapsed, fl_seconds, fl_comps = bench_io(fused, flac_files)
        fl_comps["cold_cache"] = cold
        fl_comps["wav_wall_s"] = round(w8_elapsed, 4)
        fl_comps["wav_read_s"] = w8_comps["read_s"]
        print(json.dumps({
            "metric": (f"io+compute FLAC->chain "
                       f"{fl_seconds:.0f}s x 8ch x 96kHz wall "
                       "(same PCM from a FLAC container; vs_baseline = "
                       "same-shape WAV wall / FLAC wall — FLAC wins "
                       "when storage bandwidth is below decode_rate x "
                       "(1 - flac/wav bytes): ~27 MB/s for this "
                       "corpus's 0.81x ratio at the decoder's "
                       "~150 MB/s PCM; this host's virtio disk serves "
                       "guest-cold reads from the hypervisor cache at "
                       "~GB/s, so WAV wins here: see components.read_s "
                       "vs wav_read_s)"),
            "value": round(fl_elapsed, 4),
            "unit": "s",
            "vs_baseline": round(w8_elapsed / fl_elapsed, 3),
            "components": fl_comps,
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
