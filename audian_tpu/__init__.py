"""audian-tpu: a TPU-native framework for interactive analysis of animal
vocalization recordings.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
audian package (bendalab/audian): a lazy, chunked, demand-driven DSP dataflow
graph over out-of-core audio (raw -> Butterworth filter -> envelope /
spectrogram), plugin-extensible derived traces and analyzers, min/max pyramid
decimation for overview rendering, region analysis/export, audio playback
with heterodyne down-mixing, and batch CLIs -- all with the hot compute path
on TPU.

Layering (mirrors SURVEY.md section 1 of the rebuild plan):

- ``audian_tpu.ops``       TPU kernels (SOS IIR, STFT, envelope, min/max, mix)
- ``audian_tpu.graph``     functional lazy trace DAG with halo folding
- ``audian_tpu.data``      audio I/O, out-of-core loader, ``Data`` registry
- ``audian_tpu.parallel``  device-mesh sharding (channel / chunk / sequence)
- ``audian_tpu.stream``    host-side window scheduler feeding the device
- ``audian_tpu.view``      Qt-free view-model (panels, ranges, axes, markers)
- ``audian_tpu.analysis``  analyzer protocol + plugin discovery
- ``audian_tpu.cache``     fulltrace pyramid cache artifacts
- ``audian_tpu.cli``       ``audian``, ``audian-compress``, ``songdetector``
"""

from .version import __version__, __year__, audian_dirs

__all__ = ["__version__", "__year__", "audian_dirs",
           "enable_compilation_cache"]

_cache_enabled = False


def enable_compilation_cache(path=None):
    """Enable JAX's persistent compilation cache in the audian-tpu user
    cache directory.

    First compilation of the interactive chain costs tens of seconds on
    TPU; with the persistent cache every later session reuses it.  Called
    automatically by :meth:`audian_tpu.data.Data.open` and the CLIs.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    import jax

    if path is None:
        path = audian_dirs.user_cache_path / "xla-cache"
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:
        pass
