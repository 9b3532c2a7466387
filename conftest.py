"""Repo-root pytest bootstrap.

This environment pre-imports jax in every Python process (startup hook for
the TPU tunnel), so env vars alone are too late.  Backends initialize
lazily, so programmatic config still works: force tests onto a virtual
8-device CPU mesh (multi-chip sharding paths are exercised without TPU
hardware, SURVEY.md section 4.4) and enable float64 so kernels can be
validated against scipy's float64 oracles at tight tolerances.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("AUDIAN_TPU_TESTS_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
    # float64 so kernels can be validated against scipy float64 oracles
    # at tight tolerances; NOT set on the TPU path (no f64 there — the
    # device suite compares f32 device outputs against host oracles)
    jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu" or os.environ.get(
    "AUDIAN_TPU_TESTS_ON_TPU"
), "tests must run on the virtual CPU mesh"
assert jax.device_count() >= 8 or os.environ.get("AUDIAN_TPU_TESTS_ON_TPU")

# Opt-in line coverage on sys.monitoring (no external deps;
# tools/linecov.py): AUDIAN_TPU_COV=1 records executed lines and dumps
# .linecov.json at exit for `python tools/linecov.py report`.
if os.environ.get("AUDIAN_TPU_COV"):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent / "tools"))
    import linecov

    linecov.start()
