"""Utilities: structured tracing/profiling and shared small helpers."""

from .trace import (trace_event, events, clear, enable, disable, summary,
                    timed, device_profile)

__all__ = ["trace_event", "events", "clear", "enable", "disable",
           "summary", "timed", "device_profile", "pow2_at_least",
           "round_up"]


def round_up(x, m):
    """Smallest multiple of ``m`` >= ``x``: THE alignment rule shared by
    the Pallas block geometry, the halo math, and the sharded pipeline
    (one definition so their 128-lane alignments cannot drift)."""
    return -(-int(x) // int(m)) * int(m)


def pow2_at_least(n):
    """Smallest power of two >= ``n`` (>= 1): THE bucketing rule of the
    interactive tile/window machinery — one definition so tilers and the
    Data window cannot drift apart."""
    return 1 << max(int(n) - 1, 0).bit_length() if n > 1 else 1
