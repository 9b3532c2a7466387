"""Utilities: structured tracing/profiling."""

from .trace import (trace_event, events, clear, enable, disable, summary,
                    timed, device_profile)

__all__ = ["trace_event", "events", "clear", "enable", "disable",
           "summary", "timed", "device_profile"]
