"""Persistent artifacts: the fulltrace overview cache."""

from .fulltrace import FullTraceData

__all__ = ["FullTraceData"]
