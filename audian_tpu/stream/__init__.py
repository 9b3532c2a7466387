"""Host-side streaming: aligned-block prefetch feeding the device."""

from .scheduler import BlockPrefetcher

__all__ = ["BlockPrefetcher"]
