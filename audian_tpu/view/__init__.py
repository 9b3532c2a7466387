"""Qt-free view-model layer: render tiles, panels, plot ranges, axes,
selection, markers."""

from .render import TraceTiler, SpecTiler, pick_amplitude

__all__ = ["TraceTiler", "SpecTiler", "pick_amplitude"]
