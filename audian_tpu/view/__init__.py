"""Qt-free view-model layer: render tiles, panels, plot ranges, axis tick
math, selection and zoom history."""

from .render import TraceTiler, SpecTiler, pick_amplitude
from .panels import Panel, Panels
from .plotranges import PlotRange, PlotRanges
from .axes import (tick_spacing, time_label_width, format_time_ticks,
                   REC_TIME, ABS_TIME, FILE_TIME)
from .zoom import Rect, ZoomHistory, SelectionModel

__all__ = [
    "TraceTiler", "SpecTiler", "pick_amplitude",
    "Panel", "Panels",
    "PlotRange", "PlotRanges",
    "tick_spacing", "time_label_width", "format_time_ticks",
    "REC_TIME", "ABS_TIME", "FILE_TIME",
    "Rect", "ZoomHistory", "SelectionModel",
]
