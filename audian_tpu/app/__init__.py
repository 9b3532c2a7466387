"""Application controllers: the headless per-recording browser and the
multi-file shell."""

from .markers import MarkerLabel, MarkerData
from .browser import DataBrowser, Signal, secs_to_str

__all__ = ["MarkerLabel", "MarkerData", "DataBrowser", "Signal",
           "secs_to_str"]
