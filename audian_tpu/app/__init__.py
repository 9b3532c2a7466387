"""Application controllers: the headless per-recording browser, the
multi-file shell, markers, and screenshot navigation."""

from .markers import MarkerLabel, MarkerData
from .browser import DataBrowser, Signal, secs_to_str
from .shell import Audian, audian_cli, parse_channels
from .screenshot import (view_metadata, save_view_screenshot,
                         read_png_metadata, parse_view_metadata)

__all__ = ["MarkerLabel", "MarkerData", "DataBrowser", "Signal",
           "secs_to_str", "Audian", "audian_cli", "parse_channels",
           "view_metadata", "save_view_screenshot", "read_png_metadata",
           "parse_view_metadata"]
