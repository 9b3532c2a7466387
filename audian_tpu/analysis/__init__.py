"""Analyzers, result tables, and the user-plugin system."""

from .table import ResultTable
from .analyzer import Analyzer, PlainAnalyzer, EventRecorder
from .statistics import StatisticsAnalyzer
from .plugins import Plugins, default_setup_traces

__all__ = [
    "ResultTable",
    "Analyzer",
    "PlainAnalyzer",
    "EventRecorder",
    "StatisticsAnalyzer",
    "Plugins",
    "default_setup_traces",
]
