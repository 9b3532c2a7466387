"""User plugin discovery.

Reference-compatible (`src/audian/plugins.py:16-72`): scans the current
working directory for ``audian*.py`` modules and registers every callable
named ``audian_*traces`` (derived-trace factory, called with the browser)
or ``audian_*analyzer`` (analyzer factory).  The default trace factory
installs the filter + spectrogram chain, exactly like the reference's
``default_setup_traces`` (`plugins.py:11-13`) — the envelope trace is a
plugin/CLI opt-in.
"""

from __future__ import annotations

import importlib
import os
import sys
from pathlib import Path

from ..graph import FilterNode, SpectrogramNode

__all__ = ["Plugins", "default_setup_traces"]


def default_setup_traces(browser):
    browser.add_trace(FilterNode())
    browser.add_trace(SpectrogramNode())


class Plugins:

    def __init__(self):
        self.plugins = {}
        self.trace_factories = [default_setup_traces]
        self.analyzer_factories = []

    def add_plugin(self, name, module):
        self.plugins[name] = module

    def add_trace_factory(self, factory_func):
        self.trace_factories.append(factory_func)

    def clear_trace_factories(self):
        self.trace_factories = []

    def add_analyzer_factory(self, factory_func):
        self.analyzer_factories.append(factory_func)

    def clear_analyzer_factories(self):
        self.analyzer_factories = []

    def load_plugins(self, directory=None, verbose=True):
        """Scan ``directory`` (CWD by default) for ``audian*.py`` and
        register the factories found."""
        cwd = Path(directory) if directory else Path.cwd()
        sys.path.append(os.fspath(cwd))
        try:
            for module in sorted(cwd.glob("audian*.py")):
                x = importlib.import_module(module.stem)
                called = False
                for k in dir(x):
                    attr = getattr(x, k)
                    if k.startswith("audian_") and callable(attr):
                        if k.endswith("traces"):
                            self.add_trace_factory(attr)
                            called = True
                        elif k.endswith("analyzer"):
                            self.add_analyzer_factory(attr)
                            called = True
                if called:
                    self.add_plugin(module.stem, x)
                    if verbose:
                        print(f"loaded audian plugins from {module.stem}")
        finally:
            sys.path.pop()

    def setup_traces(self, browser):
        for f in self.trace_factories:
            f(browser)

    def setup_analyzers(self, browser):
        for f in self.analyzer_factories:
            f(browser)

    # reference spelling (`plugins.py:70-72`)
    setup_analyzer = setup_analyzers
