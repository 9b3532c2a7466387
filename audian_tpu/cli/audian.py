"""``audian``: browse and analyze recordings of animal vocalizations.

The reference-compatible main entry (`src/audian/audian.py:1467-1544`):
loads user plugins from the working directory, parses the CLI, opens the
recordings, and starts a GUI frontend — Qt/pyqtgraph when available,
matplotlib otherwise.  ``--screenshot`` renders the initial view headless
(Agg) and exits, which doubles as the scriptable smoke test; a screenshot
saved by the GUI can be passed back as the input file to restore its view
(`audian.py:232-260`).
"""

from __future__ import annotations

import sys
from ..analysis import Plugins
from ..app.shell import audian_cli
from ..app.screenshot import parse_view_metadata


def _pop_option(argv, name, has_value=True):
    if name not in argv:
        return None
    i = argv.index(name)
    argv.pop(i)
    if has_value:
        return argv.pop(i) if i < len(argv) else None
    return True


def main(cargs=None):
    argv = list(sys.argv[1:] if cargs is None else cargs)
    screenshot = _pop_option(argv, "--screenshot")
    use_mpl = bool(_pop_option(argv, "--mpl", has_value=False))

    plugins = Plugins()
    plugins.load_plugins(verbose=True)

    shell = audian_cli(argv, plugins)

    # screenshots restore their recorded view (view checkpoints)
    restores = {}
    for k, f in enumerate(list(shell._pending)):
        if str(f).endswith(".png"):
            view = parse_view_metadata(f)
            if view is not None:
                shell._pending[k] = view["file"]
                restores[str(view["file"])] = view

    import audian_tpu

    audian_tpu.enable_compilation_cache()
    shell.load_files()
    if not shell.browsers:
        print("error: no recordings could be opened", file=sys.stderr)
        for path, err in shell.errors:
            print(f"  {path}: {err}", file=sys.stderr)
        return 1
    for b in shell.browsers:
        view = restores.get(str(b.file_path))
        if view:
            if view["channels"]:
                b.set_channels(view["channels"])
            b.set_times(view["toffset"], view["twindow"])

    if screenshot:
        import matplotlib

        matplotlib.use("Agg")
        from ..gui.mpl import MplBrowserWindow

        win = MplBrowserWindow(shell.browsers[0])
        win.savefig(screenshot)
        print(f"saved screenshot to {screenshot}")
        shell.close()
        return 0

    if not use_mpl:
        try:
            from ..gui.qt import run_qt

            return run_qt(shell)
        except ImportError:
            pass
    from ..gui.mpl import show

    show(shell)
    shell.close()
    return 0


def run():
    return main()


if __name__ == "__main__":
    sys.exit(run())
