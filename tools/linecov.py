"""Minimal line-coverage collector on ``sys.monitoring`` (PEP 669).

This host has no ``coverage``/``pytest-cov`` and installs are not
allowed, so the suite measures itself: a LINE-event callback records
each (file, line) once and then returns ``DISABLE`` for that location,
which makes the steady-state overhead near zero (the same design as
coverage.py's sysmon core).  Executable lines come from recompiling
each source file and walking the code-object tree, so never-imported
files and never-run branches count against the total.

Usage::

    AUDIAN_TPU_COV=1 python -m pytest tests/ -q   # conftest starts it
    python tools/linecov.py report                # prints the table

The collector dumps ``.linecov.json`` at interpreter exit; ``report``
merges any number of dump files (``.linecov*.json``) so subprocess
test runs can contribute.
"""

from __future__ import annotations

import atexit
import json
import os
import sys
from pathlib import Path

TOOL_ID = getattr(sys.monitoring, "COVERAGE_ID", 3)
REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "audian_tpu"
DUMP = REPO / ".linecov.json"

_executed: dict[str, set] = {}


def start(prefix=None, dump_path=None):
    """Begin collecting line events for files under ``prefix``."""
    prefix = str(prefix or PKG)
    mon = sys.monitoring
    try:
        mon.use_tool_id(TOOL_ID, "audian-linecov")
    except ValueError:
        return None  # someone else owns the id; collect nothing

    def on_line(code, line):
        fn = code.co_filename
        if fn.startswith(prefix):
            _executed.setdefault(fn, set()).add(line)
        return mon.DISABLE  # never fire for this location again

    mon.register_callback(TOOL_ID, mon.events.LINE, on_line)
    mon.set_events(TOOL_ID, mon.events.LINE)
    atexit.register(dump, dump_path or DUMP)
    return _executed


def dump(path=DUMP):
    out = {fn: sorted(lines) for fn, lines in _executed.items()}
    pid_path = Path(path)
    if pid_path.exists():  # keep parallel/subprocess dumps separate
        pid_path = pid_path.with_suffix(f".{os.getpid()}.json")
    pid_path.write_text(json.dumps(out))


def executable_lines(path):
    """All executable line numbers of a source file (compile + walk)."""
    try:
        code = compile(Path(path).read_text(), str(path), "exec")
    except SyntaxError:
        return set()
    lines = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _s, _e, ln in co.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # docstring-only "lines": the first statement of a module/class/def
    # compiles to a line even when it is a bare docstring; keeping them
    # matches coverage.py's accounting closely enough for a baseline
    return lines


def report(dump_glob=None, top=0):
    """Merge dumps and print per-file coverage, worst first."""
    executed = {}
    for p in sorted(REPO.glob(dump_glob or ".linecov*.json")):
        for fn, lines in json.loads(p.read_text()).items():
            executed.setdefault(fn, set()).update(lines)
    rows = []
    tot_exec = tot_all = 0
    for src in sorted(PKG.rglob("*.py")):
        alllines = executable_lines(src)
        if not alllines:
            continue
        got = executed.get(str(src), set()) & alllines
        rows.append((len(got) / len(alllines), str(src.relative_to(REPO)),
                     len(got), len(alllines)))
        tot_exec += len(got)
        tot_all += len(alllines)
    rows.sort()
    shown = rows if not top else rows[:top]
    for frac, name, got, total in shown:
        print(f"{frac * 100:6.1f}%  {got:5d}/{total:<5d}  {name}")
    print(f"{tot_exec / max(tot_all, 1) * 100:6.1f}%  "
          f"{tot_exec}/{tot_all}  TOTAL")
    return tot_exec / max(tot_all, 1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report(top=int(sys.argv[2]) if len(sys.argv) > 2 else 0)
    else:
        print(__doc__)
