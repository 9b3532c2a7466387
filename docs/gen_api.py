#!/usr/bin/env python
"""Generate per-module API reference pages for every public module.

The reference project publishes pdoc3-generated per-module API pages on
top of its mkdocs site (`build-docs.sh`, `uploaddocs.yml`); this is the
equivalent for audian-tpu, built on stdlib introspection only so it runs
in any environment (the curated overview stays in ``docs/api.md``).

Usage:
    python docs/gen_api.py            # (re)write docs/api/*.md
    python docs/gen_api.py --check    # exit 1 if pages are stale (CI)

Pages are committed; CI runs ``--check`` before ``mkdocs build`` so the
generated reference can never drift from the source.
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

PACKAGE = "audian_tpu"
OUT = Path(__file__).parent / "api"

# runnable from anywhere, installed or not
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def public_modules():
    """Every importable non-private module of the package, sorted."""
    pkg = importlib.import_module(PACKAGE)
    names = [PACKAGE]
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + "."):
        if any(part.startswith("_") for part in info.name.split(".")):
            continue
        spec = info.module_finder.find_spec(info.name.rsplit(".", 1)[-1])
        if spec is None or not (spec.origin or "").endswith(".py"):
            continue  # compiled artifacts (e.g. the native .so)
        names.append(info.name)
    return sorted(names)


def _public_names(mod):
    if hasattr(mod, "__all__"):
        return list(mod.__all__)
    return [n for n in vars(mod) if not n.startswith("_")]


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc_block(obj, indent=""):
    doc = inspect.getdoc(obj)
    if not doc:
        return []
    lines = [indent + "```text"]
    lines += [indent + ln for ln in doc.splitlines()]
    lines += [indent + "```", ""]
    return lines


def _class_section(name, cls):
    lines = [f"### `class {name}{_signature(cls)}`", ""]
    lines += _doc_block(cls)
    members = []
    for mname, m in sorted(vars(cls).items()):
        if mname.startswith("_"):
            continue
        if isinstance(m, property):
            members.append((f"`{name}.{mname}` *(property)*", m))
        elif isinstance(m, (staticmethod, classmethod)):
            members.append(
                (f"`{name}.{mname}{_signature(m.__func__)}`", m.__func__))
        elif inspect.isfunction(m):
            members.append((f"`{name}.{mname}{_signature(m)}`", m))
    for title, m in members:
        if not inspect.getdoc(m):
            continue
        lines.append(f"#### {title}")
        lines.append("")
        lines += _doc_block(m)
    return lines


def render_module(modname):
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    lines += _doc_block(mod)
    classes, functions, data = [], [], []
    for name in _public_names(mod):
        obj = getattr(mod, name, None)
        if obj is None:
            continue
        here = getattr(obj, "__module__", None) == modname
        if inspect.ismodule(obj):
            continue
        if inspect.isclass(obj):
            (classes if here else data).append((name, obj))
        elif callable(obj):
            (functions if here else data).append((name, obj))
        else:
            data.append((name, obj))
    if classes:
        for name, cls in classes:
            lines += _class_section(name, cls)
    if functions:
        lines.append("## Functions")
        lines.append("")
        for name, fn in functions:
            lines.append(f"### `{name}{_signature(fn)}`")
            lines.append("")
            lines += _doc_block(fn)
    reexports = [(n, o) for n, o in data
                 if getattr(o, "__module__", None)
                 and getattr(o, "__module__", "").startswith(PACKAGE)
                 and getattr(o, "__module__", None) != modname]
    if reexports:
        lines.append("## Re-exports")
        lines.append("")
        for name, obj in reexports:
            target = obj.__module__
            lines.append(f"- `{name}` — see [`{target}`]({target}.md)")
        lines.append("")
    consts = [n for n, o in data
              if not callable(o) and not inspect.isclass(o)
              and not getattr(o, "__module__", None)]
    if consts:
        lines.append("## Module data")
        lines.append("")
        for n in consts:
            lines.append(f"- `{n}`")
        lines.append("")
    return "\n".join(lines).rstrip() + "\n"


def render_index(modnames):
    lines = [
        "# Generated API reference",
        "",
        "One page per public module, generated from the source "
        "docstrings by `docs/gen_api.py` (the curated overview lives in "
        "[the API reference](../api.md)).",
        "",
    ]
    for modname in modnames:
        mod = importlib.import_module(modname)
        doc = (inspect.getdoc(mod) or "").strip().splitlines()
        hook = doc[0] if doc else ""
        lines.append(f"- [`{modname}`]({modname}.md) — {hook}")
    return "\n".join(lines).rstrip() + "\n"


def generate():
    modnames = public_modules()
    pages = {f"{m}.md": render_module(m) for m in modnames}
    pages["index.md"] = render_index(modnames)
    return pages


def main(argv):
    check = "--check" in argv
    pages = generate()
    stale = []
    OUT.mkdir(exist_ok=True)
    current = {p.name for p in OUT.glob("*.md")}
    for name, text in sorted(pages.items()):
        path = OUT / name
        old = path.read_text() if path.exists() else None
        if old != text:
            stale.append(name)
            if not check:
                path.write_text(text)
    for orphan in sorted(current - set(pages)):
        stale.append(orphan + " (orphan)")
        if not check:
            (OUT / orphan).unlink()
    if check and stale:
        print("stale generated API pages (run `python docs/gen_api.py`):")
        for name in stale:
            print(f"  docs/api/{name}")
        return 1
    if not check:
        print(f"wrote {len(pages)} pages to {OUT}"
              + (f" ({len(stale)} changed)" if stale else " (no changes)"))
    else:
        print(f"{len(pages)} generated API pages up to date")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
