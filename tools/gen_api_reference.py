"""Generate docs/api_reference.md from the live public API.

The reference builds its API page with Documenter's ``@autodocs`` — the
docs are EXTRACTED from the code, so they cannot drift
(/root/reference/docs/make.jl:46-85, docs/src/api.md:5-7). This is the
analog: every symbol in ``easyhybrid_tpu.__all__`` is rendered with its
live ``inspect.signature`` and docstring into ``docs/api_reference.md``.

Usage:
    python tools/gen_api_reference.py          # (re)write the file
    python tools/gen_api_reference.py --check  # CI: fail if it drifted

The ``--check`` mode regenerates in memory and diffs against the committed
file, so CI fails whenever a public symbol, signature, or docstring changes
without the reference page being regenerated — the drift ``@autodocs``
makes impossible by construction.
"""

from __future__ import annotations

import difflib
import inspect
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

HEADER = """\
# API reference (generated)

<!-- GENERATED FILE — do not edit by hand.
     Regenerate with: python tools/gen_api_reference.py
     CI fails when this file drifts from the live signatures/docstrings
     (tools/gen_api_reference.py --check). -->

Every public symbol of `easyhybrid_tpu` (the package `__all__`), with its
live signature and docstring. The narrative overview with examples lives
in [api.md](api.md); reference counterparts are cited inside the
docstrings as `file:line` of the upstream project.
"""


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return ""


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(no docstring)*"


def generate() -> str:
    # force CPU so importing the package never touches the TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")
    import easyhybrid_tpu as eh

    groups: dict = {}
    for name in sorted(eh.__all__):
        obj = getattr(eh, name)
        mod = getattr(obj, "__module__", "") or ""
        top = mod.split(".")[1] if mod.startswith("easyhybrid_tpu.") else "misc"
        groups.setdefault(top, []).append((name, obj))

    out = [HEADER]
    for top in sorted(groups):
        out.append(f"\n## `{top}`\n")
        for name, obj in groups[top]:
            kind = (
                "class" if inspect.isclass(obj)
                else "function" if callable(obj)
                else "data"
            )
            sig = _signature(obj) if kind != "data" else ""
            out.append(f"\n### `{name}{sig}`\n")
            out.append(f"*{kind} — `{getattr(obj, '__module__', '?')}`*\n")
            out.append("\n" + _doc(obj) + "\n")
            if inspect.isclass(obj):
                # public methods defined by the class itself (not inherited
                # object/abc plumbing): signature + first docstring line
                for mname, meth in sorted(vars(obj).items()):
                    if mname.startswith("_") or not callable(meth):
                        continue
                    mdoc = inspect.getdoc(meth)
                    first = mdoc.strip().splitlines()[0] if mdoc else ""
                    out.append(
                        f"- `.{mname}{_signature(meth)}` — {first}\n"
                    )
    return "".join(out)


def main() -> int:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "api_reference.md",
    )
    text = generate()
    if "--check" in sys.argv:
        try:
            with open(path) as f:
                current = f.read()
        except OSError:
            print(f"MISSING {path}: run python tools/gen_api_reference.py")
            return 1
        if current != text:
            diff = "".join(
                difflib.unified_diff(
                    current.splitlines(keepends=True),
                    text.splitlines(keepends=True),
                    fromfile="docs/api_reference.md (committed)",
                    tofile="docs/api_reference.md (live API)",
                )
            )
            print(diff[:8000])
            print(
                "\nAPI reference drifted from the live signatures/"
                "docstrings: run python tools/gen_api_reference.py"
            )
            return 1
        print(f"api_reference.md matches the live API "
              f"({text.count('### ')} symbols)")
        return 0
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {path} ({text.count('### ')} symbols)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
