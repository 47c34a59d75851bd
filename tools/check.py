"""Repo hygiene checker (parity: the reference's tools/ layer —
Runic formatter driver + ExplicitImports checker, tools/formatter/format.jl
and tools/explicits/explicits.jl).

Checks: every package file compiles, no unused imports (AST-based), no
debug statements. Run: python tools/check.py
"""

from __future__ import annotations

import ast
import pathlib
import py_compile
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
PACKAGE = ROOT / "easyhybrid_tpu"


def check_compiles() -> int:
    failures = 0
    for p in sorted(PACKAGE.rglob("*.py")):
        try:
            py_compile.compile(str(p), doraise=True)
        except py_compile.PyCompileError as e:
            print(f"COMPILE ERROR {p}: {e}")
            failures += 1
    return failures


def check_unused_imports() -> int:
    failures = 0
    for p in sorted(PACKAGE.rglob("*.py")):
        tree = ast.parse(p.read_text())
        imported = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    imported[(a.asname or a.name).split(".")[0]] = node.lineno
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    if a.name != "*":
                        imported[a.asname or a.name] = node.lineno
        src = p.read_text()
        used = {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
        exported = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__":
                        try:
                            exported = set(ast.literal_eval(node.value))
                        except ValueError:
                            pass
        typing_names = {
            "Any", "Callable", "Dict", "List", "Mapping", "NamedTuple",
            "Optional", "Sequence", "Tuple", "Union", "Iterable",
        }
        for name, line in sorted(imported.items()):
            if name in typing_names:
                continue  # annotation-only usage is fine
            if name not in used and name not in exported and f'"{name}"' not in src:
                print(f"UNUSED IMPORT {p}:{line}: {name}")
                failures += 1
    return failures


def check_debug_statements() -> int:
    failures = 0
    for p in sorted(PACKAGE.rglob("*.py")):
        for lineno, line in enumerate(p.read_text().splitlines(), 1):
            if "breakpoint()" in line or "import pdb" in line:
                print(f"DEBUG STATEMENT {p}:{lineno}")
                failures += 1
    return failures


def main() -> int:
    failures = check_compiles() + check_unused_imports() + check_debug_statements()
    if failures:
        print(f"\n{failures} issue(s)")
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
