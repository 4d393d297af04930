"""Generate Jupyter notebooks from the demo scripts (VERDICT r1 item 10).

The reference ships its demos as notebooks (``/root/reference/demos/*.ipynb``);
this repo's demos are plain scripts (importable, testable, diffable).  This
tool emits the notebook form of each demo into ``demos/notebooks/`` so both
formats exist:

  cell 1 (markdown)  — the module docstring,
  cell 2 (code)      — module-level imports/setup,
  cell 3 (code)      — the body of ``main()`` dedented (with any keyword
                       defaults of ``main`` bound first), so the notebook
                       runs cell-by-cell without a __main__ guard.

The .ipynb files are valid nbformat-4 JSON written without nbformat (not
installed here).  Regeneration is deterministic; a test checks the
committed notebooks are in sync with the scripts.

Usage: python tools/make_notebooks.py
"""

from __future__ import annotations

import ast
import json
import os
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO_DIR = os.path.join(REPO, "demos")
OUT_DIR = os.path.join(DEMO_DIR, "notebooks")


def _cells_from_script(path: str):
    src = open(path).read()
    lines = src.splitlines()
    tree = ast.parse(src)

    docstring = ast.get_docstring(tree) or os.path.basename(path)

    main_def = None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "main":
            main_def = node
    if main_def is None:
        raise ValueError(f"{path}: no main() found")

    # module-level setup: everything between the docstring and main(),
    # minus the script-only sys.path bootstrap (notebooks run from the
    # repo root where the package is importable)
    first = tree.body[0]
    setup_start = first.end_lineno if isinstance(
        first, ast.Expr) and isinstance(first.value, ast.Constant) else 0
    setup_lines = [
        ln for ln in lines[setup_start:main_def.lineno - 1]
        if not ln.startswith("sys.path.insert")
        and ln not in ("import sys", "import os")
    ]
    setup = "\n".join(setup_lines).strip("\n")

    # main() body, dedented, with its keyword defaults bound up front; a
    # trailing ``return x`` becomes the bare expression ``x`` (displayed)
    body_nodes = list(main_def.body)
    tail_expr = None
    if isinstance(body_nodes[-1], ast.Return):
        ret = body_nodes.pop()
        if ret.value is not None:
            tail_expr = ast.unparse(ret.value)
    body_start = body_nodes[0].lineno - 1
    body_end = body_nodes[-1].end_lineno
    body = textwrap.dedent("\n".join(lines[body_start:body_end]))
    if tail_expr:
        body += f"\n\n{tail_expr}"
    defaults = []
    args = main_def.args
    for arg, default in zip(args.args[len(args.args) - len(args.defaults):],
                            args.defaults):
        defaults.append(f"{arg.arg} = {ast.unparse(default)}")
    if defaults:
        body = "\n".join(defaults) + "\n\n" + body

    return docstring, setup, body


def _code_cell(source: str) -> dict:
    return {"cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [],
            "source": source.splitlines(keepends=True)}


def make_notebook(script: str) -> dict:
    docstring, setup, body = _cells_from_script(script)
    name = os.path.splitext(os.path.basename(script))[0]
    title = f"# {name.replace('_', ' ')}\n\n{docstring}"
    cells = [{"cell_type": "markdown", "metadata": {},
              "source": title.splitlines(keepends=True)}]
    if setup:
        cells.append(_code_cell(setup))
    cells.append(_code_cell(body))
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for fname in sorted(os.listdir(DEMO_DIR)):
        if not fname.endswith(".py"):
            continue
        nb = make_notebook(os.path.join(DEMO_DIR, fname))
        out = os.path.join(OUT_DIR, fname.replace(".py", ".ipynb"))
        with open(out, "w") as f:
            json.dump(nb, f, indent=1, sort_keys=True)
            f.write("\n")
        print("wrote", os.path.relpath(out, REPO))


if __name__ == "__main__":
    main()
