"""Print an annotated source tree (reference: scripts/project_tree.py —
the upstream dev nicety that renders the repo layout with docstring
first lines). Closes the last SURVEY §2.2 row.

Usage: python scripts/project_tree.py [root]
"""

from __future__ import annotations

import ast
import os
import sys

SKIP_DIRS = {".git", "__pycache__", ".pytest_cache", "build", ".claude",
             "node_modules", ".cache"}


def first_doc_line(path: str) -> str:
    try:
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            tree = ast.parse(f.read())
        doc = ast.get_docstring(tree)
        return (doc or "").strip().splitlines()[0] if doc else ""
    except (SyntaxError, ValueError, IndexError):
        return ""


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    root = os.path.abspath(root)
    print(os.path.basename(root) + "/")
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d not in SKIP_DIRS)
        rel = os.path.relpath(dirpath, root)
        depth = 0 if rel == "." else rel.count(os.sep) + 1
        indent = "    " * depth
        if rel != ".":
            print(f"{indent}{os.path.basename(dirpath)}/")
        for name in sorted(filenames):
            if name.endswith((".pyc", ".so")):
                continue
            line = f"{indent}    {name}"
            if name.endswith(".py"):
                doc = first_doc_line(os.path.join(dirpath, name))
                if doc:
                    line += f"  — {doc[:80]}"
            print(line)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piping into head/less
        pass
