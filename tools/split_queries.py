"""One-shot mechanical splitter: queries.py → queries/ package.

Sequential line-range cuts at top-level statement boundaries (the file
is define-before-use throughout — verified: exactly one forward
reference, between two ADJACENT statements kept in the same part), with
AST-computed explicit imports so every cross-part name is declared and
cross-module shadowing is structurally impossible. The registry section
(QUERIES/ORACLES dicts, rotation, dynamic oracle builders) becomes
``__init__.py``, which also re-exports every top-level name of every
part so all existing ``from tmdb_index_spark.queries import X`` sites
keep working unchanged.

Run once from the repo root; idempotence is not a goal.
"""

from __future__ import annotations

import ast
import builtins
import os

SRC = "tmdb_index_spark/queries.py"
PKG = "tmdb_index_spark/queries"

#: (module name, first source line targeted) — cut snaps to the first
#: top-level statement at or after the target; the registry cut is
#: exact (the QUERIES dict assignment).
PARTS = [
    ("_surface", 67),          # §2 reference-surface queries + _t/_dec
    ("_embed_dedup", 927),     # text dedup + embedding/ANN families
    ("_stats_causal", 2690),   # causal/model/backtest/corpus-pipeline
    ("_retrieval_tpch", 4384), # tfidf/bm25 + TPC-H q-series breadth
    ("_mixtures_graph", 6050), # mixtures, retention, pagerank
    ("_sessions_temporal", 7581),
    ("_quality_trends", 9350),
    ("_inference_late", 11050),
]
REGISTRY_LINE_NAME = "QUERIES"  # first top-level assign of this name


def stmt_start(node: ast.stmt) -> int:
    if getattr(node, "decorator_list", None):
        return node.decorator_list[0].lineno
    return node.lineno


def free_names(node: ast.stmt) -> set[str]:
    """Names a top-level statement needs from module globals."""
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        return set()
    loads: set[str] = set()
    bound: set[str] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name):
            (loads if isinstance(sub.ctx, ast.Load) else bound).add(sub.id)
        elif isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            bound.add(sub.name)
        elif isinstance(sub, (ast.Import, ast.ImportFrom)):
            for a in sub.names:
                bound.add(a.asname or a.name.split(".")[0])
        elif isinstance(sub, ast.arg):
            bound.add(sub.arg)
        elif isinstance(sub, ast.ExceptHandler) and sub.name:
            bound.add(sub.name)
        elif isinstance(sub, ast.Global):
            bound.update(sub.names)
    return loads - bound - set(dir(builtins))


def defined(node: ast.stmt) -> list[str]:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [node.name]
    if isinstance(node, ast.Assign):
        return [t.id for t in node.targets if isinstance(t, ast.Name)]
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return [node.target.id]
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        return [a.asname or a.name.split(".")[0] for a in node.names]
    return []


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    stmts = tree.body

    # registry = first top-level `QUERIES = {...}` assignment
    reg_idx = next(
        i
        for i, s in enumerate(stmts)
        if isinstance(s, (ast.Assign, ast.AnnAssign))
        and REGISTRY_LINE_NAME in defined(s)
    )
    reg_line = stmt_start(stmts[reg_idx])

    # snap each part target to a statement index
    cut_idx = []
    for _, target in PARTS:
        cut_idx.append(
            next(i for i, s in enumerate(stmts) if stmt_start(s) >= target)
        )
    cut_idx.append(reg_idx)
    assert cut_idx == sorted(cut_idx), cut_idx

    header_stmts = list(range(0, cut_idx[0]))
    part_stmts = [
        list(range(cut_idx[k], cut_idx[k + 1])) for k in range(len(PARTS))
    ]
    registry_stmts = list(range(reg_idx, len(stmts)))

    # name -> (module, stmt index) in definition order, first wins
    owner: dict[str, str] = {}
    for i in header_stmts:
        for n in defined(stmts[i]):
            owner.setdefault(n, "_shared")
    for (mod, _), idxs in zip(PARTS, part_stmts):
        for i in idxs:
            for n in defined(stmts[i]):
                owner.setdefault(n, mod)

    os.makedirs(PKG, exist_ok=True)

    def body_text(idxs: list[int], end_line: int | None = None) -> str:
        lo = stmt_start(stmts[idxs[0]]) - 1
        hi = (end_line or stmts[idxs[-1]].end_lineno)
        return "".join(lines[lo:hi])

    # _shared.py: original header (docstring + imports + QueryFn + __all__)
    shared_end = stmt_start(stmts[cut_idx[0]]) - 1
    with open(f"{PKG}/_shared.py", "w") as f:
        f.write("".join(lines[:shared_end]))

    order = ["_shared"] + [m for m, _ in PARTS]
    for k, ((mod, _), idxs) in enumerate(zip(PARTS, part_stmts)):
        needs: set[str] = set()
        have: set[str] = set()
        for i in idxs:
            needs |= free_names(stmts[i]) - have
            have.update(defined(stmts[i]))
        imports: dict[str, list[str]] = {}
        for n in sorted(needs):
            src_mod = owner.get(n)
            if src_mod is None or src_mod == mod:
                continue
            assert order.index(src_mod) < order.index(mod), (n, src_mod, mod)
            imports.setdefault(src_mod, []).append(n)
        end_line = (
            stmt_start(stmts[cut_idx[k + 1]]) - 1
            if k + 1 < len(PARTS)
            else reg_line - 1
        )
        with open(f"{PKG}/{mod}.py", "w") as f:
            f.write(
                f'"""Catalog part {mod} (mechanical split of queries.py; '
                f'see __init__)."""\n\n'
                "from __future__ import annotations\n\n"
            )
            for src_mod in order:
                if src_mod in imports:
                    names = ",\n    ".join(imports[src_mod])
                    f.write(
                        f"from tmdb_index_spark.queries.{src_mod} import (  # noqa: E501\n    {names},\n)\n"
                    )
            f.write("\n")
            f.write(body_text(idxs, end_line))

    # __init__.py: re-export everything + the registry body
    reg_needs: set[str] = set()
    have = set()
    for i in registry_stmts:
        reg_needs |= free_names(stmts[i]) - have
        have.update(defined(stmts[i]))
    with open(f"{PKG}/__init__.py", "w") as f:
        f.write(
            '"""Named query catalog (package form).\n\n'
            "Split from the single-module queries.py in round 10 — the file\n"
            "had grown to ~13k lines (half the engine) and module-level name\n"
            "shadowing risk grows with file size. Parts are sequential\n"
            "build-order cuts at statement boundaries with AST-generated\n"
            "explicit imports (cross-module shadowing is now structurally\n"
            "impossible); this __init__ holds the registry (QUERIES/ORACLES,\n"
            "driver-window rotation, dynamic oracle builders) and re-exports\n"
            "every part's top-level names so existing import sites are\n"
            "unchanged. The original module docstring (cross-engine\n"
            "determinism rules) lives in ``_shared``.\n"
            '"""\n\n'
            "from __future__ import annotations\n\n"
        )
        # re-export all names (underscore included: tests/tools import
        # _t and SQL constants directly)
        by_mod: dict[str, list[str]] = {}
        for n, m in owner.items():
            by_mod.setdefault(m, []).append(n)
        for m in order:
            names = ",\n    ".join(sorted(by_mod.get(m, [])))
            f.write(
                f"from tmdb_index_spark.queries.{m} import (  # noqa: F401,E501\n    {names},\n)\n"
            )
        f.write("\n")
        f.write("".join(lines[reg_line - 1:]))

    os.remove(SRC)
    print("parts:", [(m, len(p)) for (m, _), p in zip(PARTS, part_stmts)])
    print("registry stmts:", len(registry_stmts))


if __name__ == "__main__":
    main()
