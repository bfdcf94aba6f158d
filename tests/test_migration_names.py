"""docs/MIGRATION.md names must exist: every backticked identifier that
looks like a public API name (solver classes, factory helpers) has to be
importable from the package root or resolvable in a solvers/ops module —
documentation rot fails loudly."""

import os
import re

import pytest

import iterative_solver_tpu as its

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "MIGRATION.md")

NAME_RE = re.compile(
    r"`((?:Fused|Banded|Linear|NonLinear|Optimize|Interpolate|DistrArray|"
    r"Streamed|Sharded|BSRMatrix|Dense|Symmetric)\w*|"
    r"(?:make|create|finalize|densify)_\w+)")


def doc_names():
    """Names from prose plus the RIGHT-hand cells of mapping tables — the
    left column holds the REFERENCE's names (the thing being migrated
    FROM), which are not importable here by design."""
    ours, theirs = set(), set()
    with open(DOC) as fh:
        for line in fh:
            if line.lstrip().startswith("|"):
                cells = line.split("|")[1:]
                for i, cell in enumerate(cells):
                    tgt = theirs if i == 0 else ours
                    tgt.update(m.group(1) for m in NAME_RE.finditer(cell))
            else:
                ours.update(m.group(1) for m in NAME_RE.finditer(line))
    names = sorted(ours)
    assert len(names) >= 9, f"name extraction broke: {names}"
    return names


def _resolvable(name: str) -> bool:
    if hasattr(its, name):
        return True
    import importlib
    import pkgutil

    for pkg in ("iterative_solver_tpu.solvers", "iterative_solver_tpu.ops.kernels",
                "iterative_solver_tpu.array", "iterative_solver_tpu.parallel",
                "iterative_solver_tpu.native"):
        try:
            mod = importlib.import_module(pkg)
        except ImportError:
            continue
        if hasattr(mod, name):
            return True
        for info in pkgutil.iter_modules(mod.__path__):
            try:
                sub = importlib.import_module(f"{pkg}.{info.name}")
            except ImportError:
                continue
            if hasattr(sub, name):
                return True
    return False


@pytest.mark.parametrize("name", doc_names())
def test_migration_name_exists(name):
    assert _resolvable(name), (
        f"docs/MIGRATION.md references `{name}` but it is not importable "
        "from the package — fix the doc or restore the API")
