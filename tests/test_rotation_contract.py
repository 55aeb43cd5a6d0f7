"""Machine-checked certification-rotation contract (round-4 VERDICT item 3
-> round-5 item 5): the correctness driver verifies only a ~50-entry PREFIX
of ``__spark_entry__.queries()``, and the registry docstring promises that
every query backed by a module changed since the last certification sits
inside that prefix. This test enforces the promise:

* each registry query is mapped to the engine modules that implement it by
  scanning its source for package imports, following entry-module helper
  calls (``q_clean_clean_er`` inside ``q_best_match_pairs`` etc.), and
  closing over the package's own import graph (a query touching
  ``operators.dedup`` is also backed by everything dedup imports);
* the worktree is diffed against the commit recorded in ``ROTATION_BASE``
  (the last driver-certified point — bumped each round);
* every query whose module closure intersects the changed set must appear
  in the first ``PREFIX`` entries, unless the module is listed in
  ``EXCEPTIONS`` with a justification (e.g. a comment-only edit).
"""

from __future__ import annotations

import inspect
import os
import re
import subprocess

import pytest

import __spark_entry__ as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "continuousfilteringbenchmark_spark"
PREFIX = 50

# module path (repo-relative) -> one-line justification for why its change
# does NOT require prefix re-certification of its queries. Keep EMPTY unless
# the change is provably inert (comments/docstrings only).
EXCEPTIONS: dict[str, str] = {
    # round 5: docstring-only — documents the np.round half-even vs DuckDB
    # half-away tie assumption in the cross-polytope probe ranking
    # (ADVICE r4 item 1); no executable line changed.
    "continuousfilteringbenchmark_spark/operators/lsh.py": (
        "docstring-only edit (rounding-assumption note), r5"
    ),
}


def _base_commit() -> str:
    with open(os.path.join(REPO, "ROTATION_BASE")) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                return line
    raise AssertionError("ROTATION_BASE has no commit line")


def _changed_package_files() -> set[str]:
    try:
        diff = subprocess.run(
            ["git", "diff", "--name-only", _base_commit(), "--", f"{PKG}/"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
        untracked = subprocess.run(
            ["git", "ls-files", "--others", "--exclude-standard", f"{PKG}/"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("git unavailable or ROTATION_BASE commit missing")
    return {f for f in diff + untracked if f.endswith(".py")}


_IMPORT_RE = re.compile(rf"^\s*from\s+(?:{PKG}|\.+)([\w.]*)\s+import\s+(.+)$")


def _module_file(dotted: str) -> str | None:
    """Dotted module under the package -> repo-relative file, or None."""
    cand = os.path.join(PKG, *dotted.split("."))
    if os.path.isfile(os.path.join(REPO, cand + ".py")):
        return cand + ".py"
    if os.path.isfile(os.path.join(REPO, cand, "__init__.py")):
        return os.path.join(cand, "__init__.py")
    return None


def _imports_of_source(src: str, rel_pkg: str = "") -> set[str]:
    """Repo-relative module files imported from the package in ``src``.
    ``rel_pkg`` resolves relative imports for package-internal modules."""
    # flatten parenthesized import lists onto one line, then parse per line
    src = re.sub(
        r"import\s+\(([^)]*)\)",
        lambda m: "import " + m.group(1).replace("\n", " "),
        src,
    )
    out: set[str] = set()
    for line in src.splitlines():
        m = _IMPORT_RE.match(line)
        if not m:
            continue
        base, names = m.groups()
        base = base.strip(".")
        for name in names.split(","):
            name = name.split("#")[0].strip().split(" as ")[0].strip()
            if not name:
                continue
            for dotted in (
                f"{base}.{name}".strip(".") if base else name,
                base or name,
            ):
                if rel_pkg and _module_file(f"{rel_pkg}.{dotted}"):
                    dotted = f"{rel_pkg}.{dotted}"
                f = _module_file(dotted)
                if f:
                    out.add(f)
                    break
    return out


def _package_import_graph() -> dict[str, set[str]]:
    graph: dict[str, set[str]] = {}
    for dirpath, _, files in os.walk(os.path.join(REPO, PKG)):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), REPO)
            with open(os.path.join(dirpath, fn)) as f:
                src = f.read()
            pkg_dir = os.path.dirname(rel).replace(os.sep, ".")
            rel_pkg = pkg_dir[len(PKG) + 1 :] if pkg_dir != PKG else ""
            graph[rel] = _imports_of_source(src, rel_pkg)
    return graph


def _closure(files: set[str], graph: dict[str, set[str]]) -> set[str]:
    out = set(files)
    frontier = list(files)
    while frontier:
        f = frontier.pop()
        for dep in graph.get(f, ()):
            if dep not in out:
                out.add(dep)
                frontier.append(dep)
    return out


def _query_modules() -> dict[str, set[str]]:
    """query name -> closed set of implementing package module files."""
    graph = _package_import_graph()
    qs = E.queries()
    direct: dict[str, set[str]] = {}

    def entry_source_closure(func, seen: set[str]) -> str:
        name = func.__name__
        if name in seen:
            return ""
        seen.add(name)
        src = inspect.getsource(func)
        for called in re.findall(r"\b(\w+)\(", src):
            obj = getattr(E, called, None)
            if (
                callable(obj)
                and getattr(obj, "__module__", "") == "__spark_entry__"
                and called not in seen
            ):
                src += entry_source_closure(obj, seen)
        return src

    for name, func in qs.items():
        src = entry_source_closure(func, set())
        direct[name] = _imports_of_source(src)
    return {name: _closure(mods, graph) for name, mods in direct.items()}


def test_every_query_maps_to_engine_modules():
    qmods = _query_modules()
    empty = [q for q, mods in qmods.items() if not mods]
    assert not empty, f"query->module mapper found no package imports for: {empty}"


def test_changed_modules_queries_sit_in_certification_prefix():
    changed = _changed_package_files() - set(EXCEPTIONS)
    if not changed:
        pytest.skip("no engine modules changed since ROTATION_BASE")
    prefix = set(list(E.queries())[:PREFIX])
    qmods = _query_modules()
    violations = {
        q: sorted(mods & changed)
        for q, mods in qmods.items()
        if (mods & changed) and q not in prefix
    }
    assert not violations, (
        "queries backed by modules changed since ROTATION_BASE are outside "
        f"the first {PREFIX} registry entries (the driver's certification "
        f"prefix): {violations}"
    )
