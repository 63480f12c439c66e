"""Function-level change tracking: which registered queries does an
in-round source change affect?

Policy (the rotation blind spot that shipped v34 broken in round 3 and left
v64/v65/v67 unverified in round 4): **any query whose code changed in-round
must be in that round's driver window** (the first 50 registry entries —
the driver's correctness sweep caps there).  This module derives
query → code dependencies statically from the AST and computes the set of
queries affected by the git diff since the round-start commit.

Granularity: top-level functions and classes are the tracked units; a
change anywhere else in a module (constants, imports, module docstring)
conservatively marks *every* unit in that module changed.  Dependencies
follow imports between ``flowbyte_spark`` modules and bare-name references
within a module, to a fixpoint — so a query is "affected" if any function
it transitively calls changed.

Used only by ``tests/test_registry.py`` — zero runtime cost on query paths.
"""

from __future__ import annotations

import ast
import os
import re
import subprocess

PKG = "flowbyte_spark"

# ---------------------------------------------------------------------------
# git plumbing


def _git(repo: str, *args: str) -> str:
    res = subprocess.run(
        ["git", *args], cwd=repo, capture_output=True, text=True, check=True
    )
    return res.stdout


def round_start_sha(repo: str) -> str | None:
    """Latest commit whose subject marks a driver round boundary.

    The driver commits ``round N: verdict/advice/correctness/bench`` when a
    round's judging lands; everything after it is "this round's" work.
    """
    try:
        out = _git(repo, "log", "--format=%H %s")
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(r"round \d+: verdict", subject):
            return sha
    return None


def _changed_py_files(repo: str, sha: str) -> list[str]:
    """Tracked files changed since ``sha`` (incl. uncommitted) + untracked."""
    changed = _git(repo, "diff", "--name-only", sha).splitlines()
    untracked = _git(
        repo, "ls-files", "--others", "--exclude-standard"
    ).splitlines()
    return sorted(
        p
        for p in {*changed, *untracked}
        if p.endswith(".py") and p.startswith(PKG + "/")
    )


def _source_at(repo: str, sha: str, path: str) -> str:
    try:
        return _git(repo, "show", f"{sha}:{path}")
    except subprocess.CalledProcessError:
        return ""  # file did not exist at round start


# ---------------------------------------------------------------------------
# AST units

RESIDUE = "<module>"

Unit = tuple[str, str]  # (dotted module, function/class name or RESIDUE)


def _mod_of(path: str) -> str:
    return path[: -len(".py")].replace("/", ".").removesuffix(".__init__")


def _strip_docstrings(tree: ast.Module) -> ast.Module:
    """Remove docstring statements everywhere: a docstring-only edit is
    documentation, not behavior — it must not mark a unit changed (the
    r11 ADVICE fixes were docstring notes that would otherwise have
    marked ~18 streaming queries in-round-changed)."""
    for node in ast.walk(tree):
        if isinstance(
            node,
            (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                del body[0]
            if not body:  # a unit that was ONLY a docstring
                body.append(ast.Pass())
    return tree


def _units_of(tree: ast.Module) -> tuple[dict[str, str], list[str]]:
    """Split a module into named units and a residue.

    Returns ({name: normalized dump}, [residue statement dumps]).
    ``ast.dump`` without attributes is position-independent, so pure
    line-number drift does not count as a change; docstrings are
    stripped first, so documentation edits don't count either.
    """
    tree = _strip_docstrings(tree)
    units: dict[str, str] = {}
    residue: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            units[node.name] = ast.dump(node)
        else:
            residue.append(ast.dump(node))
    return units, residue


def changed_units(repo: str, sha: str) -> set[Unit]:
    out: set[Unit] = set()
    for path in _changed_py_files(repo, sha):
        mod = _mod_of(path)
        new_src = ""
        full = os.path.join(repo, path)
        if os.path.exists(full):
            with open(full) as fh:
                new_src = fh.read()
        old_src = _source_at(repo, sha, path)
        try:
            new_units, new_res = _units_of(ast.parse(new_src))
            old_units, old_res = _units_of(ast.parse(old_src))
        except SyntaxError:
            # Unparseable side: conservatively mark the whole module.
            out.add((mod, RESIDUE))
            out.update((mod, n) for n in _try_unit_names(new_src))
            continue
        if new_res != old_res:
            # Module-level change (imports/constants): everything shifts.
            out.add((mod, RESIDUE))
            out.update((mod, n) for n in {*new_units, *old_units})
            continue
        for name in {*new_units, *old_units}:
            if new_units.get(name) != old_units.get(name):
                out.add((mod, name))
    return out


def _try_unit_names(src: str) -> list[str]:
    try:
        return list(_units_of(ast.parse(src))[0])
    except SyntaxError:
        return []


# ---------------------------------------------------------------------------
# reference graph


def _pkg_modules(repo: str) -> dict[str, str]:
    """dotted module -> source text, for every .py under flowbyte_spark/."""
    mods: dict[str, str] = {}
    root = os.path.join(repo, PKG)
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, repo)
            with open(path) as fh:
                mods[_mod_of(rel)] = fh.read()
    return mods


class _RefCollector(ast.NodeVisitor):
    """Collect (module, name) references inside one unit."""

    def __init__(
        self,
        mod_alias: dict[str, str],
        name_alias: dict[str, Unit],
        local_units: set[str],
        own_mod: str,
    ):
        self.mod_alias = dict(mod_alias)
        self.name_alias = dict(name_alias)
        self.local_units = local_units
        self.own_mod = own_mod
        self.refs: set[Unit] = set()

    def visit_Import(self, node: ast.Import) -> None:
        _collect_import(node, self.mod_alias)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        _collect_import_from(node, self.mod_alias, self.name_alias)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        if isinstance(node.value, ast.Name) and node.value.id in self.mod_alias:
            self.refs.add((self.mod_alias[node.value.id], node.attr))
            return  # the base Name is the module itself, not a unit ref
        self.generic_visit(node)

    def visit_Name(self, node: ast.Name) -> None:
        if node.id in self.name_alias:
            self.refs.add(self.name_alias[node.id])
        elif node.id in self.local_units:
            self.refs.add((self.own_mod, node.id))


def _collect_import(node: ast.Import, mod_alias: dict[str, str]) -> None:
    for a in node.names:
        if a.name.startswith(PKG):
            mod_alias[a.asname or a.name.split(".")[0]] = a.name


def _collect_import_from(
    node: ast.ImportFrom,
    mod_alias: dict[str, str],
    name_alias: dict[str, Unit],
) -> None:
    if node.module is None or not node.module.startswith(PKG):
        return
    for a in node.names:
        # `from pkg.operators import text as T` binds a module; treat any
        # name that is itself a submodule as a module alias, else a unit.
        sub = f"{node.module}.{a.name}"
        name_alias[a.asname or a.name] = (node.module, a.name)
        mod_alias.setdefault(a.asname or a.name, sub)


def build_edges(repo: str) -> dict[Unit, set[Unit]]:
    """unit -> set of units it references (cross- and intra-module)."""
    mods = _pkg_modules(repo)
    known_units: dict[str, set[str]] = {}
    trees: dict[str, ast.Module] = {}
    for mod, src in mods.items():
        try:
            trees[mod] = ast.parse(src)
        except SyntaxError:
            continue
        known_units[mod] = set(_units_of(trees[mod])[0])

    edges: dict[Unit, set[Unit]] = {}
    for mod, tree in trees.items():
        mod_alias: dict[str, str] = {}
        name_alias: dict[str, Unit] = {}
        for node in tree.body:
            if isinstance(node, ast.Import):
                _collect_import(node, mod_alias)
            elif isinstance(node, ast.ImportFrom):
                _collect_import_from(node, mod_alias, name_alias)
        # Drop module-alias entries that are really unit imports
        # (`from x import fn` where fn is a function there, not a module).
        for alias, target in list(mod_alias.items()):
            parent, _, leaf = target.rpartition(".")
            if parent in known_units and leaf in known_units[parent]:
                del mod_alias[alias]

        local = known_units.get(mod, set())
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                coll = _RefCollector(mod_alias, name_alias, local - {node.name}, mod)
                for child in ast.iter_child_nodes(node):
                    coll.visit(child)
                edges[(mod, node.name)] = _resolve(coll.refs, known_units)
    return edges


def _resolve(refs: set[Unit], known_units: dict[str, set[str]]) -> set[Unit]:
    """Point refs to real units; unknown names fall back to the module
    residue (sound: residue changes mark every unit changed anyway)."""
    out: set[Unit] = set()
    for mod, name in refs:
        if mod not in known_units:
            continue  # outside the package tree (or unparseable)
        if name in known_units[mod]:
            out.add((mod, name))
        else:
            out.add((mod, RESIDUE))
    return out


# ---------------------------------------------------------------------------
# query registry map


def query_units(repo: str) -> dict[str, Unit]:
    """registered query name -> (module, function) defining it."""
    out: dict[str, Unit] = {}
    qdir = os.path.join(repo, PKG, "queries")
    for f in sorted(os.listdir(qdir)):
        if not f.endswith(".py"):
            continue
        rel = f"{PKG}/queries/{f}"
        with open(os.path.join(qdir, f)) as fh:
            try:
                tree = ast.parse(fh.read())
            except SyntaxError:
                continue
        for node in tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for deco in node.decorator_list:
                if (
                    isinstance(deco, ast.Call)
                    and isinstance(deco.func, ast.Name)
                    and deco.func.id == "register"
                    and deco.args
                    and isinstance(deco.args[0], ast.Constant)
                ):
                    out[deco.args[0].value] = (_mod_of(rel), node.name)
    return out


# ---------------------------------------------------------------------------
# the answer


def _reach(seed: set[Unit], edges: dict[Unit, set[Unit]]) -> set[Unit]:
    affected = set(seed)
    moved = True
    while moved:
        moved = False
        for unit, refs in edges.items():
            if unit not in affected and refs & affected:
                affected.add(unit)
                moved = True
    return affected


def affected_queries(repo: str, sha: str) -> set[str]:
    """Names of registered queries whose code changed since ``sha``,
    directly or through anything they transitively reference."""
    changed = changed_units(repo, sha)
    if not changed:
        return set()
    affected = _reach(changed, build_edges(repo))
    return {q for q, unit in query_units(repo).items() if unit in affected}


def affected_queries_split(
    repo: str, sha: str, universal_frac: float = 0.5
) -> tuple[set[str], set[str]]:
    """Split the affected set into ``(narrow, infra)``.

    A changed unit is *universal infrastructure* when it alone reaches more
    than ``universal_frac`` of the registry (e.g. ``catalog.load_table``,
    the session factory): such a change affects more queries than the
    50-slot driver window can hold, so window coverage is physically
    impossible and the fallback gate is the in-suite oracle harness (every
    registered oracle runs in the same pytest invocation).  ``narrow`` —
    queries reached by at least one NON-universal changed unit (their own
    module, a specific operator) — must still sit inside the window: that
    is the v34/v64-class regression the policy exists for.  ``infra`` is
    the remainder, affected only through universal units.
    """
    changed = changed_units(repo, sha)
    if not changed:
        return set(), set()
    edges = build_edges(repo)
    qunits = query_units(repo)
    total = max(len(qunits), 1)
    narrow: set[str] = set()
    everything: set[str] = set()
    for c in changed:
        reached = _reach({c}, edges)
        qs = {q for q, unit in qunits.items() if unit in reached}
        everything |= qs
        if len(qs) <= universal_frac * total:
            narrow |= qs
    return narrow, everything - narrow
