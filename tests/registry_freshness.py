"""Static changed-since-green analysis for the driver-window freshness rule.

Mechanizes the changed-file preemption rule the round-6/7 builders applied
by hand (and round 7's verdict flagged for post-rotation drift): a query
whose BACKING CODE changed after the commit that recorded its freshest
hash-green driver row is no longer certified by that row, so it must be
back in the declared rotation (`_DRIVER_PRIORITY` — the 50-slot window
about to re-certify it, or the explicit queue behind it).

Granularity (chosen so registry churn does not flag the world):

- The three REGISTRY modules (queries.py, queries_analytics.py,
  queries_pipeline.py) hold ~200 query functions and change every round
  (window rotation, new registrations). A whole-file diff there would
  flag everything, so each query gets a FUNCTION-LEVEL fingerprint: the
  docstring-stripped AST of its function (decorators — and therefore the
  oracle SQL — included), plus, recursively within the module, every
  same-module helper function and module-level constant it references
  (oracle fragments like _NORM/_MINHASH_SIGS are constants, so an oracle
  edit through a shared fragment still flags every query composed on it).
- ENGINE modules (operators/, functions/, rules/, plans/, streaming/,
  control/, lua_*, testdata, fixtures, artifacts, pipeline, schemas,
  session) change rarely and meaningfully, so any query that references
  one — directly or through the package-internal import closure
  (enrich.py -> functions/ip.py is the round-7 case) — is flagged when
  that module's docstring-stripped AST differs from its state at the
  green commit. Comments and docstrings never flag.

The "green commit" for round N is the commit that recorded
CORRECTNESS_rN.json: the driver certifies end-of-round HEAD, so that
commit's tree is exactly the code the green rows vouch for. The current
side reads the WORKING TREE, so uncommitted edits flag immediately —
mid-round, the builder must declare the affected queries before the
round's artifacts land.
"""

from __future__ import annotations

import ast
import copy
import functools
import os
import subprocess

PKG = "lichess_event_stream_watcher_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REGISTRY_MODULES = {
    f"{PKG}.queries",
    f"{PKG}.queries_analytics",
    f"{PKG}.queries_pipeline",
}


# --------------------------------------------------------------------------
# source access (commit blob vs working tree), cached per (commit, path)
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _source(relpath: str, commit: str | None) -> str | None:
    if commit is None:
        try:
            with open(os.path.join(REPO, relpath)) as f:
                return f.read()
        except OSError:
            return None
    r = subprocess.run(
        ["git", "-C", REPO, "show", f"{commit}:{relpath}"],
        capture_output=True,
        text=True,
    )
    return r.stdout if r.returncode == 0 else None


@functools.lru_cache(maxsize=None)
def round_commit(rnd: int) -> str | None:
    """The commit that recorded CORRECTNESS_r{rnd}.json (None if never
    committed — e.g. the current round's file mid-round)."""
    r = subprocess.run(
        ["git", "-C", REPO, "log", "-1", "--format=%H", "--", f"CORRECTNESS_r{rnd:02d}.json"],
        capture_output=True,
        text=True,
    )
    h = r.stdout.strip()
    return h or None


# --------------------------------------------------------------------------
# AST canonicalization
# --------------------------------------------------------------------------
def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:] or [ast.Pass()]
    return tree


def _node_dump(node: ast.AST) -> str:
    return ast.dump(_strip_docstrings(copy.deepcopy(node)))


@functools.lru_cache(maxsize=None)
def _module_dump(relpath: str, commit: str | None) -> str:
    """Docstring-stripped canonical dump of a whole module (engine-module
    granularity). Missing or unparsable sources get distinct sentinels so
    an added/removed/broken module always reads as 'changed'."""
    src = _source(relpath, commit)
    if src is None:
        return "<missing>"
    try:
        return ast.dump(_strip_docstrings(ast.parse(src)))
    except SyntaxError:
        return "<syntax-error>\n" + src


def _resolve_from(modname: str, level: int, module: str | None) -> str | None:
    """Absolute dotted target of a `from ... import` (package-internal
    only; None for external imports)."""
    if level == 0:
        return module if module and module.split(".")[0] == PKG else None
    parts = modname.split(".")
    base = parts[: len(parts) - level]
    if not base or base[0] != PKG:
        return None
    return ".".join(base + ([module] if module else []))


def _path_of(dotted: str) -> tuple[str, str] | None:
    """dotted -> ('file', relpath) | ('dir', relpath) | None."""
    p = dotted.replace(".", "/")
    if os.path.isfile(os.path.join(REPO, p + ".py")):
        return ("file", p + ".py")
    if os.path.isdir(os.path.join(REPO, p)):
        return ("dir", p)
    return None


def _dir_modules(relpath: str) -> list[str]:
    return sorted(
        f"{relpath}/{f}"
        for f in os.listdir(os.path.join(REPO, relpath))
        if f.endswith(".py")
    )


class _Index:
    """Module-level symbol/alias index of one registry-module source."""

    def __init__(self, src: str, modname: str):
        self.modname = modname
        self.tree = ast.parse(src)
        self.funcs: dict[str, ast.AST] = {}
        self.consts: dict[str, ast.AST] = {}
        self.aliases: dict[str, list[tuple[str, str | None]]] = {}
        for node in self.tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.funcs[node.name] = node
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.consts[t.id] = node.value
            elif (
                isinstance(node, ast.AnnAssign)
                and isinstance(node.target, ast.Name)
                and node.value is not None
            ):
                self.consts[node.target.id] = node.value
        # imports ANYWHERE in the module (query functions import engine
        # modules locally by convention), keyed by the bound name
        for node in ast.walk(self.tree):
            if isinstance(node, ast.ImportFrom):
                base = _resolve_from(modname, node.level, node.module)
                if base is None:
                    continue
                for a in node.names:
                    self.aliases.setdefault(a.asname or a.name, []).append(
                        (base, a.name)
                    )
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.split(".")[0] == PKG:
                        bound = a.asname or a.name.split(".")[0]
                        self.aliases.setdefault(bound, []).append((a.name, None))


@functools.lru_cache(maxsize=None)
def _index(modname: str, commit: str | None) -> _Index | None:
    src = _source(modname.replace(".", "/") + ".py", commit)
    return _Index(src, modname) if src is not None else None


def _names_in(node: ast.AST) -> list[str]:
    return sorted({n.id for n in ast.walk(node) if isinstance(n, ast.Name)})


def _analyze(
    modname: str, func_name: str, commit: str | None
) -> tuple[str, frozenset[str]]:
    """(fingerprint, direct backing-module relpaths) for one query function
    in one tree state. The fingerprint covers the function itself, every
    same-module helper/constant it reaches, and symbol-level prints of
    names imported from OTHER registry modules; engine-module references
    land in the backing set for whole-module comparison."""
    idx = _index(modname, commit)
    if idx is None:
        return ("<missing-module>", frozenset())
    pieces: list[str] = []
    backing: set[str] = set()
    visited: set[str] = set()

    def resolve(name: str) -> None:
        key = f"n:{name}"
        if key in visited:
            return
        visited.add(key)
        if name in idx.funcs:
            pieces.append(f"func:{name}:{_node_dump(idx.funcs[name])}")
            for n in _names_in(idx.funcs[name]):
                resolve(n)
        elif name in idx.consts:
            pieces.append(f"const:{name}:{ast.dump(idx.consts[name])}")
            for n in _names_in(idx.consts[name]):
                resolve(n)
        elif name in idx.aliases:
            for base, sym in idx.aliases[name]:
                _resolve_target(base, sym)

    def _resolve_target(base: str, sym: str | None) -> None:
        target = f"{base}.{sym}" if sym else base
        hit = _path_of(target)
        if hit is not None:
            kind, rel = hit
            mod_dotted = target
            if kind == "dir":
                backing.update(_dir_modules(rel))
                return
            if mod_dotted in REGISTRY_MODULES:
                pieces.append(f"regmod:{mod_dotted}")
                return
            backing.add(rel)
            return
        # not a module: a symbol inside module `base`
        hit = _path_of(base)
        if hit is None:
            return
        kind, rel = hit
        if kind == "dir":
            backing.update(_dir_modules(rel))
            return
        if base in REGISTRY_MODULES:
            other = _index(base, commit)
            if other is None or sym is None:
                pieces.append(f"xsym:{base}:{sym}:<missing>")
            elif sym in other.funcs:
                pieces.append(f"xsym:{base}:{sym}:{_node_dump(other.funcs[sym])}")
            elif sym in other.consts:
                pieces.append(f"xsym:{base}:{sym}:{ast.dump(other.consts[sym])}")
            else:
                pieces.append(f"xsym:{base}:{sym}:<unresolved>")
        else:
            backing.add(rel)

    resolve(func_name)
    if not any(p.startswith(f"func:{func_name}:") for p in pieces):
        pieces.append(f"<missing-func:{func_name}>")
    return ("\n".join(sorted(pieces)), frozenset(backing))


# --------------------------------------------------------------------------
# engine-module import closure (current tree; edges = package imports)
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _module_edges(relpath: str) -> frozenset[str]:
    src = _source(relpath, None)
    if src is None:
        return frozenset()
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return frozenset()
    modname = relpath[:-3].replace("/", ".")
    if relpath.endswith("/__init__.py"):
        modname = relpath[: -len("/__init__.py")].replace("/", ".")
    out: set[str] = set()

    def add(target: str) -> None:
        hit = _path_of(target)
        if hit is None:
            # `from .x import name`: try the parent as a module
            parent = target.rsplit(".", 1)[0]
            hit = _path_of(parent)
            if hit is None:
                return
        kind, rel = hit
        if kind == "dir":
            out.update(_dir_modules(rel))
        elif target not in REGISTRY_MODULES:
            out.add(rel)

    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            base = _resolve_from(modname, node.level, node.module)
            if base is None:
                continue
            for a in node.names:
                add(f"{base}.{a.name}")
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.split(".")[0] == PKG:
                    add(a.name)
    return frozenset(out)


def _closure(seeds: frozenset[str]) -> frozenset[str]:
    seen, todo = set(), list(seeds)
    while todo:
        rel = todo.pop()
        if rel in seen:
            continue
        seen.add(rel)
        todo.extend(_module_edges(rel) - seen)
    return frozenset(seen)


# --------------------------------------------------------------------------
# the public check
# --------------------------------------------------------------------------
def query_changed_since(fn, commit: str | None) -> list[str]:
    """Reasons this query's backing code differs between ``commit`` and the
    working tree (empty list = still certified by that commit's green row).
    ``commit=None`` (round artifact never committed) reads as changed."""
    if commit is None:
        return ["green round has no committed CORRECTNESS artifact"]
    modname = fn.__module__
    # Factory-made queries (closures named 'fn' inside a registration
    # factory, e.g. the 8 crit_* criteria) have no top-level def of their
    # own — fingerprint the ENCLOSING top-level factory instead, which
    # contains the whole construction (and whose imports give the backing
    # modules). Without this they'd silently fingerprint as the constant
    # '<missing-func>' on both sides and be exempt forever (round-8
    # review finding).
    func_name = (
        fn.__qualname__.split(".")[0]
        if "<locals>" in getattr(fn, "__qualname__", "")
        else fn.__name__
    )
    fp_old, back_old = _analyze(modname, func_name, commit)
    fp_new, back_new = _analyze(modname, func_name, None)
    if "<missing-func" in fp_new:
        # fail LOUD: a query this analyzer cannot resolve on the current
        # tree must read as changed, not silently certified
        return [f"unanalyzable query function {modname}.{func_name}"]
    reasons = []
    if fp_old != fp_new:
        reasons.append(f"function fingerprint changed in {modname}")
    for rel in sorted(_closure(back_old | back_new)):
        if _module_dump(rel, commit) != _module_dump(rel, None):
            reasons.append(f"backing module changed: {rel}")
    return reasons
