"""Git-derived driver-check staleness (VERDICT r7 "What's wrong" #2).

The driver re-verifies a 50-query prefix of ``queries()`` per round, so
the order must put queries whose IMPLEMENTATION changed since their last
driver-green row first.  Round 6 introduced a hand-maintained
``TOUCHED_ROUND`` dict for that; round 7 demonstrated its failure mode:
the storage/streaming layers under six long-green queries were rewritten
and nobody bumped them, so their green rows certified code that no longer
existed.  This module derives the touch round mechanically:

1. **Round boundaries** come from the driver's own ``round N:
   verdict/advice/correctness/bench`` commits; work after boundary N
   belongs to round N+1 (the current round = max boundary + 1).
2. **Per-query dependencies** are derived from the AST, not hand lists:
   starting from the registered query function (and its oracle callable,
   when the oracle is lazy), referenced top-level segments are followed
   through same-module ``Name`` references, module-level and
   function-local ``from smalltsdb_spark.x import ...`` aliases, and
   ``module.attr`` accesses on imported submodule aliases.  Every hop is
   a superset approximation (an attr name is matched against EVERY
   module it could belong to) — staleness may over-fire, never
   under-fire at the segment level.
3. **Change rounds** per segment: for each round in which git says the
   file changed at all, the segment's source (decorators included, so a
   ``@query(..., oracle)`` SQL edit counts) is hashed at the two
   adjacent round-boundary snapshots (``git show``); a differing hash
   pins the change to that round.  The working tree is the current
   round's snapshot.  A name that cannot be resolved to a segment falls
   back to the whole file's last-changed round.

``touch_rounds()`` returns ``{query_name: round}`` — the latest round in
which anything the query executes changed.  The driver order treats a
query whose most recent green round predates this as STALE.  Any
failure (no git, detached checkout, parse error) degrades to ``{}`` so
the hand-maintained overrides in ``__spark_entry__`` remain the floor.
"""

from __future__ import annotations

import ast
import hashlib
import os
import re
import subprocess
from dataclasses import dataclass, field

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BOUNDARY_RE = re.compile(r"^round (\d+): verdict")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args],
        check=True,
        capture_output=True,
        text=True,
        timeout=60,
    ).stdout


def _module_relpath(dotted: str) -> str | None:
    """'smalltsdb_spark.operators.dedup' -> repo-relative file path."""
    if not dotted.startswith("smalltsdb_spark"):
        return None
    base = dotted.replace(".", "/")
    for cand in (f"{base}.py", f"{base}/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


@dataclass
class _Segment:
    start: int  # 1-based first line (min of decorators and def/assign)
    end: int
    names: set[str] = field(default_factory=set)  # Name ids referenced
    attrs: set[str] = field(default_factory=set)  # Attribute attrs
    # local `from smalltsdb_spark.x import n` aliases inside this node
    local_aliases: dict[str, tuple[str, str]] = field(default_factory=dict)
    local_modules: dict[str, str] = field(default_factory=dict)


@dataclass
class _ModuleInfo:
    path: str
    lines: list[str]
    top: dict[str, _Segment]
    # module-level `from smalltsdb_spark.x import name` -> (relpath, name)
    aliases: dict[str, tuple[str, str]]
    # module-level submodule imports: local name -> relpath
    modules: dict[str, str]


def _collect_refs(node: ast.AST, seg: _Segment) -> None:
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name):
            seg.names.add(sub.id)
        elif isinstance(sub, ast.Attribute):
            seg.attrs.add(sub.attr)
        elif isinstance(sub, ast.ImportFrom) and sub.module:
            mod = sub.module
            if sub.level:  # relative import: resolve against the package
                mod = "smalltsdb_spark." + mod
            _record_import_from(mod, sub.names, seg.local_aliases, seg.local_modules)
        elif isinstance(sub, ast.Import):
            for a in sub.names:
                rel = _module_relpath(a.name)
                if rel:
                    seg.local_modules[a.asname or a.name.split(".")[0]] = rel


def _record_import_from(mod, names, aliases, modules) -> None:
    rel = _module_relpath(mod)
    if rel is None and not mod.startswith("smalltsdb_spark"):
        return
    for a in names:
        sub_rel = _module_relpath(f"{mod}.{a.name}")
        local = a.asname or a.name
        if sub_rel:  # `from smalltsdb_spark.operators import dedup`
            modules[local] = sub_rel
        elif rel:  # `from smalltsdb_spark.functions import md5_long`
            aliases[local] = (rel, a.name)


def _seg_span(node: ast.AST) -> tuple[int, int]:
    start = node.lineno
    for d in getattr(node, "decorator_list", []):
        start = min(start, d.lineno)
    return start, node.end_lineno


_TARGETED = (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)


def _parse_module(path: str, source: str) -> _ModuleInfo:
    tree = ast.parse(source)
    info = _ModuleInfo(path, source.splitlines(), {}, {}, {})
    for node in tree.body:
        if isinstance(node, ast.ImportFrom) and node.module:
            mod = node.module
            if node.level:
                mod = "smalltsdb_spark." + mod
            _record_import_from(mod, node.names, info.aliases, info.modules)
        elif isinstance(node, ast.Import):
            for a in node.names:
                rel = _module_relpath(a.name)
                if rel:
                    info.modules[a.asname or a.name.split(".")[0]] = rel
        elif isinstance(node, _TARGETED):
            seg = _Segment(*_seg_span(node))
            _collect_refs(node, seg)
            info.top[node.name] = seg
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            seg = _Segment(*_seg_span(node))
            _collect_refs(node, seg)
            for t in targets:
                if isinstance(t, ast.Name):
                    info.top[t.id] = seg
    return info


def _segment_source(info: _ModuleInfo, name: str) -> str:
    seg = info.top[name]
    return "\n".join(info.lines[seg.start - 1 : seg.end])


def _seg_hash(info: _ModuleInfo | None, name: str) -> str | None:
    if info is None or name not in info.top:
        return None
    return hashlib.sha256(_segment_source(info, name).encode()).hexdigest()


class _Repo:
    """Cached view of the repo's round history and module snapshots."""

    def __init__(self) -> None:
        self.boundaries = self._round_boundaries()  # round -> sha
        self.current_round = (max(self.boundaries) + 1) if self.boundaries else 1
        self.file_rounds = self._file_rounds()
        self._snapshots: dict[tuple[str, int], _ModuleInfo | None] = {}
        self._current: dict[str, _ModuleInfo | None] = {}

    def _round_boundaries(self) -> dict[int, str]:
        out: dict[int, str] = {}
        for line in _git("log", "--format=%H %s").splitlines():
            sha, _, subject = line.partition(" ")
            m = _BOUNDARY_RE.match(subject)
            if m:
                rnd = int(m.group(1))
                # the NEWEST commit claiming a round wins (drivers have
                # committed duplicate end-of-round snapshots before)
                out.setdefault(rnd, sha)
        return out

    def _file_rounds(self) -> dict[str, int]:
        """Repo-relative path -> last round in which git saw it change."""
        rounds: dict[str, int] = {}
        current = self.current_round
        # walking newest-first: a boundary subject moves us into that
        # round.  NO path filter — boundary commits touch only the
        # driver's md/json artifacts and a filtered log would drop them,
        # misattributing every prior round's work to the current round.
        for line in _git("log", "--format=\x01%s", "--name-only").splitlines():
            if line.startswith("\x01"):
                pass  # handled below
            elif not line.startswith("smalltsdb_spark"):
                continue
            if line.startswith("\x01"):
                m = _BOUNDARY_RE.match(line[1:])
                if m:
                    current = int(m.group(1))
            elif line.strip():
                rounds.setdefault(line.strip(), current)
        # uncommitted work belongs to the current round
        for line in _git("status", "--porcelain").splitlines():
            path = line[3:].split(" -> ")[-1].strip().strip('"')
            if path.startswith("smalltsdb_spark"):
                rounds[path] = self.current_round
        return rounds

    def snapshot(self, path: str, rnd: int) -> _ModuleInfo | None:
        """Module as of the END of round ``rnd`` (None if absent/unparsable)."""
        if rnd >= self.current_round:
            return self.current(path)
        key = (path, rnd)
        if key not in self._snapshots:
            info: _ModuleInfo | None = None
            sha = self.boundaries.get(rnd)
            if sha is not None:
                try:
                    info = _parse_module(path, _git("show", f"{sha}:{path}"))
                except (subprocess.CalledProcessError, SyntaxError):
                    info = None
            self._snapshots[key] = info
        return self._snapshots[key]

    def current(self, path: str) -> _ModuleInfo | None:
        if path not in self._current:
            try:
                with open(os.path.join(REPO, path)) as f:
                    self._current[path] = _parse_module(path, f.read())
            except (OSError, SyntaxError):
                self._current[path] = None
        return self._current[path]

    def segment_round(self, path: str, name: str) -> int:
        """Last round in which the named top-level segment changed."""
        info = self.current(path)
        if info is None or name not in info.top:
            return self.file_rounds.get(path, 0)  # whole-file fallback
        file_round = self.file_rounds.get(path, 0)
        cur_hash = _seg_hash(info, name)
        # check file-change rounds newest-first; the first round whose
        # boundary pair disagrees on the segment's source pins the change
        for rnd in range(file_round, 0, -1):
            after = (
                cur_hash
                if rnd >= self.current_round
                else _seg_hash(self.snapshot(path, rnd), name)
            )
            before = _seg_hash(self.snapshot(path, rnd - 1), name)
            if after != before:
                return rnd
            if rnd <= 1:
                break
        return 0


#: registration-time-only infrastructure: runs at import, returns its
#: argument unchanged, cannot alter what any query computes — following
#: it would mark EVERY query stale whenever the registry bookkeeping
#: changes (it dragged all 122 queries to round 7 before this exclusion)
_SEMANTICS_NEUTRAL = {("smalltsdb_spark/queries.py", "query")}


def _query_dependencies(
    repo: _Repo, registry_path: str, start_names: set[str]
) -> tuple[set[tuple[str, str]], set[str]]:
    """Resolve ``start_names`` in ``registry_path`` to the closure of
    (module, top-level-segment) pairs plus whole-module fallbacks."""
    segments: set[tuple[str, str]] = set()
    whole_files: set[str] = set()
    seen: set[tuple[str, str]] = set()
    work = [(registry_path, n) for n in start_names]
    while work:
        path, name = work.pop()
        if (path, name) in seen or (path, name) in _SEMANTICS_NEUTRAL:
            continue
        seen.add((path, name))
        info = repo.current(path)
        if info is None:
            whole_files.add(path)
            continue
        if name in info.modules:  # module alias used bare (rare)
            whole_files.add(info.modules[name])
            continue
        if name in info.aliases:
            tgt_path, tgt_name = info.aliases[name]
            work.append((tgt_path, tgt_name))
            continue
        if name not in info.top:
            continue  # builtin / parameter / third-party name
        segments.add((path, name))
        seg = info.top[name]
        for ref in seg.names:
            if ref == name:
                continue
            if ref in seg.local_modules:
                mod_path = seg.local_modules[ref]
            elif ref in info.modules:
                mod_path = info.modules[ref]
            else:
                work.append((path, ref))
                continue
            # `alias.attr` calls: try every attr in this segment against
            # the target module's top level (superset pairing)
            tgt = repo.current(mod_path)
            if tgt is None:
                whole_files.add(mod_path)
                continue
            matched = seg.attrs & set(tgt.top)
            if matched:
                work.extend((mod_path, a) for a in matched)
            else:
                whole_files.add(mod_path)
        for local, (tgt_path, tgt_name) in seg.local_aliases.items():
            if local in seg.names:
                work.append((tgt_path, tgt_name))
    return segments, whole_files


def _qualname_root(obj) -> str:
    return obj.__qualname__.split(".")[0]


#: the fail-CLOSED sentinel: a query whose touch round could not be
#: derived is reported as touched in a round later than any real one, so
#: it sorts STALE (re-certified soon) instead of silently never-stale —
#: a broken derivation must not masquerade as "nothing stale" (the exact
#: r7 failure mode this module exists to prevent; ADVICE r8)
STALE_ROUND = 10**9


def touch_rounds(queries: dict, oracles: dict) -> dict[str, int]:
    """{query name: last round in which its implementation changed}.

    FAILS CLOSED: any git/parse failure maps the affected queries to
    :data:`STALE_ROUND` (treated as touched-now by the driver ordering)
    and prints a visible warning — degraded derivation over-fires, never
    under-fires.  The hand floor in ``__spark_entry__`` merges via max,
    so it is unaffected either way.
    """
    import sys

    try:
        repo = _Repo()
    except Exception as exc:
        print(
            "staleness: git derivation UNAVAILABLE "
            f"({type(exc).__name__}: {exc}); failing closed — every query "
            "reported stale",
            file=sys.stderr,
        )
        return {name: STALE_ROUND for name in queries}
    out: dict[str, int] = {}
    seg_round_cache: dict[tuple[str, str], int] = {}
    failed: list[str] = []
    for name, fn in queries.items():
        try:
            registry = _module_relpath(fn.__module__)
            starts = {_qualname_root(fn)}
            oracle = oracles.get(name)
            if callable(oracle):
                starts.add(_qualname_root(oracle))
            segments, whole_files = _query_dependencies(repo, registry, starts)
            rnd = 0
            for path, seg_name in segments:
                key = (path, seg_name)
                if key not in seg_round_cache:
                    seg_round_cache[key] = repo.segment_round(path, seg_name)
                rnd = max(rnd, seg_round_cache[key])
            for path in whole_files:
                rnd = max(rnd, repo.file_rounds.get(path, 0))
            out[name] = rnd
        except Exception:
            out[name] = STALE_ROUND  # fail closed per query
            failed.append(name)
    if failed:
        print(
            f"staleness: derivation failed for {len(failed)} quer"
            f"{'y' if len(failed) == 1 else 'ies'} "
            f"({', '.join(sorted(failed)[:5])}{'…' if len(failed) > 5 else ''}); "
            "failing closed — they are reported stale",
            file=sys.stderr,
        )
    return out
