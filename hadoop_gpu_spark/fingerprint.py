"""Changed-since-last-green fingerprints for the query registry.

The driver correctness-checks only the first 50 registered queries per
round (`queries._DRIVER_WINDOW`). The rotation policy's category (b) —
"every query whose implementation changed since its last green row must
re-enter the window" — was enforced by builder memory through round 2,
and round 2 violated it once (the `band_hashes` rewrite left its two
consumers outside the window). This module mechanizes the check.

A query's *fingerprint* is a sha256 over:

- its oracle SQL (if any), and
- the source text of the query function plus every ``hadoop_gpu_spark``
  function/class it references, followed **transitively** (helpers of
  helpers across modules are included — e.g. ``dedup.minhash.band_hashes``
  reached through ``candidate_pairs``).

References are resolved statically: ``ast`` walks each function's source
for bare names, ``module.attr`` chains, and function-local
``import`` / ``from ... import`` statements, then resolves them against
the function's globals / the imported module. Dynamic dispatch (a helper
looked up from a dict or called via a string) is NOT traced — keep gate
queries' call graphs static, which they are.

``tests/green_manifest.json`` pins the fingerprint each query had when it
last earned a green oracle row. The canonical evidence is a driver-green
CORRECTNESS row; a LOCAL_SWEEP_rNN.json row (the builder's full-surface
run of the SAME DuckDB comparison at sf0.01) is an accepted substitute —
the r13 precedent, adopted as contract in r14 per ADVICE — but every
sweep-sourced entry is recorded, per query, under the reserved
``__refresh__`` manifest key with its source file, sf, round, and the
HEAD commit at refresh time, and the record is cleared the moment a
driver row re-proves the query. A sweep-sourced entry therefore never
masquerades as driver evidence: the judge (and the next round's builder)
can read exactly which greens rest on local evidence. The invariant test
fails if any query's current fingerprint differs from (or is absent
from) the manifest while the query sits outside ``_DRIVER_WINDOW`` —
i.e. a change the driver would never re-check. After a round's
CORRECTNESS_rNN.json lands, refresh the manifest for the greened
queries with::

    python -m hadoop_gpu_spark.fingerprint refresh CORRECTNESS_r03.json
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import textwrap
import types

_PKG = "hadoop_gpu_spark"


def _source_of(obj) -> str | None:
    try:
        return inspect.getsource(obj)
    except (OSError, TypeError):
        return None


def _in_pkg(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    if isinstance(obj, types.ModuleType):
        mod = obj.__name__
    return bool(mod) and (mod == _PKG or str(mod).startswith(_PKG + "."))


_REPR_SCALARS = (str, bytes, int, float, bool, complex, type(None))

# Bare-name constant hashing (r12) is scoped to CONVENTIONAL constants:
# ALL_CAPS names only, so mutable lowercase module state (e.g.
# tables._schema_cache, whose contents depend on which tables the
# process has already loaded) can never make a fingerprint
# process-flaky. The registration registries are excluded explicitly:
# the @query decorator's source references QUERIES/ORACLES, so hashing
# ORACLES (a dict of oracle strings — stable-repr'able) would couple
# EVERY registered query's fingerprint to every other query's oracle,
# flipping the whole registry on each registration — the same
# module-coupling failure the r10 attr-precision fix removed. A query's
# OWN oracle is already hashed directly in query_fingerprint.
import re as _re

_CONST_NAME_RE = _re.compile(r"_?[A-Z][A-Z0-9_]*")
_CONST_EXCLUDE = {
    ("hadoop_gpu_spark.queries", "QUERIES"),
    ("hadoop_gpu_spark.queries", "ORACLES"),
    ("hadoop_gpu_spark.queries", "STAGED_CANDIDATES"),
    ("hadoop_gpu_spark.queries", "STREAMING_SNAPSHOT"),
    ("hadoop_gpu_spark.queries", "_DRIVER_WINDOW"),
}


def _stable_repr(v, depth: int = 0) -> str | None:
    """Deterministic repr for builtin scalar/container values, or None if
    the value's repr cannot be proven process-stable (default object
    reprs embed id()). Sets are rendered sorted by element repr; depth
    is capped so a pathological self-referencing constant terminates."""
    if depth > 6:
        return None
    if isinstance(v, _REPR_SCALARS):
        return repr(v)
    if isinstance(v, (list, tuple)):
        parts = [_stable_repr(x, depth + 1) for x in v]
        if any(p is None for p in parts):
            return None
        inner = ", ".join(parts)
        return f"[{inner}]" if isinstance(v, list) else f"({inner})"
    if isinstance(v, dict):
        items = [
            (_stable_repr(k, depth + 1), _stable_repr(x, depth + 1))
            for k, x in v.items()
        ]
        if any(a is None or b is None for a, b in items):
            return None
        # Sorted by key repr, mirroring the set branch: a dict constant
        # built with process-dependent insertion order (e.g. a
        # comprehension over a set under hash randomization) must not
        # make fingerprints process-flaky (r12 ADVICE).
        return "{" + ", ".join(f"{a}: {b}" for a, b in sorted(items)) + "}"
    if isinstance(v, (set, frozenset)):
        parts = [_stable_repr(x, depth + 1) for x in v]
        if any(p is None for p in parts):
            return None
        return "set{" + ", ".join(sorted(parts)) + "}"
    return None


def _collect(obj, seen: dict[str, str]) -> None:
    """Recursively record {qualified-name: source} for obj and every
    package-internal callable its source references."""
    if isinstance(obj, types.ModuleType):
        key = obj.__name__
    else:
        key = f"{getattr(obj, '__module__', '?')}.{getattr(obj, '__qualname__', getattr(obj, '__name__', '?'))}"
    if key in seen:
        return
    src = _source_of(obj)
    if src is None:
        return
    seen[key] = src
    if isinstance(obj, types.ModuleType):
        return  # whole-module source already hashed; no finer recursion needed

    g = getattr(obj, "__globals__", None)
    if g is None:  # class: recurse via its methods' globals
        for m in vars(obj).values():
            if callable(m) and _in_pkg(m):
                _collect(m, seen)
        return

    tree = ast.parse(textwrap.dedent(src))
    local_imports: dict[str, object] = {}
    names: set[str] = set()
    attr_chains: list[tuple[str, str]] = []
    # Precision (r10): a Name node that is the BASE of a `module.attr`
    # chain must not ALSO be collected as a bare name — that hashed the
    # entire module source for every `mod.fn()` call site, so a one-
    # function edit flagged every query touching ANY function of that
    # module (observed: the asof_join struct-fill fix flipped 8 queries,
    # 5 of them join_ops users whose closures never reach asof_join —
    # more than the window's spare slots). The attr loop below collects
    # exactly the referenced attribute; bases fall back to whole-module
    # hashing only when an attribute cannot be resolved to a hashable
    # callable/submodule (e.g. a module-level constant).
    attr_base_nodes: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            attr_chains.append((node.value.id, node.attr))
            attr_base_nodes.add(id(node.value))
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and id(node) not in attr_base_nodes:
            names.add(node.id)
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(_PKG):
            try:
                mod = importlib.import_module(node.module)
            except ImportError:
                continue
            for alias in node.names:
                tgt = getattr(mod, alias.name, None)
                if tgt is None:
                    # `from pkg.sub import mod2` where mod2 is a submodule
                    # not yet imported: getattr misses until someone
                    # imports it, which made fingerprints depend on
                    # process import order (observed: q_multimodal_decode
                    # flipped after a PNG test imported multimodal.png).
                    # Import it so the closure is deterministic.
                    try:
                        tgt = importlib.import_module(f"{node.module}.{alias.name}")
                    except ImportError:
                        tgt = None
                local_imports[alias.asname or alias.name] = tgt
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(_PKG):
                    try:
                        local_imports[alias.asname or alias.name.split(".")[0]] = (
                            importlib.import_module(alias.name)
                        )
                    except ImportError:
                        pass

    def resolve(name: str):
        if name in local_imports:
            return local_imports[name]
        return g.get(name)

    for base, attr in attr_chains:
        tgt = resolve(base)
        if isinstance(tgt, types.ModuleType) and _in_pkg(tgt):
            sub = getattr(tgt, attr, None)
            if sub is None:
                # un-imported submodule accessed as pkg.sub — import for a
                # deterministic closure (same class of flake as above)
                try:
                    sub = importlib.import_module(f"{tgt.__name__}.{attr}")
                except ImportError:
                    sub = None
            if sub is not None and _in_pkg(sub) and (callable(sub) or isinstance(sub, types.ModuleType)):
                _collect(sub, seen)
            else:
                # module-level constant (or unresolvable attr): no function
                # source to hash — fall back to the whole module so a
                # constant edit still flips the consumer's fingerprint.
                names.add(base)
        elif tgt is not None and _in_pkg(tgt):
            # non-module base (class, object): hash the base itself, as
            # the bare-name path always did.
            names.add(base)
    for name in names:
        tgt = resolve(name)
        if tgt is None:
            continue
        if _in_pkg(tgt) and (callable(tgt) or isinstance(tgt, types.ModuleType)):
            _collect(tgt, seen)
        elif (
            not callable(tgt)
            and not isinstance(tgt, types.ModuleType)
            and _CONST_NAME_RE.fullmatch(name)
            and (g.get("__name__"), name) not in _CONST_EXCLUDE
        ):
            # r12 (ADVICE r11): a module-level CONSTANT consumed by bare
            # name (e.g. retrieval._DL_RE inside bm25_topk) resolved here
            # to a plain value and fell through both branches — its edit
            # changed behavior without flipping any consumer fingerprint,
            # the exact hole the green-manifest safety story cannot
            # afford. Hash a deterministic repr of the VALUE, keyed by
            # the consuming function's module + name. Only reprs proven
            # stable (builtin scalars/containers, recursively) are
            # hashed; anything else (objects with id()-bearing reprs)
            # falls back to nothing rather than a flaky fingerprint —
            # such constants should be lifted into functions.
            # An ALL_CAPS EMPTY mutable container is an accumulator
            # (bloom._BC_CACHE), not a constant — a genuinely constant
            # empty container has nothing to protect. Hashing one made
            # the fingerprint process-flaky: empty at import it hashed
            # as "{}", populated with broadcast handles it fell out of
            # _stable_repr entirely, so q_bloom_decontaminate's
            # fingerprint flipped after any test warmed the cache.
            if isinstance(tgt, (dict, list, set)) and not tgt:
                continue
            rep = _stable_repr(tgt)
            if rep is not None:
                owner = g.get("__name__", "?")
                seen.setdefault(f"{owner}.${name}", rep)


def query_fingerprint(name: str) -> str:
    from hadoop_gpu_spark.queries import ORACLES, QUERIES

    seen: dict[str, str] = {}
    _collect(QUERIES[name], seen)
    h = hashlib.sha256()
    h.update((ORACLES.get(name) or "").encode())
    for key in sorted(seen):
        h.update(key.encode())
        h.update(seen[key].encode())
    return h.hexdigest()[:16]


def all_fingerprints() -> dict[str, str]:
    from hadoop_gpu_spark.queries import QUERIES

    return {n: query_fingerprint(n) for n in QUERIES}


def manifest_path() -> str:
    import os

    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "green_manifest.json")


# ---------------------------------------------------------------------------
# Data epoch: the round-3 incident class. Code fingerprints cannot see a
# TESTDATA regeneration (the driver changed events.ts from TIMESTAMP(NANOS)
# to timestamp[us] between rounds and silently invalidated two greens), so
# the manifest also pins a hash of every table's parquet schema + row count
# at sf0.001 under the reserved key below. A drifted table treats every
# query that (statically) touches it as changed → it must re-enter the
# driver window.
# ---------------------------------------------------------------------------
DATA_EPOCH_KEY = "__data_epoch__"
EPOCH_SF_DIR = "/root/testdata/sf0.001"


def data_epoch(sf_dir: str = EPOCH_SF_DIR) -> dict[str, str]:
    """{table: hash(parquet schema + row count)} for the current test data."""
    import os

    import pyarrow.parquet as pq

    from hadoop_gpu_spark.tables import TABLE_NAMES

    out = {}
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        h = hashlib.sha256()
        # schema string carries physical types incl. timestamp unit —
        # exactly the drift class that broke round 3
        h.update(pq.read_schema(path).to_string().encode())
        h.update(str(pq.read_metadata(path).num_rows).encode())
        out[t] = h.hexdigest()[:16]
    return out


def query_tables(name: str) -> set[str]:
    """Tables a query (statically) touches: table-name word occurrences in
    its source closure plus its oracle SQL. Conservative — a false positive
    only widens the re-check set, the safe direction."""
    import re

    from hadoop_gpu_spark.queries import ORACLES, QUERIES
    from hadoop_gpu_spark.tables import TABLE_NAMES

    seen: dict[str, str] = {}
    _collect(QUERIES[name], seen)
    # the loader module literally enumerates every table name — exclude it,
    # then match only quoted literals (T(spark, sf_dir, "events")-style) in
    # python sources and bare word occurrences in the oracle SQL
    py_blob = "\n".join(
        src for key, src in seen.items() if not key.startswith(_PKG + ".tables")
    )
    sql_blob = ORACLES.get(name) or ""
    return {
        t
        for t in TABLE_NAMES
        if re.search(rf"""['"]{t}['"]""", py_blob) or re.search(rf"\b{t}\b", sql_blob)
    }


def epoch_changed_queries(manifest: dict) -> list[str]:
    """Queries invalidated by a test-data epoch drift: every query touching
    a table whose schema/rowcount hash differs from the manifest's pinned
    epoch. A table absent from the pinned epoch counts as drifted (no
    evidence was recorded for it)."""
    from hadoop_gpu_spark.queries import QUERIES

    pinned = manifest.get(DATA_EPOCH_KEY, {})
    current = data_epoch()
    # symmetric difference matters: a table REMOVED from disk is as much
    # a drift as a changed schema (current-only iteration missed it)
    drifted = {
        t for t in set(pinned) | set(current) if pinned.get(t) != current.get(t)
    }
    if not drifted:
        return []
    return [n for n in QUERIES if query_tables(n) & drifted]


REFRESH_KEY = "__refresh__"


def refresh(
    correctness_json: str,
    force: bool = False,
    exclude: list[str] | None = None,
) -> None:
    """Update the manifest for every query the given results file shows
    green. Accepts both shapes: the driver's CORRECTNESS_rNN.json
    (top-level {name: {err, rows_match, schema_match, hash_match}}) and
    the local sweep's LOCAL_SWEEP_rNN.json ({"results": {name: {ok}}}).

    ``exclude`` (r16, mirroring restamp's): green rows to SKIP — their
    pins stay stale so the changed-queries invariant keeps forcing them
    into the next driver window. This is the sanctioned answer when the
    moved-pin guard below refuses: queries whose closures changed in the
    same round their rows were earned are excluded and re-windowed
    instead of force-stamped, and everyone else's refresh (including the
    sweep-bridge clearing) still lands.

    Sweep-sourced refreshes record per-query provenance under the
    reserved ``__refresh__`` key (source file, sf, round, HEAD commit —
    the r13 ADVICE item: a sweep 'ok' weakening the driver-row pin must
    leave an audit trail, as restamp's ``__restamp__`` block does);
    driver-sourced refreshes clear the record for the queries they
    re-prove, so ``__refresh__`` always lists exactly the entries whose
    CURRENT pin rests on local-sweep evidence.

    Laundering guard (r14 ADVICE, mirroring restamp's): a driver row
    proves the behavior of the tree the DRIVER ran, so a driver-sourced
    refresh must not MOVE an existing pin — a moved pin means the
    query's closure changed after the row was earned, and stamping the
    current fingerprint would launder that change past the
    changed-queries-must-be-windowed invariant (e.g. replaying an older
    CORRECTNESS_rNN.json after in-round edits). The normal
    first-commit-of-round flow moves nothing (the driver ran the
    end-of-round tree). Refused by default; ``force=True`` stamps
    anyway and records the moved pins under ``__refresh__`` with
    ``driver_forced`` so the downgrade stays auditable."""
    import json
    import os

    with open(correctness_json) as f:
        rows = json.load(f)
    from_sweep = "results" in rows and isinstance(rows["results"], dict)
    if from_sweep:
        green = {n for n, r in rows["results"].items() if r.get("ok")}
    else:
        green = {
            n for n, r in rows.items()
            if not r.get("err") and r.get("rows_match")
            and r.get("schema_match", True) and r.get("hash_match", True)
        }
    green -= set(exclude or [])
    # Driver CORRECTNESS files carry no top-level "round" key — derive it
    # from the canonical filename so provenance records never stamp
    # round=None (the r15 ADVICE CLI finding).
    import re as _re

    m = _re.search(r"r(\d+)", os.path.basename(correctness_json))
    file_round = rows.get("round") if from_sweep else None
    if file_round is None and m:
        file_round = int(m.group(1))
    path = manifest_path()
    try:
        with open(path) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        manifest = {}
    fps = all_fingerprints()
    provenance = dict(manifest.get(REFRESH_KEY, {}))
    head, _ = _git_state()
    if not from_sweep:
        moved = sorted(
            n for n in green
            if n in fps and n in manifest and manifest[n] != fps[n]
        )
        if moved and not force:
            raise RuntimeError(
                f"driver refresh refused: it would MOVE the pins of {moved} "
                f"— their closures changed after {os.path.basename(correctness_json)}'s "
                "rows were earned, so those rows do not prove the current "
                "tree. Leave the stale pins (the window invariant then "
                "forces the queries into the next driver window), or pass "
                "force=True (audited under __refresh__ as driver_forced)"
            )
    else:
        moved = []
    for n in green:
        if n in fps:
            changed = manifest.get(n) != fps[n]
            manifest[n] = fps[n]
            if from_sweep:
                # only stamp entries the sweep actually moved: an entry
                # identical to its driver-earned pin needs no downgrade
                if changed:
                    provenance[n] = {
                        "source": os.path.basename(correctness_json),
                        "sf": rows.get("sf"),
                        "round": file_round,
                        "commit": head,
                    }
            elif n in moved:  # forced: keep the audit trail
                provenance[n] = {
                    "source": os.path.basename(correctness_json),
                    "round": file_round,
                    "commit": head,
                    "driver_forced": True,
                }
            else:
                provenance.pop(n, None)  # driver row supersedes
    # drop retired queries (keep reserved keys)
    manifest = {n: v for n, v in manifest.items() if n in fps or n.startswith("__")}
    provenance = {n: v for n, v in provenance.items() if n in fps}
    if provenance:
        manifest[REFRESH_KEY] = provenance
    else:
        manifest.pop(REFRESH_KEY, None)
    # green rows were earned against the data on disk right now: pin it
    manifest[DATA_EPOCH_KEY] = data_epoch()
    with open(path, "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1)
        f.write("\n")
    print(
        f"manifest: {len(green & set(fps))} refreshed "
        f"({'sweep' if from_sweep else 'driver'}-sourced), "
        f"{len(exclude or [])} excluded, "
        f"{len(manifest)} total, {len(provenance)} sweep-pinned"
    )


def _repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git_state() -> tuple[str, list[str]]:
    """(HEAD sha, dirty tracked paths) — '' / [] when git is unavailable."""
    import subprocess

    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True, cwd=_repo_root(),
        ).stdout.strip()
        porcelain = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            capture_output=True, text=True, check=True, cwd=_repo_root(),
        ).stdout
    except Exception:
        return "", []
    dirty = [ln[3:].strip() for ln in porcelain.splitlines() if ln.strip()]
    return head, dirty


def _changed_top_defs(relpath: str) -> set[str] | None:
    """Top-level def/class names in ``relpath`` whose source (incl.
    decorators) differs from HEAD. None = treat the WHOLE file as
    changed (new/unparseable file, or module-level code outside defs —
    constants, registrations — differs)."""
    import os
    import subprocess

    root = _repo_root()
    try:
        old = subprocess.run(
            ["git", "show", f"HEAD:{relpath}"],
            capture_output=True, text=True, check=True, cwd=root,
        ).stdout
        new = open(os.path.join(root, relpath)).read()
        t_old, t_new = ast.parse(old), ast.parse(new)
    except Exception:
        return None

    def tops(src: str, tree: ast.Module):
        defs: dict[str, str] = {}
        other: list[str] = []
        for nd in tree.body:
            seg = ast.get_source_segment(src, nd) or ""
            if isinstance(nd, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                dec = "".join(
                    ast.get_source_segment(src, d) or "" for d in nd.decorator_list
                )
                defs[nd.name] = dec + seg
            else:
                other.append(seg)
        return defs, "\n".join(other)

    d_old, o_old = tops(old, t_old)
    d_new, o_new = tops(new, t_new)
    if o_old != o_new:
        return None
    return {k for k in set(d_old) | set(d_new) if d_old.get(k) != d_new.get(k)}


def _query_closure_deps(name: str) -> set[tuple[str, str]]:
    """(repo-relative source path, top-level name) pairs for every
    collected member of the query's closure; '*' as the name marks a
    whole-module hash (any change to that file moves the fingerprint)."""
    import os
    import sys

    from hadoop_gpu_spark.queries import QUERIES

    seen: dict[str, str] = {}
    _collect(QUERIES[name], seen)
    root = _repo_root()
    out: set[tuple[str, str]] = set()
    for key in seen:
        parts = key.split(".")
        for i in range(len(parts), 0, -1):
            mod = sys.modules.get(".".join(parts[:i]))
            f = getattr(mod, "__file__", None)
            if f:
                rest = parts[i:]
                out.add((os.path.relpath(f, root), rest[0] if rest else "*"))
                break
    return out


def laundered_queries(dirty_pkg_files: list[str], candidates: list[str]) -> list[str]:
    """The mechanical exclude-list derivation (r12 ADVICE): which of
    ``candidates`` (fingerprint-drifted, not excluded) have a closure
    member whose source actually DIFFERS FROM HEAD in one of the dirty
    package files — i.e. whose drift is a behavior change a restamp
    would launder, as opposed to drift from the hashing-algorithm edit
    itself. Def-level precision: a dirty queries.py with one changed
    function only implicates queries whose closures reach that
    function (or the module-level code, if that changed)."""
    changed: dict[str, set[str] | None] = {
        p: _changed_top_defs(p) for p in dirty_pkg_files
    }

    def is_laundered(qname: str) -> bool:
        for rel, top in _query_closure_deps(qname):
            if rel not in changed:
                continue
            ch = changed[rel]
            if ch is None:
                return True  # whole file suspect
            if top == "*":
                if ch:
                    return True  # whole-module hash + any changed def
            elif top in ch:
                return True
        return False

    return [n for n in candidates if is_laundered(n)]


def restamp(exclude: list[str] | None = None, force: bool = False) -> None:
    """Recompute every EXISTING manifest entry under the current
    fingerprint ALGORITHM. Only valid when the working tree is
    behaviorally identical to the tree that earned those greens — i.e.
    immediately after a change to this module's hashing itself, in the
    same commit. Queries named in ``exclude`` (behaviorally changed in
    the same round) keep their stale entries, so the invariant test
    still forces them into the driver window.

    Mechanical guard (r12 ADVICE): a restamp with behavior changes
    sitting dirty in the package would silently launder them past the
    changed-queries-must-be-windowed invariant. So: refuse when any
    tracked file under the package other than this module is dirty —
    unless every query whose CURRENT fingerprint differs from its
    manifest entry is named in ``exclude`` (then the stale entries keep
    doing their job), or ``force=True``. Provenance (HEAD commit, dirty
    list, excludes) is recorded under ``__restamp__`` either way, so a
    bad restamp is at least auditable after the fact."""
    import json

    path = manifest_path()
    with open(path) as f:
        manifest = json.load(f)
    fps = all_fingerprints()
    skip = set(exclude or [])

    head, dirty = _git_state()
    pkg = "hadoop_gpu_spark/"
    me = f"{pkg}fingerprint.py"
    suspect = [p for p in dirty if p.startswith(pkg) and p != me]
    if suspect and not force:
        drifted_unexcluded = sorted(
            n for n in manifest
            if not n.startswith("__") and n not in skip
            and n in fps and manifest[n] != fps[n]
        )
        # Drift from the algorithm edit alone (this module is allowed
        # dirty) restamps fine; drift whose closure actually reaches a
        # def changed vs HEAD in another dirty package file would be
        # LAUNDERED — refuse unless excluded.
        bad = laundered_queries(suspect, drifted_unexcluded)
        if bad:
            raise RuntimeError(
                f"restamp refused: dirty package files {suspect} moved "
                f"fingerprints of non-excluded queries {bad} via defs "
                "changed since HEAD — commit the behavior change and "
                "re-window those queries, add them to exclude, or pass "
                "force=True (audited via __restamp__)"
            )

    n = 0
    for name in list(manifest):
        if name.startswith("__") or name in skip or name not in fps:
            continue
        manifest[name] = fps[name]
        n += 1
    manifest["__restamp__"] = {
        "commit": head,
        "dirty": dirty,
        "excluded": sorted(skip),
        "forced": bool(force and suspect),
    }
    with open(path, "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1)
        f.write("\n")
    print(f"manifest: {n} restamped, {len(skip)} excluded")


def ack_epoch() -> None:
    """Pin the current data epoch without touching query fingerprints — the
    explicit, committed acknowledgement after a data regeneration has been
    locally re-verified and the affected queries re-windowed."""
    import json

    path = manifest_path()
    with open(path) as f:
        manifest = json.load(f)
    manifest[DATA_EPOCH_KEY] = data_epoch()
    with open(path, "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1)
        f.write("\n")
    print(f"epoch pinned for {len(manifest[DATA_EPOCH_KEY])} tables")


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 2 and sys.argv[1] == "refresh":
        # validate BEFORE destructuring (r15 ADVICE: `refresh --force`
        # with no file raised a bare StopIteration from next())
        flags = [a for a in sys.argv[2:] if a.startswith("--")]
        files = [a for a in sys.argv[2:] if not a.startswith("--")]
        unknown = [
            a for a in flags
            if a != "--force" and not a.startswith("--exclude=")
        ]
        if len(files) != 1 or unknown:
            sys.exit(
                "usage: python -m hadoop_gpu_spark.fingerprint refresh "
                "<CORRECTNESS_rNN.json|LOCAL_SWEEP_rNN.json> [--force] "
                "[--exclude=q_a,q_b]"
            )
        excl: list[str] = []
        for a in flags:
            if a.startswith("--exclude="):
                excl += [n for n in a.split("=", 1)[1].split(",") if n]
        refresh(files[0], force="--force" in flags, exclude=excl)
    elif len(sys.argv) >= 2 and sys.argv[1] == "restamp":
        argv = [a for a in sys.argv[2:] if a != "--force"]
        restamp(
            argv[0].split(",") if argv else None,
            force="--force" in sys.argv[2:],
        )
    elif len(sys.argv) >= 2 and sys.argv[1] == "epoch":
        ack_epoch()
    elif len(sys.argv) >= 2 and sys.argv[1] == "dump":
        import json

        print(json.dumps(all_fingerprints(), indent=1))
    else:
        print(__doc__)
