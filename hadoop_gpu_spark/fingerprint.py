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
last earned a driver-green CORRECTNESS row. The invariant test fails if
any query's current fingerprint differs from (or is absent from) the
manifest while the query sits outside ``_DRIVER_WINDOW`` — i.e. a change
the driver would never re-check. After a round's CORRECTNESS_rNN.json
lands, refresh the manifest for the greened queries with::

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
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            attr_chains.append((node.value.id, node.attr))
        elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(_PKG):
            try:
                mod = importlib.import_module(node.module)
            except ImportError:
                continue
            for alias in node.names:
                local_imports[alias.asname or alias.name] = getattr(mod, alias.name, None)
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
            if sub is not None and _in_pkg(sub) and (callable(sub) or isinstance(sub, types.ModuleType)):
                _collect(sub, seen)
    for name in names:
        tgt = resolve(name)
        if tgt is None or not _in_pkg(tgt):
            continue
        if callable(tgt) or isinstance(tgt, types.ModuleType):
            _collect(tgt, seen)


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


def refresh(correctness_json: str) -> None:
    """Update the manifest for every query the given CORRECTNESS file
    shows green (rows+schema+hash, or rows-only with no err)."""
    import json

    with open(correctness_json) as f:
        rows = json.load(f)
    green = {
        n for n, r in rows.items()
        if not r.get("err") and r.get("rows_match") and r.get("schema_match", True)
        and r.get("hash_match", True)
    }
    path = manifest_path()
    try:
        with open(path) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        manifest = {}
    fps = all_fingerprints()
    for n in green:
        if n in fps:
            manifest[n] = fps[n]
    # drop retired queries
    manifest = {n: v for n, v in manifest.items() if n in fps}
    with open(path, "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1)
        f.write("\n")
    print(f"manifest: {len(green & set(fps))} refreshed, {len(manifest)} total")


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "refresh":
        refresh(sys.argv[2])
    elif len(sys.argv) >= 2 and sys.argv[1] == "dump":
        import json

        print(json.dumps(all_fingerprints(), indent=1))
    else:
        print(__doc__)
