"""Plan-shape assertions — the 100 TB survival checks (pushdown, pruning,
broadcast, no cartesians) for the headline queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_gpu_spark import plans
from hadoop_gpu_spark.queries import QUERIES
from hadoop_gpu_spark.tables import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 30).select("l_orderkey")
    pf = plans.pushed_filters(li)
    assert "l_quantity" in pf, pf


def test_column_pruning(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    cols = plans.read_schema_columns(li)
    assert set(cols) <= {"l_orderkey", "l_quantity"}, cols


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = QUERIES["q_join_star"](spark, sf_dir)
    assert plans.has_broadcast_join(df)


def test_no_accidental_cartesian_in_relational_queries(spark, sf_dir):
    # ANN/gram queries use an intentional broadcast NL join; relational ones
    # must not.
    for name in ["q01_pricing_summary", "q_join_star", "q_join_override",
                 "q_join_semi", "q_join_anti", "q_events_hourly"]:
        assert not plans.has_cartesian(QUERIES[name](spark, sf_dir)), name


def test_q1_plans_hash_aggregate(spark, sf_dir):
    # partial/final HashAggregate = the reference's combiner pattern, free.
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    assert "HashAggregate" in plans.formatted_plan(df)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    # CompositeInputFormat parity: co-bucketed tables join with no Exchange
    # on either side (zero-shuffle map-side merge join).
    from hadoop_gpu_spark import sources
    from hadoop_gpu_spark.tables import load_table

    # managed tables land in ./spark-warehouse (gitignored)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    sources.write_bucketed_table(
        orders.withColumnRenamed("o_custkey", "k"), "orders_bkt", ["k"], 4, ["k"]
    )
    sources.write_bucketed_table(
        customer.withColumnRenamed("c_custkey", "k"), "customer_bkt", ["k"], 4, ["k"]
    )
    a = spark.table("orders_bkt")
    b = spark.table("customer_bkt")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "k")
        plan = plans.formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    # MultipleOutputFormat write + partition-pruned read: the scan lists
    # only the selected lang partition (PartitionFilters in the plan).
    from hadoop_gpu_spark import sources
    from hadoop_gpu_spark.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    path = str(tmp_path / "docs_by_lang")
    sources.write_partitioned(docs, path, ["lang"])
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = plans.formatted_plan(back)
    assert "PartitionFilters" in plan and "lang" in plan
    n_en = docs.filter(F.col("lang") == "en").count()
    assert back.count() == n_en


def test_q06_filters_pushed_to_scan(spark, sf_dir):
    # Q6 is the canonical pushdown query: every predicate must reach the
    # parquet scan as PushedFilters.
    df = QUERIES["q06_forecast_revenue"](spark, sf_dir)
    pf = plans.pushed_filters(df)
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in pf, f"{col} not pushed: {pf}"


def test_grep_ranked_plans_take_ordered_no_window(spark, sf_dir):
    # r14 restructure pin (r13 VERDICT's one perf-weak mark): the top-20
    # rank must come from TakeOrderedAndProject (per-partition heaps) —
    # never from a global WindowExec over the vocabulary-sized
    # (Heaps-law, corpus-unbounded) distinct-match counts frame.
    plan = plans.formatted_plan(QUERIES["q_grep_ranked"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_dedup_pipeline_never_shuffles_text(spark, sf_dir):
    # The ARCHITECTURE.md claim, pinned: in every dedup gate the document
    # text is consumed at the scan (hashing/shingling) and only ids,
    # hashes, and band keys cross an Exchange. A regression that shuffles
    # `text` would silently 100x the shuffle volume at corpus scale.
    for name in [
        "q_near_dedup_survivors",
        "q_dedup_minhash_pairs",
        "q_dedup_simhash_pairs",
        "q_dedup_exact",
        "q_dedup_fingerprint",
        "q_boilerplate_ratio",
        "q_contamination",
        "q_winnow_fingerprint",
        "q_pretrain_pipeline",
    ]:
        cols = plans.shuffled_columns(QUERIES[name](spark, sf_dir))
        assert "text" not in cols, f"{name} shuffles text: {sorted(cols)}"


def test_tfidf_single_tokenize_pass_no_vocab_broadcast(spark, sf_dir):
    # r08 contract (VERDICT r07 #3): document frequency is a window over
    # the tf frame already in flight — ONE tokenize pass in the plan (one
    # documents scan node), NO join at all (the old broadcast of the
    # vocabulary-sized dfreq frame replanned the whole tokenize subtree
    # AND would exceed the 8 GB broadcast cap at open-vocab scale), no
    # scalar crossJoin branch, and text never enters an exchange.
    import re

    df = QUERIES["q_tfidf_topterms"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    scan_ids = set(re.findall(r"^\s*\((\d+)\) Scan parquet", plan, re.M))
    assert len(scan_ids) == 1, f"expected ONE documents scan, got {sorted(scan_ids)}"
    assert "Join" not in plan, "tfidf should derive df via window, not a join"
    assert not plans.has_cartesian(df)
    assert "text" not in plans.shuffled_columns(df)


def test_unigram_logprob_join_unhinted_and_never_shuffles_text(spark, sf_dir):
    # r08 contract (VERDICT r07 #4): the toks⋈freq join carries NO
    # explicit broadcast hint (the vocab side is corpus-cardinality — a
    # forced broadcast would die on the 8 GB cap at open-vocab scale;
    # the hint audit in test_plan_invariants pins the class). At suite
    # scale the planner still chooses a broadcast join from size stats —
    # assert that so a surprise shuffle-regression at small scale stays
    # visible — and the document text never enters an exchange.
    df = QUERIES["q_unigram_logprob"](spark, sf_dir)
    assert plans.has_broadcast_join(df)
    assert "text" not in plans.shuffled_columns(df)


def test_driver_window_invariants():
    # The driver correctness-checks the first 50 registered queries; the
    # rotation policy requires (a) exactly 50 window slots, (b) every
    # bench HEADLINE query inside the window (a benched time without a
    # same-round correctness row is not a result), (c) oracles for every
    # registered query.
    from bench import HEADLINE
    from hadoop_gpu_spark.queries import ORACLES, QUERIES, _DRIVER_WINDOW

    assert len(_DRIVER_WINDOW) == 50
    window = list(QUERIES)[:50]
    assert window == _DRIVER_WINDOW
    # r14 policy change (r13 VERDICT #1): HEADLINE queries are no longer
    # auto-windowed every round — they rotate on the standard 4-round
    # freshness cadence, and test_changed_queries_are_windowed already
    # forces any changed member back in the same round. HEADLINE must
    # still be registered queries (benched ≠ unproven):
    missing = [q for q in HEADLINE if q not in QUERIES]
    assert not missing, f"HEADLINE not registered: {missing}"
    assert set(ORACLES) == set(QUERIES)


def test_changed_queries_are_windowed():
    # Mechanized rotation-policy category (b): a query whose implementation
    # changed since its last driver-green row — detected by comparing its
    # source-closure fingerprint against the checked-in last-green manifest
    # — MUST be inside the driver window, or its new behavior never touches
    # the hard signal (this exact failure happened in round 2: the
    # band_hashes rewrite left q_dedup_minhash_pairs / q_dedup_ngram_jaccard
    # outside the window with stale green rows). New queries (absent from
    # the manifest) must be windowed for the same reason. Refresh the
    # manifest after each round's CORRECTNESS lands:
    #   python -m hadoop_gpu_spark.fingerprint refresh CORRECTNESS_rNN.json
    import json

    from hadoop_gpu_spark.fingerprint import all_fingerprints, manifest_path
    from hadoop_gpu_spark.queries import QUERIES, _DRIVER_WINDOW

    from hadoop_gpu_spark.fingerprint import epoch_changed_queries

    with open(manifest_path()) as f:
        manifest = json.load(f)
    fps = all_fingerprints()
    # Data-epoch guard (round-3 incident class): a testdata regeneration
    # invalidates greens with zero code-fingerprint signal, so queries
    # touching a drifted table count as changed too.
    epoch_changed = set(epoch_changed_queries(manifest))
    offenders = [
        n for n in QUERIES
        if (manifest.get(n) != fps[n] or n in epoch_changed)
        and n not in _DRIVER_WINDOW
    ]
    assert not offenders, (
        f"queries changed since last driver-green but outside _DRIVER_WINDOW: "
        f"{offenders} — add them to the window (hadoop_gpu_spark/queries.py) "
        f"or, if they are in the latest CORRECTNESS file, refresh the manifest; "
        f"if the cause is a test-data regeneration (epoch-changed: "
        f"{sorted(epoch_changed)[:8]}…), re-verify locally, re-window, then "
        f"`python -m hadoop_gpu_spark.fingerprint epoch`"
    )


def test_sweep_pins_are_one_round_bridges():
    # r14 ADVICE: a sweep-sourced manifest refresh (__refresh__ pins)
    # must not become STANDING evidence that keeps a changed query out
    # of the driver window indefinitely — in r14 five HEADLINE queries
    # drifted (shared-utility memoization) and were re-pinned from the
    # sf0.01 sweep, so their benched times rested on local evidence
    # only. Rule: a sweep pin stamped in round R must sit in
    # _DRIVER_WINDOW for round R+1 (converting to a driver row, which
    # clears the record). If a bulk utility drift ever exceeds the
    # window's spare slots, stagger: refresh only the subset you can
    # window that round (refresh() accepts any filtered results file)
    # and leave the rest's pins stale — the changed-queries invariant
    # then forces them into the following window.
    import json
    import pathlib
    import re

    from hadoop_gpu_spark.fingerprint import REFRESH_KEY, manifest_path
    from hadoop_gpu_spark.queries import _DRIVER_WINDOW

    with open(manifest_path()) as f:
        manifest = json.load(f)
    root = pathlib.Path(__file__).parent.parent
    rounds = [
        int(re.search(r"r(\d+)", f.name).group(1))
        for f in root.glob("CORRECTNESS_r*.json")
    ]
    upcoming = max(rounds) + 1 if rounds else 0
    stale_bridges = sorted(
        n for n, rec in manifest.get(REFRESH_KEY, {}).items()
        if (rec.get("round") or 0) < upcoming and n not in _DRIVER_WINDOW
    )
    assert not stale_bridges, (
        f"sweep-pinned queries whose one-round bridge expires with round "
        f"{upcoming} are outside _DRIVER_WINDOW: {stale_bridges} — rotate "
        "them in so the driver converts the sweep pin to a driver row"
    )


def test_stale_evidence_is_windowed():
    # r14 mechanization of the 4-round freshness policy (it lived only in
    # comments through r13, and the r13 VERDICT's registration-logjam
    # finding was exactly a failure of hand-run window math): with the
    # upcoming round N = latest CORRECTNESS file + 1, every registered
    # query whose latest driver-green row is older than N-3 — or that has
    # never earned one — must sit inside _DRIVER_WINDOW.
    import json
    import pathlib
    import re

    from hadoop_gpu_spark.queries import QUERIES, _DRIVER_WINDOW

    root = pathlib.Path(__file__).parent.parent
    latest: dict[str, int] = {}
    rounds = []
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        rno = int(re.search(r"r(\d+)", f.name).group(1))
        rounds.append(rno)
        for n, row in json.loads(f.read_text()).items():
            if (
                not row.get("err")
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
            ):
                latest[n] = max(latest.get(n, 0), rno)
    assert rounds, "no CORRECTNESS files — nothing to check"
    upcoming = max(rounds) + 1
    stale = [
        n for n in QUERIES
        if latest.get(n, -1) < upcoming - 3 and n not in _DRIVER_WINDOW
    ]
    assert not stale, (
        f"stale-evidence queries outside the driver window (latest green "
        f"older than round {upcoming - 3}, upcoming round {upcoming}): "
        f"{[(n, latest.get(n)) for n in stale]} — rotate them in"
    )


def test_data_epoch_guard_detects_drift():
    # The guard that the round-3 incident (events TIMESTAMP(NANOS) →
    # timestamp[us] regeneration) would have tripped: perturb the pinned
    # epoch hash for one table and every query touching it must report
    # as changed.
    import json

    from hadoop_gpu_spark.fingerprint import (
        DATA_EPOCH_KEY,
        data_epoch,
        epoch_changed_queries,
        manifest_path,
        query_tables,
    )

    with open(manifest_path()) as f:
        manifest = json.load(f)
    # the checked-in manifest must pin the current on-disk epoch
    assert manifest.get(DATA_EPOCH_KEY) == data_epoch(), (
        "test data changed since the manifest pinned it — re-verify affected "
        "queries, re-window them, then `python -m hadoop_gpu_spark.fingerprint epoch`"
    )
    # synthetic drift: events regenerated
    fake = dict(manifest)
    fake[DATA_EPOCH_KEY] = dict(fake[DATA_EPOCH_KEY], events="0" * 16)
    changed = set(epoch_changed_queries(fake))
    assert "q_events_hourly" in changed and "q_sessionization" in changed
    assert "q01_pricing_summary" not in changed  # lineitem-only query untouched
    # a table DELETED from disk must flag too (pinned-only entries drift)
    fake2 = dict(manifest)
    fake2[DATA_EPOCH_KEY] = dict(fake2[DATA_EPOCH_KEY], ghost_table="f" * 16)
    assert epoch_changed_queries(fake2) is not None  # no crash on unknown table
    # static table tracer sanity
    assert "events" in query_tables("q_events_hourly")
    assert "lineitem" in query_tables("q01_pricing_summary")


def test_lsh_ann_corpus_vectors_never_shuffle(spark, sf_dir):
    # The q_ann_lsh scale claim, pinned: corpus embeddings (__cv) are
    # consumed at the scan side of the broadcast join — only the tiny
    # query set and scored candidate rows cross an Exchange.
    cols = plans.shuffled_columns(QUERIES["q_ann_lsh"](spark, sf_dir))
    assert "__cv" not in cols, sorted(cols)
    assert plans.has_broadcast_join(QUERIES["q_ann_lsh"](spark, sf_dir))


def test_lsh_bucketed_corpus_probe_prunes_partitions(spark, sf_dir, tmp_path):
    # The "written bucketed by signature, probe = partition pruning" story
    # from lsh_bucket_topk's docstring, demonstrated: write the corpus
    # partitioned by sig, read back filtered to one query's sig, and the
    # scan must list only that partition (PartitionFilters present).
    from pyspark.sql import functions as F

    from hadoop_gpu_spark.similarity.ann import lsh_signature, lsh_signs
    from hadoop_gpu_spark.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    signs = lsh_signs(5, emb.select(F.size("embedding")).first()[0])
    with_sig = emb.withColumn("sig", lsh_signature("embedding", signs))
    path = str(tmp_path / "corpus_by_sig")
    with_sig.write.partitionBy("sig").parquet(path)

    probe_sig = with_sig.filter(F.col("vec_id") == 0).select("sig").first()[0]
    probe = spark.read.parquet(path).filter(F.col("sig") == probe_sig)
    plan = plans.formatted_plan(probe)
    assert "PartitionFilters" in plan and "sig" in plan
    bucket_n = probe.count()
    assert 0 < bucket_n < emb.count()


def test_fingerprints_independent_of_import_order():
    # The r04 flake: a query's closure silently grew when an unrelated
    # test imported a lazily-loaded submodule (multimodal.png), flipping
    # its fingerprint mid-suite. _collect must import submodules itself so
    # the closure — and thus the manifest check — is deterministic.
    from hadoop_gpu_spark.fingerprint import _collect, query_fingerprint

    seen: dict[str, str] = {}
    _collect(QUERIES["q_multimodal_decode"], seen)
    assert any(k.startswith("hadoop_gpu_spark.multimodal.png") for k in seen), (
        "lazy submodule multimodal.png missing from closure — fingerprints "
        "would depend on process import order"
    )
    fp1 = query_fingerprint("q_multimodal_decode")
    import hadoop_gpu_spark.multimodal.png  # noqa: F401

    assert query_fingerprint("q_multimodal_decode") == fp1


def test_fingerprint_module_attr_is_function_precise():
    # r10 precision fix: a `join_ops.broadcast_join(...)` call site hashes
    # exactly the referenced function (transitively), NOT the whole joins
    # module — before this, a one-function edit (the asof_join struct-fill
    # fix) flipped 8 queries, 5 of them join_ops users whose closures never
    # reach asof_join, overflowing the driver window's spare slots with
    # provably-unchanged queries.
    from hadoop_gpu_spark.fingerprint import _collect

    seen: dict[str, str] = {}
    _collect(QUERIES["q_join_broadcast"], seen)
    assert "hadoop_gpu_spark.operators.joins.broadcast_join" in seen
    assert "hadoop_gpu_spark.operators.joins" not in seen, (
        "whole joins module hashed for a single-function reference — the "
        "module-coupling the r10 precision fix removed"
    )
    assert not any(".asof_join" in k for k in seen), seen.keys()


def _refs_module_constant():
    # fixture for the constant-fallback test below — a module-level
    # constant reference has no function source to hash
    from hadoop_gpu_spark import fingerprint as fp_mod

    return fp_mod.DATA_EPOCH_KEY


def test_fingerprint_module_constant_falls_back_to_module_hash():
    # The precision fix must stay CONSERVATIVE for `mod.CONSTANT`: there is
    # no function source to hash, so the whole module is hashed — a
    # constant edit still flips every consumer's fingerprint.
    from hadoop_gpu_spark.fingerprint import _collect

    seen: dict[str, str] = {}
    _collect(_refs_module_constant, seen)
    assert "hadoop_gpu_spark.fingerprint" in seen, (
        "module-level constant reference escaped the fingerprint closure"
    )


def test_fingerprint_sees_bare_name_constants(monkeypatch):
    # r12 fix (r11 VERDICT #4 / ADVICE r11): a constant consumed by BARE
    # name inside a traced function (tokenize's TOKEN_SPLIT_RE default,
    # bm25_topk's _DL_RE) resolved to a plain value and fell through both
    # _collect branches — editing it changed behavior without flipping
    # any consumer fingerprint. The closure now hashes a stable repr of
    # the value, so the edit flips every consumer.
    from hadoop_gpu_spark import fingerprint as fp
    from hadoop_gpu_spark.operators import fields

    seen: dict[str, str] = {}
    fp._collect(QUERIES["q_wordcount"], seen)
    key = "hadoop_gpu_spark.operators.fields.$TOKEN_SPLIT_RE"
    assert key in seen and seen[key] == repr(fields.TOKEN_SPLIT_RE), sorted(
        k for k in seen if "$" in k
    )

    fp1 = fp.query_fingerprint("q_wordcount")
    monkeypatch.setattr(fields, "TOKEN_SPLIT_RE", r"[,;]+")
    assert fp.query_fingerprint("q_wordcount") != fp1, (
        "bare-name constant edit did not flip the consumer fingerprint"
    )

    # Scope guards: the hashing is limited to ALL_CAPS conventional
    # constants (mutable lowercase module state like tables._schema_cache
    # would make fingerprints depend on which tables the process already
    # loaded) and excludes the registration registries (hashing ORACLES
    # would couple every query's fingerprint to every OTHER query's
    # oracle — registering one new gate flipped all 128 when this
    # landed unscoped).
    assert not any("_schema_cache" in k for k in seen), sorted(
        k for k in seen if "$" in k
    )
    assert not any(k.endswith(".$ORACLES") or k.endswith(".$QUERIES") for k in seen)


def test_fingerprint_ignores_mutable_cache_constants():
    # r12 follow-up falsifier: bloom._BC_CACHE is an ALL_CAPS name but
    # MUTABLE broadcast-handle state. Hashing it made the fingerprint a
    # function of process history — empty at import it hashed as "{}",
    # populated it fell out of _stable_repr — so running any bloom test
    # before test_changed_queries_are_windowed flipped
    # q_bloom_decontaminate vs the manifest (observed full-suite-order
    # failure). Empty mutable containers are now skipped; the
    # fingerprint must be identical before and after cache warm-up.
    from hadoop_gpu_spark import fingerprint as fp
    from hadoop_gpu_spark.operators import bloom

    fp0 = fp.query_fingerprint("q_bloom_decontaminate")
    key = ("test-app", "test-key")
    bloom._BC_CACHE[key] = object()  # unstable repr, like a Broadcast
    try:
        assert fp.query_fingerprint("q_bloom_decontaminate") == fp0, (
            "cache warm-up changed a query fingerprint"
        )
    finally:
        bloom._BC_CACHE.pop(key, None)

    seen: dict[str, str] = {}
    fp._collect(QUERIES["q_bloom_decontaminate"], seen)
    assert not any(k.endswith("$_BC_CACHE") for k in seen), sorted(
        k for k in seen if "$" in k
    )


def test_stable_repr_rejects_unstable_and_orders_sets():
    # The constant-hash must never inject process-flaky material: default
    # object reprs carry id(); set iteration order varies by hash seed.
    from hadoop_gpu_spark.fingerprint import _stable_repr

    assert _stable_repr({"a": [1, 2.5, ("x", None)]}) == "{'a': [1, 2.5, ('x', None)]}"
    assert _stable_repr({3, 1, 2}) == "set{1, 2, 3}"
    assert _stable_repr(object()) is None
    assert _stable_repr([1, object()]) is None
    lst: list = [1]
    lst.append(lst)  # self-referencing constant must terminate
    assert _stable_repr(lst) is None
    # dicts order by key repr like sets (r13): a dict constant built in
    # process-dependent insertion order (comprehension over a set under
    # hash randomization) must not make fingerprints process-flaky
    assert _stable_repr({"b": 1, "a": 2}) == _stable_repr({"a": 2, "b": 1})
    assert _stable_repr({"b": 1, "a": 2}) == "{'a': 2, 'b': 1}"


def test_changed_top_defs_is_def_precise():
    # The restamp laundering guard's git-diff primitive: only defs whose
    # source (incl. decorators) differs from HEAD are named; module-level
    # drift outside defs degrades to whole-file (None).
    from hadoop_gpu_spark.fingerprint import _changed_top_defs, _git_state

    _, dirty = _git_state()
    clean = "hadoop_gpu_spark/utils.py"
    if clean not in dirty:
        # a committed file with no working-tree changes: no changed defs
        assert _changed_top_defs(clean) == set()
    # an untracked/nonexistent path degrades to whole-file suspicion
    assert _changed_top_defs("hadoop_gpu_spark/__no_such_file__.py") is None


def test_restamp_guard_mechanically_derives_laundered_set():
    # laundered_queries maps dirty-file def changes onto query closures:
    # a candidate is flagged iff its closure reaches a changed def. With
    # an empty dirty list, nothing can be laundered.
    from hadoop_gpu_spark.fingerprint import laundered_queries
    from hadoop_gpu_spark.queries import QUERIES

    some = list(QUERIES)[:5]
    assert laundered_queries([], some) == []


def test_driver_refresh_refuses_to_move_pins(tmp_path, monkeypatch):
    # The r14 ADVICE laundering hole: replaying a driver CORRECTNESS
    # file after in-round edits would stamp the CURRENT tree's
    # fingerprint as driver-proven. refresh() must refuse to MOVE an
    # existing pin from a driver-sourced file unless forced — and a
    # forced move must leave a driver_forced audit record.
    import json

    from hadoop_gpu_spark import fingerprint as fp

    manifest = tmp_path / "m.json"
    manifest.write_text(json.dumps({"q_x": "old-fp", "q_y": "same-fp"}))
    corr = tmp_path / "CORRECTNESS_r99.json"
    corr.write_text(json.dumps({
        "q_x": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True},
        "q_y": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True},
    }))
    monkeypatch.setattr(fp, "manifest_path", lambda: str(manifest))
    monkeypatch.setattr(fp, "all_fingerprints", lambda: {"q_x": "new-fp", "q_y": "same-fp"})
    monkeypatch.setattr(fp, "data_epoch", lambda *a, **k: {})

    with pytest.raises(RuntimeError, match="q_x"):
        fp.refresh(str(corr))
    # refusal left the manifest untouched
    assert json.loads(manifest.read_text())["q_x"] == "old-fp"

    fp.refresh(str(corr), force=True)
    m = json.loads(manifest.read_text())
    assert m["q_x"] == "new-fp"
    assert m[fp.REFRESH_KEY]["q_x"]["driver_forced"] is True
    # r15 ADVICE: driver files carry no "round" key — the provenance
    # round derives from the CORRECTNESS_rNN filename, never None
    assert m[fp.REFRESH_KEY]["q_x"]["round"] == 99
    assert "q_y" not in m[fp.REFRESH_KEY]  # unmoved pin: clean driver pin


def test_driver_refresh_exclude_does_not_waive_other_movers(tmp_path, monkeypatch):
    # Excluding one moved query must not silence the guard for OTHER
    # non-excluded movers — exclusion is per-query, not a bypass.
    import json

    from hadoop_gpu_spark import fingerprint as fp

    manifest = tmp_path / "m.json"
    manifest.write_text(json.dumps({"q_x": "old-fp", "q_y": "old-fp-y"}))
    corr = tmp_path / "CORRECTNESS_r99.json"
    corr.write_text(json.dumps({
        "q_x": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True},
        "q_y": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True},
    }))
    monkeypatch.setattr(fp, "manifest_path", lambda: str(manifest))
    monkeypatch.setattr(fp, "all_fingerprints", lambda: {"q_x": "new-fp", "q_y": "new-fp-y"})
    monkeypatch.setattr(fp, "data_epoch", lambda *a, **k: {})

    with pytest.raises(RuntimeError, match="q_y"):
        fp.refresh(str(corr), exclude=["q_x"])
    assert json.loads(manifest.read_text())["q_y"] == "old-fp-y"


def test_driver_refresh_excluded_move_does_not_refuse(tmp_path, monkeypatch):
    # The sanctioned alternative to force (r16): exclude the moved
    # queries — their pins stay stale (so the changed-queries invariant
    # keeps them window-forced) while everyone else's refresh lands.
    import json

    from hadoop_gpu_spark import fingerprint as fp

    manifest = tmp_path / "m.json"
    manifest.write_text(json.dumps({"q_x": "old-fp", "q_y": "same-fp"}))
    corr = tmp_path / "CORRECTNESS_r99.json"
    corr.write_text(json.dumps({
        "q_x": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True},
        "q_y": {"err": None, "rows_match": True, "schema_match": True, "hash_match": True},
    }))
    monkeypatch.setattr(fp, "manifest_path", lambda: str(manifest))
    monkeypatch.setattr(fp, "all_fingerprints", lambda: {"q_x": "new-fp", "q_y": "same-fp"})
    monkeypatch.setattr(fp, "data_epoch", lambda *a, **k: {})

    fp.refresh(str(corr), exclude=["q_x"])  # the only mover is excluded
    m = json.loads(manifest.read_text())
    assert m["q_x"] == "old-fp"  # stale → stays window-forced
    assert m["q_y"] == "same-fp"
    assert fp.REFRESH_KEY not in m  # no sweep/forced records created


def test_ensure_min_partitions_sees_through_fake_splits(spark, tmp_path):
    # A parquet file with ONE row group reports maxPartitionBytes-many
    # byte-range splits, but every row lands in the single split covering
    # the group's offset — partition COUNT is fake parallelism and the
    # old count-only check skipped the repartition, serializing every
    # downstream Arrow kernel (r13 sf10 soak: minhash/simhash/winnow ran
    # ~60x instead of ~10x at 10x data). The helper must count the
    # actual splittable units (row groups) and repartition.
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_gpu_spark.utils import ensure_min_partitions

    rng = np.random.default_rng(7)
    # incompressible hex so the on-disk size exceeds one 8 MB split
    data = rng.integers(0, 256, size=(12000, 1024), dtype=np.uint8)
    texts = [bytes(r).hex() for r in data]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    p = str(tmp_path / "onegroup.parquet")
    pq.write_table(t, p, row_group_size=len(texts))
    assert pq.ParquetFile(p).metadata.num_row_groups == 1

    df = spark.read.parquet(p)
    # precondition: the scan must REPORT >= 2 splits or we'd exercise
    # the plain count branch instead of the row-group-aware one
    assert df.rdd.getNumPartitions() >= 2

    fixed = ensure_min_partitions(df, target=2)
    nonempty = fixed.groupBy(F.spark_partition_id()).count().count()
    assert nonempty >= 2


def test_strip_file_scheme():
    from hadoop_gpu_spark.utils import _strip_file_scheme

    assert _strip_file_scheme("file:///a/b.parquet") == "/a/b.parquet"
    assert _strip_file_scheme("file:/a/b.parquet") == "/a/b.parquet"
    assert _strip_file_scheme("file://host/a/b.parquet") == "/a/b.parquet"
    assert _strip_file_scheme("/a/b.parquet") == "/a/b.parquet"
    assert _strip_file_scheme("s3://bkt/a.parquet") == "s3://bkt/a.parquet"


def test_pipe_pipeline_has_no_rdd_boundary(spark, sf_dir):
    # The Streaming line-protocol legs (pipe_map/pipe_reduce) must stay
    # inside ONE DataFrame plan. The old rdd.pipe form compiled to a
    # `Scan ExistingRDD` leaf, which sat outside Catalyst/AQE: a composed
    # pipeline re-executed the upstream map leg once per downstream plan
    # compile. mapInPandas keeps the exchange a plan node over the
    # parquet scan instead of a plan-opaque RDD leaf.
    from hadoop_gpu_spark.queries import QUERIES

    composed = QUERIES["q_pipe_lang_counts"](spark, sf_dir)
    plan = composed._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan, plan
    assert "MapInPandas" in plan, plan

    # the full map -> shuffle -> reduce composition too
    from hadoop_gpu_spark.operators.pipes import pipe_map, pipe_reduce

    docs = load_table(spark, "documents", sf_dir).select(
        F.col("lang").alias("k"), F.lit("1").alias("v")
    )
    two_leg = pipe_reduce(pipe_map(docs, "cat"), "cat", num_partitions=4)
    plan2 = two_leg._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan2, plan2


def test_persist_always_paired_with_cleanup():
    # The r03 leak pattern, banned mechanically: any module that calls
    # .persist( must also call .unpersist( (try/finally scoped), and
    # gate-query code (queries.py) may not call .persist or
    # .localCheckpoint DIRECTLY at all — an intermediate that must
    # outlive its function uses utils.eager_persist (recomputable
    # lineage + the release_persisted_frames() teardown path; the
    # earlier eager-localCheckpoint idiom was retired in r08 because
    # checkpoint blocks are non-replicated and lineage-free — one lost
    # executor at cluster scale kills the returned plan). Iterative
    # operators OUTSIDE queries.py (pq_train's Lloyd loop, connected
    # components) keep localCheckpoint deliberately: there lineage
    # truncation is the point and the blocks are released in-call.
    import ast
    import pathlib

    def calls(src, name):
        return sum(
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == name
            for node in ast.walk(ast.parse(src))
        )

    pkg = pathlib.Path(__file__).resolve().parent.parent / "hadoop_gpu_spark"
    for py in sorted(pkg.rglob("*.py")):
        src = py.read_text()
        n_persist = calls(src, "persist")
        n_unpersist = calls(src, "unpersist")
        if py.name == "queries.py":
            assert n_persist == 0, f"{py.name}: bare .persist() in gate-query code"
            assert calls(src, "localCheckpoint") == 0, (
                f"{py.name}: direct .localCheckpoint() in gate-query code — "
                "use utils.eager_persist (recomputable lineage) instead"
            )
        elif n_persist:
            assert n_unpersist > 0, f"{py.name}: .persist() without .unpersist()"


def test_eager_persist_materializes_and_releases(spark):
    # The dual-branch-recompute cure (utils.eager_persist) end-to-end:
    # the frame is cached with recomputable lineage at construction,
    # both consumer branches plan InMemoryTableScans over ONE
    # InMemoryRelation, and release_persisted_frames() (bench/sweep
    # teardown) returns the storage — the executable form of the
    # lifetime contract (VERDICT r07 #7 / r07 ADVICE medium).
    from pyspark.sql import functions as F

    from hadoop_gpu_spark import plans, utils

    base = spark.range(1000).select((F.col("id") % 13).alias("k"))
    agg = utils.eager_persist(base.groupBy("k").agg(F.count("*").alias("n")))
    assert agg.storageLevel.useMemory and agg.storageLevel.useDisk
    # scalar branch + main branch — the q11/q15/q20/q22 shape
    mx = agg.agg(F.max("n").alias("mx"))
    both = agg.crossJoin(F.broadcast(mx)).filter(F.col("n") == F.col("mx"))
    plan = plans.formatted_plan(both)
    assert "InMemoryTableScan" in plan
    # lineage stays recomputable: the cached relation's child plan (the
    # recompute path) is still present under the relation node
    assert "InMemoryRelation" in plan
    assert utils.release_persisted_frames() >= 1
    assert not agg.storageLevel.useMemory and not agg.storageLevel.useDisk
    assert utils._PERSISTED == []


def test_docstring_test_references_exist():
    # Doc-to-test integrity (VERDICT r05 #3: functions/pii.py cited a
    # test file that did not exist — doc drift in a module whose safety
    # argument was "banned by that test"). Every `tests/<name>.py` path
    # and every `tests/<name>.py::<test_name>` reference mentioned
    # anywhere in package sources must point at a real file (and, for ::
    # references, a test that actually exists in it).
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    pkg = root / "hadoop_gpu_spark"
    pat = re.compile(r"tests/([A-Za-z0-9_]+\.py)(?:::([A-Za-z0-9_]+))?")
    missing = []
    for py in sorted(pkg.rglob("*.py")):
        for m in pat.finditer(py.read_text()):
            path = root / "tests" / m.group(1)
            if not path.exists():
                missing.append(f"{py.relative_to(root)}: {m.group(0)} (no such file)")
            elif m.group(2) and m.group(2) not in path.read_text():
                missing.append(f"{py.relative_to(root)}: {m.group(0)} (no such test)")
    assert not missing, "\n".join(missing)


def test_hierarchical_prefix_sum_matches_reference(spark):
    # The shared two-level cumsum (q_sequence_pack offsets,
    # q_total_order_sort rank bases): exclusive prefix sums in bucket
    # order, both directions, across superbucket boundaries (width 4 on
    # 11 buckets forces several), with gaps in the bucket ids.
    from hadoop_gpu_spark.utils import hierarchical_prefix_sum

    rows = [(b, (b * 7) % 5 + 1) for b in [0, 1, 2, 5, 6, 7, 9, 12, 13, 17, 20]]
    sizes = spark.createDataFrame(rows, "b long, n long")

    for descending in (False, True):
        got = {
            r["b"]: r["__base"]
            for r in hierarchical_prefix_sum(
                sizes, "b", "n", superbucket_width=4, descending=descending
            ).collect()
        }
        order = sorted(dict(rows), reverse=descending)
        acc, want = 0, {}
        for b in order:
            want[b] = acc
            acc += dict(rows)[b]
        assert got == want, (descending, got, want)
