"""r11 candidate gates, oracle-pinned while STAGED (built r09; the r10
window is exactly full — 26 r06-latest + 21 HEADLINE + q_stream_quantiles
+ the asof struct-fix pair — so these register r11 beside the 24-query
r07-latest rotation). Same staging pattern as funnel/pq_train and the
r09 trio: the driver-identical oracle comparison runs here every
session, so registration is a one-line @query move with the evidence
already standing.

Covers: BM25 ranked retrieval (operators/retrieval.py) and
SemDeDup-style semantic dedup (dedup/semantic.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle import compare_frames, duckdb_con

R11_CANDIDATES = ["q_bm25_topk", "q_semantic_dedup"]


@pytest.mark.parametrize("name", R11_CANDIDATES)
def test_r11_candidate_gate_oracle(spark, sf_dir, name):
    from hadoop_gpu_spark import queries as q

    fn = getattr(q, name)
    oracle = getattr(q, f"Q_{name[2:].upper()}_ORACLE")
    got = fn(spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    want = con.sql(oracle).df()
    con.close()
    errs = compare_frames(got, want)
    assert not errs, f"{name}: " + "; ".join(errs[:3])
    assert len(got) > 0, f"{name}: empty gate proves nothing"


def test_r11_candidate_oracles_emit_driver_safe_types(sf_dir):
    from hadoop_gpu_spark import queries as q

    con = duckdb_con(sf_dir)
    offenders = []
    for name in R11_CANDIDATES:
        rel = con.sql(getattr(q, f"Q_{name[2:].upper()}_ORACLE"))
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            if typ in ("HUGEINT", "UHUGEINT", "UBIGINT"):
                offenders.append(f"{name}.{col}: {typ}")
    con.close()
    assert not offenders, offenders


# ---------------------------------------------------------------------------
# BM25 (operators/retrieval.py)
# ---------------------------------------------------------------------------
def test_bm25_rare_term_outranks_common_mass(spark, sf_dir):
    # The idf property itself: a doc containing the rare 'dup' marker
    # must outrank docs matching only the common co-term — on the
    # synthetic corpus 'dup' appears in a handful of docs while
    # 'customer' appears in nearly all, so if rank-1 for the
    # ("dup customer") query did NOT contain 'dup', idf would be broken.
    from hadoop_gpu_spark import queries as q
    from hadoop_gpu_spark.tables import load_table

    top = (
        q.q_bm25_topk(spark, sf_dir)
        .filter(F.col("qid") == "q_rare")
        .orderBy("rank")
        .toPandas()
    )
    assert len(top) > 0
    docs = load_table(spark, "documents", sf_dir).toPandas().set_index("doc_id")
    best_text = docs.loc[int(top.iloc[0]["doc_id"]), "text"]
    assert "dup" in best_text.split()


def test_bm25_scores_monotone_and_ranks_dense(spark, sf_dir):
    from hadoop_gpu_spark import queries as q

    out = q.q_bm25_topk(spark, sf_dir).toPandas()
    for qid, grp in out.groupby("qid"):
        g = grp.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        # scores non-increasing with rank (ties broken by doc_id)
        assert (g["score"].diff().dropna() <= 1e-12).all()


def test_bm25_absent_term_query_yields_no_rows(spark, sf_dir):
    from hadoop_gpu_spark.operators.retrieval import bm25_topk
    from hadoop_gpu_spark.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    out = bm25_topk(docs, [("qx", "zzqx_not_in_corpus")], top_k=5).toPandas()
    assert len(out) == 0


def test_bm25_plan_single_corpus_scan_no_vocab_broadcast(spark, sf_dir):
    # The 100 TB shape: ONE corpus scan in the returned plan (the stats
    # pass ran at construction), term filter pushed below the aggregate,
    # and no unbounded broadcast — the qterms join is AQE's call.
    import re

    from hadoop_gpu_spark import plans
    from hadoop_gpu_spark import queries as q

    df = q.q_bm25_topk(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert len(re.findall(r"^\s*\(\d+\) Scan parquet\b", plan, re.M)) == 1, plan
    assert "text" not in plans.shuffled_columns(df)


def test_bm25_matches_standalone_reference(spark):
    # Tiny corpus with hand-checkable structure, verified against an
    # independent plain-python BM25 (not the SQL twin — a third
    # implementation).
    import math

    rows = [
        (0, "apple banana apple"),
        (1, "apple cherry"),
        (2, "banana banana banana durian"),
        (3, "cherry durian elderberry fig grape"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from hadoop_gpu_spark.operators.retrieval import bm25_topk

    got = (
        bm25_topk(docs, [("q", "apple banana")], top_k=4)
        .orderBy("rank")
        .toPandas()
    )
    # reference
    k1, b = 1.2, 0.75
    n, tt = 4, 3 + 2 + 4 + 5
    texts = {i: t.split() for i, t in rows}

    def idf(term):
        df = sum(1 for t in texts.values() if term in t)
        return round(math.log((n - df + 0.5) / (df + 0.5) + 1), 9)

    def score(i):
        s = 0.0
        dl = len(texts[i])
        for term in ("apple", "banana"):
            tf = texts[i].count(term)
            if not tf:
                continue
            ratio = (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl * n / tt)))
            s += round(idf(term) * ratio, 9)
        return round(s, 6)

    want = sorted(
        ((i, score(i)) for i in texts if score(i) > 0),
        key=lambda x: (-x[1], x[0]),
    )
    assert list(map(tuple, got[["doc_id", "score"]].values.tolist())) == [
        (float(i), s) for i, s in want
    ] or list(map(tuple, got[["doc_id", "score"]].values.tolist())) == want


# ---------------------------------------------------------------------------
# Semantic dedup (dedup/semantic.py)
# ---------------------------------------------------------------------------
def test_semantic_dedup_survivors_have_no_earlier_near_neighbor(spark, sf_dir):
    # The operator's defining invariant, checked directly on its output:
    # for every survivor pair in the same cluster, cosine < tau; and
    # every pruned vector HAS an earlier same-cluster neighbor >= tau.
    import numpy as np

    from hadoop_gpu_spark import queries as q
    from hadoop_gpu_spark.tables import load_table

    out = q.q_semantic_dedup(spark, sf_dir).toPandas()
    emb = load_table(spark, "embeddings", sf_dir).toPandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        return float(va @ vb / np.sqrt((va @ va) * (vb @ vb)))

    by_cluster: dict[int, list[int]] = {}
    for r in out.itertuples():
        by_cluster.setdefault(int(r.cid), []).append(int(r.vec_id))
    tau = 0.30
    for members in by_cluster.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                assert cos(a, b) < tau + 1e-9, (a, b, cos(a, b))
    # pruned set: complement of survivors among all assigned vectors
    survivors = set(int(v) for v in out["vec_id"])
    assert len(survivors) < len(vecs)  # something was actually pruned


def test_semantic_dedup_assignment_is_max_cosine(spark, sf_dir):
    import numpy as np

    from hadoop_gpu_spark import queries as q
    from hadoop_gpu_spark.tables import load_table

    out = q.q_semantic_dedup(spark, sf_dir).toPandas()
    emb = load_table(spark, "embeddings", sf_dir).toPandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    cents = {c: vecs[c] for c in range(8)}

    def best(v):
        scores = {
            c: float(vecs[v] @ cv / np.sqrt((vecs[v] @ vecs[v]) * (cv @ cv)))
            for c, cv in cents.items()
        }
        return max(scores, key=lambda c: (scores[c], -c))

    for r in out.sample(min(50, len(out)), random_state=0).itertuples():
        assert int(r.cid) == best(int(r.vec_id))


def test_semantic_dedup_plan_shares_one_assignment_relation(spark, sf_dir):
    # The self-join's two branches must read ONE cached assignment
    # relation (eager_persist), not recompute the corpus x centroid
    # cosine pass per side — the dual-branch-recompute class, pre-empted
    # at build time for this operator.
    import re

    from hadoop_gpu_spark import plans
    from hadoop_gpu_spark import queries as q

    plan = plans.formatted_plan(q.q_semantic_dedup(spark, sf_dir))
    assert plan.count("InMemoryTableScan") >= 2, plan
    # live scans: only the cached relation's build lineage (per the
    # display convention) — no uncached corpus scan outside it
    live = re.findall(r"^\s*\(\d+\) Scan parquet\b", plan, re.M)
    assert len(live) <= 2, plan


@pytest.fixture(scope="module", autouse=True)
def _release_persisted_after():
    yield
    from hadoop_gpu_spark.utils import release_persisted_frames

    release_persisted_frames()
