"""r14/r15 candidate gate, oracle-pinned while STAGED: q_bpe_token_counts
— BPE apply+count under the trained tokenizer (ml/bpe.py
bpe_token_counts). Same staging pattern as the r09/r11/r12/r13 cohorts:
the driver-identical oracle comparison runs here every session at BOTH
scales, so registration is a one-line @query move with the evidence
already standing. Beyond the oracle pin, this file carries the
operator's falsifiers:

- a pure-python THIRD implementation (train + encode + count) that also
  proves the min-rank-iterative encoder equals apply-in-learning-order
  replay — the property the replace-chain design rests on;
- an early-pair-exhaustion edge vs the DuckDB twin on a crafted corpus
  (the engine ``break``s and keeps the merged vocab; the SQL's
  LEFT JOIN + COALESCE lattice must do the same, where a CROSS JOIN
  would erase it);
- a single-corpus-scan plan pin: the returned count plan reads the
  eager_persist'd vocab frame, never the corpus parquet again;
- partition invariance (exact integers, no accumulation-order leak).
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.oracle import compare_frames, duckdb_con

R14_CANDIDATES = ["q_bpe_token_counts", "q_nb_lang_confusion"]

_BOTH_SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("name", R14_CANDIDATES)
@pytest.mark.parametrize("scale_dir", _BOTH_SCALES)
def test_r14_candidate_gate_oracle(spark, name, scale_dir):
    from hadoop_gpu_spark import queries as q

    fn = getattr(q, name)
    oracle = getattr(q, f"Q_{name[2:].upper()}_ORACLE")
    got = fn(spark, scale_dir).toPandas()
    con = duckdb_con(scale_dir)
    want = con.sql(oracle).df()
    con.close()
    errs = compare_frames(got, want)
    assert not errs, f"{name}@{scale_dir}: " + "; ".join(errs[:3])
    assert len(got) > 0, f"{name}@{scale_dir}: empty gate proves nothing"


def test_r14_candidate_oracles_emit_driver_safe_types(sf_dir):
    from hadoop_gpu_spark import queries as q

    con = duckdb_con(sf_dir)
    offenders = []
    for name in R14_CANDIDATES:
        rel = con.sql(getattr(q, f"Q_{name[2:].upper()}_ORACLE"))
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            if typ in ("HUGEINT", "UHUGEINT", "UBIGINT"):
                offenders.append(f"{name}.{col}: {typ}")
    con.close()
    assert not offenders, offenders


# ---------------------------------------------------------------------------
# Pure-python third implementation (no Spark, no SQL, no md5): classic
# Sennrich word-count BPE. Training merges ALL occurrences of the argmax
# pair greedily left-to-right after each learned step, so the final vocab
# IS the encoded corpus.
# ---------------------------------------------------------------------------


def _merge_all(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(texts: list[str], n_merges: int):
    """(merges, vocab, subword_counts) — the reference train+encode."""
    wc: Counter = Counter()
    for t in texts:
        for w in t.split():
            wc[w] += 1
    vocab = {w: [*w, "</w>"] for w in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        vocab = {w: _merge_all(syms, *best) for w, syms in vocab.items()}
    counts: Counter = Counter()
    for w, syms in vocab.items():
        for s in syms:
            counts[s] += wc[w]
    return merges, vocab, counts


def _encode_min_rank(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """The classic BPE ENCODER: repeatedly merge the lowest-rank pair
    present (all its occurrences), until none of the learned pairs
    remains — the GPT-2 encode loop."""
    syms = [*word, "</w>"]
    while True:
        present = [(ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks]
        if not present:
            return syms
        _, (a, b) = min(present)
        syms = _merge_all(syms, a, b)


_CRAFTED = [
    "aaaa aa a aaa",          # single-letter overlap runs: greedy pairing
    "low lower lowest low",   # the Sennrich example shape
    "aaaa",                   # repeated from doc 1: cross-doc weighting
    "ab ab abab ba",          # merged symbol re-pairs with itself
]


def test_bpe_token_counts_matches_pure_python_reference(spark):
    from hadoop_gpu_spark.ml.bpe import bpe_token_counts

    docs = spark.createDataFrame([(t,) for t in _CRAFTED], "text string")
    got = {
        r["subword"]: r["n_tokens"]
        for r in bpe_token_counts(docs, "text", n_merges=6).collect()
    }
    _, _, want = _ref_bpe(_CRAFTED, 6)
    assert got == dict(want)


def test_min_rank_encoder_equals_apply_in_order_replay(spark):
    # The design's load-bearing property: applying merges once each IN
    # LEARNING ORDER (the replace chain) equals the classic min-rank
    # iterative encoder — true because a learned pair can only reference
    # symbols that already existed when it was learned, so later merges
    # never create an occurrence of an earlier pair. Proven here against
    # the reference trainer's maintained vocab AND the iterative encoder.
    merges, vocab, _ = _ref_bpe(_CRAFTED, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, syms in vocab.items():
        replay = [*w, "</w>"]
        for a, b in merges:
            replay = _merge_all(replay, a, b)
        assert replay == syms, w
        assert _encode_min_rank(w, ranks) == syms, w


def test_bpe_token_counts_early_exhaustion_matches_twin(spark):
    # n_merges far beyond what the corpus supports: the engine breaks
    # out and keeps the fully-merged vocab; the SQL lattice's LEFT JOIN
    # + COALESCE must carry the vocab through the empty merge steps
    # (a CROSS JOIN against an empty b{s} would erase every word).
    import duckdb

    from hadoop_gpu_spark.ml.bpe import bpe_token_counts, bpe_token_counts_sql

    texts = ["ab ab", "ab"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_token_counts(docs, "text", n_merges=8).toPandas()

    con = duckdb.connect()
    con.execute("CREATE TABLE tiny(text VARCHAR)")
    con.executemany("INSERT INTO tiny VALUES (?)", [(t,) for t in texts])
    want = con.sql(bpe_token_counts_sql("tiny", "text", 8)).df()
    con.close()
    assert not compare_frames(got, want)
    # and the corpus really did exhaust: 'ab</w>' fully fused in 2 merges
    assert dict(zip(got["subword"], got["n_tokens"])) == {"ab</w>": 3}


def test_bpe_token_counts_sql_twin_matches_reference_fuzz():
    """python <-> DuckDB differential fuzz of the ENCODE+COUNT lattice
    (the train-side twin is fuzzed in test_r11_candidates.py): tiny
    2-3 letter corpora force count ties, repeated-letter runs (greedy
    non-overlap), single-char words, empty corpora, and pair exhaustion
    (the LEFT JOIN + COALESCE vocab carry-through). No JVM per example —
    the Spark side is pinned to this same twin by the oracle gate tests
    above, closing the triangle."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hadoop_gpu_spark.ml.bpe import bpe_token_counts_sql

    word = st.text(alphabet="abc", min_size=1, max_size=6)

    @given(
        words=st.lists(word, min_size=0, max_size=10),
        n_merges=st.integers(min_value=1, max_value=8),
    )
    @settings(max_examples=60, deadline=None)
    def run(words, n_merges):
        texts = [" ".join(words)]
        _, _, want = _ref_bpe(texts, n_merges)
        con = duckdb.connect()
        con.sql("CREATE TABLE t (text VARCHAR)")
        con.execute("INSERT INTO t VALUES (?)", [texts[0]])
        rows = con.sql(bpe_token_counts_sql("t", "text", n_merges)).fetchall()
        con.close()
        got = {s: int(n) for s, n in rows}
        assert got == dict(want), (words, n_merges, got, want)

    run()


def test_bpe_token_counts_single_corpus_scan_plan(spark, sf_dir):
    # 100 TB pin: training already paid the one corpus scan into the
    # persisted (word, wc) frame; the RETURNED count plan must read that
    # cached frame (InMemoryTableScan), never the corpus parquet again.
    from hadoop_gpu_spark import queries as q
    from hadoop_gpu_spark.plans import formatted_plan

    plan = formatted_plan(q.q_bpe_token_counts(spark, sf_dir))
    # the count plan reads the cached vocab frame…
    assert "InMemoryTableScan" in plan, plan
    # …and every parquet-scan mention sits BELOW the InMemoryRelation —
    # i.e. inside its recorded build plan (the scan already paid), never
    # as a live leaf of the returned count plan.
    assert plan.index("InMemoryRelation") < plan.index("Scan parquet"), plan


def test_bpe_checkpoint_cadence_does_not_change_results(spark):
    # the re-checkpoint branch (step % checkpoint_every == 0: new eager
    # checkpoint, predecessor's blocks released) ran untested at the
    # default cadence of 16 — every gate uses 8 merges. Train well past
    # several re-checkpoints and pin bit-equality against the
    # no-recheckpoint run and the pure-python reference.
    from hadoop_gpu_spark.ml.bpe import bpe_merges, bpe_token_counts

    docs = spark.createDataFrame([(t,) for t in _CRAFTED * 3], "text string")
    m_every2 = [tuple(r) for r in bpe_merges(docs, "text", 7, checkpoint_every=2).collect()]
    m_never = [tuple(r) for r in bpe_merges(docs, "text", 7, checkpoint_every=100).collect()]
    assert m_every2 == m_never
    want_merges, _, want_counts = _ref_bpe(_CRAFTED * 3, 7)
    assert [(l, r) for _, l, r, _ in m_every2] == want_merges

    c2 = bpe_token_counts(docs, "text", 7, checkpoint_every=2).collect()
    assert {r["subword"]: r["n_tokens"] for r in c2} == dict(want_counts)


def test_bpe_driver_train_bit_identical_to_distributed(spark, monkeypatch):
    # r16 optimization: _train_on_counts runs the Sennrich iteration
    # driver-side when the materialized vocab is at or below
    # DRIVER_TRAIN_MAX_WORDS (the per-iteration Spark-job overhead IS
    # the training cost at gate scale). The two paths must be
    # bit-identical — forced here by pinning the threshold to 0 for the
    # distributed run, on a corpus with the overlap shapes, unicode,
    # an NBSP-containing token (Java \s does not split NBSP — the
    # strip(" ")-vs-strip() seam), and an early-exhaustion doc.
    from hadoop_gpu_spark.ml import bpe as bpe_mod

    corpus = _CRAFTED + [" ab  ab x y", "ünïc ünïc öde", "q"]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    driver = [tuple(r) for r in bpe_mod.bpe_merges(docs, "text", 9).collect()]
    monkeypatch.setattr(bpe_mod, "DRIVER_TRAIN_MAX_WORDS", 0)
    dist = [tuple(r) for r in bpe_mod.bpe_merges(docs, "text", 9).collect()]
    assert driver == dist
    # single-symbol-only corpus exhausts instantly on both paths
    one = spark.createDataFrame([("z z z",)], "text string")
    d1 = [tuple(r) for r in bpe_mod.bpe_merges(one, "text", 3).collect()]
    monkeypatch.undo()
    assert d1 == [tuple(r) for r in bpe_mod.bpe_merges(one, "text", 3).collect()]


@pytest.mark.parametrize("corpus", ["crafted", "documents"])
def test_bpe_fast_path_bit_identical_to_expression_chain(spark, sf_dir, corpus):
    # The production Arrow encoder (min-rank iterative, O(1) plan size
    # in vocab) must equal the replace-chain expression form (the
    # oracle-parity anchor) bit-for-bit — on the crafted overlap corpus
    # AND the real documents table.
    from hadoop_gpu_spark.ml.bpe import bpe_token_counts

    if corpus == "crafted":
        docs = spark.createDataFrame([(t,) for t in _CRAFTED], "text string")
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    expr = bpe_token_counts(docs, "text", n_merges=6, fast_path=False).collect()
    arrow = bpe_token_counts(docs, "text", n_merges=6, fast_path=True).collect()
    assert [tuple(r) for r in expr] == [tuple(r) for r in arrow]


def test_bpe_auto_fast_path_switches_on_merge_count(spark):
    # the auto knob: ≤ EXPR_CHAIN_MAX_MERGES stays on expressions (no
    # Arrow/python in the plan); beyond it the encoder UDF appears.
    from hadoop_gpu_spark.ml import bpe
    from hadoop_gpu_spark.plans import formatted_plan

    docs = spark.createDataFrame([(t,) for t in _CRAFTED], "text string")
    small = formatted_plan(bpe.bpe_token_counts(docs, "text", n_merges=3))
    assert "ArrowEvalPython" not in small, small
    saved = bpe.EXPR_CHAIN_MAX_MERGES
    try:
        bpe.EXPR_CHAIN_MAX_MERGES = 2
        big = formatted_plan(bpe.bpe_token_counts(docs, "text", n_merges=3))
    finally:
        bpe.EXPR_CHAIN_MAX_MERGES = saved
    assert "ArrowEvalPython" in big, big


def _chain_apply(word, merges):
    # Pure-python twin of the replace-chain semantics: apply merges IN
    # LEARNING ORDER, each fusing all its occurrences greedily
    # left-to-right (non-overlapping). The ground truth the Arrow
    # min-rank encoder must reproduce.
    syms = [*word, "</w>"]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# The r12 ADVICE falsifier: merge 1's concatenation ("ab") is a symbol
# merge 0 references — two decompositions of "abc", where learning-order
# and min-rank genuinely diverge (chain: [ab, c, </w>]; min-rank would
# fuse a+b first, then ab+c → [abc, </w>]).
_AMBIGUOUS = [("ab", "c"), ("a", "b")]


def test_bpe_ambiguous_merge_pairs_detector():
    from hadoop_gpu_spark.ml.bpe import ambiguous_merge_pairs

    assert ambiguous_merge_pairs(_AMBIGUOUS) == [(0, 1, "ab")]
    # the divergence the detector predicts is real: the chain leaves
    # merge 0 unfired (no "ab" symbol existed when it ran)
    assert _chain_apply("abc", _AMBIGUOUS) == ["ab", "c", "</w>"]
    # trainer-shaped (unambiguous) lists pass: every concatenation is
    # only referenced by LATER merges
    assert ambiguous_merge_pairs([("a", "b"), ("ab", "c")]) == []
    assert ambiguous_merge_pairs([]) == []


def test_bpe_word_encoder_refuses_ambiguous_list():
    from hadoop_gpu_spark.ml.bpe import _word_encoder

    with pytest.raises(ValueError, match="ambiguous merge list"):
        _word_encoder(_AMBIGUOUS)
    # unambiguous reordering of the same pairs constructs fine and
    # matches the chain
    ok = [("a", "b"), ("ab", "c")]
    enc = _word_encoder(ok)
    assert enc("abc") == _chain_apply("abc", ok) == ["abc", "</w>"]


def test_bpe_segment_auto_stays_on_chain_for_ambiguous_list(spark):
    # Auto mode may never let the depth switch change output: past the
    # knob an AMBIGUOUS list must stay on the (always-correct) chain —
    # no Arrow in the plan, output equal to the forced chain — while
    # forcing the Arrow path raises.
    from hadoop_gpu_spark.ml import bpe
    from hadoop_gpu_spark.plans import formatted_plan

    docs = spark.createDataFrame([("abc abd",)], "text string")
    merges = _AMBIGUOUS + [("b", "d")]
    saved = bpe.EXPR_CHAIN_MAX_MERGES
    try:
        bpe.EXPR_CHAIN_MAX_MERGES = 2
        seg_auto = bpe.bpe_segment(docs, merges)
        assert "ArrowEvalPython" not in formatted_plan(seg_auto)
        got = seg_auto.collect()[0]["subwords"]
        want = bpe.bpe_segment(docs, merges, fast_path=False).collect()[0]["subwords"]
        assert got == want == ["ab", "c", "</w>", "ab", "d", "</w>"]
        with pytest.raises(ValueError, match="ambiguous merge list"):
            bpe.bpe_segment(docs, merges, fast_path=True)
    finally:
        bpe.EXPR_CHAIN_MAX_MERGES = saved


def test_bpe_encoder_chain_equivalence_fuzz():
    # Over a 2-letter alphabet, short random merge lists hit the
    # ambiguous-decomposition class constantly ("a"+"ab" vs "aa"+"b" …).
    # Contract: ambiguous lists are refused at construction; on every
    # unambiguous list the min-rank encoder equals the learning-order
    # chain exactly. Pure python — no JVM per example.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hadoop_gpu_spark.ml.bpe import _word_encoder, ambiguous_merge_pairs

    sym = st.text(alphabet="ab", min_size=1, max_size=2)

    @given(
        merges=st.lists(st.tuples(sym, sym), max_size=6),
        word=st.text(alphabet="ab", min_size=1, max_size=8),
    )
    @settings(max_examples=150, deadline=None)
    def run(merges, word):
        if ambiguous_merge_pairs(merges):
            with pytest.raises(ValueError, match="ambiguous merge list"):
                _word_encoder(merges)
        else:
            assert _word_encoder(merges)(word) == _chain_apply(word, merges)

    run()


def test_bpe_token_counts_partition_invariant(spark):
    from hadoop_gpu_spark.ml.bpe import bpe_token_counts

    docs = spark.createDataFrame([(t,) for t in _CRAFTED * 7], "text string")
    a = bpe_token_counts(docs.coalesce(1), "text", n_merges=5).collect()
    b = bpe_token_counts(docs.repartition(13), "text", n_merges=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---------------------------------------------------------------------------
# Naive-Bayes language classifier (ml/nbayes.py): pure-python third
# implementation and falsifiers. The docstring at the top of this file
# describes the staging pattern; the NB-specific risks are the Laplace
# lattice (smoothing denominators), the zero-token prior-only path, and
# argmax tie-breaks.
# ---------------------------------------------------------------------------


def _ref_nb_confusion(docs: list[tuple[str, str, str]]):
    """(id, label, text) rows -> {(label, pred): n} — independent NB."""
    import math

    counts: Counter = Counter()
    cls_tok: Counter = Counter()
    pri_n: Counter = Counter()
    for _, lab, text in docs:
        pri_n[lab] += 1
        for t in text.split():
            counts[(t, lab)] += 1
            cls_tok[lab] += 1
    vocab = {t for t, _ in counts}
    V = len(vocab)
    N = sum(pri_n.values())
    classes = sorted(pri_n)
    conf: Counter = Counter()
    for _, lab, text in docs:
        best = None
        for c in classes:
            s = round(math.log(pri_n[c] / N), 9)
            for t in text.split():
                if t in vocab:
                    s = round(
                        s + round(math.log((counts[(t, c)] + 1) / (cls_tok[c] + V)), 9),
                        9,
                    )
            if best is None or s > best[0] or (s == best[0] and c < best[1]):
                best = (s, c)
        conf[(lab, best[1])] += 1
    return dict(conf)


_NB_DOCS = [
    ("d1", "en", "the cat sat on the mat"),
    ("d2", "en", "the dog ate the bone"),
    ("d3", "fr", "le chat le chien"),
    ("d4", "fr", "le monde est grand"),
    ("d5", "de", "der hund und die katze"),
    ("d6", "en", ""),  # zero-token doc: scores on priors alone
    ("d7", "de", "die welt ist gross"),
    ("d8", "fr", "le chat dort"),
    ("d9", "de", "der der der"),  # repeated-token weighting
]


def test_nb_confusion_matches_pure_python_reference(spark):
    from hadoop_gpu_spark.ml.nbayes import nb_confusion

    df = spark.createDataFrame(_NB_DOCS, "doc_id string, lang string, text string")
    got = {
        (r["lang"], r["pred"]): r["n_docs"]
        for r in nb_confusion(df, id_col="doc_id", label_col="lang").collect()
    }
    assert got == _ref_nb_confusion(_NB_DOCS)


def test_nb_zero_token_doc_takes_max_prior_class(spark):
    # a textless doc must be classified by priors alone (ties to the
    # smaller class name) — the LEFT-join + COALESCE path, not a
    # dropped row.
    from hadoop_gpu_spark.ml.nbayes import nb_classify

    df = spark.createDataFrame(
        [("a", "en", "x y z"), ("b", "en", "x q"), ("c", "fr", "u v"), ("z", "fr", "")],
        "doc_id string, lang string, text string",
    )
    rows = {
        r["doc_id"]: r["pred"]
        for r in nb_classify(df, id_col="doc_id", label_col="lang").collect()
    }
    assert rows["z"] == "en"  # en prior 2/4 == fr prior 2/4 -> tie to 'en'
    assert len(rows) == 4  # nobody dropped


def test_nb_score_held_out_corpus(spark):
    # the production quality-filter shape: train on a labeled seed set,
    # score a DIFFERENT corpus that carries no labels. Disjoint seed
    # vocabularies make the expected classes unambiguous; a doc with no
    # in-vocabulary tokens must fall back to the max-prior class
    # (ties to the smaller class name).
    from hadoop_gpu_spark.ml.nbayes import nb_score

    seed = spark.createDataFrame(
        [
            ("s1", "good", "alpha beta gamma"),
            ("s2", "good", "alpha beta delta"),
            ("s3", "spam", "zzz yyy xxx"),
        ],
        "doc_id string, label string, text string",
    )
    corpus = spark.createDataFrame(
        [
            ("c1", "beta gamma gamma"),   # good vocabulary
            ("c2", "xxx zzz"),            # spam vocabulary
            ("c3", "unseen words only"),  # no evidence -> max prior = good (2/3)
            ("c4", ""),                   # empty -> same prior fallback
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r["pred"]
        for r in nb_score(seed, corpus, id_col="doc_id").collect()
    }
    assert out == {"c1": "good", "c2": "spam", "c3": "good", "c4": "good"}


def test_nb_argmax_is_aggregate_not_window(spark):
    # r16 optimization: the per-document argmax runs as a map-side-
    # combinable min(struct(-posterior, cls, ...)) aggregate, not a
    # row_number window over the |docs| x |classes| grid — the plan
    # must carry no Window node (the tie-break equivalence is pinned by
    # the reference/fuzz tests around this one; the bounded |classes|-row
    # prior window in nb_score is over a 1-row partition and was also
    # removed from the scoring path).
    import re

    from hadoop_gpu_spark import plans
    from hadoop_gpu_spark.ml.nbayes import nb_classify

    df = spark.createDataFrame(_NB_DOCS, "doc_id string, lang string, text string")
    plan = plans.formatted_plan(nb_classify(df, id_col="doc_id", label_col="lang"))
    # only the bounded |classes|-row prior window may remain
    assert len(re.findall(r"^\s*\(\d+\) Window\b", plan, re.M)) <= 1, plan


def test_nb_confusion_partition_invariant(spark):
    from hadoop_gpu_spark.ml.nbayes import nb_confusion

    df = spark.createDataFrame(_NB_DOCS * 5, "doc_id string, lang string, text string")
    a = nb_confusion(df.coalesce(1), id_col="doc_id", label_col="lang").collect()
    b = nb_confusion(df.repartition(13), id_col="doc_id", label_col="lang").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_nb_sql_twin_matches_reference_fuzz():
    """python <-> DuckDB differential fuzz of the NB lattice over tiny
    adversarial corpora: 2-letter words force count ties, duplicate
    texts across classes force near-equal posteriors (tie-break), empty
    texts exercise the prior-only path. No JVM per example — the Spark
    side is pinned to the same twin by the oracle gate tests above."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hadoop_gpu_spark.ml.nbayes import nb_confusion_sql

    text = st.lists(
        st.text(alphabet="ab", min_size=1, max_size=3), min_size=0, max_size=6
    ).map(" ".join)

    @given(
        rows=st.lists(
            st.tuples(st.sampled_from(["p", "q", "r"]), text), min_size=1, max_size=8
        )
    )
    @settings(max_examples=50, deadline=None)
    def run(rows):
        docs = [(f"d{i}", lab, t) for i, (lab, t) in enumerate(rows)]
        con = duckdb.connect()
        con.execute("CREATE TABLE t(doc_id VARCHAR, lang VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?,?,?)", docs)
        sql = nb_confusion_sql("t", id_col="doc_id", text_col="text", label_col="lang")
        got = {(r[0], r[1]): int(r[2]) for r in con.sql(sql).fetchall()}
        con.close()
        assert got == _ref_nb_confusion(docs), (docs, got)

    run()


def test_nb_gate_confusion_is_complete_and_conserves_docs(spark, sf_dir):
    # Output-shape invariants on the real corpus. NOTE the testdata's
    # text is the same token distribution for every lang (the lang
    # column is uncorrelated metadata — the same reason the HEURISTIC
    # gate is named q_lang_id_confusion), so diagonal dominance is NOT
    # an invariant here; separable-corpus accuracy is pinned by
    # test_nb_separable_corpus_is_diagonal below. What must hold: every
    # document is classified exactly once (row sums == per-lang doc
    # counts), every true label appears, and predictions come from the
    # label set.
    from hadoop_gpu_spark import queries as q
    from hadoop_gpu_spark.tables import load_table

    rows = q.q_nb_lang_confusion(spark, sf_dir).collect()
    want = {
        r["lang"]: r["n"]
        for r in load_table(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got: dict[str, int] = {}
    for r in rows:
        got[r["lang"]] = got.get(r["lang"], 0) + r["n_docs"]
        assert r["pred"] in want, r
    assert got == want


def test_nb_separable_corpus_is_diagonal(spark):
    # on a corpus whose classes have disjoint vocabularies the
    # classifier must recover every label exactly.
    from hadoop_gpu_spark.ml.nbayes import nb_confusion

    docs = [
        (f"{lang}{i}", lang, " ".join(f"{lang}tok{j}" for j in range(5)))
        for lang in ("aa", "bb", "cc")
        for i in range(4)
    ]
    df = spark.createDataFrame(docs, "doc_id string, lang string, text string")
    rows = nb_confusion(df, id_col="doc_id", label_col="lang").collect()
    assert {(r["lang"], r["pred"]): r["n_docs"] for r in rows} == {
        ("aa", "aa"): 4,
        ("bb", "bb"): 4,
        ("cc", "cc"): 4,
    }
