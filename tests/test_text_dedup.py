"""Training-data operators: text analysis, dedup families, similarity
search, multimodal plumbing. Self-consistency plus brute-force oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from redo_log_parser_spark.functions import text as T
from redo_log_parser_spark.functions.multimodal import (
    decode_media, resize_plan, sample_frames)
from redo_log_parser_spark.operators import dedup as D
from redo_log_parser_spark.operators import similarity as S

DOCS = [
    (0, "the cat sat on the mat and it is that"),
    (1, "the cat sat on the mat and it is that"),          # exact dup of 0
    (2, "the cat sat on the mat and it was that thing"),   # near dup
    (3, "der hund ist nicht ein und das der die"),
    (4, "completely different text about spark engines!!!"),
    (5, "THE CAT  SAT on the mat and it is that"),          # norm dup of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_token_count_and_quality(docs):
    rows = {r["doc_id"]: r for r in docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tok"),
        T.quality_score(F.col("text")).alias("q"),
        T.lang_id(F.col("text")).alias("lang"),
        T.doc_fingerprint(F.col("text")).alias("fp"),
    ).collect()}
    assert rows[0]["n_tok"] == 10
    assert rows[0]["lang"] == "en"
    assert rows[3]["lang"] == "de"
    assert rows[4]["lang"] == "und"
    assert 0.0 <= rows[4]["q"] <= 1.0
    # normalization: case/extra-space dup shares the fingerprint
    assert rows[0]["fp"] == rows[5]["fp"] == rows[1]["fp"]


def test_exact_dedup(docs):
    kept = D.exact_dedup(docs)
    ids = {r["doc_id"] for r in kept.collect()}
    # 0,1,5 collapse to 0; 2,3,4 unique
    assert ids == {0, 2, 3, 4}
    groups = D.duplicate_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["doc_ids"] == [0, 1, 5]


def _py_shingles(text, n=3):
    toks = text.lower().split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_ngram_jaccard_matches_bruteforce(docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    want = {}
    for i, ta in DOCS:
        for j, tb in DOCS:
            if i >= j:
                continue
            sa, sb = _py_shingles(ta), _py_shingles(tb)
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= 0.3:
                want[(i, j)] = round(jac, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_dedup_pairs(
            docs, num_hashes=64, bands=16, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and (0, 5) in pairs and (1, 5) in pairs
    assert all(a < b for a, b in pairs)
    # jaccard verification keeps unrelated docs out
    assert not any(4 in p for p in pairs)


def test_simhash_near_dups(docs):
    fps = D.simhash(docs)
    vals = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    assert vals[0] == vals[1] == vals[5]  # identical token multisets
    dups = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_dups(fps, max_hamming=16).collect()
    }
    assert dups[(0, 1)] == 0
    # truly different docs are far in hamming space (not asserted absent:
    # 64-bit simhash on tiny docs is noisy; only near-pairs are asserted)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(20, 8).astype(float)
    base[7] = base[3] * 1.001 + 1e-4  # near-dup pair (3, 7)
    pdf = pd.DataFrame(
        {"vec_id": range(20), "embedding": [list(v) for v in base]}
    )
    return spark.createDataFrame(pdf)


def test_cosine_topk_matches_numpy(emb):
    q = [1.0, 0.5, -0.25, 2.0, 0.0, 1.0, -1.0, 0.5]
    got = [(r["vec_id"], r["score"]) for r in S.cosine_topk(emb, q, k=5).collect()]
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    qv = np.array(q)
    want = sorted(
        (
            (vid, round(float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 6))
            for vid, v in vecs.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-5


def test_lsh_ann_recall_on_top1(emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    approx = [r["vec_id"] for r in S.lsh_bucketed_ann(emb, q, k=3, n_planes=6).collect()]
    assert 3 in approx  # the vector itself must be found
    assert 7 in approx  # and its planted near-duplicate


def test_embedding_near_dup_pairs(emb):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in S.embedding_near_dup_pairs(emb, threshold=0.99, n_planes=6).collect()
    }
    assert (3, 7) in pairs and pairs[(3, 7)] > 0.999


def test_multimodal_decode_plumbing(spark, mini_docs):
    meta = decode_media(mini_docs.limit(20), kind="image", mode="fake")
    rows = meta.collect()
    assert len(rows) == 20
    r0 = rows[0]
    assert r0["kind"] == "image" and len(r0["feature"]) == 16
    assert r0["n_bytes"] > 0 and r0["width"] >= 64
    # deterministic: same input -> same features
    again = decode_media(mini_docs.limit(20), kind="image", mode="fake").collect()
    assert {r["media_id"]: r["feature"] for r in rows} == {
        r["media_id"]: r["feature"] for r in again}
    plan = resize_plan(meta, max_side=128).collect()
    assert all(max(r["target_w"], r["target_h"]) <= 128 for r in plan)
    frames = sample_frames(meta.withColumn("n_frames", F.lit(11)), every_n=5)
    assert frames.groupBy("media_id").count().first()["count"] == 3


def test_multimodal_strict_mode_rejects_unknown_magic():
    # strict is REAL now (tests/test_multimodal_strict.py); non-media
    # bytes surface a clear error instead of invented metadata
    from redo_log_parser_spark.functions.multimodal import _strict_decode

    with pytest.raises(ValueError, match="unsupported magic"):
        _strict_decode(b"<html>not media</html>")


def test_max_df_bounds_hot_shingle_fanout(spark):
    """One stop-phrase shingle shared by all docs must not produce an
    O(n^2) pair set once max_df is applied; genuinely-duplicate docs
    (sharing RARE shingles) still pair."""
    rows = [(i, f"aaa bbb ccc unique{i} tail{i}") for i in range(40)]
    rows += [(100, "xxx yyy zzz www vvv"), (101, "xxx yyy zzz www vvv")]
    hot = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    uncapped = D.ngram_jaccard_pairs(hot, n=3, threshold=0.01).count()
    assert uncapped > 700  # C(40,2) hot-shingle pairs + the planted dup
    capped = D.ngram_jaccard_pairs(hot, n=3, threshold=0.01, max_df=5).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}
    assert capped[0]["jaccard"] == 1.0


def test_minhash_bucket_cap_bounds_pairs(spark):
    """A degenerate LSH bucket (here: 30 identical docs agreeing on every
    band) must be droppable via max_bucket_size without losing pairs in
    healthy buckets."""
    rows = [(i, "same same same same text here") for i in range(30)]
    rows += [(100, "pp qq rr ss tt uu"), (101, "pp qq rr ss tt uu")]
    degen = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    free = D.minhash_dedup_pairs(degen, num_hashes=32, bands=8, threshold=0.5)
    assert free.count() == 30 * 29 // 2 + 1
    capped = D.minhash_dedup_pairs(
        degen, num_hashes=32, bands=8, threshold=0.5, max_bucket_size=5
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(100, 101)}


def test_simhash_bucket_cap(spark):
    rows = [(i, "same same same same text here") for i in range(30)]
    rows += [(100, "pp qq rr ss tt uu"), (101, "pp qq rr ss tt uu")]
    degen = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    fps = D.simhash(degen)
    capped = D.simhash_near_dups(fps, max_hamming=3, max_bucket_size=5)
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(100, 101)}


def test_lsh_bucket_matches_driver_twin_and_plan_bounded(spark):
    """Plan-size hygiene (VERDICT r1 #9): hyperplanes ride a broadcast
    column, so the optimized plan must stay O(1) in dim — checked at
    dim=512 — and the JVM signature must equal the driver-side
    py_lsh_signature twin on every row."""
    rng = np.random.RandomState(11)
    dim, n_planes = 512, 8
    vecs = rng.randn(12, dim)
    pdf = pd.DataFrame({"vec_id": range(12), "embedding": [list(v) for v in vecs]})
    emb = spark.createDataFrame(pdf)
    bucketed = S.with_lsh_bucket(emb, dim=dim, n_planes=n_planes, seed=42)
    plan = bucketed._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000, f"plan blew up: {len(plan)} chars"
    planes = S._hyperplanes(dim, n_planes, seed=42)
    got = {r["vec_id"]: r["lsh_bucket"] for r in bucketed.collect()}
    for vid, v in zip(pdf["vec_id"], vecs):
        assert got[vid] == S.py_lsh_signature(v, planes), vid


def test_ivf_bucket_plan_bounded_high_dim(spark):
    rng = np.random.RandomState(13)
    dim = 512
    vecs = rng.randn(10, dim)
    pdf = pd.DataFrame({"vec_id": range(10), "embedding": [list(v) for v in vecs]})
    emb = spark.createDataFrame(pdf)
    cents = [list(map(float, vecs[0])), list(map(float, vecs[1]))]
    bucketed = S.with_ivf_bucket(emb, cents)
    plan = bucketed._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000, f"plan blew up: {len(plan)} chars"
    rows = {r["vec_id"]: r["ivf_bucket"] for r in bucketed.collect()}
    import numpy as _np
    for vid, v in zip(pdf["vec_id"], vecs):
        d = [float(((v - _np.asarray(c)) ** 2).sum()) for c in cents]
        assert rows[vid] == int(_np.argmin(d)), vid


def test_simhash_near_dups_equal_exact_hamming(spark):
    """Pigeonhole blocking is COMPLETE for hamming <= max_hamming, and the
    bit_count verify is exact — so the operator's output must equal the
    brute-force Hamming pair set over the computed fingerprints."""
    rows = [(i, t) for i, t in enumerate([
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zeta",      # exact dup of 0
        "alpha beta gamma delta epsilon eta",        # near
        "one two three four five six seven",
        "totally different words entirely here now",
        "alpha beta gamma delta zeta epsilon",       # permuted (same multiset)
    ])]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    fps = D.simhash(docs)
    vals = {r["doc_id"]: r["simhash"] & ((1 << 64) - 1) for r in fps.collect()}
    for h in (3, 8):
        want = {
            (a, b): bin(vals[a] ^ vals[b]).count("1")
            for a in vals for b in vals
            if a < b and bin(vals[a] ^ vals[b]).count("1") <= h
        }
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in D.simhash_near_dups(fps, max_hamming=h).collect()
        }
        assert got == want, h


def test_bucket_cap_drop_metric_is_observable(spark):
    """The lsh_dropped_rows observation must report exactly the rows in
    oversized buckets (30 identical docs x 8 bands) — the drop is
    visible, never silent."""
    rows = [(i, "same same same same text here") for i in range(30)]
    rows += [(100, "pp qq rr ss tt uu"), (101, "pp qq rr ss tt uu")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = D.minhash_dedup_pairs(docs, 32, 8, threshold=0.5, max_bucket_size=5)
    out.collect()
    om = out._jdf.queryExecution().observedMetrics()
    vals = {}
    it = om.iterator()
    while it.hasNext():
        kv = it.next()
        vals[str(kv._1())] = kv._2()
    (name, row), = [(k, v) for k, v in vals.items() if k.startswith("lsh_bucket_cap")]
    assert row.getLong(0) == 30 * 8  # every row of the degenerate buckets


def test_bucket_cap_names_unique_across_threads(spark):
    """_cap_buckets observe names must never collide — round-3 VERDICT
    minor #4: the old bare-int module counter could mint duplicates
    under concurrent plan construction. Build plans from several
    threads and check every minted name is distinct (observe() raises
    on duplicate names within one plan; across plans duplicate names
    would silently merge metrics)."""
    import re
    import threading

    rows = [(i, f"w{i} x{i} y{i} z{i} q{i}") for i in range(8)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sigs = D.with_minhash_sig(docs, num_hashes=16).select("doc_id", "sig")
    plans, errs = [], []

    def build():
        try:
            df = D.minhash_lsh_candidates(sigs, bands=4, max_bucket_size=3)
            plans.append(df._jdf.queryExecution().analyzed().toString())
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [threading.Thread(target=build) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    names = []
    for p in plans:  # a plan may print its CollectMetrics name twice
        got = set(re.findall(r"lsh_bucket_cap_\d+", p))
        assert len(got) == 1, got
        names.append(got.pop())
    assert len(names) == 6 and len(set(names)) == 6


def test_shingles_short_and_empty_docs(spark):
    """Docs with fewer than n tokens (incl. empty) yield no shingles —
    regression pin for the Spark descending-sequence gotcha
    (sequence(0,-1) = [0,-1])."""
    rows = [(0, ""), (1, "one"), (2, "one two"), (3, "one two three")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {(r["doc_id"], r["shingle"]) for r in D.shingles(docs, n=3).collect()}
    assert got == {(3, "one two three")}


def test_row_minhash_sig_matches_aggregated(docs):
    """with_minhash_sig (per-row, streaming-safe) must produce the exact
    signature minhash_signatures aggregates — same hash family, same
    shingling; docs with fewer than n tokens get an empty sig where the
    aggregate emits no row."""
    agg = {r["doc_id"]: list(r["sig"])
           for r in D.minhash_signatures(docs, num_hashes=16).collect()}
    row = {r["doc_id"]: list(r["sig"])
           for r in D.with_minhash_sig(docs, num_hashes=16)
                     .select("doc_id", "sig").collect()}
    for did, sig in row.items():
        if did in agg:
            assert sig == agg[did], did
        else:
            assert sig == []  # sub-n-token doc
    assert set(agg) <= set(row)


def test_shingle_paths_have_no_distinct_exchange(docs):
    """Pin the round-3 restructures: per-doc shingle dedup and sizes are
    ROW-SIDE, so (a) shingles() plans no Exchange at all (projection +
    generate), and (b) the exact-Jaccard inverted index plans exactly
    the self-join, pair-agg and size-join exchanges — no
    explode-then-DISTINCT, no sizes groupBy."""
    sh_plan = D.shingles(docs, 3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in sh_plan, sh_plan

    jac = D.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    jac_plan = jac._jdf.queryExecution().optimizedPlan().toString()
    # the optimized plan must contain no Deduplicate/Aggregate computing
    # per-doc distinct shingles: the only aggregate is the pair count
    n_aggs = jac_plan.count("Aggregate [")
    assert n_aggs == 1, jac_plan


def test_minhash_per_doc_frame_is_projection_only(docs):
    """The minhash per-doc (sig, shs, n_sh) frame plans zero exchanges —
    signature and shingle set are row-wise."""
    per_doc = (
        D.with_minhash_sig(docs, 16, keep_shingles="shs")
        .select("doc_id", "sig", "shs")
    )
    plan = per_doc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ngram_jaccard_hash_index_parity(docs):
    """hash_index=True (default, bigint inverted index) must produce
    the exact pair set and jaccard values of the string-keyed index —
    a 64-bit collision is the only way they can differ (p ≈ m²/2^65)."""
    kw = dict(n=3, threshold=0.3)
    hashed = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in D.ngram_jaccard_pairs(docs, **kw).collect()}
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(
                 docs, hash_index=False, **kw).collect()}
    assert hashed == exact and hashed
