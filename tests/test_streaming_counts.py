"""Watermarked streaming per-op window counts (streaming/stream.py)."""

import os
import time

from pyspark.sql import functions as F

from redo_log_parser_spark.streaming.stream import (
    parse_stream, stream_documents, streaming_op_counts)


def test_windowed_op_counts(spark, mini_docs, tmp_path):
    src = str(tmp_path / "src")
    mini_docs.write.mode("overwrite").parquet(src)
    events = parse_stream(stream_documents(spark, src))
    agg = streaming_op_counts(events, watermark="5 minutes", window="1 minute")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("op_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from op_counts").collect()
    total = {}
    for r in rows:
        total[r["op"]] = total.get(r["op"], 0) + r["count"]
    assert total == {"insert": 161, "update": 220, "delete": 52}
    # the mini-log spans ~62 seconds -> at least two 1-minute windows
    assert len({str(r["w"]) for r in rows}) >= 2


def test_streaming_incarnations_state_crosses_micro_batches(spark, tmp_path):
    """applyInPandasWithState must carry per-ROWID incarnation state
    ACROSS micro-batch boundaries: a fuzz log containing ROWID-reuse
    restarts is streamed as four chronological file slices with
    maxFilesPerTrigger=1 (so restarts and their predecessors land in
    different batches), and the rewritten ids must equal the batch
    window over the whole log. The single-batch variant lives in
    test_xes_sink.py; this one fails if state.update/get is broken."""
    import pandas as pd
    from fuzzgen import fuzz_records, records_to_documents
    from redo_log_parser_spark.functions.parse import parse_documents
    from redo_log_parser_spark.operators.rowid import uniquify_row_ids
    from redo_log_parser_spark.streaming.stateful import streaming_incarnations

    records, _ = fuzz_records(seed=7)
    pdf = records_to_documents(records)
    batch = uniquify_row_ids(parse_documents(spark.createDataFrame(pdf)))
    want = {r["url"]: r["row_id"]
            for r in batch.select("url", "row_id").collect()}
    assert any("#" in v for v in want.values()), \
        "seed must exercise incarnation restarts"

    # four chronological slices, one parquet file each, ascending mtime
    # so the file source's modification-time ordering replays the log
    src = str(tmp_path / "slices")
    os.makedirs(src)
    n = len(pdf)
    now = time.time()
    for i in range(4):
        part = pdf.iloc[i * n // 4:(i + 1) * n // 4]
        f = os.path.join(src, f"slice_{i}.parquet")
        part.to_parquet(f, coerce_timestamps="us",
                        allow_truncated_timestamps=True)
        os.utime(f, (now - 400 + i * 100, now - 400 + i * 100))

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_incarnations(
        parse_stream(docs).filter(F.col("parse_error").isNull()))
    sink = str(tmp_path / "isink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ickpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert len(q.recentProgress) >= 4, "expected one micro-batch per slice"
    got = {r["url"]: r["row_id"] for r in spark.read.parquet(sink).collect()}
    assert got == want


def test_streaming_exact_dedup(spark, mini_docs, tmp_path):
    """Duplicated content within the watermark horizon is emitted once;
    the survivor set matches the batch exact_dedup fingerprint set."""
    import pandas as pd
    from pyspark.sql import functions as F
    from redo_log_parser_spark.streaming.stream import (
        stream_documents, streaming_exact_dedup)
    from redo_log_parser_spark.functions.text import doc_fingerprint

    pdf = mini_docs.toPandas()
    dup = pdf.head(40).copy()
    dup["url"] = dup["url"] + "#recrawl"   # same text, different url
    src = str(tmp_path / "dsrc")
    spark.createDataFrame(pd.concat([pdf, dup])).write.mode("overwrite").parquet(src)

    out = streaming_exact_dedup(stream_documents(spark, src))
    sink = str(tmp_path / "dsink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(sink)
    n_fp_batch = (
        mini_docs.select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct().count()
    )
    assert got.count() == n_fp_batch            # one survivor per fingerprint
    assert got.select("fingerprint").distinct().count() == n_fp_batch


def test_streaming_lsh_near_dedup(spark, tmp_path):
    """Near-dup docs arriving in later micro-batches are dropped when any
    LSH band collides with an earlier arrival; distinct docs and
    sub-n-token docs survive. Expectation = greedy-by-slice replay over
    the batch band keys (same banded_keys expression the stream uses)."""
    import pandas as pd
    from redo_log_parser_spark.operators.dedup import (
        banded_keys, with_minhash_sig)
    from redo_log_parser_spark.streaming.stream import (
        lsh_survivors, stream_documents, streaming_lsh_near_dedup)

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls on the quiet grey town and nobody watches the road")
    slices = [
        [("u0", base),
         ("u1", "completely different words about spark shuffles and "
                "partitions flowing through executors at night")],
        [("u2", base),                           # exact text of u0 -> drop
         ("u3", base.replace("road", "street")),  # near dup of u0 -> drop
         ("u4", "tiny doc")],                     # sub-n-token -> keep
        [("u5", "a third corpus of entirely unrelated tokens speaking "
                "of harvest moons and copper kettles boiling slowly")],
    ]
    src, sink = str(tmp_path / "lsrc"), str(tmp_path / "lsink")
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    all_rows = []
    for i, sl in enumerate(slices):
        rows = [(u, t0 + pd.Timedelta(minutes=i), None, t, "en")
                for u, t in sl]
        all_rows.extend(rows)
        pdf = pd.DataFrame(
            rows, columns=["url", "warc_ts", "html", "text", "lang"])
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "append").parquet(src)

    docs = spark.readStream.schema(
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string").option("maxFilesPerTrigger", "1").parquet(src)
    out = streaming_lsh_near_dedup(docs, num_hashes=16, bands=4)
    kept = []
    q = (
        out.writeStream.foreachBatch(
            lambda b, _i: kept.extend(
                r["url"] for r in lsh_survivors(b).collect()))
        .option("checkpointLocation", str(tmp_path / "lckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # greedy replay: doc dropped iff any band key seen in an earlier doc
    # (slice order == arrival order here)
    bdf = spark.createDataFrame(pd.DataFrame(
        all_rows, columns=["url", "warc_ts", "html", "text", "lang"]))
    keys = {
        r["url"]: set()
        for r in bdf.collect()
    }
    for r in banded_keys(with_minhash_sig(bdf, num_hashes=16), 4,
                         keep_cols=("url",)).collect():
        keys[r["url"]].add((r["band"], r["bucket"]))
    seen, want = set(), set()
    for u, _t in [x for sl in slices for x in sl]:
        k = keys[u]
        if not k:                    # sentinel path: always kept
            want.add(u)
        elif not (k & seen):
            want.add(u)
            seen |= k
        else:
            seen |= k                # dropped doc's fresh keys enter state
    assert "u0" in want and "u2" not in want
    assert sorted(kept) == sorted(want)


def test_streaming_lsh_near_dedup_on_documents_corpus(spark, tmp_path):
    """Corpus-scale pin on the driver's documents table (sf0.001, 500
    docs, 43 involved in real band collisions at 16 hashes / 4 bands):
    stream survivors == greedy-by-arrival replay over the batch band
    keys. Docs are layered so no two colliding docs share a micro-batch
    (the documented same-trigger caveat), making the replay oracle
    exact."""
    import pandas as pd
    from redo_log_parser_spark.operators.dedup import (
        banded_keys, with_minhash_sig)
    from redo_log_parser_spark.streaming.stream import (
        lsh_survivors, streaming_lsh_near_dedup)

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    keys = {}
    for r in banded_keys(with_minhash_sig(d, 16), 4,
                         keep_cols=("doc_id",)).collect():
        keys.setdefault(r["doc_id"], set()).add((r["band"], r["bucket"]))
    all_ids = [r["doc_id"] for r in d.select("doc_id").collect()]

    # layer assignment: a doc goes one layer after the last earlier doc
    # it collides with, so every micro-batch is internally collision-free
    layer, key_last_layer = {}, {}
    for did in sorted(all_ids):
        k = keys.get(did, set())
        lay = max((key_last_layer.get(x, -1) for x in k), default=-1) + 1
        layer[did] = lay
        for x in k:
            key_last_layer[x] = lay
    n_layers = max(layer.values()) + 1
    assert n_layers >= 2          # the corpus really has collisions

    pdf = d.toPandas()
    t0 = pd.Timestamp("2024-01-01")
    pdf["warc_ts"] = pdf["doc_id"].map(
        lambda i: t0 + pd.Timedelta(minutes=layer[i]))
    pdf["url"] = pdf["doc_id"].map(lambda i: f"d{i}")
    src = str(tmp_path / "csrc")
    for lay in range(n_layers):
        sl = pdf[pdf["doc_id"].map(layer) == lay]
        spark.createDataFrame(
            sl[["url", "warc_ts", "text", "doc_id"]]
        ).coalesce(1).write.mode("append").parquet(src)

    docs = spark.readStream.schema(
        "url string, warc_ts timestamp, text string, doc_id long"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    out = streaming_lsh_near_dedup(docs, num_hashes=16, bands=4)
    kept = []
    q = (
        out.writeStream.foreachBatch(
            lambda b, _i: kept.extend(
                r["url"] for r in lsh_survivors(b).collect()))
        .option("checkpointLocation", str(tmp_path / "cckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    seen, want = set(), set()
    for lay in range(n_layers):
        for did in sorted(i for i in all_ids if layer[i] == lay):
            k = keys.get(did, set())
            if not k or not (k & seen):
                want.add(f"d{did}")
            seen |= k
    assert len(want) < len(all_ids)     # something was actually dropped
    assert sorted(kept) == sorted(want)


def test_streaming_lsh_same_trigger_family_keeps_one(spark, tmp_path):
    """The round-3 group-loss fix: a whole near-dup family arriving in
    ONE trigger keeps exactly one member (smallest (ts, id)), instead of
    splitting its band keys and losing every member. A family whose
    keys collide with an EARLIER trigger's state keeps zero new members
    (the survivor already exists), and an unrelated singleton in the
    same burst is untouched. Expectation = per-trigger replica of the
    election: union-find over within-batch shared keys, component
    dropped if any member touches prior state, else min-(ts, id) kept."""
    import pandas as pd
    from redo_log_parser_spark.operators.dedup import (
        banded_keys, with_minhash_sig)
    from redo_log_parser_spark.streaming.stream import (
        lsh_survivors, streaming_lsh_near_dedup)

    orig = ("an original essay about rivers bridges and the slow erosion "
            "of limestone under patient water across long centuries of "
            "rain carving terraces through the valley floor while "
            "shepherds moved their flocks between the high summer "
            "pastures and the sheltered winter folds following paths "
            "their grandparents had walked")
    fam = ("a template page listing prices hours directions parking "
           "notes seasonal menus daily specials contact forms newsletter "
           "signups cookie banners privacy policies and the same "
           "boilerplate footer repeated across dozens of mirror sites "
           "with identical markup identical headings identical "
           "navigation and identical legal text")
    slices = [
        [("orig", orig)],
        [("fam_c", fam.replace("footer", "banner")),   # family, one trigger
         ("fam_a", fam),
         ("fam_b", fam.replace("parking", "garage")),
         ("solo", "entirely unrelated prose concerning orchards "
                  "beekeeping and the late frost that ruined the plum "
                  "blossoms in early april"),
         ("redo_1", orig.replace("rain", "storms")),   # collide with state
         ("redo_2", orig.replace("valley", "canyon"))],
    ]
    src = str(tmp_path / "fsrc")
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    all_rows = []
    for i, sl in enumerate(slices):
        rows = [(u, t0 + pd.Timedelta(minutes=i), t) for u, t in sl]
        all_rows.extend(rows)
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
        ).coalesce(1).write.mode("append").parquet(src)

    bdf = spark.createDataFrame(
        pd.DataFrame(all_rows, columns=["url", "warc_ts", "text"]))
    keys = {r["url"]: set() for r in bdf.collect()}
    for r in banded_keys(with_minhash_sig(bdf, num_hashes=16), 4,
                         keep_cols=("url",)).collect():
        keys[r["url"]].add((r["band"], r["bucket"]))
    # the fixture must actually exercise both rules
    assert keys["fam_a"] & keys["fam_b"] and keys["fam_a"] & keys["fam_c"]
    assert keys["redo_1"] & keys["orig"] and keys["redo_2"] & keys["orig"]
    assert not (keys["fam_a"] | keys["solo"]) & keys["orig"]
    assert not keys["fam_a"] & keys["solo"]

    # replica election, trigger by trigger
    seen, want = set(), set()
    for sl in slices:
        urls = [u for u, _t in sl]
        parent = {u: u for u in urls}

        def find(u):
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u

        for i, u in enumerate(urls):
            for v in urls[i + 1:]:
                if keys[u] & keys[v]:
                    parent[find(u)] = find(v)
        comps = {}
        for u in urls:
            comps.setdefault(find(u), []).append(u)
        for members in comps.values():
            if any(keys[u] & seen for u in members):
                continue                       # family seen earlier: no new
            want.add(min(members))             # same ts -> min url
        for u in urls:
            seen |= keys[u]

    docs = spark.readStream.schema(
        "url string, warc_ts timestamp, text string"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    out = streaming_lsh_near_dedup(docs, num_hashes=16, bands=4)
    kept = []
    q = (
        out.writeStream.foreachBatch(
            lambda b, _i: kept.extend(
                r["url"] for r in lsh_survivors(b).collect()))
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert want == {"orig", "fam_a", "solo"}   # pin the concrete outcome
    assert sorted(kept) == sorted(want)


def test_lsh_survivors_chain_component_in_one_batch(spark):
    """Unit-level election check on a hand-built post-dedup batch:
    A{K1}, B{K1,K2}, C{K2} form ONE chain component (A and C share no
    key) -> exactly one survivor, the min id. If K1 was swallowed by
    earlier-batch state (its row absent from the batch), the whole
    chain is dropped -> zero survivors."""
    import pandas as pd
    from redo_log_parser_spark.streaming.stream import lsh_survivors

    t = pd.Timestamp("2024-01-01")
    K1, K2 = (0, 111), (1, 222)

    def batch(kept_keys, manifests):
        rows = []
        for band, bucket in kept_keys:
            rows.append(("owner", t, band, bucket, None))
        for i, (u, ks) in enumerate(manifests.items()):
            rows.append((u, t, -1, 10_000 + i, ks))
        pdf = pd.DataFrame(
            rows, columns=["url", "warc_ts", "band", "bucket", "keys"])
        return spark.createDataFrame(
            pdf, "url string, warc_ts timestamp, band int, bucket long, "
                 "keys array<struct<band:int,bucket:bigint>>")

    manifests = {"a": [K1], "b": [K1, K2], "c": [K2]}
    got = lsh_survivors(batch([K1, K2], manifests)).collect()
    assert [(r["url"]) for r in got] == ["a"]

    got = lsh_survivors(batch([K2], manifests)).collect()  # K1 in state
    assert got == []


def test_streaming_lsh_same_url_two_versions_one_batch(spark, tmp_path):
    """Doc identity is (url, warc_ts): two non-colliding versions of one
    url inside a single trigger are judged independently (merging their
    band counts would wrongly drop both), and a tiny re-crawl at a new
    ts is always kept (the sentinel is unique per arrival, not an
    exact-dedup-by-url)."""
    import pandas as pd
    import pytest
    from redo_log_parser_spark.streaming.stream import (
        lsh_survivors, streaming_lsh_near_dedup)

    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("u0", t0, "alpha beta gamma delta epsilon zeta eta theta "
                   "iota kappa lambda mu"),
        ("u0", t0 + pd.Timedelta(seconds=30),
         "one two three four five six seven eight nine ten eleven"),
        ("tiny", t0, "so small"),
        ("tiny", t0 + pd.Timedelta(seconds=30), "also wee"),
    ]
    src = str(tmp_path / "vsrc")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    ).coalesce(1).write.parquet(src)

    docs = spark.readStream.schema(
        "url string, warc_ts timestamp, text string").parquet(src)
    out = streaming_lsh_near_dedup(docs, num_hashes=16, bands=4)
    kept = []
    q = (
        out.writeStream.foreachBatch(
            lambda b, _i: kept.extend(
                (r["url"], str(r["warc_ts"])) for r in lsh_survivors(b).collect()))
        .option("checkpointLocation", str(tmp_path / "vckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(kept) == 4 and len({u for u, _ in kept}) == 2

    # invalid banding fails fast instead of silently colliding everything
    with pytest.raises(ValueError, match="multiple of"):
        streaming_lsh_near_dedup(docs, num_hashes=8, bands=16)


def test_parse_stream_sql_parser_matches_pandas(spark, mini_docs, tmp_path):
    """parse_stream(parser='sql') binds the pure-expression parser to a
    streaming frame; over the mini-log both streaming parsers must land
    identical frames (same contract as the batch parity tests — the
    expression parser is projection-only, so streaming changes nothing
    about its plan)."""
    src = str(tmp_path / "src_sqlp")
    mini_docs.write.mode("overwrite").parquet(src)

    def run(parser, name):
        q = (
            parse_stream(stream_documents(spark, src), parser=parser)
            .writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.sql(f"select * from {name}")

    a = run("pandas", "ps_pandas")
    b = run("sql", "ps_sql")
    assert a.columns == b.columns
    norm = lambda df: df.select(  # noqa: E731
        *[c for c in a.columns if c != "parse_error"],
        F.col("parse_error").isNotNull().alias("is_reject"),
    )
    a, b = norm(a), norm(b)
    diff = a.exceptAll(b).unionAll(b.exceptAll(a))
    assert diff.count() == 0


def test_streaming_explode_log_records_matches_batch(spark, tmp_path):
    """explode_log_records is projection+explode only, so it binds to a
    readStream unchanged (same contract as parse_stream): packed
    multi-statement text cells exploded + parsed in a stream must equal
    the batch result exactly."""
    from fuzzgen import fuzz_records, records_to_packed_documents
    from redo_log_parser_spark.functions.parse import parse_documents
    from redo_log_parser_spark.sources.logfile import explode_log_records

    records, _ = fuzz_records(seed=31)
    pdf = records_to_packed_documents(records, seed=31)
    src = str(tmp_path / "packed")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    cols = ["url", "op", "table_id", "row_id", "ts", "statement",
            "parse_error"]
    batch = parse_documents(explode_log_records(spark.createDataFrame(pdf)))
    want = sorted(
        tuple(r) for r in batch.select(*cols).fillna("", subset=["parse_error"]).collect()
    )

    events = parse_stream(
        explode_log_records(stream_documents(spark, src)))
    q = (
        events.select(*cols).writeStream.outputMode("append")
        .format("memory").queryName("explode_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql(
            "select * from explode_stream"
        ).fillna("", subset=["parse_error"]).collect()
    )
    assert len(got) == len(records) and got == want
