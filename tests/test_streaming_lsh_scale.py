"""Corpus-scale streaming near-dedup election (round-4 VERDICT item 3).

Promotes the round-4 one-off runtime validations into the suite: 1,200
documents in three micro-batches, with forced multi-member families
arriving inside ONE trigger (exact duplicates — guaranteed band
collisions) so `lsh_survivors`' within-trigger connected-components
election genuinely runs at scale, plus families straddling triggers so
the prior-state drop rule runs too. The oracle is a pure-Python replica
over the ACTUAL batch band keys: per trigger, union-find over shared
keys; a component touching earlier-trigger state keeps zero members,
otherwise min-(ts, id) survives.
"""

import random

import pandas as pd
import pytest

from redo_log_parser_spark.operators.dedup import banded_keys, with_minhash_sig
from redo_log_parser_spark.streaming.stream import (
    lsh_survivors,
    streaming_lsh_near_dedup,
)

VOCAB = [
    "river", "bridge", "stone", "orchard", "harvest", "lantern", "meadow",
    "granite", "thistle", "copper", "sparrow", "harbor", "cinder", "willow",
    "furrow", "quarry", "saddle", "ember", "frost", "gable", "mortar",
    "spindle", "tether", "waggon", "yarrow", "zephyr", "anvil", "bellows",
]

N_TRIGGERS = 3


def _corpus():
    """(url, trigger, text) rows: ~420 families, sizes 1-4; family 0
    (size 3, exact dups) forced wholly into trigger 2; family 1 (size 3,
    exact dups) split trigger 0 / trigger 2 / trigger 2 — one prior-
    state drop with a within-trigger pair. Exact duplicates share every
    band key by construction; worded variants collide probabilistically
    and the oracle follows whatever the keys say."""
    rng = random.Random(20250818)
    rows = []
    fam_id = 0

    def base_text():
        return " ".join(rng.choice(VOCAB) for _ in range(30))

    # forced families (exact dups -> guaranteed collisions)
    t = base_text()
    rows += [(f"f{fam_id}m{j}", 2, t) for j in range(3)]
    fam_id += 1
    t = base_text()
    rows += [(f"f{fam_id}m0", 0, t), (f"f{fam_id}m1", 2, t),
             (f"f{fam_id}m2", 2, t)]
    fam_id += 1
    # bulk: random families
    while len(rows) < 1200:
        size = rng.choice([1, 1, 1, 2, 2, 3, 4])
        words = base_text().split()
        for j in range(size):
            w = list(words)
            if j:  # near-dup: one word swapped
                w[rng.randrange(len(w))] = rng.choice(VOCAB)
            rows.append((f"f{fam_id}m{j}", rng.randrange(N_TRIGGERS),
                         " ".join(w)))
        fam_id += 1
    return rows


@pytest.mark.slow
def test_streaming_lsh_election_at_1200_docs(spark, tmp_path):
    rows = _corpus()
    assert len(rows) >= 1200
    t0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(rows, columns=["url", "trigger", "text"])
    pdf["warc_ts"] = pdf["trigger"].map(lambda i: t0 + pd.Timedelta(minutes=i))

    # batch band keys = the ground truth the oracle is defined over
    bdf = spark.createDataFrame(pdf[["url", "warc_ts", "text"]])
    keys = {u: set() for u in pdf["url"]}
    for r in banded_keys(with_minhash_sig(bdf, num_hashes=16), 4,
                         keep_cols=("url",)).collect():
        keys[r["url"]].add((r["band"], r["bucket"]))

    # replica election, trigger by trigger
    seen, want = set(), set()
    multi_member_seen = prior_state_drop_seen = 0
    for trig in range(N_TRIGGERS):
        urls = sorted(pdf[pdf["trigger"] == trig]["url"])
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
            if len(members) > 1:
                multi_member_seen += 1
            if any(keys[u] & seen for u in members):
                prior_state_drop_seen += 1
                continue
            want.add(min(members))  # same ts within a trigger -> min url
        for u in urls:
            seen |= keys[u]
    # the fixture exercises both election rules, at scale
    assert multi_member_seen >= 2 and prior_state_drop_seen >= 1
    assert len(want) < len(rows)

    src = str(tmp_path / "scale_src")
    for trig in range(N_TRIGGERS):
        sl = pdf[pdf["trigger"] == trig]
        spark.createDataFrame(
            sl[["url", "warc_ts", "text"]]
        ).coalesce(1).write.mode("append").parquet(src)

    docs = spark.readStream.schema(
        "url string, warc_ts timestamp, text string"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    out = streaming_lsh_near_dedup(docs, num_hashes=16, bands=4)
    kept = []
    q = (
        out.writeStream.foreachBatch(
            lambda b, _i: kept.extend(
                r["url"] for r in lsh_survivors(b).collect()))
        .option("checkpointLocation", str(tmp_path / "scale_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    assert sorted(kept) == sorted(want)
    # forced family 0: all three in trigger 2, exactly one survives
    assert len({u for u in kept if u.startswith("f0m")}) == 1
    # forced family 1: trigger-0 member survives, trigger-2 pair drops
    assert {u for u in kept if u.startswith("f1m")} == {"f1m0"}
