"""Edge-case unit tests for the training-data function modules,
against pure-Python references (independent of the DuckDB oracles).
"""

import hashlib

import pyspark.sql.functions as F
import pytest

from mimeograph_spark.functions.dedup import (
    MINHASH_PRIME,
    lsh_candidate_pairs,
    minhash_params,
    simhash_near_dups,
    with_minhash,
)
from mimeograph_spark.functions.multimodal import (
    decode_metadata,
    frame_sample,
    media_blob,
    with_media_blob,
)
from mimeograph_spark.functions.similarity import brute_force_topk
from mimeograph_spark.functions.textstats import with_textstats


def _py_shingles(text, n=3):
    import re
    toks = re.sub(r"\s+", " ", text.lower().strip()).split(" ")
    if len(toks) >= n:
        out = []
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            if g not in out:
                out.append(g)
        return out
    return [" ".join(toks)]


def _py_minhash(text, k):
    sh = _py_shingles(text)
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh]
    return [
        min((h * a + b) % MINHASH_PRIME for h in hs)
        for a, b in minhash_params(k)
    ]


def test_minhash_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one two",
        "single",
        "a a a a a",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: list(r["minhash"]) for r in with_minhash(df, k=6).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_minhash(t, 6), t


def test_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    near = base.replace("lazy", "sleepy")
    far = "completely different words entirely unrelated to anything here"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_candidate_pairs(df, k=16, bands=8).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)] > 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_lsh_identical_cluster_is_linear(spark):
    """1k identical docs must produce m-1 member->canonical links (all
    jaccard 1.0), never the O(m^2) pair set — the duplicate-heavy-crawl
    case the bucket-capped, exact-collapsed design exists for."""
    rows = [(i, "same exact text repeated everywhere") for i in range(1000)]
    rows.append((5000, "a totally different document about other things"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = lsh_candidate_pairs(df, k=16, bands=4).collect()
    assert len(pairs) == 999
    assert all(p["id_a"] == 0 and p["jaccard"] == 1.0 for p in pairs)
    assert {p["id_b"] for p in pairs} == set(range(1, 1000))


def test_lsh_bucket_cap_drops_megabuckets(spark):
    """With max_bucket=1 every band bucket with >=2 reps is dropped, so
    only the exact member->canonical links survive."""
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    near = base.replace("lazy", "sleepy")
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, base)], "doc_id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_candidate_pairs(df, k=16, bands=8, max_bucket=1).collect()
    }
    assert pairs == {(1, 3): 1.0}  # exact link kept, banded pair capped away


def _py_simhash(text, bits=32):
    import re
    toks = re.sub(r"\s+", " ", text.lower().strip()).split(" ")
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
    out = 0
    for b in range(bits):
        vote = sum(1 if h & (1 << b) else -1 for h in hs)
        if vote > 0:
            out |= 1 << b
    return out


def test_simhash_blocking_recall_matches_bruteforce(spark):
    """Multi-table blocking must find EVERY pair within max_hamming
    (pigeonhole guarantee), verified against all-pairs hamming."""
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",  # 1-token change
        "alpha beta gamma delta epsilon zeta nu iota",
        "completely different words unrelated to the others entirely",
        "completely different words unrelated to the others entirelx",
        "mid range document with some shared alpha beta words here",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(df, max_hamming=3).collect()
    }
    sigs = {i: _py_simhash(t) for i, t in rows}
    want = {
        (i, j): bin(sigs[i] ^ sigs[j]).count("1")
        for i in sigs
        for j in sigs
        if i < j and bin(sigs[i] ^ sigs[j]).count("1") <= 3
    }
    assert got == want


def test_simhash_near_dups_on_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "zzz yyy xxx www vvv uuu")],
        "doc_id long, text string",
    )
    pairs = simhash_near_dups(df, max_hamming=0).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 2)}


def test_brute_force_topk_self_is_rank1(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = {
        r["query_id"]: (r["vec_id"], r["cosine"])
        for r in brute_force_topk(emb, queries, k=1).collect()
    }
    for qid, (vid, cos) in top1.items():
        assert vid == qid
        assert cos == pytest.approx(1.0, abs=1e-5)


def test_textstats_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the the the the the the"),
         (4, "der die und das der die")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in with_textstats(df).collect()}
    assert got[1]["n_tokens"] == 0 and got[2]["n_tokens"] == 0
    assert got[3]["lang_pred"] == "en"
    assert got[4]["lang_pred"] == "de"
    assert got[3]["stopword_ratio"] == 1.0


def test_media_blob_roundtrip(spark):
    refs = spark.createDataFrame([("x:1",), ("x:2",)], "media_ref string")
    meta = {
        r["media_ref"]: r.asDict()
        for r in decode_metadata(with_media_blob(refs)).collect()
    }
    raw = media_blob("x:1")
    assert meta["x:1"]["valid"] is True
    assert meta["x:1"]["payload_bytes"] == len(raw) - 9
    assert meta["x:1"]["width"] == int.from_bytes(raw[4:6], "big")
    assert meta["x:1"]["height"] == int.from_bytes(raw[6:8], "big")


def test_frame_sample_short_payload_emits_no_rows(spark):
    """A payload shorter than one frame must yield zero frames — not a
    phantom frame_no=0 over a partial slice."""
    full = media_blob("v:full")          # 256-byte stream -> 16 frames
    short = full[:9 + 7]                 # header + 7 bytes < frame_bytes
    df = spark.createDataFrame(
        [("v:full", bytearray(full)), ("v:short", bytearray(short))],
        "media_ref string, media_blob binary",
    )
    got = frame_sample(df, every_n=4).groupBy("media_ref").count().collect()
    counts = {r["media_ref"]: r["count"] for r in got}
    assert counts == {"v:full": 4}  # frames 0,4,8,12; v:short absent


def test_frame_sig_matches_python(spark):
    """frame_sig = md5(hex(frame)); with 16-byte frames each frame is
    stream block k, so the sig is md5(md5('ref:k'))."""
    df = spark.createDataFrame([("v:9",)], "media_ref string")
    got = {
        r["frame_no"]: r["frame_sig"]
        for r in frame_sample(with_media_blob(df), every_n=4).collect()
    }
    for k in (0, 4, 8, 12):
        inner = hashlib.md5(f"v:9:{k}".encode()).hexdigest()
        assert got[k] == hashlib.md5(inner.encode()).hexdigest()


def test_approx_count_distinct_within_tolerance(spark):
    """The documented 100 TB swap-in for exact COUNT(DISTINCT): HLL++
    must land within its configured relative error on the events data.
    (Not a driver query: HLL sketches aren't replayable in DuckDB.)"""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(0.05 * row["exact"], 1)


def test_cap_drops_are_reported_and_pair_output_stays_linear(spark):
    """Degenerate corpus (5k identical docs): every block blows past
    max_block, so the operator must (a) report the drop through its
    cap-stats side output — never silently — and (b) keep the pair
    output linear instead of emitting the 12.5M-pair clique."""
    from mimeograph_spark.cacheutil import cap_stats, unpersist_deps
    from mimeograph_spark.functions.dedup import simhash_near_dups

    docs = spark.range(5000).selectExpr(
        "id AS doc_id", "'all documents share this text' AS text"
    )
    pairs = simhash_near_dups(docs, max_block=256)
    stats = cap_stats(pairs).collect()[0]
    assert stats["operator"] == "simhash_near_dups"
    assert stats["dropped_buckets"] == 4  # all 4 blocks of the clique
    assert stats["dropped_rows"] == 20000  # 5000 docs x 4 blocks
    assert pairs.count() == 0  # clique suppressed, not exploded
    unpersist_deps(pairs)


def test_resolve_clusters_chain_collapses_to_one_canonical(spark):
    """A-B and B-C (never a direct A-C pair) must land in ONE cluster
    with canonical A; a long chain exercises multiple propagation
    rounds (pointer jumping converges in O(log diameter))."""
    from mimeograph_spark.functions.dedup import resolve_clusters

    chain = [(i, i + 1) for i in range(1, 9)]  # 1-2-...-9, diameter 8
    pairs = spark.createDataFrame(
        chain + [(20, 21), (30, 30)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_clusters(pairs).collect()
    }
    assert got == (
        {i: 1 for i in range(1, 10)} | {20: 20, 21: 20, 30: 30}
    )


def test_resolve_clusters_empty_pairs(spark):
    from mimeograph_spark.functions.dedup import resolve_clusters

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert resolve_clusters(pairs).count() == 0


def test_asof_join_edge_semantics(spark):
    """Equal timestamps match (<=), earlier-only semantics otherwise,
    and a left row with no at-or-before right row gets NULLs."""
    from datetime import datetime

    from mimeograph_spark.operators.asof import asof_join

    L = spark.createDataFrame(
        [(1, 100, datetime(2024, 1, 1, 10, 0)),   # equal-time match -> r2
         (2, 100, datetime(2024, 1, 1, 9, 30)),   # between r1 and r2 -> r1
         (3, 100, datetime(2024, 1, 1, 8, 0)),    # before all -> NULL
         (4, 200, datetime(2024, 1, 1, 12, 0))],  # group with no rights
        "event_id long, user_id long, ts timestamp",
    )
    R = spark.createDataFrame(
        [(11, 100, datetime(2024, 1, 1, 9, 0)),
         (12, 100, datetime(2024, 1, 1, 10, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(
            L, R, time_col="ts", by=["user_id"], value_cols=["event_id"]
        ).collect()
    }
    assert got == {1: 12, 2: 11, 3: None, 4: None}


def test_asof_join_null_value_field_not_inherited(spark):
    """All output columns come from the SAME matched right row: a
    matched row with a NULL value column yields NULL — it must not
    inherit that field from an older right row (single-struct fill)."""
    from datetime import datetime

    from mimeograph_spark.operators.asof import asof_join

    L = spark.createDataFrame(
        [(1, 100, datetime(2024, 1, 1, 11, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    R = spark.createDataFrame(
        [(11, "old-label", 100, datetime(2024, 1, 1, 9, 0)),
         (12, None, 100, datetime(2024, 1, 1, 10, 0))],
        "event_id long, label string, user_id long, ts timestamp",
    )
    row = asof_join(
        L, R, time_col="ts", by=["user_id"],
        value_cols=["event_id", "label"],
    ).collect()[0]
    assert row["asof_event_id"] == 12
    assert row["asof_label"] is None  # not "old-label"


def test_asof_join_bucketed_matches_plain_on_skewed_keys(spark):
    """The time-bucketed two-phase form (hard per-task bound for hot
    `by` keys) must return exactly the plain single-window result on a
    skew fixture: one bot user with 20k events next to 50 normal
    users."""
    from mimeograph_spark.operators.asof import asof_join

    hot_r = spark.range(20000).selectExpr(
        "id AS event_id", "CAST(0 AS LONG) AS user_id",
        "timestamp_seconds(1700000000 + id * 7) AS ts",
    )
    norm_r = spark.range(2000).selectExpr(
        "100000 + id AS event_id", "1 + id % 50 AS user_id",
        "timestamp_seconds(1700000000 + id * 61) AS ts",
    )
    R = hot_r.unionByName(norm_r)
    L = spark.range(3000).selectExpr(
        "500000 + id AS event_id", "id % 51 AS user_id",
        "timestamp_seconds(1700000000 + id * 43) AS ts",
    )
    kw = dict(time_col="ts", by=["user_id"], value_cols=["event_id", "ts"])
    plain = asof_join(L, R, **kw).collect()
    bucketed = asof_join(L, R, time_bucket="6 hours", **kw).collect()
    key = lambda r: r["event_id"]
    assert sorted(bucketed, key=key) == sorted(plain, key=key)


def test_html_boilerplate_stripped_content_kept(spark):
    """Nav, ad and footer blocks (short and/or link-dense) must be
    discarded, article prose kept, and every discarded visible char
    accounted in boilerplate_chars."""
    from mimeograph_spark.functions.html_extract import (
        extract_main_content,
        synth_html,
    )

    prose = ("the quick brown fox jumps over the lazy dog and keeps "
             "running through the long field of data")
    df = spark.createDataFrame([(7, prose)], "doc_id long, text string")
    row = df.select(
        extract_main_content(
            synth_html(F.col("doc_id"), F.col("text"))
        ).alias("r")
    ).select("r.*").collect()[0]
    assert row["main_text"].startswith(prose)
    assert "Home" not in row["main_text"]          # nav dropped
    assert "cheap deals" not in row["main_text"]   # ad dropped
    assert "Privacy" not in row["main_text"]       # footer dropped
    assert "tracker" not in row["main_text"]       # script removed
    assert row["n_blocks_kept"] == 2               # article p1 + tail
    assert row["boilerplate_chars"] > 0


def test_split_assignment_stable_across_partitioning(spark):
    """Hash-based split membership must be identical under any
    repartitioning (the property seeded-RNG sample() lacks), and the
    split fractions must land near the requested weights."""
    from mimeograph_spark.functions.sampling import with_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        r["doc_id"]: r["split"]
        for r in with_split(docs).select("doc_id", "split").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in with_split(docs.repartition(17))
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9
    assert set(a.values()) == {"train", "val", "test"}


def test_decontaminate_flags_planted_overlap(spark):
    """A train doc embedding a verbatim eval passage must be flagged
    with the right distinct-5-gram match count; clean docs must not."""
    from mimeograph_spark.functions.dedup import decontaminate

    passage = "the secret benchmark question about spark internals"
    ev = spark.createDataFrame(
        [(100, passage)], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, "prefix words here " + passage + " and a suffix"),
         (2, "totally unrelated content with no overlap at all whatsoever")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_matched_ngrams"]
        for r in decontaminate(train, ev, n=5).collect()
    }
    # passage has 7 words -> 3 distinct 5-grams, all present in doc 1
    assert got == {1: 3}


def test_pack_sequences_layout_invariants(spark):
    """The packed layout must be a dense token stream per shard:
    each doc begins exactly where the previous one (plus separator)
    ended, offsets never reach the budget, span counts match the
    arithmetic, and the layout is identical under any repartitioning
    (pure function of ids + token counts)."""
    from mimeograph_spark.functions.packing import (
        pack_sequences,
        sequence_manifest,
    )

    budget, sep = 128, 1
    docs = spark.createDataFrame(
        [(i, (i * 37) % 300 + 1) for i in range(200)],
        "doc_id long, n_tokens long",
    )
    packed = pack_sequences(
        docs, budget=budget, n_shards=4, sep_tokens=sep
    ).collect()
    by_shard = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["doc_id"])):
        cum = by_shard.get(r["shard"], 0)
        assert r["seq_id"] == cum // budget
        assert r["begin_offset"] == cum % budget
        assert 0 <= r["begin_offset"] < budget
        end = cum + r["n_tokens"] + sep - 1
        assert r["n_seqs"] == end // budget - cum // budget + 1
        by_shard[r["shard"]] = cum + r["n_tokens"] + sep
    assert len(by_shard) == 4

    again = pack_sequences(
        docs.repartition(13), budget=budget, n_shards=4, sep_tokens=sep
    ).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(again) == key(packed)

    man = sequence_manifest(
        pack_sequences(docs, budget=budget, n_shards=4, sep_tokens=sep),
        budget=budget,
    ).collect()
    assert sum(r["n_docs_started"] for r in man) == 200
    for r in man:
        assert 0 <= r["first_offset"] < budget


def test_repetition_stats_closed_form(spark):
    """Hand-computed repetition signals: a repeated-bigram doc, an
    all-unique doc, and an empty doc."""
    from mimeograph_spark.functions.repetition import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "w x y z"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}

    r1 = rows[1]
    assert r1["n_tokens"] == 6
    assert abs(r1["uniq_token_frac"] - round(2 / 6, 6)) < 1e-9
    # bigrams: [a b, b a, a b, b a, a b] -> top "a b" x3, all duplicated
    assert r1["top_bigram"] == "a b"
    assert r1["top_bigram_count"] == 3
    assert abs(r1["top_bigram_frac"] - 0.6) < 1e-9
    assert r1["dup_bigram_frac"] == 1.0
    # trigrams: [a b a, b a b, a b a, b a b] -> all duplicated
    assert r1["dup_trigram_frac"] == 1.0

    r2 = rows[2]
    assert r2["uniq_token_frac"] == 1.0
    assert r2["dup_bigram_frac"] == 0.0
    assert r2["dup_trigram_frac"] == 0.0
    assert r2["top_bigram_count"] == 1
    assert abs(r2["top_bigram_frac"] - round(1 / 3, 6)) < 1e-9
    # tie on count=1 -> lexicographically greatest bigram wins
    assert r2["top_bigram"] == "y z"

    r3 = rows[3]
    assert r3["n_tokens"] == 0
    assert r3["top_bigram"] == ""
    assert r3["top_bigram_count"] == 0
    assert r3["uniq_token_frac"] == 0.0


def test_global_index_dense_ordered_and_partition_stable(spark):
    """with_global_index must yield exactly 0..n-1 ranked by the key,
    identical under any repartitioning, including skewed/sparse key
    spaces that leave most range buckets empty."""
    from mimeograph_spark.functions.ids import with_global_index

    # sparse + clustered keys: 0..49 and 1_000_000..1_000_049
    keys = list(range(50)) + [1_000_000 + i for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["global_idx"]
        for r in with_global_index(df, "k", n_buckets=16).collect()
    }
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want

    again = {
        r["k"]: r["global_idx"]
        for r in with_global_index(
            df.repartition(7), "k", n_buckets=16
        ).collect()
    }
    assert again == want

    empty = spark.createDataFrame([], "k long")
    assert with_global_index(empty, "k").count() == 0


def test_stratified_sampling_exact_and_threshold(spark):
    """Exact variant keeps exactly min(cap, n_g) per group; threshold
    variant is deterministic across partitionings and lands near the
    cap; both keep subsets of the input."""
    from mimeograph_spark.functions.sampling import (
        stratified_sample,
        stratified_sample_exact,
    )

    rows = [(i, "big" if i < 400 else "small") for i in range(430)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    exact = stratified_sample_exact(df, "lang", cap=100)
    by_g = {
        r["lang"]: r["n"]
        for r in exact.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_g == {"big": 100, "small": 30}

    thr = stratified_sample(df, "lang", cap=100)
    kept = sorted(r["doc_id"] for r in thr.collect())
    again = sorted(
        r["doc_id"]
        for r in stratified_sample(df.repartition(11), "lang", cap=100).collect()
    )
    assert kept == again
    n_big = sum(1 for i in kept if i < 400)
    assert 60 <= n_big <= 140  # ~cap with binomial noise
    assert sum(1 for i in kept if i >= 400) == 30  # threshold 10000: all kept


def test_exact_percentiles_match_numpy(spark):
    """Rank-arithmetic percentiles must equal numpy's linear
    interpolation exactly (same percentile_cont definition), per
    group, including a size-1 group."""
    import numpy as np

    from mimeograph_spark.functions.quantiles import exact_percentiles

    rng = [(int(x), "g1") for x in (5, 1, 9, 3, 7, 2, 8)] + [(42, "g2")]
    df = spark.createDataFrame(rng, "v long, g string")
    got = {r["g"]: r for r in exact_percentiles(df, "v", "g").collect()}
    for g, vals in (("g1", [5, 1, 9, 3, 7, 2, 8]), ("g2", [42])):
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            want = round(float(np.percentile(vals, q * 100)), 6)
            assert abs(got[g][col] - want) < 1e-9, (g, col)
        assert got[g]["n"] == len(vals)


def test_tfidf_top_terms_closed_form(spark):
    """Two tiny docs: the term unique to a doc must outscore the
    shared term, ranks deterministic."""
    import math

    from mimeograph_spark.functions.tfidf import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "shared rare rare"), (2, "shared common")],
        "doc_id long, text string",
    )
    rows = [
        (r["doc_id"], r["term"], r["tf"], r["score"], r["rank"])
        for r in tfidf_top_terms(df, k=2).collect()
    ]
    idf_unique = math.log(3 / 2) + 1  # df=1, N=2
    idf_shared = math.log(3 / 3) + 1  # df=2
    want = [
        (1, "rare", 2, round(2 * idf_unique, 6), 1),
        (1, "shared", 1, round(idf_shared, 6), 2),
        (2, "common", 1, round(idf_unique, 6), 1),
        (2, "shared", 1, round(idf_shared, 6), 2),
    ]
    assert sorted(rows) == sorted(want)


def test_approx_sketches_vs_exact(spark):
    """The approximate aggregates the 100 TB path would actually use
    (HLL count-distinct, t-digest-style percentiles) must land within
    their documented error of the exact baselines this repo computes
    (exact distinct counts; rank-arithmetic percentiles)."""
    from mimeograph_spark.functions.quantiles import exact_percentiles

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    exact = docs.agg(
        F.countDistinct("doc_id").alias("n")
    ).first()["n"]
    approx = docs.agg(
        F.approx_count_distinct("doc_id", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.06  # 3x the 2% rsd

    ex = {
        r["lang"]: r["p90"]
        for r in exact_percentiles(docs, "n_chars", "lang").collect()
    }
    ap = {
        r["lang"]: r["p90"]
        for r in docs.groupBy("lang")
        .agg(F.percentile_approx("n_chars", 0.9, 10000).alias("p90"))
        .collect()
    }
    for lang, want in ex.items():
        # percentile_approx is rank-exact at this accuracy/row count;
        # it returns a data value, the exact form interpolates —
        # allow one value-gap of slack
        assert abs(ap[lang] - want) <= max(10.0, 0.05 * want), lang


def test_scored_extraction_dom_hints(spark):
    """Class/id DOM hints (the arms the synthetic driver page doesn't
    exercise): an ad-classed long block is demoted below threshold, a
    content-classed short block is promoted above it, an unhinted
    block passes on raw length."""
    from mimeograph_spark.functions.html_extract import (
        extract_main_content_scored,
    )

    a = "x" * 50          # 50 - 30 (neg) = 20 < 25 -> dropped
    b = "y" * 10          # 10 + 30 (pos) = 40 >= 25 -> kept
    c = "z" * 30          # 30 >= 25 -> kept
    html = (
        f'<div class="x-ad-y">{a}</div>'
        f'<div class="post">{b}</div>'
        f"<p>{c}</p>"
    )
    df = spark.createDataFrame([(html,)], "h string")
    r = df.select(
        extract_main_content_scored(F.col("h")).alias("r")
    ).first()["r"]
    assert r["main_text"] == f"{b} {c}"
    assert r["n_blocks_kept"] == 2
    assert r["n_blocks_total"] == 3
    assert r["boilerplate_chars"] == 50
    assert r["top_score"] == 40


def test_reading_order_recovers_token_sequence(spark):
    """Round-trip property: scrambled word boxes from the two-column
    and single-column synthetic layouts must reorder back to exactly
    the original token sequence, and column detection must fire only
    on the two-column pages."""
    from mimeograph_spark.operators.layout import (
        reading_order,
        synth_word_boxes,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").filter(F.length(F.trim("text")) > 0)
    boxes = synth_word_boxes(docs).orderBy(F.md5(F.col("word")))  # scramble
    ordered = reading_order(boxes)

    rebuilt = {
        r["doc_id"]: (r["t"], r["c"])
        for r in ordered.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("t"),
            F.max("col").alias("c"),
        )
        .collect()
    }
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rebuilt.keys() == originals.keys()
    for did, (text, maxcol) in rebuilt.items():
        norm = " ".join(originals[did].split())
        assert text == norm, did
        n_words = len(norm.split())
        if did % 2 == 0 and n_words >= 6:
            assert maxcol == 1, (did, maxcol)
        else:
            assert maxcol == 0, (did, maxcol)


def test_cogrouped_asof_lag_edges(spark):
    """Cogroup edge semantics: a user with no views matches nothing,
    a simultaneous view matches with lag 0, and view-only users emit
    no row."""
    from datetime import datetime

    from mimeograph_spark.operators.cogroup import cogrouped_asof_lag

    t = lambda m: datetime(2024, 1, 1, 10, m)
    purchases = spark.createDataFrame(
        [(1, t(5)), (1, t(10)), (2, t(3)), (3, t(1))],
        "user_id long, ts timestamp",
    )
    views = spark.createDataFrame(
        [(1, t(2)), (1, t(10)), (3, t(2)), (9, t(0))],
        "user_id long, ts timestamp",
    )
    rows = {r["user_id"]: r for r in cogrouped_asof_lag(purchases, views).collect()}
    assert set(rows) == {1, 2, 3}
    # user 1: 10:05 -> view 10:02 (180s); 10:10 -> view 10:10 (0s)
    assert rows[1]["n_purchases"] == 2 and rows[1]["n_matched"] == 2
    assert rows[1]["total_lag_us"] == 180_000_000
    # user 2 has no views at all
    assert rows[2]["n_matched"] == 0 and rows[2]["total_lag_us"] == 0
    # user 3's only view is AFTER the purchase
    assert rows[3]["n_matched"] == 0


def test_profile_columns_null_and_empty_edges(spark):
    """Profiling degenerate shapes: an all-null column reports full
    null count with empty min/max/mode, and an empty frame yields an
    empty profile rather than erroring."""
    from mimeograph_spark.functions.profile import profile_columns

    df = spark.createDataFrame(
        [("a", None), ("b", None), (None, None)],
        "s string, dead string",
    )
    rows = {r["col_name"]: r for r in profile_columns(df, ("s", "dead")).collect()}
    assert rows["dead"]["n_rows"] == 3
    assert rows["dead"]["n_nulls"] == 3
    assert rows["dead"]["n_distinct"] == 0
    assert rows["dead"]["min_val"] is None and rows["dead"]["max_val"] is None
    assert rows["dead"]["top_val"] == "" and rows["dead"]["top_count"] == 0
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["top_val"] == "b"  # tie on count -> greatest value

    empty = spark.createDataFrame([], "s string")
    assert profile_columns(empty, ("s",)).count() == 0


def test_weighted_sample_properties(spark):
    """Weighted sampling must be partition-invariant (pure function
    of ids + weights), favor heavy rows (a 100x-weight minority
    dominates the sample), and plan as TakeOrderedAndProject — a
    per-partition top-k merge, never a global sort."""
    from mimeograph_spark.functions.sampling import weighted_sample_topk

    rows = [(i, 10000 if i < 50 else 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    a = [r["doc_id"] for r in weighted_sample_topk(df, "w", k=40).collect()]
    b = [
        r["doc_id"]
        for r in weighted_sample_topk(df.repartition(13), "w", k=40).collect()
    ]
    assert sorted(a) == sorted(b)
    heavy = sum(1 for i in a if i < 50)
    assert heavy >= 25, heavy  # 5% of rows, 100x weight -> dominates

    plan = (
        weighted_sample_topk(df, "w", k=40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_media_blob_column_equals_python_reference(spark):
    """The codegen blob (md5/unhex/hex built-ins) must be
    byte-identical to the Python reference implementation, and NULL
    refs must propagate."""
    from mimeograph_spark.functions.multimodal import (
        media_blob,
        media_blob_col,
    )

    refs = [f"pg:{i}:{j}" for i in range(10) for j in range(5)]
    df = spark.createDataFrame([(r,) for r in refs] + [(None,)], "ref string")
    got = {
        r["ref"]: (bytes(r["b"]) if r["b"] is not None else None)
        for r in df.select("ref", media_blob_col(F.col("ref")).alias("b")).collect()
    }
    for r in refs:
        assert got[r] == media_blob(r), r
    assert got[None] is None


def test_resolve_clusters_raises_on_non_convergence(spark):
    """Exhausting max_iters without a zero-change round must RAISE —
    non-converged labels flowing downstream would silently corrupt
    every keep/drop decision.  A 12-node path graph cannot converge
    in one round (pointer jumping needs ~log2(diameter))."""
    import pytest

    from mimeograph_spark.functions.dedup import resolve_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        resolve_clusters(pairs, max_iters=1)
    with pytest.raises(ValueError):
        resolve_clusters(pairs, max_iters=0)
    # and with enough rounds the same graph resolves to one canonical
    out = resolve_clusters(pairs, max_iters=10)
    assert {r["canonical_id"] for r in out.collect()} == {0}


def test_hypertable_distinct_rollup_accuracy_and_merge(spark):
    """The sketch rollup must (a) estimate within HLL's documented
    error of the exact distinct at EVERY level (lgk=12 -> ~1.6%
    relative standard error; assert 5% = ~3 sigma), and (b) be
    merge-consistent: the coarse estimates come from unioning finer
    sketches, never from re-reading raw ids."""
    import pyspark.sql.functions as F

    from mimeograph_spark.cacheutil import unpersist_deps
    from mimeograph_spark.operators.hypertable import (
        hypertable_distinct_rollup,
    )

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    out = hypertable_distinct_rollup(events)
    rows = {
        (r["resolution"], r["window_start"], r["event_type"]):
            r["approx_distinct"]
        for r in out.collect()
    }
    assert len(rows) > 10
    for res in ("10 minutes", "1 hour", "1 day"):
        exact = {
            (res, r["w"]["start"], r["event_type"]): r["exact"]
            for r in events.groupBy(
                F.window("ts", res).alias("w"), "event_type"
            )
            .agg(F.countDistinct("user_id").alias("exact"))
            .collect()
        }
        assert set(exact) <= set(rows)
        for k, ex in exact.items():
            approx = rows[k]
            assert abs(approx - ex) <= max(0.05 * ex, 2.0), (k, approx, ex)
    assert unpersist_deps(out) == 2


def test_hypertable_distinct_rollup_reads_raw_once(spark):
    """Same single-physical-scan discipline as the sum/count rollup:
    every level above the finest derives from cached sketches."""
    from mimeograph_spark.cacheutil import unpersist_deps
    from mimeograph_spark.operators.hypertable import (
        hypertable_distinct_rollup,
    )

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    df = None
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = hypertable_distinct_rollup(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        )
        assert df.count() > 0

        def walk(j):
            out = [j.nodeName()]
            it = j.children().iterator()
            while it.hasNext():
                out.extend(walk(it.next()))
            return out

        names = walk(df._jdf.queryExecution().executedPlan())
        scans = [
            n for n in names
            if ("FileScan" in n or n.strip().startswith("Scan "))
            and "InMemoryTableScan" not in n
        ]
        imts = [n for n in names if "InMemoryTableScan" in n]
        assert len(scans) == 0, names
        assert len(imts) == 3, names
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        if df is not None:
            assert unpersist_deps(df) == 2


def test_char_class_stats_cr_matches_duckdb_oracle(spark, tmp_path):
    """Cross-engine check of the whitespace class ON A CARRIAGE
    RETURN: the sf* testdata contains no \\r, so the driver gate
    cannot catch a lost \\r in either engine's char class (a previous
    oracle revision embedded literal control bytes and silently
    dropped the CR under newline normalization).  Plants \\r, \\x0b
    (Java \\s includes it, the explicit class must NOT), and \\f."""
    import duckdb

    from mimeograph_spark import sql_oracles
    from mimeograph_spark.functions.textstats import char_class_stats

    rows = [
        ("d1", "a\rb\r\nc"),          # bare CR + CRLF
        ("d2", "x\x0by"),             # vertical tab: NOT whitespace here
        ("d3", " \t\n\r\f"),          # the whole class
        ("d4", None),
    ]
    path = str(tmp_path / "docs_cr.parquet")
    spark.createDataFrame(rows, "doc_id string, text string").coalesce(
        1
    ).write.parquet(path)

    got = {
        r["doc_id"]: r
        for r in char_class_stats(spark.read.parquet(path)).collect()
    }
    assert got["d1"]["n_space"] == 3          # CR, CR, LF
    assert got["d2"]["n_space"] == 0          # \x0b is 'other'
    assert got["d2"]["n_other"] == 1
    assert got["d3"]["n_space"] == 5

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    oracle = {
        r[0]: r
        for r in con.execute(sql_oracles.CHAR_STATS_ORACLE).fetchall()
    }
    for doc_id, r in got.items():
        o = oracle[doc_id]
        assert (
            r["n_chars_total"], r["n_lower"], r["n_upper"],
            r["n_digit"], r["n_space"], r["n_other"],
        ) == tuple(o[1:7]), (doc_id, dict(r.asDict()), o)
        assert abs(r["class_entropy"] - o[7]) <= 1e-6


def test_fuzzy_name_pairs_suffix_block_catches_first_char_edits(spark):
    """A first-char typo shares NO prefix block with its original, so
    a prefix-only blocking pass is structurally blind to it; the
    reversed-prefix pass must surface it at distance 1.  Also pins
    pair-level dedup: a pair found by BOTH passes (edit in the
    middle, shared prefix and suffix) appears exactly once."""
    from mimeograph_spark.functions.dedup import fuzzy_name_pairs

    rows = [
        ("cold steel gear",),   # vs first-char typo: suffix pass only
        ("xold steel gear",),
        ("warm bronze bolt",),  # vs mid-edit: both passes -> once
        ("warm bronxe bolt",),
        ("unrelated thing",),
    ]
    df = spark.createDataFrame(rows, "name string")
    out = fuzzy_name_pairs(df, "name").collect()
    pairs = {(r["name_a"], r["name_b"]): r["dist"] for r in out}
    assert pairs[("cold steel gear", "xold steel gear")] == 1
    assert pairs[("warm bronxe bolt", "warm bronze bolt")] == 1
    assert len(out) == len(pairs) == 2


def test_pii_scrub_matches_straight_line_python(spark):
    """pii_scrub vs the same ordered redaction chain in plain Python
    `re` (Perl-style leftmost-first greedy, like Java and RE2 for
    these alternation-free patterns): redacted text and every class
    count must match exactly, including the tricky compositions —
    digit run inside an email (counts as email, never double-counts
    as id), phone vs bare digit run, IPv4 octets never counted as
    ids."""
    import re as _re

    from mimeograph_spark.functions.pii import PII_CLASSES, pii_scrub

    rows = [
        (1, "write to user12345678901@mail.example.org today"),
        (2, "server 192.168.001.255 and card 4111222233334444"),
        (3, "ssn 987-65-4321 or call +1 (555) 867-5309 x12"),
        (4, "phone 555-123-4567 and id 123456789 and 12345678 short"),
        (5, None),
        (6, "plain text with no pii at all, just words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
    for doc_id, text in rows:
        red = text or ""
        for _, pattern, token in PII_CLASSES:
            red = _re.sub(pattern, token, red)
        r = got[doc_id]
        assert r["redacted"] == red, (doc_id, r["redacted"], red)
        total = 0
        for name, _, token in PII_CLASSES:
            want = red.count(token)
            assert r[f"n_{name}"] == want, (doc_id, name, r)
            total += want
        assert r["n_pii"] == total
    # the planted fixture classes land where intended
    assert got[1]["n_email"] == 1 and got[1]["n_id"] == 0
    assert got[2]["n_ipv4"] == 1 and got[2]["n_id"] == 1
    assert got[3]["n_ssn"] == 1 and got[3]["n_phone"] == 1
    assert got[4]["n_phone"] == 1 and got[4]["n_id"] == 1


def test_decontaminate_graded_planted_windows(spark):
    """Planted overlaps of known window lengths: longest_n must equal
    the exact planted window size, pairs below n_min must not appear,
    and a short eval doc (fewer tokens than n_min) contributes
    nothing (pad_short=False: no whole-text fallback gram)."""
    from mimeograph_spark.functions.dedup import decontaminate_graded

    eval_rows = [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "one two three"),  # 3 tokens < n_min=4 -> invisible
    ]
    train_rows = [
        # shares exactly a 6-token window with eval 100
        (1, "xx yy beta gamma delta epsilon zeta eta zz ww vv uu tt"),
        # shares exactly a 4-token window
        (2, "beta gamma delta epsilon QQ RR SS TT UU VV WW XX YY ZZ"),
        # shares only a 3-token window -> below n_min, absent
        (3, "beta gamma delta JJ KK LL MM NN OO PP QQ RR SS TT"),
        # contains eval 101 verbatim but eval 101 is too short
        (4, "one two three JJ KK LL MM NN OO PP QQ RR SS TT"),
    ]
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    tr = spark.createDataFrame(train_rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["eval_id"]): r["longest_n"]
        for r in decontaminate_graded(tr, ev, n_min=4, n_max=13).collect()
    }
    assert got == {(1, 100): 6, (2, 100): 4}


def test_line_dedup_semantics(spark):
    from mimeograph_spark.functions.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "alpha\nshared footer\nalpha\n   \nunique one"),
            (2, "beta\nShared Footer  \nbeta two"),
            (3, "\n\n  "),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(df).collect()
    }
    # doc 1: 4 non-blank lines; 'alpha' repeat at pos 2 dropped
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == "alpha\nshared footer\nunique one"
    # doc 2: footer matches doc 1's (case/trim-insensitive) -> dropped
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 2
    assert out[2]["clean_text"] == "beta\nbeta two"
    # doc 3: whitespace-only -> zero lines, empty clean_text
    assert out[3]["n_lines"] == 0 and out[3]["n_kept"] == 0
    assert out[3]["clean_text"] == ""


def test_semantic_dedup_semantics(spark):
    from mimeograph_spark.functions.similarity import semantic_dedup

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.01]),   # near-copy of 1 -> dup
            (3, [0.0, 1.0]),
            (4, [0.01, 0.999]),   # near-copy of 3 -> dup
            (6, [0.7, 0.7]),      # alone in its neighbourhood
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r["is_dup"]
        for r in semantic_dedup(
            df, threshold=0.95, centroid_step=2, dim=2, refine_iters=1
        ).collect()
    }
    assert out == {1: False, 2: True, 3: False, 4: True, 6: False}


def test_nb_classifier_separable(spark):
    from mimeograph_spark.functions.nbclassifier import nb_train_predict

    df = spark.createDataFrame(
        [
            (1, "a", "apple apple banana"),
            (2, "a", "apple banana banana"),
            (3, "b", "zebra zebra yak"),
            (4, "b", "zebra yak yak"),
            (5, "a", ""),  # empty doc -> argmax prior (a: 3 of 5 docs)
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r for r in nb_train_predict(df).collect()}
    assert len(out) == 5
    for i in (1, 2, 3, 4, 5):
        assert out[i]["correct"], (i, out[i]["pred"])
    assert out[5]["pred"] == "a"


def test_normalize_urls_rules(spark):
    from mimeograph_spark.functions.urls import normalize_urls

    df = spark.createDataFrame(
        [
            ("HTTP://WWW.Example.COM:80/Path/?b=2&utm_source=x&a=1#frag",),
            ("https://news.bbc.co.uk:443/story",),
            ("https://a.b.example.com.au:8443/x/",),
            ("http://localhost/",),
        ],
        "url string",
    )
    out = {r["url"]: r for r in normalize_urls(df).collect()}
    r = out["HTTP://WWW.Example.COM:80/Path/?b=2&utm_source=x&a=1#frag"]
    assert r["norm_url"] == "http://www.example.com/Path?a=1&b=2"
    assert r["host"] == "www.example.com"
    assert r["registered_domain"] == "example.com"
    assert r["n_params"] == 2
    r = out["https://news.bbc.co.uk:443/story"]
    assert r["norm_url"] == "https://news.bbc.co.uk/story"
    assert r["registered_domain"] == "bbc.co.uk"
    r = out["https://a.b.example.com.au:8443/x/"]
    assert r["norm_url"] == "https://a.b.example.com.au:8443/x"
    assert r["registered_domain"] == "example.com.au"
    r = out["http://localhost/"]
    assert r["norm_url"] == "http://localhost/"
    assert r["registered_domain"] == "localhost"
    assert r["n_params"] == 0


def test_url_dedup_best_argmax_and_ties(spark):
    """Same canonical URL from tracking-param/trailing-slash/case
    variants collapses to one row; the winner is max quality with max
    doc_id as the tie-break; distinct URLs never merge."""
    from mimeograph_spark.functions.urls import url_dedup_best

    df = spark.createDataFrame(
        [
            (1, "http://A.com/x?utm_source=t", 5),
            (2, "http://a.com:80/x/", 9),
            (3, "HTTP://a.com/x", 9),   # quality tie with doc 2
            (4, "http://a.com/y", 1),
        ],
        "doc_id long, url string, quality long",
    )
    rows = {r["norm_url"]: r for r in url_dedup_best(df).collect()}
    assert set(rows) == {"http://a.com/x", "http://a.com/y"}
    best = rows["http://a.com/x"]
    assert best["n_docs"] == 3
    assert best["best_score"] == 9
    assert best["best_doc_id"] == 3  # tie on score -> larger id wins
    assert rows["http://a.com/y"]["best_doc_id"] == 4


def test_heavy_hitters_exact_counts_and_skew(spark):
    """Constructed skew: key 7 appears 60x, keys 0..5 appear 4x each.
    Top-k is exact, shares sum to the covered mass, rank is
    deterministic, and skew_factor = max/mean over ALL keys."""
    from mimeograph_spark.functions.profile import heavy_hitters

    rows = [(7,)] * 60 + [(k,) for k in range(6) for _ in range(4)]
    df = spark.createDataFrame(rows, "user_id long")
    out = heavy_hitters(df, ["user_id"], k=3).collect()
    assert [(r["user_id"], r["cnt"], r["rank"]) for r in out] == [
        (7, 60, 1), (0, 4, 2), (1, 4, 3),
    ]
    total, nkeys, mx = 84, 7, 60
    assert out[0]["share"] == round(60 / total, 6)
    assert out[0]["skew_factor"] == round(mx / (total / nkeys), 6)
    # every row carries the same global skew factor
    assert len({r["skew_factor"] for r in out}) == 1


def test_bigram_logprob_hand_computed(spark):
    """Tiny corpus checked against hand arithmetic: doc 1 'a b a',
    doc 2 'a b', doc 3 'x' (no bigrams), doc 4 '' (no tokens).
    Unigrams: a=3, b=2, x=1, T=6.  Bigrams: (a,b)=2, (b,a)=1."""
    import math

    from mimeograph_spark.functions.textstats import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "x"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_logprob(df).collect()}

    def micro(c12, c1, c2, tot=6):
        return round(
            math.log(0.75 * (c12 / c1) + 0.25 * (c2 / tot)) * 1_000_000
        )

    ab, ba = micro(2, 3, 2), micro(1, 2, 3)
    assert got[1]["n_bigrams"] == 2
    assert got[1]["sum_micro"] == ab + ba
    assert got[1]["mean_logprob"] == round((ab + ba) / 2e6, 6)
    assert got[2]["n_bigrams"] == 1 and got[2]["sum_micro"] == ab
    for d in (3, 4):
        assert got[d]["n_bigrams"] == 0
        assert got[d]["sum_micro"] == 0
        assert got[d]["mean_logprob"] == 0.0


def test_chunk_documents_tail_coverage(spark):
    """Every token position must fall in some chunk; chunk starts sit
    on the stride grid; the final chunk truncates at the last token.
    n=10, W=4, S=3 -> starts 1,4,7 (last chunk 7..10 reaches the
    final token); n=9 exercises the non-multiple ceil (n-W=5 ->
    same grid, shorter tail chunk)."""
    from mimeograph_spark.functions.packing import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
            (2, "a b c d e f g h i"),
            (3, "short"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, window=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    starts1 = sorted((r["start_tok"], r["n_tok"]) for r in by_doc[1])
    assert starts1 == [(1, 4), (4, 4), (7, 4)]
    assert [r["chunk_text"] for r in sorted(by_doc[1],
            key=lambda r: r["chunk_id"])][-1] == "t7 t8 t9 t10"
    starts2 = sorted((r["start_tok"], r["n_tok"]) for r in by_doc[2])
    assert starts2 == [(1, 4), (4, 4), (7, 3)]
    assert [(r["start_tok"], r["n_tok"], r["chunk_text"])
            for r in by_doc[3]] == [(1, 1, "short")]
    assert 4 not in by_doc and 5 not in by_doc
    # coverage: union of [start, start+n_tok) spans 1..n for doc 1
    covered = set()
    for r in by_doc[1]:
        covered |= set(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
    assert covered == set(range(1, 11))


def test_check_constraints_counts_violations(spark):
    """Planted violations: one NULL key, one duplicate id, one
    negative value, two values over the cap, one alien status."""
    from mimeograph_spark.functions.expectations import check_constraints

    df = spark.createDataFrame(
        [
            (1, 10, "O", 5.0),
            (1, 20, "F", 50.0),   # duplicate id=1
            (2, None, "P", -1.0),  # null key, negative
            (3, 40, "X", 200.0),   # alien status, over cap
            (4, 50, "O", 150.0),   # over cap
        ],
        "id long, key long, status string, val double",
    )
    rules = [
        ("not_null", "key", None),
        ("unique", "id", None),
        ("ge", "val", 0),
        ("le", "val", 100),
        ("in", "status", ("O", "F", "P")),
    ]
    got = {(r["rule"], r["col_name"]): (r["n_violations"], r["passed"])
           for r in check_constraints(df, rules).collect()}
    assert got == {
        ("not_null", "key"): (1, False),
        ("unique", "id"): (1, False),
        ("ge", "val"): (1, False),
        ("le", "val"): (2, False),
        ("in", "status"): (1, False),
    }


def test_domain_stats_blocklist_and_url_counts(spark):
    """Three docs on one domain across two canonical URLs, one
    blocked domain dropped entirely; quality aggregates are exact."""
    from mimeograph_spark.functions.urls import domain_stats

    df = spark.createDataFrame(
        [
            ("http://a.example.com/x", 10),
            ("http://a.example.com/x?utm_source=t", 30),
            ("http://b.example.com/y", 20),
            ("http://spam.junk.net/z", 99),
        ],
        "url string, quality long",
    )
    out = {r["registered_domain"]: r
           for r in domain_stats(df, blocklist=("junk.net",)).collect()}
    assert set(out) == {"example.com"}
    r = out["example.com"]
    assert (r["n_docs"], r["n_urls"]) == (3, 2)
    assert (r["min_quality"], r["max_quality"]) == (10, 30)
    assert r["mean_quality"] == 20.0


def _dup_corpus(spark):
    """30 docs with planted exact and near dups straddling the 20/25
    batch boundaries: 1==7==23 (exact), 21==22 (exact, both new),
    2==8==24 (exact after the same one-word change), 25~26 (banded
    near pair, straddling the second chain boundary), plus unique
    filler."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = []
    for i in range(1, 31):
        if i in (1, 7, 23):
            t = base
        elif i in (21, 22, 27):
            t = base + " twice"
        elif i in (2, 8, 24):
            t = base.replace("river", "creek0")
        elif i == 25:
            t = base.replace("lazy", "sleepy")
        elif i == 26:
            t = base.replace("lazy", "sleepy").replace("bank", "shore")
        else:
            t = f"unique document number {i} " + " ".join(
                f"tok{i}_{j}" for j in range(12)
            )
        rows.append((i, t))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_increment_equals_full_recompute(spark, tmp_path):
    """build(old) + increment(new) must emit exactly the full-corpus
    LSH pairs that touch a new doc — same ids, same jaccard."""
    from mimeograph_spark.functions.dedup import lsh_candidate_pairs
    from mimeograph_spark.functions.incremental import (
        build_lsh_index,
        lsh_increment,
    )

    docs = _dup_corpus(spark)
    old = docs.filter("doc_id <= 20")
    new = docs.filter("doc_id > 20")
    path = str(tmp_path / "idx")
    build_lsh_index(old, path, k=16, bands=4)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_increment(
            spark, path, new, k=16, bands=4, update=False
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_candidate_pairs(docs, k=16, bands=4).collect()
        if r["id_b"] > 20
    }
    assert got == want
    # the planted cross-batch links actually surfaced
    assert got[(1, 23)] == 1.0
    assert got[(21, 22)] == 1.0
    assert (25, 26) in got and got[(25, 26)] < 1.0


def test_lsh_increment_chain_updates_index(spark, tmp_path):
    """Two successive increments with update=True: the second batch
    must see the first batch's docs through the index, and the union
    over the chain must equal the full recompute restricted to
    ids past the first cutoff."""
    from mimeograph_spark.functions.dedup import lsh_candidate_pairs
    from mimeograph_spark.functions.incremental import (
        build_lsh_index,
        lsh_increment,
    )

    docs = _dup_corpus(spark)
    path = str(tmp_path / "idx")
    build_lsh_index(docs.filter("doc_id <= 20"), path, k=16, bands=4)
    p1 = lsh_increment(
        spark, path, docs.filter("doc_id > 20 AND doc_id <= 25"),
        k=16, bands=4, update=True,
    ).collect()
    p2 = lsh_increment(
        spark, path, docs.filter("doc_id > 25"),
        k=16, bands=4, update=True,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in p1 + p2}
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_candidate_pairs(docs, k=16, bands=4).collect()
        if r["id_b"] > 20
    }
    assert got == want
    # 25~26 (banded) and 21==27 (exact fp) straddle the two
    # increments: only the appended index can link them
    assert (25, 26) in got and got[(25, 26)] < 1.0
    assert got[(21, 27)] == 1.0


# ---------------------------------------------------------------- linkgraph


def _py_pagerank(edges, iterations=5, d=0.85):
    """Straight-line mirror of linkgraph.pagerank (incl. per-round
    rounding and dangling redistribution)."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: round(1.0 / n, 10) for v in nodes}
    for _ in range(iterations):
        dang = sum(r for v, r in rank.items() if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / out[s]
        rank = {
            v: round(
                (1.0 - d) / n + d * (contrib[v] + dang / n), 10
            )
            for v in nodes
        }
    return {v: round(r, 6) for v, r in rank.items()}


def test_pagerank_matches_python_mirror(spark):
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (5, 1),
        (6, 7),  # 7 is dangling
    ]
    from mimeograph_spark.functions.linkgraph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    assert got == _py_pagerank(edges)


def test_pagerank_mass_conserved_and_dedup(spark):
    # duplicate edges collapse; total mass stays ~1 despite dangling
    from mimeograph_spark.functions.linkgraph import pagerank

    edges = [(1, 2), (1, 2), (2, 3), (3, 4)]  # 4 dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, iterations=8).collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-4
    exp = _py_pagerank(list(dict.fromkeys(edges)), iterations=8)
    got = {r["node"]: r["rank"] for r in rows}
    assert got == exp


def test_pagerank_rejects_zero_iterations(spark):
    from mimeograph_spark.functions.linkgraph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_classifier_eval_known_confusion(spark):
    """Hand confusion: truth a,a,a,b,b,c preds a,a,b,b,b,a.
    a: tp=2 n_true=3 n_pred=3 -> P=R=2/3; b: tp=2 n_true=2 n_pred=3;
    c: never predicted -> P=0, R=0, F1=0 (0/0 guards)."""
    from mimeograph_spark.functions.nbclassifier import classifier_eval

    df = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("a", "b"),
         ("b", "b"), ("b", "b"), ("c", "a")],
        "lang string, pred string",
    )
    got = {
        r["label"]: (
            r["n_true"], r["n_pred"], r["tp"],
            r["precision"], r["recall"], r["f1"],
        )
        for r in classifier_eval(df).collect()
    }
    t = round(2 / 3, 6)
    assert got["a"] == (3, 3, 2, t, t, t)
    assert got["b"] == (2, 3, 2, t, 1.0, 0.8)
    assert got["c"] == (1, 0, 0, 0.0, 0.0, 0.0)


def test_weighted_pagerank_equal_weights_match_pagerank(spark):
    """With every weight equal, w/W = 1/outdeg and weighted PageRank
    must reproduce the unweighted ranks exactly (same rounding
    schedule); a dangling node (5) exercises the mass redistribution,
    and ranks still sum to ~1."""
    from mimeograph_spark.functions.linkgraph import (
        pagerank,
        weighted_pagerank,
    )

    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (2, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    plain = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    wdf = df.withColumn("weight", F.lit(2.0))
    wr = {
        r["node"]: r["rank"]
        for r in weighted_pagerank(wdf).collect()
    }
    assert wr == plain
    assert abs(sum(wr.values()) - 1.0) < 1e-4


def test_weighted_pagerank_weight_shifts_rank(spark):
    """1->2 weighted 9 vs 1->3 weighted 1: node 2 must outrank node 3
    (unweighted PageRank would tie them), and duplicated edge rows sum
    their weights (idempotent contraction)."""
    from mimeograph_spark.functions.linkgraph import weighted_pagerank

    df = spark.createDataFrame(
        [(1, 2, 4.0), (1, 2, 5.0), (1, 3, 1.0)],
        "src long, dst long, weight double",
    )
    got = {r["node"]: r["rank"] for r in weighted_pagerank(df).collect()}
    assert got[2] > got[3]
    dup = spark.createDataFrame(
        [(1, 2, 9.0), (1, 3, 1.0)], "src long, dst long, weight double"
    )
    got2 = {r["node"]: r["rank"] for r in weighted_pagerank(dup).collect()}
    assert got == got2


def _py_hits(edges, iterations=5):
    """Straight-line mirror of linkgraph.hits (L1 norm, per-round
    rounding to 10, final rounding to 6)."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    hub = {v: round(1.0 / n, 10) for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        araw = {v: 0.0 for v in nodes}
        for s, t in edges:
            araw[t] += hub[s]
        s_a = sum(araw.values())
        auth = {
            v: round(araw[v] / s_a if s_a > 0 else 0.0, 10)
            for v in nodes
        }
        hraw = {v: 0.0 for v in nodes}
        for s, t in edges:
            hraw[s] += auth[t]
        s_h = sum(hraw.values())
        hub = {
            v: round(hraw[v] / s_h if s_h > 0 else 0.0, 10)
            for v in nodes
        }
    return {
        v: (round(hub[v], 6), round(auth[v], 6)) for v in nodes
    }


def test_hits_matches_python_mirror_and_separates_roles(spark):
    """5 -> {1,2,3} makes 5 the dominant hub with zero authority;
    3 (pointed at by everyone) dominates authority.  Scores are
    L1-normalized so each family sums to ~1."""
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3),
        (5, 1), (5, 2), (5, 3),
    ]
    from mimeograph_spark.functions.linkgraph import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    rows = hits(df).collect()
    got = {r["node"]: (r["hub"], r["authority"]) for r in rows}
    assert got == _py_hits(edges)
    hubs = {v: h for v, (h, _a) in got.items()}
    auths = {v: a for v, (_h, a) in got.items()}
    assert max(hubs, key=hubs.get) == 5
    assert max(auths, key=auths.get) == 3
    assert auths[5] == 0.0  # nothing points at 5
    assert abs(sum(hubs.values()) - 1.0) < 1e-4
    assert abs(sum(auths.values()) - 1.0) < 1e-4


def test_containment_pairs_catches_contained_doc(spark):
    """A short doc embedded verbatim in a much longer one has
    containment 1.0 even though its Jaccard is far below any LSH
    threshold — the case this operator exists for.  An unrelated doc
    pairs with nothing."""
    from mimeograph_spark.functions.dedup import containment_pairs

    short = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"word{i} filler{i} pad{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            ("a", short),
            ("b", filler + " " + short + " " + filler),
            ("c", "completely different text about other topics entirely"),
        ],
        "doc_id string, text string",
    )
    rows = containment_pairs(df, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [("a", "b")]
    r = rows[0]
    assert r["containment"] == 1.0
    assert r["common"] == r["size_a"]  # every shingle of a is in b
    # Jaccard of the same pair is far below the containment score
    assert r["common"] / (r["size_a"] + r["size_b"] - r["common"]) < 0.2


def test_containment_pairs_df_cap_drops_stopword_grams(spark):
    """A shingle present in more than max_df docs is excluded from
    the index: with max_df=2 a 3-way-shared shingle contributes to no
    pair, so docs sharing ONLY that shingle never pair."""
    from mimeograph_spark.functions.dedup import containment_pairs

    common = "alpha beta gamma"
    df = spark.createDataFrame(
        [
            ("a", common + " one two three"),
            ("b", common + " four five six"),
            ("c", common + " seven eight nine"),
        ],
        "doc_id string, text string",
    )
    assert containment_pairs(df, threshold=0.1, max_df=2).count() == 0
    # raising the cap re-admits the shared shingle -> all 3 pairs
    assert containment_pairs(df, threshold=0.1, max_df=3).count() == 3


def test_winnow_guarantee_and_short_doc(spark):
    """The winnowing guarantee: any shared token run of length
    >= k + w - 1 contributes at least one COMMON fingerprint, no
    matter the surrounding context.  A doc shorter than k tokens
    still yields exactly one (whole-text) fingerprint, and selection
    density never exceeds the k-gram count."""
    from mimeograph_spark.functions.winnow import winnow_fingerprints

    k = w = 4
    run = "one two three four five six seven"  # k + w - 1 = 7 tokens
    df = spark.createDataFrame(
        [
            ("a", "left ctx alpha " + run + " beta right ctx"),
            ("b", "totally other words " + run + " and more tail here"),
            ("s", "tiny doc"),  # < k tokens
        ],
        "doc_id string, text string",
    )
    got = {
        r["id"]: (r["n_kgrams"], set(r["fps"]))
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }
    assert got["a"][1] & got["b"][1]  # guaranteed common fingerprint
    assert got["s"][0] == 1 and len(got["s"][1]) == 1
    for nk, fps in got.values():
        assert 1 <= len(fps) <= nk


def test_winnow_pairs_identical_docs_full_overlap(spark):
    from mimeograph_spark.functions.winnow import winnow_pairs

    text = " ".join(f"tok{i % 17} w{i}" for i in range(40))
    df = spark.createDataFrame(
        [("a", text), ("b", text), ("c", "unrelated filler " * 10)],
        "doc_id string, text string",
    )
    rows = winnow_pairs(df, min_shared=1, max_df=8).collect()
    assert [(r["id_a"], r["id_b"], r["overlap"]) for r in rows] == [
        ("a", "b", 1.0)
    ]


def _py_lpa(edges, iterations=4):
    """Straight-line mirror of linkgraph.lpa_communities: undirected
    simple graph, synchronous rounds, count-max with min-label ties."""
    und = set()
    for s, t in edges:
        if s != t:
            und.add((s, t))
            und.add((t, s))
    nbrs: dict = {}
    for s, t in und:
        nbrs.setdefault(s, []).append(t)
    labels = {v: v for v in nbrs}
    for _ in range(iterations):
        new = {}
        for v, ns in nbrs.items():
            cnt: dict = {}
            for u in ns:
                cnt[labels[u]] = cnt.get(labels[u], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def test_lpa_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge: LPA separates them —
    clique interiors end uniform, the two sides end different — and
    the Spark result equals the synchronous python mirror exactly."""
    from mimeograph_spark.functions.linkgraph import lpa_communities

    cl_a = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl_b = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = cl_a + cl_b + [(3, 10), (2, 2)]  # self-loop dropped
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in lpa_communities(df, iterations=4).collect()
    }
    assert got == _py_lpa(edges)
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[11], got[12], got[13]}) == 1
    assert got[0] != got[13]


def test_zipf_fit_exact_small_corpus(spark):
    """Known frequencies (a:4, b:2, c:1, d:1 — ranks 1,2,3,4 with the
    c<d alphabetical tie-break) reproduce a hand-computed OLS."""
    import math

    from mimeograph_spark.functions.textstats import zipf_fit

    df = spark.createDataFrame(
        [("a a A b", ), ("a b c d", )], "text string"
    )
    row = zipf_fit(df).collect()[0]
    freqs = [4, 2, 1, 1]
    xs = [math.log(r) for r in range(1, 5)]
    ys = [math.log(c) for c in freqs]
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert row["n_terms"] == 4
    assert row["slope"] == round(slope, 6)
    assert row["intercept"] == round((sy - slope * sx) / n, 6)
    assert row["r2"] == round(r2, 6)
    assert row["slope"] < 0  # frequency falls with rank


def test_event_transitions_counts_probs_and_tiebreak(spark):
    """user 1: A->B->A->B (ts tie at the middle step broken by
    event_id), user 2: A->A.  P(B|A)=2/3, P(A|A)=1/3, P(A|B)=1."""
    from mimeograph_spark.functions.funnel import event_transitions

    rows = [
        (1, 1, "2024-01-01 00:00:00", "A"),
        (2, 1, "2024-01-01 00:00:01", "B"),
        (3, 1, "2024-01-01 00:00:02", "A"),
        (4, 1, "2024-01-01 00:00:02", "B"),  # same ts as event 3
        (10, 2, "2024-01-01 00:00:00", "A"),
        (11, 2, "2024-01-01 00:00:05", "A"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["src"], r["dst"]): (r["n_transitions"], r["prob"])
        for r in event_transitions(df).collect()
    }
    assert got == {
        ("A", "B"): (2, round(2 / 3, 6)),
        ("A", "A"): (1, round(1 / 3, 6)),
        ("B", "A"): (1, 1.0),
    }


def test_pq_topk_recovers_separated_clusters(spark):
    """Three well-separated clusters (orthogonal corners of R^8 with
    small deterministic within-cluster jitter): every query's top-5
    comes from its own cluster, and the query itself (queries are
    corpus members) reranks to rank 1 with cosine 1.0."""
    from mimeograph_spark.functions.similarity import pq_topk

    rows = []
    for c in range(3):
        for i in range(20):
            v = [0.0] * 8
            v[c] = 1.0
            v[(c + 3) % 8] = 0.01 * i  # deterministic jitter
            rows.append((c * 20 + i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") % 20 == 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # init ids 1, 18, 35, 52 span all three clusters (a degenerate
    # all-in-one-cluster seed can merge two corners at ksub this low)
    got = pq_topk(
        df, queries, dim=8, m=2, ksub=4, init_step=17, iters=2,
        shortlist=10, k=5,
    ).collect()
    assert len(got) == 15  # 3 queries x top-5
    for r in got:
        assert r["vec_id"] // 20 == r["query_id"] // 20  # own cluster
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"]
            assert r["cosine"] == 1.0


def test_pq_index_probe_equals_composed(spark, tmp_path):
    """build_pq_index + pq_probe returns exactly what the composed
    pq_topk returns at the same geometry — the persisted index is an
    amortization, never a different answer."""
    from mimeograph_spark.functions.similarity import (
        PqIndex,
        build_pq_index,
        pq_probe,
        pq_topk,
    )

    rows = []
    for c in range(3):
        for i in range(20):
            v = [0.0] * 8
            v[c] = 1.0
            v[(c + 3) % 8] = 0.01 * i
            rows.append((c * 20 + i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") % 20 == 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(dim=8, m=2, ksub=4, init_step=17, iters=2)
    composed = sorted(
        map(tuple, pq_topk(df, queries, shortlist=10, k=5, **kw).collect())
    )
    path = str(tmp_path / "pq")
    build_pq_index(df, path, **kw)
    idx = PqIndex.load(path)  # meta round-trip
    assert (idx.dim, idx.m, idx.ksub) == (8, 2, 4)
    probed = sorted(
        map(tuple, pq_probe(idx, queries, df, shortlist=10, k=5).collect())
    )
    assert probed == composed


def test_pq_topk_rejects_indivisible_dim(spark):
    import pytest

    from mimeograph_spark.functions.similarity import pq_topk

    df = spark.createDataFrame(
        [(1, [0.0] * 10)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        pq_topk(df, df.selectExpr("vec_id as query_id", "embedding"),
                dim=10, m=3)


def test_top_event_paths_counts_and_ties(spark):
    """user 1: A,B,C,A,B,C -> paths A>B>C x2, B>C>A, C>A>B;
    user 2: A,B,C -> A>B>C again.  Ties rank lexicographically."""
    from mimeograph_spark.functions.funnel import top_event_paths

    rows = [
        (i, 1, f"2024-01-01 00:00:0{i}", t)
        for i, t in enumerate("ABCABC")
    ] + [
        (10 + i, 2, f"2024-01-01 01:00:0{i}", t)
        for i, t in enumerate("ABC")
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = [
        (r["path"], r["n"], r["rank"])
        for r in top_event_paths(df, length=3, top_k=10)
        .orderBy("rank")
        .collect()
    ]
    assert got == [("A>B>C", 3, 1), ("B>C>A", 1, 2), ("C>A>B", 1, 3)]


def test_triangle_stats_known_graph(spark):
    # K4 on {1..4} (4 triangles) + pendant edge 4-5 + isolated edge
    # 6-7; reversed duplicates, a self-loop, and an exact duplicate
    # must all collapse before counting.
    from mimeograph_spark.functions.linkgraph import triangle_stats

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (6, 7),
        (2, 1), (3, 3), (1, 2),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_stats(df).collect()[0]
    assert row["n_vertices"] == 7
    assert row["n_edges"] == 8
    # degrees: 3,3,3,4,1,1,1 -> wedges 3+3+3+6 = 15
    assert row["n_wedges"] == 15
    assert row["n_triangles"] == 4
    assert row["clustering"] == round(12 / 15, 6)


def test_triangle_stats_wedge_only_graph(spark):
    # star graph: wedges but zero triangles -> clustering 0.0
    from mimeograph_spark.functions.linkgraph import triangle_stats

    df = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    row = triangle_stats(df).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 10
    assert row["clustering"] == 0.0


def test_triangle_stats_matches_brute_force(spark):
    # random-ish planted graph vs an itertools brute force
    import itertools

    from mimeograph_spark.functions.linkgraph import triangle_stats

    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    edges = [
        (h(f"{i}:u") % 30, h(f"{i}:v") % 30) for i in range(120)
    ]
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    verts = {x for e in canon for x in e}
    brute = sum(
        1
        for a, b, c in itertools.combinations(sorted(verts), 3)
        if (a, b) in canon and (a, c) in canon and (b, c) in canon
    )
    df = spark.createDataFrame(list(edges), "src long, dst long")
    row = triangle_stats(df).collect()[0]
    assert row["n_triangles"] == brute
    assert row["n_edges"] == len(canon)
    assert row["n_vertices"] == len(verts)


# ------------------------------------------------------------------ search


def test_inverted_postings_sorted_and_min_df(spark):
    from mimeograph_spark.functions.search import inverted_postings

    df = spark.createDataFrame(
        [
            (3, "alpha beta"),
            (1, "beta  gamma beta"),  # dup token counts once per doc
            (2, "beta"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_postings(df, min_df=2).collect()
    }
    # alpha/gamma are hapaxes -> dropped; beta in docs 1,2,3 sorted
    assert rows == {"beta": (3, [1, 2, 3])}


def test_bm25_matches_python_mirror(spark):
    import math

    from mimeograph_spark.functions.search import bm25_topk

    corpus = {
        1: "spark shuffle spark join",
        2: "spark",
        3: "window join window window",
        4: "noise words only here",
    }
    terms, k1, b = ["spark", "window"], 1.2, 0.75
    dl = {d: len(t.split()) for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    tf = {
        (d, w): corpus[d].split().count(w)
        for d in corpus
        for w in terms
        if w in corpus[d].split()
    }
    dfreq = {w: sum(1 for (d, w2) in tf if w2 == w) for w in terms}
    exp = {}
    for d in corpus:
        parts = [
            math.log(1.0 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
            * tf[(d, w)]
            * (k1 + 1.0)
            / (tf[(d, w)] + k1 * (1.0 - b + b * dl[d] / avgdl))
            for w in terms
            if (d, w) in tf
        ]
        if parts:
            exp[d] = round(sum(parts), 6)
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    rows = bm25_topk(df, terms, k=10).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert got == exp
    # determinism of ordering: score desc then doc_id asc
    order = [r["doc_id"] for r in rows]
    assert order == sorted(
        exp, key=lambda d: (-exp[d], d)
    )


def test_bm25_rejects_empty_terms(spark):
    from mimeograph_spark.functions.search import bm25_topk

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])


def _py_cms_bucket(key: str, d: int, width: int) -> int:
    return int(hashlib.md5(f"{d}:{key}".encode()).hexdigest()[:8], 16) % width


def test_cms_estimate_upper_bounds_and_python_mirror(spark):
    """Narrow width forces collisions; every estimate must still be
    >= the true count (one-sided error) and equal the straight-line
    Python sketch exactly."""
    from mimeograph_spark.functions.sketches import cms_build, cms_estimate

    depth, width = 3, 8
    freqs = {f"k{i}": (i % 5) + 1 for i in range(40)}
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "key string")
    counters = cms_build(df, "key", depth=depth, width=width)
    est = {
        r["key"]: r["cms_cnt"]
        for r in cms_estimate(
            counters, df, "key", depth=depth, width=width
        ).collect()
    }
    # python mirror of the exact same counter table
    table = {}
    for k, n in freqs.items():
        for d in range(depth):
            b = _py_cms_bucket(k, d, width)
            table[(d, b)] = table.get((d, b), 0) + n
    for k, n in freqs.items():
        expect = min(
            table[(d, _py_cms_bucket(k, d, width))] for d in range(depth)
        )
        assert est[k] == expect
        assert est[k] >= n


def test_cms_exact_when_width_dominates(spark):
    """With width far above the key cardinality every bucket row is
    collision-free and the estimate is exact."""
    from mimeograph_spark.functions.sketches import cms_build, cms_estimate

    freqs = {"a": 3, "b": 1, "c": 7}
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "key string")
    counters = cms_build(df, "key", depth=4, width=4096)
    est = {
        r["key"]: r["cms_cnt"]
        for r in cms_estimate(
            counters, df, "key", depth=4, width=4096
        ).collect()
    }
    assert est == freqs


def test_cms_counters_are_linear(spark):
    """Counter tables from disjoint shards add cell-wise to the
    whole-corpus table — the property that makes the build a plain
    distributed sum."""
    from mimeograph_spark.functions.sketches import cms_build

    rows = [(f"k{i % 7}",) for i in range(50)]
    whole = spark.createDataFrame(rows, "key string")
    left = spark.createDataFrame(rows[:23], "key string")
    right = spark.createDataFrame(rows[23:], "key string")

    def tab(df):
        return {
            (r["d"], r["bucket"]): r["cnt"]
            for r in cms_build(df, "key", depth=3, width=16).collect()
        }

    combined = tab(left)
    for cell, cnt in tab(right).items():
        combined[cell] = combined.get(cell, 0) + cnt
    assert combined == tab(whole)


def test_cms_absent_key_estimates_zero_on_empty_sketch(spark):
    from mimeograph_spark.functions.sketches import cms_build, cms_estimate

    empty = spark.createDataFrame([], "key string")
    counters = cms_build(empty, "key", depth=3, width=16)
    probe = spark.createDataFrame([("ghost",)], "key string")
    rows = cms_estimate(counters, probe, "key", depth=3, width=16).collect()
    assert [(r["key"], r["cms_cnt"]) for r in rows] == [("ghost", 0)]


def _py_bloom_coords(key: str, k: int, m_bits: int):
    for h in range(k):
        p = int(hashlib.md5(f"{h}:{key}".encode()).hexdigest()[:8], 16) % m_bits
        yield p // 32, 1 << (p % 32)


def test_bloom_no_false_negatives_and_python_mirror(spark):
    """Even a deliberately saturated bloom must answer true for every
    inserted key, and each answer must equal the straight-line Python
    bitset exactly (false positives included)."""
    from mimeograph_spark.functions.sketches import bloom_build, bloom_contains

    k, m = 3, 128  # 60 keys * 3 hashes into 128 bits: heavy collisions
    keys = [f"key{i}" for i in range(60)]
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    bloom = bloom_build(df, "key", k=k, m_bits=m)
    probes = keys + [f"other{i}" for i in range(40)]
    got = {
        r["key"]: r["maybe_member"]
        for r in bloom_contains(
            bloom,
            spark.createDataFrame([(x,) for x in probes], "key string"),
            "key", k=k, m_bits=m,
        ).collect()
    }
    words = {}
    for x in keys:
        for w, mask in _py_bloom_coords(x, k, m):
            words[w] = words.get(w, 0) | mask
    for x in probes:
        expect = all(
            (words.get(w, 0) & mask) == mask
            for w, mask in _py_bloom_coords(x, k, m)
        )
        assert got[x] == expect
    assert all(got[x] for x in keys)  # zero false negatives


def test_bloom_words_or_cellwise_across_shards(spark):
    """Shard bitsets OR together to the whole-set bitset — the build
    distributes like any aggregation."""
    from mimeograph_spark.functions.sketches import bloom_build

    keys = [(f"k{i}",) for i in range(30)]

    def tab(rows):
        df = spark.createDataFrame(rows, "key string")
        return {
            r["word_idx"]: r["word"]
            for r in bloom_build(df, "key", k=3, m_bits=256).collect()
        }

    combined = tab(keys[:13])
    for w, word in tab(keys[13:]).items():
        combined[w] = combined.get(w, 0) | word
    assert combined == tab(keys)


def test_bloom_decontaminate_supersets_exact(spark):
    """The bloom path may over-flag (false positives) but must flag
    every doc the exact n-gram join flags."""
    from mimeograph_spark.functions.dedup import (
        bloom_decontaminate,
        decontaminate,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "one two three four five six seven"),
        (3, "totally unrelated words here nothing shared at all"),
        (4, "alpha beta gamma delta epsilon again"),
    ]
    ev = [(100, "alpha beta gamma delta epsilon zeta"),
          (101, "one two three four five six")]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    eval_set = spark.createDataFrame(ev, "doc_id long, text string")
    exact = {
        r["doc_id"]
        for r in decontaminate(train, eval_set, n=5).collect()
    }
    bloom = {
        r["doc_id"]: r["contaminated"]
        for r in bloom_decontaminate(
            train, eval_set, n=5, k=4, m_bits=4096
        ).collect()
    }
    assert set(bloom) == {1, 2, 3, 4}  # every train doc reported
    for d in exact:
        assert bloom[d], f"doc {d} exact-contaminated but bloom missed it"


def test_corpus_overlap_identical_and_disjoint(spark):
    from mimeograph_spark.functions.dedup import corpus_overlap

    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    same = corpus_overlap(a, a, n=3, k=32).collect()[0]
    assert same["exact_jaccard"] == 1.0
    assert same["n_agree"] == 32 and same["est_jaccard"] == 1.0

    b = spark.createDataFrame(
        [(3, "totally different words entirely here")],
        "doc_id long, text string",
    )
    disj = corpus_overlap(a, b, n=3, k=32).collect()[0]
    assert disj["n_intersect"] == 0 and disj["exact_jaccard"] == 0.0


def test_corpus_overlap_matches_python_mirror(spark):
    """Signature mins, slot agreement, and exact Jaccard all equal a
    straight-line Python computation over the same md5/LCG family."""
    from mimeograph_spark.functions.dedup import (
        MINHASH_PRIME,
        corpus_overlap,
        minhash_params,
    )

    docs_a = ["the quick brown fox jumps over the lazy dog",
              "pack my box with five dozen liquor jugs"]
    docs_b = ["the quick brown fox jumps over a sleeping cat",
              "pack my box with five dozen liquor jugs"]
    k = 16

    def gramset(docs):
        out = set()
        for t in docs:
            for s in _py_shingles(t, 3):
                out.add(int(hashlib.md5(s.encode()).hexdigest()[:8], 16))
        return out

    ga, gb = gramset(docs_a), gramset(docs_b)
    params = minhash_params(k)
    sig = lambda gs: [
        min((h * pa + pb) % MINHASH_PRIME for h in gs)
        for pa, pb in params
    ]
    sa, sb = sig(ga), sig(gb)
    expect_agree = sum(int(x == y) for x, y in zip(sa, sb))
    expect_exact = round(len(ga & gb) / len(ga | gb), 6)

    a = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_a)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_b)], "doc_id long, text string"
    )
    row = corpus_overlap(a, b, n=3, k=k).collect()[0]
    assert row["n_agree"] == expect_agree
    assert row["exact_jaccard"] == expect_exact
    assert row["n_a"] == len(ga) and row["n_b"] == len(gb)
    assert row["n_intersect"] == len(ga & gb)


def test_funnel_order_semantics(spark):
    """Ordered-funnel: a later-step event BEFORE the earlier step
    must not count; ties on ts resolve by event_id."""
    from datetime import datetime

    from mimeograph_spark.functions.funnel import funnel_steps

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1 completes A then B in order
        (1, t(1), 1, "A"), (1, t(2), 2, "B"),
        # u2 has B before A: reaches step 1 only
        (2, t(1), 3, "B"), (2, t(2), 4, "A"),
        # u3 never does A
        (3, t(1), 5, "B"),
        # u4: A and B at the SAME ts — event_id order (A first) counts
        (4, t(1), 6, "A"), (4, t(1), 7, "B"),
        # u5: same ts but B has the smaller event_id: step 1 only
        (5, t(1), 9, "A"), (5, t(1), 8, "B"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        r["step"]: (r["n_users"], r["conv_from_prev"])
        for r in funnel_steps(df, ["A", "B"]).collect()
    }
    # step 1 (A): u1, u2, u4, u5 -> 4 of 5 users
    assert got[1] == (4, 0.8)
    # step 2 (B after A): u1 and u4 only
    assert got[2] == (2, 0.5)


def test_funnel_rejects_empty_steps(spark):
    from mimeograph_spark.functions.funnel import funnel_steps

    df = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, event_type string"
    )
    with pytest.raises(ValueError):
        funnel_steps(df, [])


def test_retention_cohorts_matches_python_mirror(spark):
    from datetime import datetime

    from mimeograph_spark.functions.funnel import retention_cohorts

    rows = []
    # u1 active periods 0,1,3; u2 periods 1,2; u3 period 0 only
    for u, day in [(1, 0), (1, 8), (1, 22), (2, 7), (2, 15), (3, 2)]:
        rows.append((u, datetime(2024, 1, 1 + day, 12, 0, 0)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_period"], r["period_offset"]): (
            r["n_active"], r["n_cohort"], r["retention"]
        )
        for r in retention_cohorts(df, period_days=7).collect()
    }
    # cohorts: u1,u3 -> period 0 (2 users); u2 -> period 1 (1 user)
    assert got[(0, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (1, 2, 0.5)   # u1 in period 1
    assert got[(0, 3)] == (1, 2, 0.5)   # u1 in period 3
    assert (0, 2) not in got            # nobody from cohort 0 in p2
    assert got[(1, 0)] == (1, 1, 1.0)
    assert got[(1, 1)] == (1, 1, 1.0)   # u2 in period 2


def test_histogram_bins_add_cellwise_and_clamp(spark):
    from mimeograph_spark.functions.quantiles import histogram_bins

    vals = [float(v) for v in (-5, 0, 1, 3, 7, 9, 9.99, 12, 55)]

    def tab(vs):
        df = spark.createDataFrame([(v,) for v in vs], "x double")
        return {
            r["bin"]: r["cnt"]
            for r in histogram_bins(df, "x", 0.0, 10.0, bins=10).collect()
        }

    whole = tab(vals)
    # clamping: -5 lands in bin 0; 12 and 55 land in bin 9
    assert whole[0] == 2  # -5 (clamped), 0 (width 1.0; 1 -> bin 1)
    assert whole[1] == 1  # 1
    assert whole[9] == 4  # 9, 9.99, 12 (clamped), 55 (clamped)
    combined = tab(vals[:4])
    for b, c in tab(vals[4:]).items():
        combined[b] = combined.get(b, 0) + c
    assert combined == whole


def test_histogram_quantiles_error_bounded_by_bin_width(spark):
    """Estimates come within one bin width of the exact linear
    quantiles, and tighten as bins grow."""
    import numpy as np

    from mimeograph_spark.functions.quantiles import histogram_quantiles

    vals = [((i * 37) % 1000) / 10.0 for i in range(500)]  # 0..99.9
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    exact = {q: float(np.quantile(vals, q)) for q in (0.5, 0.9, 0.99)}
    for bins in (10, 100):
        width = 100.0 / bins
        got = {
            r["q"]: r["hist_est"]
            for r in histogram_quantiles(
                df, "x", 0.0, 100.0, bins=bins
            ).collect()
        }
        for q, e in exact.items():
            assert abs(got[q] - e) <= width + 1e-9, (bins, q, got[q], e)


def test_histogram_quantiles_rejects_bad_range(spark):
    from mimeograph_spark.functions.quantiles import histogram_quantiles

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        histogram_quantiles(df, "x", 5.0, 5.0)


def test_resample_locf_gap_fill_and_leading_nulls(spark):
    from datetime import datetime

    from mimeograph_spark.functions.timeseries import resample_locf

    t = lambda m: datetime(2024, 1, 1, 0, m, 0)
    rows = [
        # series A: buckets 0 and 3 observed; 1-2 are gaps
        ("A", t(0), 10.0), ("A", t(1), 20.0), ("A", t(31), 40.0),
        # series B: first observation in bucket 2 -> leading gaps
        ("B", t(25), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    got = {
        (r["series"], r["bucket_start"].minute): (
            r["n_obs"], r["value_avg"], r["value_filled"], r["is_gap"]
        )
        for r in resample_locf(df, bucket_secs=600).collect()
    }
    # grid spans buckets 0..3 for BOTH series
    assert len(got) == 8
    assert got[("A", 0)] == (2, 15.0, 15.0, False)   # mean of 10, 20
    assert got[("A", 10)] == (0, None, 15.0, True)   # carried forward
    assert got[("A", 20)] == (0, None, 15.0, True)
    assert got[("A", 30)] == (1, 40.0, 40.0, False)
    assert got[("B", 0)] == (0, None, None, True)    # nothing to carry
    assert got[("B", 10)] == (0, None, None, True)
    assert got[("B", 20)] == (1, 7.0, 7.0, False)
    assert got[("B", 30)] == (0, None, 7.0, True)


def _drift_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_distribution_drift_zero_on_identical(spark):
    from mimeograph_spark.functions.drift import distribution_drift

    a = _drift_df(spark, ["alpha beta beta gamma", "delta alpha"])
    row = distribution_drift(a, a).collect()[0]
    assert row["kl_ab"] == 0.0 and row["kl_ba"] == 0.0
    assert row["js"] == 0.0 and row["tv"] == 0.0
    assert row["n_a"] == row["n_b"] == 6


def test_distribution_drift_matches_python_mirror_and_symmetry(spark):
    import math

    from mimeograph_spark.functions.drift import distribution_drift

    ta = ["cat cat dog fish", "cat bird"]
    tb = ["dog dog dog snake", "snake snake fish"]
    from collections import Counter
    ca = Counter(w for t in ta for w in t.split())
    cb = Counter(w for t in tb for w in t.split())
    vocab = sorted(set(ca) | set(cb))
    V, na, nb = len(vocab), sum(ca.values()), sum(cb.values())
    A, B = na + V, nb + V

    def r6(x):
        return round(x, 6)

    s_ab = s_ba = s_pm = s_qm = s_tv = 0
    for w in vocab:
        pa = (ca.get(w, 0) + 1) * B
        qa = (cb.get(w, 0) + 1) * A
        m_pq = round(math.log(pa / qa) * 1e6)
        m_pm = round(math.log(2 * pa / (pa + qa)) * 1e6)
        m_qm = round(math.log(2 * qa / (pa + qa)) * 1e6)
        s_ab += (ca.get(w, 0) + 1) * m_pq
        s_ba += (cb.get(w, 0) + 1) * (-m_pq)
        s_pm += (ca.get(w, 0) + 1) * m_pm
        s_qm += (cb.get(w, 0) + 1) * m_qm
        s_tv += abs(pa - qa)

    a, b = _drift_df(spark, ta), _drift_df(spark, tb)
    row = distribution_drift(a, b).collect()[0]
    assert row["vocab"] == V and row["n_a"] == na and row["n_b"] == nb
    assert row["kl_ab"] == r6(s_ab / (A * 1e6))
    assert row["kl_ba"] == r6(s_ba / (B * 1e6))
    assert row["js"] == r6(0.5 * (s_pm / (A * 1e6) + s_qm / (B * 1e6)))
    assert row["tv"] == r6(s_tv / (2.0 * A * B))
    assert row["kl_ab"] > 0 and row["tv"] > 0

    rev = distribution_drift(b, a).collect()[0]
    assert rev["js"] == row["js"]           # JS is symmetric
    assert rev["kl_ab"] == row["kl_ba"]     # KL swaps with arguments
    assert rev["tv"] == row["tv"]


# ---------------------------------------------------------- blocklist


def test_blocklist_scan_and_join_modes_agree(spark):
    from mimeograph_spark.functions.blocklist import blocklist_filter

    rows = [
        (1, "the quick brown fox"),
        (2, "a QUICK   brown\tfox jumps"),  # case + whitespace runs
        (3, "quickbrown fox"),  # no token-boundary match
        (4, ""),  # empty text
        (5, "brown fox quick brown fox"),
        (6, "class act"),  # 'ass' must NOT match inside 'class'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    phrases = ["quick brown", "fox jumps", "ass", "brown fox quick"]
    scan = {
        r["doc_id"]: (tuple(r["matched"]), r["n_matches"], r["keep"])
        for r in blocklist_filter(df, phrases, mode="scan").collect()
    }
    join = {
        r["doc_id"]: (tuple(r["matched"]), r["n_matches"], r["keep"])
        for r in blocklist_filter(df, phrases, mode="join").collect()
    }
    assert scan == join
    assert scan[1] == (("quick brown",), 1, False)
    assert scan[2] == (("fox jumps", "quick brown"), 2, False)
    assert scan[3] == ((), 0, True)
    assert scan[4] == ((), 0, True)
    assert scan[5] == (("brown fox quick", "quick brown"), 2, False)
    assert scan[6] == ((), 0, True)


def test_blocklist_rejects_empty_and_bad_mode(spark):
    from mimeograph_spark.functions.blocklist import blocklist_filter

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        blocklist_filter(df, [])
    with pytest.raises(ValueError):
        blocklist_filter(df, ["x"], mode="nope")


# ------------------------------------------------------------ diffing


def test_snapshot_diff_statuses(spark):
    from mimeograph_spark.functions.diffing import (
        diff_summary,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, t string, n long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, "d", 41), (5, "e", 50)],
        "k long, t string, n long",
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}
    summary = {
        r["status"]: r["n"]
        for r in diff_summary(old, new, ["k"]).collect()
    }
    assert summary == {
        "removed": 1, "changed": 2, "added": 1, "unchanged": 1,
    }


def test_snapshot_diff_null_safe_hash(spark):
    # ('a', NULL) vs (NULL, 'a') and ('a','') vs ('a',NULL) must all
    # register as changed — the sentinel + separator prevents
    # concat-collapse collisions.
    from mimeograph_spark.functions.diffing import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, "a", "")], "k long, x string, y string"
    )
    new = spark.createDataFrame(
        [(1, None, "a"), (2, "a", None)], "k long, x string, y string"
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "changed", 2: "changed"}


def test_snapshot_diff_requires_keys_and_columns(spark):
    from mimeograph_spark.functions.diffing import snapshot_diff

    df = spark.createDataFrame([(1, "a")], "k long, t string")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, ["k", "t"])


# ------------------------------------------------- embedding outliers


def test_embedding_outliers_matches_numpy(spark):
    import numpy as np

    from mimeograph_spark.functions.similarity import embedding_outliers

    rng = [
        [((i * 7 + j * 3) % 11) / 11.0 for j in range(4)]
        for i in range(40)
    ]
    rng.append([25.0, 25.0, 25.0, 25.0])  # planted far outlier
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in embedding_outliers(df).collect()}
    arr = np.array(rng)
    m = np.round(arr.mean(axis=0), 6)
    dist = np.round(np.sqrt(((arr - m) ** 2).sum(axis=1)), 6)
    mu, sigma = np.round(dist.mean(), 6), np.round(dist.std(), 6)
    z = np.round((dist - mu) / sigma, 4)
    for i in range(len(rng)):
        assert got[i]["dist"] == pytest.approx(dist[i], abs=2e-6)
        assert got[i]["z"] == pytest.approx(z[i], abs=2e-4)
    assert got[40]["is_outlier"] is True
    assert sum(1 for r in got.values() if r["is_outlier"]) == 1


def test_embedding_outliers_zero_variance(spark):
    from mimeograph_spark.functions.similarity import embedding_outliers

    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    rows = embedding_outliers(df).collect()
    assert all(r["z"] == 0.0 and not r["is_outlier"] for r in rows)


# -------------------------------------------------------- composition


def test_source_concentration_matches_python(spark):
    from mimeograph_spark.functions.composition import (
        source_concentration,
    )

    rows = [
        (1, "a", 10), (2, "a", 30), (3, "b", 10),
        (4, "b", 10), (5, "c", 40), (6, "c", 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r["source"]: r for r in source_concentration(df).collect()}
    # shares: a=40/140, b=20/140, c=80/140; rank by weight desc
    assert got["c"]["rank"] == 1 and got["a"]["rank"] == 2
    assert got["c"]["share"] == round(80 / 140, 6)
    assert got["c"]["cum_share"] == round(80 / 140, 6)
    assert got["a"]["cum_share"] == round(120 / 140, 6)
    assert got["b"]["cum_share"] == 1.0
    # doc-level Gini: ranks over sorted weights [10,10,10,30,40,40]
    w = sorted([10, 30, 10, 10, 40, 40])
    n, sw = len(w), sum(w)
    siw = sum((i + 1) * x for i, x in enumerate(w))
    exp = round(2.0 * siw / (n * sw) - (n + 1.0) / n, 6)
    assert got["a"]["gini"] == exp
    assert all(r["gini"] == exp for r in got.values())


def test_source_concentration_uniform_gini_zero(spark):
    from mimeograph_spark.functions.composition import (
        source_concentration,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", 7) for i in range(30)],
        "doc_id long, source string, n_chars long",
    )
    rows = source_concentration(df).collect()
    # equal weights -> Gini exactly 0 under the rank formula
    assert all(abs(r["gini"]) < 1e-9 for r in rows)


# ----------------------------------------------------- trigram backoff


def _py_stupid_backoff(docs, train_ids, alpha=0.4):
    """Straight-line mirror of textstats.trigram_backoff_logprob."""
    import math

    def toks(t):
        t = t.strip().lower()
        return t.split() if t else []

    uni, bi, tri = {}, {}, {}
    for did, text in docs:
        if did not in train_ids:
            continue
        tk = toks(text)
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for x in zip(tk, tk[1:]):
            bi[x] = bi.get(x, 0) + 1
        for x in zip(tk, tk[1:], tk[2:]):
            tri[x] = tri.get(x, 0) + 1
    T, V = sum(uni.values()), len(uni)
    out = {}
    for did, text in docs:
        tk = toks(text)
        tgs = list(zip(tk, tk[1:], tk[2:]))
        sm = 0
        for g in tgs:
            w1, w2, w3 = g
            if g in tri:
                s = math.log(tri[g] / bi[(w1, w2)])
            elif (w2, w3) in bi:
                s = math.log(alpha * (bi[(w2, w3)] / uni[w2]))
            else:
                s = math.log(
                    alpha * alpha * ((uni.get(w3, 0) + 1) / (T + V))
                )
            sm += int(round(s * 1e6))
        mean = round(sm / (len(tgs) * 1e6), 6) if tgs else 0.0
        out[did] = (len(tgs), sm, mean)
    return out


def test_trigram_backoff_exercises_all_branches(spark):
    from mimeograph_spark.functions.textstats import (
        trigram_backoff_logprob,
    )

    docs = [
        (0, "a b c a b c d"),          # train
        (2, "b c d b c"),              # train
        (1, "a b c x y z"),            # eval: seen tri, unseen w/ bi+uni
        (3, "q q q"),                  # eval: fully OOV -> unigram floor
        (5, "xy"),                     # eval: too short -> 0 trigrams
        (7, ""),                       # eval: empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_trigrams"], r["sum_micro"], r["mean_logprob"]
        )
        for r in trigram_backoff_logprob(
            df, train_filter=F.col("doc_id") % 2 == 0
        ).collect()
    }
    exp = _py_stupid_backoff(docs, {0, 2})
    # integers must match exactly; the mean differs only where Python's
    # banker's rounding and Spark's HALF_UP disagree on a .5 boundary
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][:2] == exp[k][:2], k
        assert abs(got[k][2] - exp[k][2]) <= 1.01e-6, k
    assert got[5] == (0, 0, 0.0) and got[7] == (0, 0, 0.0)


# ------------------------------------------------------ normalization


def test_normalize_text_nfc_controls_whitespace(spark):
    from mimeograph_spark.functions.normalize import normalize_text

    rows = [
        (1, "cafe\u0301 time"),  # decomposed; NFC composes e+acute
        (2, "a\x07b\x00c"),            # controls stripped
        (3, "  a \t\n b  "),            # ws collapse + trim
        (4, "plain ascii"),             # unchanged
        (5, None),                      # null survives as null
        (6, "\u212b ring"),  # ANGSTROM SIGN -> U+00C5 (len same)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert got[1]["norm_text"] == "caf\u00e9 time"
    assert got[1]["changed"] and got[1]["delta_chars"] == 1
    assert got[2]["norm_text"] == "abc"
    assert got[2]["delta_chars"] == 2
    assert got[3]["norm_text"] == "a b"
    assert got[4]["norm_text"] == "plain ascii"
    assert got[4]["changed"] is False and got[4]["delta_chars"] == 0
    assert got[5]["norm_text"] is None and got[5]["changed"] is None
    assert got[6]["norm_text"] == "\u00c5 ring"
    assert got[6]["changed"] and got[6]["delta_chars"] == 0


# ------------------------------------------------------------ agreement


def test_binary_agreement_matches_sklearn_free_formula(spark):
    from mimeograph_spark.functions.agreement import binary_agreement

    # hand confusion matrix: n11=4 n10=2 n01=1 n00=3
    rows = (
        [(True, True)] * 4 + [(True, False)] * 2
        + [(False, True)] * 1 + [(False, False)] * 3
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = binary_agreement(df, F.col("a"), F.col("b")).collect()[0]
    assert (r["n"], r["n11"], r["n10"], r["n01"], r["n00"]) == (
        10, 4, 2, 1, 3,
    )
    po = 7 / 10
    pe = (6 * 5 + 4 * 5) / 100
    assert r["po"] == round(po, 6)
    assert r["pe"] == round(pe, 6)
    assert r["kappa"] == round((po - pe) / (1 - pe), 6)


def test_binary_agreement_degenerate_raters(spark):
    from mimeograph_spark.functions.agreement import binary_agreement

    df = spark.createDataFrame(
        [(True, True)] * 5, "a boolean, b boolean"
    )
    r = binary_agreement(df, F.col("a"), F.col("b")).collect()[0]
    assert r["pe"] == 1.0 and r["kappa"] == 0.0


# --------------------------------------------------------------- robust


def test_mad_outliers_matches_numpy(spark):
    import numpy as np

    from mimeograph_spark.functions.robust import mad_outliers

    vals = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 500)]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    got = {r["event_id"]: r for r in mad_outliers(df).collect()}
    med = round(float(np.percentile(vals, 50)), 6)
    mad = round(float(np.percentile([abs(v - med) for v in vals], 50)), 6)
    for i, v in enumerate(vals):
        exp = int(round(0.6745 * (v - med) / mad * 1e6))
        assert got[i]["rz_micro"] == exp
        assert got[i]["is_outlier"] == (abs(exp) > 3500000)
    assert got[9]["is_outlier"] is True
    assert sum(1 for r in got.values() if r["is_outlier"]) == 1


def test_mad_outliers_zero_mad_group(spark):
    from mimeograph_spark.functions.robust import mad_outliers

    # over half identical -> MAD 0 -> nothing flagged even with an
    # extreme value present
    rows = [(i, "g", 5.0) for i in range(6)] + [(9, "g", 1e9)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = mad_outliers(df).collect()
    assert all(r["rz_micro"] == 0 and not r["is_outlier"] for r in got)
