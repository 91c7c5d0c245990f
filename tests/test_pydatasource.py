"""Python DataSource API (Spark 4): generating reader + commit-protocol
JSONL sink (sources/pydatasource.py)."""

import json
import os

from mimeograph_spark.sources.pydatasource import register, synth_doc


def test_synthdocs_reader_partitioned_and_deterministic(spark):
    register(spark)
    df = (
        spark.read.format("synthdocs")
        .option("n_docs", 120)
        .option("n_parts", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = {
        r["doc_id"]: r.asDict(recursive=True) for r in df.collect()
    }
    assert len(rows) == 120
    # every doc matches the closed-form generator — partition
    # boundaries must not shift content
    for i in (0, 7, 59, 119):
        exp = synth_doc(i)
        assert rows[exp["doc_id"]]["spans"] == exp["spans"]
    kinds = {
        s["kind"] for r in rows.values() for s in r["spans"]
    }
    assert kinds == {"text", "media"}


def test_synthdocs_feeds_the_extract_pipeline(spark):
    # the generated frame has the pipeline's input shape: the full
    # extract chain must run over it end-to-end
    from mimeograph_spark.plans.pipeline import extract

    register(spark)
    df = (
        spark.read.format("synthdocs")
        .option("n_docs", 40)
        .option("n_parts", 2)
        .load()
    )
    res = extract(df).collect()
    assert len(res) == 40
    assert {r["status"] for r in res} == {"complete"}
    assert all(len(r["spans_out"]) > 0 for r in res)


def test_jsonlsink_commit_protocol(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(25)], "k long, t string"
    ).repartition(3)
    df.write.format("jsonlsink").option("path", out).mode(
        "append"
    ).save()
    files = sorted(os.listdir(out))
    # no orphan .tmp survives a successful commit; _SUCCESS carries
    # the total row count
    assert not any(f.endswith(".tmp") for f in files)
    assert "_SUCCESS" in files
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert json.load(f)["rows"] == 25
    got = []
    for f in files:
        if f.endswith(".jsonl"):
            with open(os.path.join(out, f)) as fh:
                got.extend(json.loads(line) for line in fh)
    assert sorted((r["k"], r["t"]) for r in got) == [
        (i, f"t{i}") for i in range(25)
    ]


def test_jsonlsink_overwrite_clears_prior_output(spark, tmp_path):
    """mode=overwrite must not leave prior committed part files in
    place — readers of the directory would otherwise see a mix of old
    and new data under a fresh _SUCCESS.  The clear happens inside
    commit(), so a FAILED overwrite job leaves the old data intact."""
    register(spark)
    out = str(tmp_path / "sink")
    first = spark.createDataFrame(
        [(i, f"old{i}") for i in range(10)], "k long, t string"
    ).repartition(3)
    first.write.format("jsonlsink").option("path", out).mode(
        "append"
    ).save()
    second = spark.createDataFrame(
        [(i, f"new{i}") for i in range(4)], "k long, t string"
    ).repartition(2)
    second.write.format("jsonlsink").option("path", out).mode(
        "overwrite"
    ).save()
    got = []
    for f in sorted(os.listdir(out)):
        if f.endswith(".jsonl"):
            with open(os.path.join(out, f)) as fh:
                got.extend(json.loads(line) for line in fh)
    assert sorted((r["k"], r["t"]) for r in got) == [
        (i, f"new{i}") for i in range(4)
    ]
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert json.load(f)["rows"] == 4
