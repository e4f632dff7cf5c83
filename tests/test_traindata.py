"""Training-corpus preparation operators (operators/traindata.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bbcnews_scraper_nlp_spark.operators import traindata as TD


def test_deterministic_split_partitions_and_ratios(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = TD.deterministic_split(df, "doc_id").groupBy("split").count()
    counts = {r["split"]: r["count"] for r in out.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # partition: every row exactly one split
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # roughly 80/10/10 (hash buckets are uniform-ish)
    assert 0.7 < counts["train"] / 2000 < 0.9


def test_deterministic_split_stable_under_repartition(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {
        (r["doc_id"], r["split"])
        for r in TD.deterministic_split(df, "doc_id").collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in TD.deterministic_split(df.repartition(13), "doc_id").collect()
    }
    assert a == b


def test_contamination_detects_planted_ngram(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "prefix words then the quick brown fox jumps right out"),
            (2, "totally unrelated content about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    out = TD.contamination(docs, bench, "doc_id", "text", n=5).collect()
    assert [r["doc_id"] for r in out] == [1]
    r = out[0]
    # "the quick brown fox jumps" is the single shared 5-gram
    assert r["contaminated_ngrams"] == 1
    assert r["total_ngrams"] == 6
    assert abs(r["contamination_ratio"] - round(1 / 6, 6)) < 1e-9


def test_pii_scrub_rules(spark):
    df = spark.createDataFrame(
        [
            (
                "mail a.smith+x@sub.example.co.uk or 192.168.0.1 "
                "card 1234567890123 short 12345678 done"
            )
        ],
        "string",
    ).toDF("text")
    out = df.select(TD.pii_scrub(F.col("text")).alias("s")).first()["s"]
    assert "<EMAIL>" in out and "@" not in out
    assert "<IP>" in out and "192.168" not in out
    assert "<ID>" in out and "1234567890123" not in out
    assert "12345678" in out  # 8 digits: below the 9-digit redaction floor


def test_pack_sequences_matches_sequential_reference(spark):
    rows = [(i, 10 + (i * 37) % 300) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = TD.pack_sequences(df, "doc_id", "n_tokens", budget=512, shards=4).collect()
    got = {r["doc_id"]: (r["shard"], r["bin"]) for r in out}
    assert len(got) == 200
    # python reference: same shard hash, concat-and-chunk per shard
    shard_of = {
        r["doc_id"]: r["shard"]
        for r in df.select(
            "doc_id", TD.hash_bucket(F.col("doc_id"), 4).alias("shard")
        ).collect()
    }
    cum: dict[int, int] = {}
    for doc_id, n_tokens in sorted(rows):
        s = shard_of[doc_id]
        before = cum.get(s, 0)
        assert got[doc_id] == (s, before // 512), doc_id
        cum[s] = before + n_tokens
