"""Structured Streaming ingest: availableNow drain equals batch
dedup; dedup key actually deduplicates."""

from __future__ import annotations

from bbcnews_scraper_nlp_spark.catalog import load_table
from bbcnews_scraper_nlp_spark.streaming.ingest import incremental_dedup_batch


def test_stateful_user_stats_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from bbcnews_scraper_nlp_spark.streaming.ingest import user_stats_batch

    out = user_stats_batch(spark, sf_dir)
    # final state per user (availableNow may emit once per key per
    # batch; take the last = max n_events)
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in out.orderBy("n_events").collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["t"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(final) == set(batch)
    for u, (n, t) in batch.items():
        assert final[u][0] == n
        assert abs(final[u][1] - t) < 1e-6


def test_streaming_dedup_matches_batch(spark, sf_dir):
    out = incremental_dedup_batch(spark, sf_dir, key="event_id")
    batch = load_table(spark, sf_dir, "events")
    assert out.count() == batch.select("event_id").distinct().count()
    assert set(out.columns) == set(batch.columns)
    # timestamps survived the nanos fix-up into real timestamps
    assert dict(out.dtypes)["ts"] == "timestamp"


def test_windowed_counts_match_batch_closed_windows(spark, sf_dir):
    from pyspark.sql import functions as F

    from bbcnews_scraper_nlp_spark.streaming.ingest import windowed_counts_batch

    out = windowed_counts_batch(spark, sf_dir)
    streamed = {
        (r["window_start"], r["window_end"], r["event_type"]): r["n"]
        for r in out.collect()
    }
    assert streamed, "watermark should have closed at least one window"

    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r["ws"], r["we"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("ws"),
            F.col("window.end").alias("we"),
            "event_type",
            "n",
        )
        .collect()
    }
    # every emitted window is final: exact match with the batch count
    for k, n in streamed.items():
        assert batch[k] == n, k
    # append-mode cutoff: only windows fully past the watermark
    # (max ts - 1 day) were emitted, the newer ones are still open
    max_ts = ev.agg(F.max("ts")).first()[0]
    unemitted = set(batch) - set(streamed)
    import datetime

    cutoff = max_ts - datetime.timedelta(days=1)
    for start, end, _ in streamed:
        assert end <= cutoff + datetime.timedelta(days=1)
    assert all(end > cutoff - datetime.timedelta(seconds=1) for _, end, _ in unemitted)
