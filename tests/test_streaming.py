"""Structured Streaming ingest: availableNow drain equals batch
dedup; dedup key actually deduplicates."""

from __future__ import annotations

from bbcnews_scraper_nlp_spark.catalog import load_table
from bbcnews_scraper_nlp_spark.streaming.ingest import incremental_dedup_batch


def test_streaming_dedup_matches_batch(spark, sf_dir):
    out = incremental_dedup_batch(spark, sf_dir, key="event_id")
    batch = load_table(spark, sf_dir, "events")
    assert out.count() == batch.select("event_id").distinct().count()
    assert set(out.columns) == set(batch.columns)
    # timestamps survived the nanos fix-up into real timestamps
    assert dict(out.dtypes)["ts"] == "timestamp"
