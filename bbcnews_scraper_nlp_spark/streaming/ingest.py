"""Incremental ingestion as Structured Streaming (SURVEY §2.10).

The reference's 30-minute Airflow crawl with URL dedup is a
micro-batch upsert stream (bbc_news_dag.py:78-84 + the unique-index
skip at :34-38). Spark-native shape:

  readStream (file source) -> withWatermark -> dropDuplicates(key)
  -> sink, Trigger.AvailableNow for catch-up batch runs.

- watermark bounds the dedup state store (the reference's unbounded
  Mongo index becomes bounded streaming state — the 100 TB fix);
  the 90-day horizon mirrors archive_scraper.py:28's 3-month cutoff.
- Trigger.AvailableNow processes everything present then stops: the
  exact semantics of one cron tick (catchup=False).
- checkpointLocation gives the cross-run state handoff the reference
  does through XCom + Mongo (bbc_news_dag.py:60-67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    key: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "90 days",
) -> DataFrame:
    """Streaming dedup source over the events table.

    File-source streams need an explicit schema; we take it (and the
    NANOS-timestamp fix-up) from the batch reader in catalog.py.
    """
    from ..catalog import load_table

    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file-stream sources need a directory; glob-filter to the one
    # table inside the sf dir
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get(ts_col) == "bigint":
        stream = stream.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    del batch
    return stream.withWatermark(ts_col, watermark).dropDuplicates([key])


def run_available_now(
    deduped: DataFrame,
    query_name: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Drain all available input into an in-memory sink (test/smoke
    path; production sinks swap format for parquet/kafka)."""
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_dedup_batch(
    spark: SparkSession, sf_dir: str, key: str = "event_id"
) -> DataFrame:
    """End-to-end: stream -> watermark -> dropDuplicates -> collect
    the drained micro-batches as a batch DataFrame (synchronous; used
    by the rows-only driver check)."""
    import tempfile
    import uuid

    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = run_available_now(stream_events(spark, sf_dir, key=key), name, ckpt)
    q.awaitTermination()
    return spark.table(name)
