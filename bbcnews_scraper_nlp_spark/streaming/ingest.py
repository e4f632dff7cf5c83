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


USER_STATS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count + value total, emitted once per
    micro-batch per updated key.

    This is the engine's slot for operators Structured Streaming
    lacks natively (the reference's cross-run XCom/Mongo state,
    bbc_news_dag.py:60-67, generalized). State is a 2-field tuple per
    key — GroupState keeps it in the state store (RocksDB/HDFS at
    scale), bounded by key cardinality, checkpointed for exactly-once
    recovery.
    """
    import pandas as pd

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def user_stats_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the stateful per-user stats over all available input and
    return the final micro-batch output as a batch DataFrame."""
    import tempfile
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    name = f"user_stats_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the canonical
    Structured Streaming shape for late data: counts per (day window,
    event_type); the watermark both bounds aggregation state and
    defines the late-data cutoff (append mode emits a window only
    once the watermark passes its end, i.e. it can no longer change).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def windowed_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the watermarked windowed aggregation with AvailableNow
    and return the emitted (closed) windows as a batch DataFrame."""
    import tempfile
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    name = f"win_counts_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


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
