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

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

# State partitions for the bounded certification drains below. A
# stateful streaming operator opens, commits, and snapshots ONE state
# store per shuffle partition per micro-batch — a fixed per-partition
# cost that dwarfs row work when partitions outnumber the keys'
# throughput (measured: the sf0.1 interval outer join drain is 2.4x
# faster at 8 state partitions than at the batch session's 32). State
# partitioning is a durable property of the CHECKPOINT, not the
# session, so it should be sized to key cardinality x arrival rate —
# at production scale raise it (or leave the conf alone) so each
# store's state fits memory; these drains run minutes of synthetic
# data into throwaway checkpoints.
STATE_PARTITIONS = 8


@contextmanager
def scoped_state_partitions(spark: SparkSession, n: int = STATE_PARTITIONS):
    """Pin spark.sql.shuffle.partitions (which fixes a NEW streaming
    query's state-partition count at first checkpoint) for the
    duration of a drain, restoring the session value after. The whole
    start→awaitTermination must sit inside the scope — the count is
    locked when the first batch plans."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def checkpoint_lineage(spark: SparkSession, checkpoint: str) -> str:
    """The checkpoint lineage id: Spark writes ``{"id": <uuid>}`` to
    ``<checkpoint>/metadata`` at first query start and preserves it
    across restarts from the same checkpoint; a FRESH checkpoint gets
    a fresh id. foreachBatch batch ids restart at 0 per checkpoint,
    so any state keyed by batch id alone collides across lineages —
    sinks here scope their partition keys / commit tags with this id.
    Read via the Hadoop FS API (checkpoints may live on s3a/hdfs).
    Only valid once the query has started — call from inside
    foreachBatch, not at stream-construction time."""
    import json as _json

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{checkpoint}/metadata")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return str(_json.loads(raw)["id"])


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    key: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "90 days",
) -> DataFrame:
    """Streaming dedup source over the events table.

    File-source streams need an explicit schema; we take it (and the
    NANOS/NTZ timestamp fix-ups) from ``event_stream``.
    """
    stream = event_stream(spark, sf_dir, ts_col=ts_col)
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


USER_STATS_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"
_STATE_SCHEMA = "n bigint, total bigint"


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

    The value total is carried as integer CENTS, scaled JVM-side
    (Spark ROUND semantics) before the Python boundary: an integer
    fold is exact in any batch/partition arrival order, which is what
    makes the drained result hash-comparable against a batch SQL
    aggregate (a float running total differs in the last bits per
    arrival order). One pandas int sum per key per batch.
    """
    import pandas as pd

    stream = stream.withColumn(
        "__cents", F.round(F.col("value") * 100).cast("long")
    )

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["__cents"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def running_user_stats_tws(stream: DataFrame) -> DataFrame:
    """Spark 4 twin of ``running_user_stats`` on the
    transformWithStateInPandas API (SPARK-49564): the successor to
    applyInPandasWithState with composite state types, timers, and
    initial-state handover. Same semantics here — per-user running
    (count, total) in a ValueState, one row per updated key per
    micro-batch — so both APIs stay covered and results must match
    (tests/test_streaming.py; the equivalence test skips where the
    python ``protobuf`` package is absent — TWS's state-server wire
    protocol requires it). At scale this is the API that pairs with
    the RocksDB provider (session.ROCKSDB_STATE_STORE): column-family
    state layout + changelog checkpointing.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    stream = stream.withColumn(
        "__cents", F.round(F.col("value") * 100).cast("long")
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle):
            self._agg = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._agg.get() if self._agg.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                total += int(pdf["__cents"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [total]}
            )

        def close(self):
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=USER_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def user_stats_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the stateful per-user stats over all available input and
    return the FINAL state per user as a batch DataFrame. The update-
    mode memory sink keeps one row per key per micro-batch that
    touched it; n_events only grows, so the final state is the
    max-(n_events, total_cents) struct per user — deterministic even
    when AvailableNow splits the input into several batches."""
    import tempfile
    import uuid

    stream = event_stream(spark, sf_dir)
    name = f"user_stats_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
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
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_cents")).alias("__s"))
        .select("user_id", "__s.n_events", "__s.total_cents")
    )


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

    stream = event_stream(spark, sf_dir)
    name = f"win_counts_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
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
    with scoped_state_partitions(spark):
        q = run_available_now(stream_events(spark, sf_dir, key=key), name, ckpt)
        q.awaitTermination()
    return spark.table(name)


def event_stream(spark: SparkSession, sf_dir: str, ts_col: str = "ts") -> DataFrame:
    """Streaming reader for the events table (schema pinned from the
    parquet footer; NANOS ts normalized to micros exactly as the
    batch reader does).

    The event-time column is normalized to TIMESTAMP (LTZ):
    watermarks REQUIRE it (`withWatermark` on TIMESTAMP_NTZ throws
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and tz-less parquet reads
    as NTZ in Spark 4. Session timezone is pinned UTC
    (session.get_spark), so the cast relabels the same wall clock."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get(ts_col) == "bigint":
        stream = stream.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    return stream


def dedup_within_watermark(
    stream: DataFrame,
    key: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """dropDuplicatesWithinWatermark: dedup keys whose duplicates
    arrive within the watermark delay of each other. Unlike
    dropDuplicates (state lives forever per key unless the watermark
    column is part of the key), state here is *evicted by event
    time* — the store holds only ~(keys seen in the last watermark
    window), the right bound for an infinite-retention stream whose
    duplicates are bursty (retries, re-crawls) rather than eternal.
    The reference's unique-url index (bbc_news_dag.py:34-38) is the
    unbounded version; this is what survives years of uptime."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def interval_join_clicks_views(
    clicks: DataFrame,
    views: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: each click joins the
    same user's views from the preceding ``lookback`` window.

    Both sides carry watermarks so the state store can discard rows
    once no future match is possible (buffered-state bound =
    watermark + interval width — without both bounds a stream-stream
    join buffers forever). The join condition is an equi-key
    (user_id, shuffled symmetrically) plus the time-range predicate
    evaluated within each key's buffered rows."""
    c = clicks.withWatermark("click_ts", watermark)
    v = views.withWatermark("view_ts", watermark)
    return c.join(
        v,
        F.expr(
            "c_user_id = v_user_id AND "
            f"view_ts BETWEEN click_ts - INTERVAL {lookback} AND click_ts"
        ),
        "inner",
    )


def interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the stream-stream interval join over all available input
    (two independent file-stream readers over the same table, as a
    real pipeline would read two topics)."""
    import tempfile
    import uuid

    def side(event_type: str, ts_alias: str, cols: list) -> DataFrame:
        s = event_stream(spark, sf_dir)
        return s.filter(F.col("event_type") == event_type).select(
            *cols, F.col("ts").alias(ts_alias)
        )

    clicks = side(
        "click",
        "click_ts",
        [F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user_id")],
    )
    views = side(
        "view",
        "view_ts",
        [F.col("user_id").alias("v_user_id"), F.col("value").alias("view_value")],
    )
    joined = interval_join_clicks_views(clicks, views)
    name = f"ssjoin_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "click_id", "c_user_id", "click_ts", "view_ts", "view_value"
    )


def upsert_foreach_batch(
    stream: DataFrame,
    root: str,
    name: str,
    key: str,
    checkpoint_dir: str,
):
    """Idempotent streaming sink: every micro-batch MERGEs into the
    stage table via foreachBatch + upsert_skip (left-anti + append).
    foreachBatch is the bridge from exactly-once streaming to
    batch-only sinks: replayed micro-batches (failure recovery)
    re-run the anti-join and append nothing — idempotence replaces
    sink-side transactionality."""
    from ..sources.stage_io import upsert_skip

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_skip(batch_df.sparkSession, batch_df, root, name, key)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_window_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming sessionization via ``F.session_window`` — DYNAMIC
    windows that extend while events keep arriving within ``gap`` of
    the session's end (vs the fixed grid of ``F.window``). State per
    open session; the watermark closes sessions whose possible-extend
    horizon has passed, so append mode emits each session exactly
    once and state is bounded by (active keys × open sessions).

    Semantics note (pinned by the batch-equivalence test): a session
    window is half-open — an event arriving EXACTLY ``gap`` after the
    last one starts a NEW session (merge condition is strict `<`).
    The batch twin (`relational.sessionize`) therefore needs `>=` as
    its new-session test to agree on boundary gaps.

    window.end = last event ts + gap (the "horizon"), per Spark's
    definition — not the last event's timestamp.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def session_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the streaming sessionization with AvailableNow and return
    the emitted (closed) sessions as a batch DataFrame."""
    import tempfile
    import uuid

    name = f"sess_counts_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            session_window_counts(event_stream(spark, sf_dir))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def enrich_stream_static(
    stream: DataFrame, dim: DataFrame, key_expr, payload_cols: list[str]
) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension
    table. Spark plans the static side as a broadcast (re-resolved
    per micro-batch, so a refreshed dim parquet is picked up without
    restarting the query); the stream side never shuffles and no
    join state accumulates — unlike stream-stream joins, the static
    side is always fully available, so no watermark is needed.
    ``key_expr`` is the join condition; ``payload_cols`` the dim
    columns carried onto the stream."""
    from pyspark.sql import functions as F  # noqa: F811

    return stream.join(F.broadcast(dim), key_expr, "left").select(
        *[stream[c] for c in stream.columns], *[dim[c] for c in payload_cols]
    )


def enrich_stream_static_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain a stream-static enrichment: the events file-stream joined
    to a small static user-segment dimension (broadcast per
    micro-batch, no stream shuffle, no join state)."""
    import tempfile
    import uuid

    from ..catalog import load_table

    users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            F.col("user_id").alias("u_user_id"),
            F.concat(
                F.lit("seg_"), F.pmod(F.xxhash64("user_id"), F.lit(4))
            ).alias("segment"),
        )
    )
    stream = event_stream(spark, sf_dir)
    enriched = enrich_stream_static(
        stream,
        users,
        stream["user_id"] == users["u_user_id"],
        ["segment"],
    )
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def interval_join_left_outer_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drain the LEFT OUTER watermarked stream-stream interval join:
    matched rows emit immediately; unmatched clicks emit null-padded
    only once the global watermark (min of both sides' max event time
    minus the delay) passes their timestamp — state for them can then
    never match. Tail clicks above the final watermark stay withheld
    at drain end: that is the API's contract, and the oracle encodes
    exactly this cutoff."""
    import tempfile
    import uuid

    def side(event_type: str, ts_alias: str, cols: list) -> DataFrame:
        s = event_stream(spark, sf_dir)
        return s.filter(F.col("event_type") == event_type).select(
            *cols, F.col("ts").alias(ts_alias)
        )

    clicks = side(
        "click",
        "click_ts",
        [F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user_id")],
    )
    views = side(
        "view",
        "view_ts",
        [F.col("user_id").alias("v_user_id"), F.col("value").alias("view_value")],
    )
    c = clicks.withWatermark("click_ts", "1 hour")
    v = views.withWatermark("view_ts", "1 hour")
    joined = c.join(
        v,
        F.expr(
            "c_user_id = v_user_id AND "
            "view_ts BETWEEN click_ts - INTERVAL 30 minutes AND click_ts"
        ),
        "left_outer",
    )
    name = f"ssoj_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "click_id", "c_user_id", "click_ts", "view_ts", "view_value"
    )


def near_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    index_path: str,
    out_path: str,
    checkpoint: str,
    jaccard_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming NEAR-dedup with persistent LSH state: each
    micro-batch (a) probes the on-disk MinHash-LSH index for
    near-duplicates of anything already accepted, (b) drops intra-
    batch near-dups (min-id canonical via the one-shot pair finder),
    (c) appends the survivors' signatures to the index and their
    rows to the accepted sink. The approximate twin of the exact
    cross-run Bloom dedup (relational.filter_unseen): state lives in
    parquet — restart-safe, never recomputed. Epoch replays are
    idempotent by construction: the accepted sink AND the index
    appends are partitioned by ``(__lineage, __batch)`` and written
    as dynamic partition overwrites, so a crash mid-batch followed by
    checkpoint replay replaces exactly that batch's rows instead of
    duplicating them. The lineage key (``checkpoint_lineage``) scopes
    the batch id to THIS checkpoint: foreachBatch ids restart at 0
    per checkpoint, so without it a second pipeline — or a restart
    after checkpoint loss — would silently overwrite the first
    lineage's ``__batch=0`` partitions. Cross-lineage replays are
    additionally made no-ops by the id replay-guard: a doc id already
    present in the index was accepted before (this lineage or any
    other) and is skipped — upsert-skip semantics, the reference's
    unique-key insert (F6/S7), which is also why the index CAN be
    shared by multiple pipelines so long as doc ids are globally
    unique (the ingest contract). Accepted-sink and index writes are
    ordered so every crash point replays to the identical end state
    (see the in-body comments). Returns the started query
    (AvailableNow: drains what exists, then stops)."""
    from pyspark import StorageLevel

    from ..operators.dedup import (
        append_lsh_index,
        lsh_banded,
        lsh_index_meta,
        lsh_signatures,
        query_lsh_index,
        save_lsh_index,
    )

    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)

    def _index_exists() -> bool:
        # Hadoop FS probe, not os.path: index_path may be s3a://hdfs://
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{index_path}/meta")
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.exists(p)

    lineage_cache: dict[str, str] = {}

    def _lineage() -> str:
        if "id" not in lineage_cache:
            lineage_cache["id"] = checkpoint_lineage(spark, checkpoint)
        return lineage_cache["id"]

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        have_index = _index_exists()
        params = (
            lsh_index_meta(spark, index_path)
            if have_index
            else {
                "num_hashes": 64, "bands": 16, "shingle_mode": "word",
                "shingle_n": 3, "shingle_hash": "xxhash64",
            }
        )
        # ONE signature pass per batch, threaded through intra-batch
        # dedup, the index probe, and the index append (each would
        # otherwise re-tokenize/shingle/hash the same text); params
        # come from the index meta so intra-batch and cross-run pairs
        # are judged in the SAME signature space.
        base = lsh_signatures(
            batch, id_col, text_col, params["num_hashes"],
            params["shingle_mode"], params["shingle_n"],
            params["shingle_hash"],
        ).persist(StorageLevel.MEMORY_AND_DISK)
        dup_ids = None
        new_ids = None
        try:
            # (b) intra-batch near-dedup: min-id survives each pair
            banded = lsh_banded(
                base, id_col, params["num_hashes"], params["bands"]
            )
            l = banded.select("band", "bhash", F.col(id_col).alias("id_1"))
            r = banded.select("band", "bhash", F.col(id_col).alias("id_2"))
            cand = (
                l.join(r, ["band", "bhash"])
                .filter(F.col("id_1") < F.col("id_2"))
                .select("id_1", "id_2")
                .dropDuplicates(["id_1", "id_2"])
            )
            sets = base.select(F.col(id_col), F.col("__sh"))
            pairs = cand.join(
                sets.select(F.col(id_col).alias("id_1"), F.col("__sh").alias("sh_1")),
                "id_1",
            ).join(
                sets.select(F.col(id_col).alias("id_2"), F.col("__sh").alias("sh_2")),
                "id_2",
            )
            inter = F.size(F.array_intersect("sh_1", "sh_2"))
            union = F.size("sh_1") + F.size("sh_2") - inter
            jac = F.when(union > 0, inter.cast("double") / union).otherwise(
                F.lit(0.0)
            )
            losers = (
                pairs.filter(jac >= jaccard_threshold)
                .select(F.col("id_2").alias(id_col))
                .distinct()
            )
            kept = batch.join(losers, id_col, "left_anti")
            kept_base = base.join(
                losers.withColumnRenamed(id_col, id_col), id_col, "left_anti"
            )
            if have_index:
                # replay/resubmit guard (upsert-skip, the reference's
                # unique-key insert semantics F6/S7): an id already in
                # the index was accepted by an earlier batch — in THIS
                # lineage (crash replay) or a previous one (checkpoint
                # loss re-drain). Skipping it makes cross-lineage
                # replays no-ops instead of duplicates. Materialized
                # via localCheckpoint BEFORE any index partition is
                # overwritten below (a lazy plan would re-read deleted
                # files mid-write). At 100 TB swap the sets-scan for
                # the Bloom seen-set (relational.save_bloom) — same
                # contract, constant-size probe.
                seen = spark.read.parquet(f"{index_path}/sets").select(
                    F.col("id").alias(id_col)
                )
                new_ids = (
                    kept.select(id_col)
                    .join(seen, id_col, "left_anti")
                    .localCheckpoint(eager=True)
                )
                kept = kept.join(new_ids, id_col, "left_semi")
                kept_base = kept_base.join(new_ids, id_col, "left_semi")
                # (a) cross-run near-dedup against everything accepted
                hits = query_lsh_index(
                    kept, id_col, text_col, index_path, jaccard_threshold,
                    base=kept_base, base_params=params,
                )
                # materialize the probe too, same reason as new_ids;
                # if the cached copy is lost the batch fails and
                # replays — idempotent.
                dup_ids = (
                    hits.select(F.col("new_id").alias(id_col))
                    .distinct()
                    .localCheckpoint(eager=True)
                )
                kept = kept.join(dup_ids, id_col, "left_anti")
                kept_base = kept_base.join(dup_ids, id_col, "left_anti")
            # lineage+batch-partitioned dynamic overwrite: a replayed
            # epoch replaces its own partition — idempotent accepted
            # sink, scoped to this checkpoint lineage. Written BEFORE
            # the index append: a crash between the two replays with
            # these ids absent from the index, so the sink rewrite is
            # identical and the index catches up — the reverse order
            # would let the id-guard skip rows the sink never got.
            (
                kept.withColumn("__lineage", F.lit(_lineage()))
                .withColumn("__batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__lineage", "__batch")
                .parquet(out_path)
            )
            if have_index:
                append_lsh_index(
                    kept, id_col, text_col, index_path,
                    base=kept_base, base_params=params, batch_id=batch_id,
                    lineage=_lineage(),
                )
            else:
                save_lsh_index(
                    kept, id_col, text_col, index_path, **params,
                    base=kept_base, base_params=params, batch_id=batch_id,
                    lineage=_lineage(),
                )
        finally:
            base.unpersist()
            if new_ids is not None:
                new_ids.unpersist()
            if dup_ids is not None:
                dup_ids.unpersist()  # releases the localCheckpoint blocks

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cms_stream(
    spark: SparkSession,
    input_dir: str,
    sketch_path: str,
    checkpoint: str,
    key: str,
    depth: int = 5,
    width: int = 256,
    where: str | None = None,
):
    """Streaming frequency tracking with PERSISTENT count-min state:
    each micro-batch builds its own CMS counter delta
    (``profiling.build_cms``) and writes it as a ``__batch``
    partition of the sketch table; the merged sketch at any moment is
    one cell-wise SUM over all partitions (``read_cms_sketch``).
    CMS counters are mergeable by addition, so this is the sketch
    analog of the persistent LSH/Bloom state — heavy-hitter and
    frequency queries over the full history at any time, without
    rescanning raw input.

    Exactly-once without a transactional sink: the delta write is a
    dynamic partition overwrite keyed by ``(__lineage, __batch)`` —
    the lineage (``checkpoint_lineage``) scopes the restart-at-0
    batch ids to this checkpoint, so an epoch replay REPLACES its own
    partition instead of double-counting, and a DIFFERENT pipeline
    (or a post-checkpoint-loss restart) can never overwrite this
    lineage's partitions. Because md5-based CMS is fully
    deterministic, the replayed delta is bit-identical. The drained
    merged sketch therefore equals the batch-built sketch of the same
    input exactly (pytest-pinned). One sketch table binds to exactly
    ONE checkpoint lineage — re-draining the same input under a fresh
    checkpoint would ADD a second lineage's counts, so
    ``read_cms_sketch`` refuses mixed-lineage tables instead of
    silently double-counting.

    Sketch table size: n_batches x (<= depth*width) skinny rows —
    compact with ``stage_io.compact_stage`` (re-aggregating to one
    partition) when batch count grows.
    """
    from ..operators.profiling import build_cms

    import os

    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if input_dir.endswith(".parquet"):
        # file streams require a directory: stream the parent with a
        # glob pinned to this file (the event_stream convention)
        parent, leaf = os.path.split(input_dir.rstrip("/"))
        reader = reader.option("pathGlobFilter", leaf)
        stream = reader.parquet(parent)
    else:
        stream = reader.parquet(input_dir)
    if where is not None:
        # pre-sketch row filter (e.g. one event_type per pipeline) —
        # a narrow predicate the scan absorbs, so each state scope
        # only ever sees its own slice
        stream = stream.filter(where)

    lineage_cache: dict[str, str] = {}

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if "id" not in lineage_cache:
            lineage_cache["id"] = checkpoint_lineage(spark, checkpoint)
        delta = build_cms(batch, key, depth=depth, width=width)
        (
            delta.withColumn("__lineage", F.lit(lineage_cache["id"]))
            .withColumn("__batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__lineage", "__batch")
            .parquet(sketch_path)
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_cms_sketch(spark: SparkSession, sketch_path: str) -> DataFrame:
    """Merge the per-batch CMS deltas into the current sketch:
    cell-wise integer sum (associative/commutative — any merge order
    gives the identical counter table). Refuses a table holding
    deltas from MORE than one checkpoint lineage: summing across
    lineages double-counts any input drained by both (the silent-
    corruption mode the lineage partition key exists to surface)."""
    deltas = spark.read.parquet(sketch_path)
    if "__lineage" in deltas.columns:
        n_lineages = deltas.select("__lineage").distinct().count()
        if n_lineages > 1:
            raise ValueError(
                f"read_cms_sketch: {sketch_path} holds deltas from "
                f"{n_lineages} checkpoint lineages; merging would "
                "double-count re-drained input. Keep one sketch table "
                "per pipeline lineage (clear the table when resetting "
                "the checkpoint)."
            )
    return deltas.groupBy("row_i", "col_j").agg(F.sum("cnt").alias("cnt"))


def kmv_stream(
    spark: SparkSession,
    input_dir: str,
    sketch_path: str,
    checkpoint: str,
    key: str,
    group_cols: list[str],
    k: int = 64,
    where: str | None = None,
):
    """Streaming DISTINCT-count tracking with persistent KMV state —
    the set-cardinality sibling of ``cms_stream`` (frequencies).
    Each micro-batch writes its own per-group k-min sketch
    (``profiling.kmv_sketch``) as a ``(__lineage, __batch)`` dynamic
    partition; the merged sketch at any moment is the k smallest
    DISTINCT hashes across all deltas (``read_kmv_sketch``) — KMV
    merges by k-min-of-union, not by addition, which is what makes
    it also INTERSECTABLE across groups (kmv_distinct_setops).

    Exactly-once by the cms_stream argument, and stronger than it
    needs to be: md5 hashing makes each delta bit-identical on epoch
    replay, and even a DOUBLE-counted delta would be absorbed by the
    distinct-union merge (k-min is idempotent under duplication —
    the lineage guard still applies so mixed pipelines fail loudly
    rather than silently mixing scopes).

    Sketch table size: n_batches × (≤ k rows per group per batch).
    """
    import os

    from ..operators.profiling import kmv_sketch

    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if input_dir.endswith(".parquet"):
        parent, leaf = os.path.split(input_dir.rstrip("/"))
        reader = reader.option("pathGlobFilter", leaf)
        stream = reader.parquet(parent)
    else:
        stream = reader.parquet(input_dir)
    if where is not None:
        # pre-sketch row filter (e.g. one event_type per pipeline) —
        # a narrow predicate the scan absorbs, so each state scope
        # only ever sees its own slice
        stream = stream.filter(where)

    lineage_cache: dict[str, str] = {}

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if "id" not in lineage_cache:
            lineage_cache["id"] = checkpoint_lineage(spark, checkpoint)
        delta = kmv_sketch(batch, key, group_cols, k=k)
        (
            delta.withColumn("__lineage", F.lit(lineage_cache["id"]))
            .withColumn("__batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__lineage", "__batch")
            .parquet(sketch_path)
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv_sketch(
    spark: SparkSession, sketch_path: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge the per-batch KMV deltas into the current sketch: the k
    smallest DISTINCT hashes per group (idempotent and
    order-independent — k-min of a union). Same mixed-lineage guard
    as read_cms_sketch."""
    from pyspark.sql import Window

    deltas = spark.read.parquet(sketch_path)
    if "__lineage" in deltas.columns:
        n_lineages = deltas.select("__lineage").distinct().count()
        if n_lineages > 1:
            raise ValueError(
                f"read_kmv_sketch: {sketch_path} holds deltas from "
                f"{n_lineages} checkpoint lineages; keep one sketch "
                "table per pipeline lineage."
            )
    hv = deltas.select(*group_cols, "hv").distinct()
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        hv.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def commit_stream_batch(
    batch: DataFrame, table_root: str, batch_id: int, lineage: str = ""
) -> int | None:
    """Commit one micro-batch to a manifest-versioned table,
    exactly-once within a checkpoint lineage: the commit is tagged
    ``batch:{lineage}:{id}`` (Delta's ``txn`` appId+version shape)
    and a replayed batch whose tag is already committed is a no-op.
    foreachBatch ids restart at 0 per checkpoint, so the bare id is
    only unique WITHIN a lineage — without the scope, a restart after
    checkpoint loss would replay new input as batch 0, match the old
    ``batch:0`` tag, and silently DROP those rows. With it, a fresh
    lineage re-commits everything it drains: across lineages the sink
    degrades to at-least-once (duplicates, visible and reconcilable
    via time travel), never to silent loss. Factored out of
    ``versioned_sink_stream`` so replay idempotency is unit-testable
    without forcing a checkpoint crash. Returns the committed version
    or None if skipped (replay / empty)."""
    from ..sources.versioned import commit_version, committed_tags

    if batch.isEmpty():
        return None
    tag = f"batch:{lineage}:{int(batch_id)}"
    if tag in committed_tags(table_root):
        return None
    return commit_version(batch, table_root, mode="append", tag=tag)


def versioned_sink_stream(
    spark: SparkSession,
    input_dir: str,
    table_root: str,
    checkpoint: str,
):
    """Exactly-once streaming parquet sink via the versioned-table
    log: each micro-batch lands as ONE atomic manifest commit
    (readers never see a torn batch — they resolve a manifest, which
    either includes the batch or doesn't), and foreachBatch's
    at-least-once delivery is de-duplicated by the lineage-scoped
    ``batch:{lineage}:{id}`` commit tag (see ``commit_stream_batch``
    for the exactly-once-within-a-lineage / at-least-once-across-
    lineages contract). This is the transactional upgrade of the raw
    ``(__lineage, __batch)`` partition-overwrite sinks used by
    near_dedup_stream / cms_stream — same idempotency, plus snapshot
    isolation and time travel per micro-batch."""
    import os

    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if input_dir.endswith(".parquet"):
        parent, leaf = os.path.split(input_dir.rstrip("/"))
        stream = reader.option("pathGlobFilter", leaf).parquet(parent)
    else:
        stream = reader.parquet(input_dir)

    lineage_cache: dict[str, str] = {}

    def sink(b: DataFrame, bid: int) -> None:
        if "id" not in lineage_cache:
            lineage_cache["id"] = checkpoint_lineage(spark, checkpoint)
        commit_stream_batch(b, table_root, bid, lineage=lineage_cache["id"])

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_decode_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode INSIDE Structured Streaming: stream the
    documents table, synthesize real PNG payloads and decode them
    back (operators/multimodal.decode_image_pixels — the same
    Arrow-batched mapInPandas stage the batch query uses) per
    micro-batch, drain with AvailableNow into an append-mode memory
    sink. The stage is stateless and 1:1 per document, so the drained
    result is deterministic regardless of how AvailableNow splits the
    input — which is why the batch query's closed-form oracle applies
    unchanged. This is the shape of a production media-ingest
    pipeline: decode work rides the stream, no shuffle, bounded
    per-batch memory via Arrow batch sizing."""
    import os
    import tempfile
    import uuid

    from ..operators.multimodal import (
        attach_gradient_image_payload,
        decode_image_pixels,
    )

    docs_path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(docs_path).schema
    parent, leaf = os.path.split(docs_path.rstrip("/"))
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", leaf)
        .parquet(parent)
    )
    # spread the decode across the cluster: a single-file source
    # plans ONE input partition per micro-batch, which serialized the
    # whole Python decode stage onto one core (profiled: a 7.6 s
    # single-task batch at sf0.1). Repartition BEFORE the payload
    # attach so only the skinny document rows shuffle, never the
    # synthesized image bytes (guide: move heavy bytes zero times).
    # At scale a multi-file source already splits; the shuffle then
    # just rebalances skew. Stateless 1:1 stage, so the drained row
    # set is unchanged.
    stream = stream.repartition(spark.sparkContext.defaultParallelism)
    decoded = decode_image_pixels(
        attach_gradient_image_payload(stream, "doc_id")
    )
    name = f"stream_decode_{uuid.uuid4().hex[:8]}"
    q = (
        decoded.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)

def static_join_view_stream(
    spark: SparkSession, sf_dir: str, name: str = "stream_join_view"
):
    """Stream-STATIC join + view aggregation: maintain a revenue-by-
    priority join view over an append-only orders stream against the
    static lineitem dimension — the native Structured Streaming form
    of incremental join-view maintenance (each micro-batch joins ONLY
    its new rows: the engine executes exactly the |Δ|-bounded delta
    leg of ``relational.delta_join_legs``, and the complete-mode agg
    state IS the materialized view). The drained view over the whole
    table equals the batch join aggregate exactly — integer cents,
    arrival-order-free — so the direct-join SQL is the oracle. At
    100 TB the static side is a real dimension table (broadcast or
    pre-bucketed); view cardinality (5 priorities) bounds the agg
    state."""
    import tempfile

    schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    view = (
        stream.select("o_orderkey", "o_orderpriority")
        .join(li, "o_orderkey")
        .groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
    q = (
        view.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_sjv_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_quality_gate_batch(
    spark, sf_dir: str, max_files_per_trigger: int | None = None
):
    """The published Gopher word-level quality gate INSIDE Structured
    Streaming (the production shape: documents are quality-scored as
    they arrive, before anything downstream sees them): stream the
    documents table, compute the Rae et al. 2021 Table A1 word-level
    stats as PURE per-row HOF expressions
    (operators/textstats.gopher_stats_columns — no explode, no
    groupBy, no watermark), drain with AvailableNow into an
    append-mode memory sink. Stateless and 1:1 per document, so the
    drained result is deterministic regardless of micro-batch splits
    — the BATCH gopher_quality_flags oracle applies unchanged (same
    integer truncating divisions, two plan shapes for one
    semantics)."""
    import os
    import tempfile
    import uuid

    from ..operators.textstats import gopher_stats_columns

    docs_path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(docs_path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(docs_path):
        # documents.parquet is a dataset DIRECTORY: stream it directly
        target = docs_path
    else:
        # single-file layout (the driver testdata): pathGlobFilter
        # narrows the parent listing to that one file
        parent, leaf = os.path.split(docs_path.rstrip("/"))
        reader = reader.option("pathGlobFilter", leaf)
        target = parent
    if max_files_per_trigger is not None:
        # forces a multi-micro-batch drain (split-invariance tests)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(target)
    flagged = stream.select(
        "doc_id", *gopher_stats_columns(F.col("text"))
    )
    name = f"stream_qgate_{uuid.uuid4().hex[:8]}"
    q = (
        flagged.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_hrw_route_batch(
    spark, sf_dir: str, n_shards: int = 9,
    max_files_per_trigger: int | None = None,
):
    """Rendezvous-hash ROUTING inside Structured Streaming — the
    ingest-placement gate: every arriving document is assigned its
    shard by the same pure-projection HRW expression the batch
    topology audit (consistent_hash_shards) certifies. Stateless and
    1:1 per document (no explode, no groupBy, no watermark), so the
    AvailableNow drain is append-mode and split-invariant, and the
    BATCH per-doc assignment SQL is the oracle unchanged — the hash
    match certifies that the streaming router and the batch audit
    compute the identical placement."""
    import os
    import tempfile
    import uuid

    from ..operators.relational import hrw_shard

    docs_path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(docs_path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(docs_path):
        target = docs_path
    else:
        parent, leaf = os.path.split(docs_path.rstrip("/"))
        reader = reader.option("pathGlobFilter", leaf)
        target = parent
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(target)
    routed = stream.select(
        "doc_id", hrw_shard(F.col("doc_id"), n_shards).alias("shard")
    )
    name = f"stream_hrw_{uuid.uuid4().hex[:8]}"
    q = (
        routed.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_blocklist_gate_batch(
    spark, sf_dir: str, patterns: list[str],
    max_files_per_trigger: int | None = None,
):
    """Aho-Corasick blocklist matching inside Structured Streaming —
    the ingest-side content gate: every arriving document exits with
    its per-pattern match counts from the SAME goto/fail automaton
    walk the batch query (aho_corasick_matches) certifies. The
    automaton is built once on the driver side (bounded: one row per
    pattern prefix) and closure-broadcast into the stateless
    mapInPandas stage; no watermark, no state, so the AvailableNow
    drain is append-mode and split-invariant and the BATCH
    position-scan SQL is the oracle unchanged — streaming gate and
    batch audit provably compute identical matches."""
    import os
    import tempfile
    import uuid

    from ..operators.ahocorasick import automaton_frame, match_counts

    docs_path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(docs_path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(docs_path):
        target = docs_path
    else:
        parent, leaf = os.path.split(docs_path.rstrip("/"))
        reader = reader.option("pathGlobFilter", leaf)
        target = parent
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(target)
    auto = automaton_frame(spark, patterns)
    gated = match_counts(stream, "doc_id", "text", auto)
    name = f"stream_ac_{uuid.uuid4().hex[:8]}"
    q = (
        gated.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
