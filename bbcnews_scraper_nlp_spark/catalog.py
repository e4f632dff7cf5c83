"""Testdata catalog: lazy parquet readers for the driver tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet per table under a
scale-factor directory. All reads are plain ``spark.read.parquet`` so
Catalyst gets full pushdown/pruning; no schema inference cost (parquet
carries its schema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def widen_scan(
    spark: SparkSession, df: DataFrame, barrier: bool = False
) -> DataFrame:
    """Scan-width guard for compute-heavy consumers.

    Single-row-group parquet files scan as ONE partition no matter how
    maxPartitionBytes is set, so every downstream narrow op (regex
    tokenize, shingling, vectorize) runs on one core. When the scan is
    narrower than the cluster, repartition up to defaultParallelism —
    one cheap round-robin shuffle buys full-width codegen stages.

    ``barrier=True`` additionally defeats filter pushdown below the
    widen exchange: Catalyst pushes every deterministic filter below
    a bare RepartitionOperation (alias-substituting predicates on
    derived columns on the way down), so for a heavy-predicate
    consumer (prepare_corpus's language/quality/repetition chain) the
    expensive text predicates land right back on the one-partition
    scan side and run single-threaded. ``localCheckpoint(eager=False)``
    makes the widened table a real materialization barrier (lazy, at
    first use, executor-local blocks) below which nothing pushes, and
    multi-consumer plans re-read the blocks instead of re-running the
    scan. It is opt-in because it also BLOCKS beneficial pushdown and
    adds a materialization pass — consumers whose downstream work is
    shuffle-bound (e.g. minhash clustering) measured 2x slower with
    it, while the predicate-bound corpus pipeline measured ~2x faster.

    Self-disabling at scale: a 100 TB table has file splits >= cores,
    the guard sees npart >= parallelism and returns the scan
    untouched — full pushdown/pruning semantics, no shuffle, no
    materialization. The widening (and optional barrier) exists only
    in the under-split small-file regime, where the whole table is by
    definition cheap to materialize.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        wide = df.repartition(target)
        return wide.localCheckpoint(eager=False) if barrier else wide
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, widen: bool | str = False
) -> DataFrame:
    """``widen``: False = plain scan; True = widen_scan;
    ``"barrier"`` = widen_scan with the pushdown-defeating
    materialization barrier (heavy-predicate consumers only)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if widen:
        return widen_scan(
            spark, load_table(spark, sf_dir, name), barrier=widen == "barrier"
        )
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
        # parquet reader rejects. Read nanos as long, then integer-
        # divide to micros ("div", NOT fp division — nanos exceed
        # double's 2^53 exact-integer range) — matching DuckDB's
        # truncating nanos->micros conversion.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
