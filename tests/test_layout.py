"""Z-order layout: the clustering must provably tighten parquet
min/max stats on BOTH dimensions — measured on real row-group
metadata, not inferred from the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from bbcnews_scraper_nlp_spark.operators.layout import (
    file_minmax,
    morton_z2,
    morton_z2_sql,
    overlapping_units,
)
from bbcnews_scraper_nlp_spark.sources.stage_io import write_zordered


def _grid(spark, side=128):
    # every (x, y) cell of a side x side grid, shuffled arrival order
    rows = [((i * 2654435761) % (side * side),) for i in range(side * side)]
    return spark.createDataFrame(rows, "h long").select(
        (F.col("h") % side).alias("x"), (F.col("h") / side).cast("long").alias("y")
    )


def test_morton_matches_reference_bit_interleave(spark):
    df = _grid(spark, side=32).withColumn(
        "z", morton_z2(F.col("x"), F.col("y"), 5)
    )

    def ref(x, y):
        z = 0
        for b in range(5):
            z |= ((x >> b) & 1) << (2 * b + 1)
            z |= ((y >> b) & 1) << (2 * b)
        return z

    for r in df.collect():
        assert r["z"] == ref(r["x"], r["y"])
    # the curve is a bijection on the 2*bits-bit square
    assert df.select("z").distinct().count() == 32 * 32


def test_morton_sql_twin_identical(spark):
    import duckdb

    pdf = _grid(spark, side=64).toPandas()  # noqa: F841 (duckdb scans it)
    got = duckdb.sql(
        f"SELECT x, y, {morton_z2_sql('x', 'y', 6)} AS z FROM pdf"
    ).df()
    spark_z = {
        (r["x"], r["y"]): r["z"]
        for r in _grid(spark, side=64)
        .withColumn("z", morton_z2(F.col("x"), F.col("y"), 6))
        .collect()
    }
    for x, y, z in got.itertuples(index=False):
        assert spark_z[(x, y)] == z


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _grid(spark, side=128)

    zpath, xpath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    write_zordered(df, zpath, ["x", "y"], num_files=16, bits_per_col=7)
    # baseline: the same write clustered by a single-column sort
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(xpath)
    )

    zstats = file_minmax(zpath, ["x", "y"])
    xstats = file_minmax(xpath, ["x", "y"])

    # selective slice on x ONLY: both layouts prune well
    xbox = {"x": (40, 47)}
    assert overlapping_units(xstats, xbox) <= 2
    assert overlapping_units(zstats, xbox) <= len(zstats) // 2

    # selective slice on y ONLY: x-sort reads EVERYTHING, z-order
    # skips most units -- the reason the layout exists
    ybox = {"y": (40, 47)}
    z_hit = overlapping_units(zstats, ybox)
    x_hit = overlapping_units(xstats, ybox)
    assert x_hit == len(xstats)  # single-column sort cannot prune y
    assert z_hit <= len(zstats) // 2, (z_hit, len(zstats))

    # 2-D box: z-order reads a small corner
    box = {"x": (0, 31), "y": (0, 31)}
    assert overlapping_units(zstats, box) <= max(2, len(zstats) // 4)


# ---------------------------------------------------------------
# round 11: Hilbert curve
# ---------------------------------------------------------------


def _xy2d(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_literal_transform_and_is_a_bijection(spark):
    from pyspark.sql import functions as F

    from bbcnews_scraper_nlp_spark.operators.layout import hilbert_d2

    n = 32  # bits=5, full 32x32 grid
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
        )
    )
    rows = hilbert_d2(grid, "x", "y", 5).collect()
    assert len(rows) == n * n
    got = {(r["x"], r["y"]): r["hval"] for r in rows}
    assert got == {(x, y): _xy2d(n, x, y) for x in range(n) for y in range(n)}
    assert sorted(got.values()) == list(range(n * n))  # bijection


def test_hilbert_writer_skipping_at_least_matches_morton(spark, tmp_path):
    """The point of the Hilbert upgrade, MEASURED on real parquet
    row-group stats: over a sweep of aligned boxed scans, the
    Hilbert-clustered layout reads no more row groups in total than
    the Morton one (unit-step locality -> each file covers a more
    compact blob), and strictly fewer on at least one box shape."""
    df = _grid(spark, side=128)
    hpath, zpath = str(tmp_path / "hilb"), str(tmp_path / "zord")
    write_zordered(
        df, hpath, ["x", "y"], num_files=16, bits_per_col=7,
        curve="hilbert",
    )
    write_zordered(df, zpath, ["x", "y"], num_files=16, bits_per_col=7)
    hstats = file_minmax(hpath, ["x", "y"])
    zstats = file_minmax(zpath, ["x", "y"])
    assert len(hstats) == len(zstats)

    boxes = (
        # 16x16 aligned tiles across the whole grid
        [
            {"x": (bx, bx + 15), "y": (by, by + 15)}
            for bx in range(0, 128, 16)
            for by in range(0, 128, 16)
        ]
        # thin slices on each single dimension
        + [{"x": (lo, lo + 7)} for lo in range(0, 128, 16)]
        + [{"y": (lo, lo + 7)} for lo in range(0, 128, 16)]
    )
    h_total = sum(overlapping_units(hstats, b) for b in boxes)
    z_total = sum(overlapping_units(zstats, b) for b in boxes)
    assert h_total <= z_total, (h_total, z_total)
    # and the layout is genuinely selective, not one giant row group
    assert h_total < len(hstats) * len(boxes) // 2


def test_hilbert_writer_round_trips_rows(spark, tmp_path):
    # clustering must not change the DATA: same multiset of rows, no
    # internal curve columns leak into the written schema
    df = _grid(spark, side=32)
    path = str(tmp_path / "h32")
    write_zordered(
        df, path, ["x", "y"], num_files=4, bits_per_col=5,
        curve="hilbert",
    )
    back = spark.read.parquet(path)
    assert sorted(back.columns) == ["x", "y"]
    assert back.count() == 32 * 32
    assert back.distinct().count() == 32 * 32


def test_hilbert_adjacency_law_morton_lacks(spark):
    """Consecutive Hilbert indices are UNIT grid steps (|dx|+|dy| = 1
    for every d -> d+1) — the locality property that makes 1-D key
    ranges compact 2-D blobs; Morton's Z jumps violate it."""
    from pyspark.sql import functions as F

    from bbcnews_scraper_nlp_spark.operators.layout import (
        hilbert_d2,
        morton_z2,
    )

    n = 16
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    h = {
        r["hval"]: (r["x"], r["y"])
        for r in hilbert_d2(grid, "x", "y", 4).collect()
    }
    assert all(
        abs(h[d][0] - h[d + 1][0]) + abs(h[d][1] - h[d + 1][1]) == 1
        for d in range(n * n - 1)
    )
    m = {
        r["zval"]: (r["x"], r["y"])
        for r in grid.select(
            "x", "y", morton_z2(F.col("x"), F.col("y"), 4).alias("zval")
        ).collect()
    }
    assert any(
        abs(m[d][0] - m[d + 1][0]) + abs(m[d][1] - m[d + 1][1]) > 1
        for d in range(n * n - 1)
    )
