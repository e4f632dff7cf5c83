"""Item-item collaborative filtering as pure DataFrame computation.

Co-occurrence recommendation (Sarwar et al. 2001, "Item-Based
Collaborative Filtering") — the classic "users who bought X also
bought Y" primitive. In a training-data pipeline the same shape ranks
related documents/sources from co-click or co-citation interactions;
here it runs over the order history (customer × part baskets).

Design constraints shared with the rest of the engine:
- similarity is integer-exact: cosine²(i,j) in parts-per-million =
  co(i,j)² · 10⁶ div (n_i · n_j) over binary interaction vectors —
  monotone in cosine, so the top-k ranking is EXACTLY the cosine
  ranking with no floating point anywhere (the bm25 milli-quantize
  recipe taken to its no-float limit);
- pair generation is the user-keyed self-join (codegen hash join,
  AQE-skew-splittable) — the group-explode alternative pays
  interpreted HOF lambdas and OOMs on hot users (PLANS.md pair-gen
  note); power-user baskets are capped upstream by
  ``relational.cap_hot_keys``, the standard mitigation (a 10⁶-item
  basket contributes 10¹² pairs and zero signal);
- per-item top-k via one rank window partitioned by the anchor item.

At 100 TB: interactions shuffle once on user for pair-gen, pairs
shuffle once on (i, j) for the count, item degrees broadcast or
shuffle-join on item id, the window keys on the anchor item. No
all-pairs stage exists — only observed co-occurrences materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def item_item_topk(
    interactions: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    k: int = 3,
    min_co: int = 1,
) -> DataFrame:
    """Top-``k`` most-similar items per item by binary cosine.

    ``interactions`` must be distinct (user, item) pairs — dedupe
    upstream (multiplicity is events, not preference strength, in
    the binary model).

    ``min_co`` is the support-threshold prune — the deterministic
    counterpart of DIMSUM's magnitude-based sampling (Zadeh &
    Carlsson 2013): pairs with fewer than ``min_co`` co-occurrences
    are dropped right after the pair count, BEFORE the degree joins
    and rank window. In co-occurrence data the overwhelming bulk of
    the Σdeg² pair volume is co=1 noise, so even min_co=2 collapses
    the downstream join/window input by an order of magnitude —
    the pair-volume bound that doesn't depend on the hot-user cap.
    The top-k is UNCHANGED whenever every true top-k neighbor has
    co ≥ min_co (a pair below the threshold has cosine² =
    co²/(n_i·n_j) < min_co²/(n_i·n_j) — with ranks dominated by
    well-supported pairs the cut is exact; tests pin this). The
    (i, j) count itself still aggregates map-side first, so the
    exchange carries partially-combined pairs either way.

    Returns (item, rec, sim_ppm, rank) with rank 1..k per item,
    ordered within an item by sim_ppm descending then rec ascending
    (total tie order — engine-independent).
    """
    ia = interactions.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    )
    deg = ia.groupBy("i").agg(F.count("*").alias("n"))
    co = (
        ia.join(ia.select(F.col("u"), F.col("i").alias("j")), "u")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("co"))
    )
    if min_co > 1:
        co = co.filter(F.col("co") >= min_co)
    sim = (
        co.join(deg.select(F.col("i"), F.col("n").alias("ni")), "i")
        .join(deg.select(F.col("i").alias("j"), F.col("n").alias("nj")), "j")
        .select(
            "i",
            "j",
            F.expr(f"co * co * {PPM} div (ni * nj)").alias("sim_ppm"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc("sim_ppm"), "j")
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("rec"),
            "sim_ppm",
            "rank",
        )
    )


def item_item_dimsum(
    interactions: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    k: int = 3,
    gamma: int = 32,
) -> DataFrame:
    """Top-``k`` similar items with DIMSUM magnitude-proportional
    pair SAMPLING (Zadeh & Carlsson 2013, "Dimension Independent
    Matrix Square using MapReduce") — the sampling that shrinks the
    pair SHUFFLE itself, where ``min_co`` only shrinks what survives
    the count. Each co-occurrence event (u, i, j) is kept with
    probability p_ij = min(1, γ/√(n_i·n_j)) — well-supported
    low-degree pairs pass exactly (p = 1 whenever n_i·n_j <= γ²),
    high-degree pairs are sampled down in proportion to the cosine
    DENOMINATOR they carry, so the expected kept-pair mass per item
    is O(γ²) independent of degree (the paper's shuffle bound). The
    cosine² estimator then needs NO square root: in the sampled lane
    E[co_s] = co·γ/√(n_i n_j), so (co_s/p)²/(n_i·n_j) = co_s²/γ² —
    integer-exact in ppm, like the exact lane's co²·10⁶/(n_i·n_j).

    Determinism (the hash-certificate property): the Bernoulli draw
    is a 20-bit integer from md5("dimsum-v1:u:min(i,j):max(i,j)") —
    symmetric in (i, j), recomputable bit-for-bit in any engine —
    kept iff H²·n_i·n_j < γ²·2⁴⁰ (P = γ/√(n_i·n_j) exactly, as an
    INTEGER comparison; the product routes through DECIMAL(38,0) /
    HUGEINT so int64 never wraps at any degree).

    Plan shape at 100 TB: degrees join onto interactions item-keyed,
    ONE user-keyed self-join generates candidates, the draw filter
    runs INSIDE that join stage (map-side, before any exchange), and
    only sampled pairs enter the (i, j) count shuffle — the stage
    that exceeded task memory at fixed partitions in the exact
    variant's 10x rehearsal. Degrees ride the kept rows (MAX per
    group), so no post-count degree join.

    Returns (item, rec, sim_ppm, sampled, rank): ``sampled`` = 1
    when the pair's lane was the estimator (n_i·n_j > γ²); sim_ppm
    in that lane is an unbiased-in-co² integer estimate and may
    exceed 10⁶.
    """
    g2 = gamma * gamma
    ia = interactions.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    )
    deg = ia.groupBy("i").agg(F.count("*").alias("n"))
    ia2 = ia.join(deg, "i").select("u", "i", F.col("n").alias("ni"))
    cand = (
        ia2.join(
            ia2.select(
                "u", F.col("i").alias("j"), F.col("ni").alias("nj")
            ),
            "u",
        )
        .filter(F.col("i") != F.col("j"))
        .withColumn(
            "__h",
            F.expr(
                "cast(conv(substring(md5(concat('dimsum-v1:',"
                " cast(u as string), ':',"
                " cast(least(i, j) as string), ':',"
                " cast(greatest(i, j) as string))), 1, 5), 16, 10)"
                " as bigint)"
            ),
        )
    )
    kept = cand.filter(
        F.expr(
            f"cast(ni as decimal(38,0)) * nj <= {g2}"
            f" or cast(__h as decimal(38,0)) * __h * ni * nj"
            f" < cast({g2} as decimal(38,0)) * {1 << 40}"
        )
    )
    co = kept.groupBy("i", "j").agg(
        F.max("ni").alias("ni"),
        F.max("nj").alias("nj"),
        F.count("*").alias("co_s"),
    )
    sim = co.select(
        "i",
        "j",
        F.expr(
            f"case when cast(ni as decimal(38,0)) * nj <= {g2}"
            f" then cast(co_s as decimal(38,0)) * co_s * {PPM}"
            f"      div (ni * nj)"
            f" else cast(co_s as decimal(38,0)) * co_s * {PPM}"
            f"      div {g2} end"
        ).alias("sim_ppm"),
        F.expr(f"cast(ni as decimal(38,0)) * nj > {g2}")
        .cast("long")
        .alias("sampled"),
    )
    w = Window.partitionBy("i").orderBy(F.desc("sim_ppm"), "j")
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("rec"),
            "sim_ppm",
            "sampled",
            "rank",
        )
    )
