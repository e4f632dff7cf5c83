"""Distributed suffix ranking by prefix doubling, and exact-substring
duplicated-span extraction built on it (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better", §4.1
ExactSubstr — the suffix-array half whose n-gram approximation lives
in ``dedup.remove_dup_spans``).

Reference intent: the URL-level dedup in the reference pipeline
(``BBCNews-scraper-nlp/news_scraping/pipelines.py:33-44``) done to the
published training-data standard: find every maximal span of >=
``span_len`` tokens whose text occurs more than once in the corpus,
exactly — not by hashed n-gram approximation.

Why prefix doubling and not the n-gram join: materializing one
``span_len``-token string per position multiplies corpus bytes by
``span_len`` (a 50-token threshold = 50x write amplification at
100 TB). Prefix doubling keeps every intermediate row at fixed width
(two integer ranks), reaching window ``2^k`` after k rounds — the
classic distributed suffix-array construction (log-rounds of
sort/join, cf. pDC3 / Flick-Aluru), truncated at the first window
>= ``span_len`` because equal-window detection at the threshold
length is all ExactSubstr needs (a "bounded-window" suffix ranking).

Determinism: every global rank here is a TWO-LEVEL rank — range-
bucket the integral bucket key by broadcast min/max integer
arithmetic (never RangePartitioner sampling, never a partition-id),
per-bucket ``row_number`` over a unique key, plus the exclusive
bucket-count prefix as base offset. The only unpartitioned window
scans the ``buckets``-row totals table, a constant. Rank VALUES are
therefore a pure function of the data — recomputation of any branch
agrees, so no checkpoint is needed for consistency (iteration frames
are still eager-checkpointed to stop the 2x-per-round analysis-tree
growth, the connected-components contract).

Alphabet order: round-0 token ranks order by (xxhash64-bucket, token)
— a deterministic permutation of the alphabet. A suffix array under a
permuted alphabet has identical equal-window and LCP structure, which
is the only thing span extraction reads; the permutation avoids
funnelling the vocabulary through collation-ordered range sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _two_level_rank(
    df: DataFrame,
    bucket_src: Column,
    order_cols: list[str],
    buckets: int = 64,
) -> DataFrame:
    """Global 1-based rank over ``df`` (rows must be unique on
    ``order_cols``), ordered by (integer range-bucket of
    ``bucket_src``, ``order_cols``). Deterministic by construction:
    bucket width comes from a broadcast integer min/max (no
    sampling), so independent recomputations of any branch assign
    identical ranks. Adds a ``rank`` column, drops internals."""
    b = df.withColumn("__bsrc", bucket_src.cast("long"))
    lim = b.agg(
        F.min("__bsrc").alias("__lo"), F.max("__bsrc").alias("__hi")
    )
    b = b.crossJoin(F.broadcast(lim)).withColumn(
        "__bucket",
        F.expr(f"(__bsrc - __lo) div (((__hi - __lo) div {buckets}) + 1)"),
    )
    totals = b.groupBy("__bucket").agg(F.count("*").alias("__t"))
    wb = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    base = totals.select(
        "__bucket",
        F.coalesce(F.sum("__t").over(wb), F.lit(0)).alias("__base"),
    )
    wi = Window.partitionBy("__bucket").orderBy(*order_cols)
    return (
        b.join(F.broadcast(base), "__bucket")
        .withColumn(
            "rank", (F.col("__base") + F.row_number().over(wi)).cast("long")
        )
        .drop("__bucket", "__base", "__bsrc", "__lo", "__hi")
    )


# public alias: the deterministic global-rank primitive is useful
# beyond suffix construction (e.g. exact tercile bucketing in
# q_text.kn_perplexity_buckets) — same contract, same guarantees.
two_level_rank = _two_level_rank


def _two_level_rank_fixed(
    df: DataFrame,
    bucket_src: Column,
    lo: int,
    hi: int,
    order_cols: list[str],
    buckets: int = 64,
) -> tuple[DataFrame, int]:
    """Two-level rank with STATICALLY KNOWN ``[lo, hi]`` bounds on
    ``bucket_src`` — the suffix-doubling fast path. The adaptive form
    above derives bucket width and base offsets from two aggregates
    over its own input, and both ride in as broadcasts; exchange
    reuse never crosses a broadcast boundary, so the input's lineage
    (a shuffle-derived distinct here) executes THREE times per rank.
    With the bounds known up front the width is a literal, the
    (unique-keyed) input materializes once (eager localCheckpoint),
    the ≤``buckets`` per-bucket counts collect to the driver
    (bounded: one row per bucket), and the base offsets attach as a
    literal array lookup — no aggregate broadcasts, no extra joins,
    one execution of the input.

    Rank VALUES differ from the adaptive form (bucket boundaries
    differ), but remain a pure deterministic function of the data;
    suffix construction only consumes rank equality and order, both
    of which any two-level bucketing preserves. Returns
    ``(ranked_df, n_rows)`` — the row count is free from the totals
    pass and feeds the next round's ``hi``."""
    width = ((hi - lo) // buckets) + 1
    b = (
        df.withColumn("__bsrc", bucket_src.cast("long"))
        .withColumn("__bucket", F.expr(f"(__bsrc - {lo}) div {width}"))
        .localCheckpoint(eager=True)
    )
    counts = dict(
        (r["__bucket"], r["__t"])
        for r in b.groupBy("__bucket").agg(F.count("*").alias("__t")).collect()
    )
    bases, running = [], 0
    for i in range(buckets):
        bases.append(running)
        running += counts.get(i, 0)
    wi = Window.partitionBy("__bucket").orderBy(*order_cols)
    ranked = (
        b.withColumn(
            "rank",
            (
                F.element_at(F.lit(bases), F.col("__bucket").cast("int") + 1)
                + F.row_number().over(wi)
            ).cast("long"),
        )
        .drop("__bucket", "__bsrc")
    )
    return ranked, running


def suffix_window_ranks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_log2: int = 4,
    seed_log2: int = 2,
    buckets: int = 64,
) -> DataFrame:
    """Bounded-window suffix ranking by prefix doubling: returns
    (id, n_toks, pos, v) where ``v`` is the global rank of the
    ``2^window_log2``-token window starting at ``pos`` — equal v iff
    equal window content, and v order = lexicographic order of the
    windows under a deterministically permuted seed alphabet. Windows
    truncated by the document end stay exact: the seed gram IS the
    (shorter) remaining text — tokens are space-free, so the joined
    string is injective on token sequences — and missing right
    halves in later rounds compare via a sentinel (-1, below every
    real rank): end-of-string suffix semantics, so v is a genuine
    (truncated) suffix ranking.

    Seeding: ranks start at window ``2^seed_log2`` grams directly
    (DC3 seeds with length-3 substrings for the same reason) — the
    small fixed seed amplification buys ``seed_log2`` fewer rounds of
    shuffle+materialize; doubling then runs rounds
    ``seed_log2+1..window_log2`` on fixed-width two-integer rows. Per
    round: one shift self-join on (id, pos+2^(k-1)) keys, one
    distinct-pair shuffle, the constant-size two-level rank, and one
    map-back join — each keyed, none global. Each round's frame is
    eager-checkpointed (the analysis-tree contract: every round
    references the previous frame twice); rank values are
    deterministic, so the checkpoints are a compile-time
    optimization only."""
    assert seed_log2 <= window_log2
    seed = 1 << seed_log2
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "",
    )
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
    g = base.select(
        "__id",
        F.size("__toks").alias("n_toks"),
        F.explode(
            # guard: Spark's sequence(0, -1) infers step -1 (it does
            # NOT return empty), so an empty document must shortcut
            F.when(
                F.size("__toks") > 0,
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - F.lit(1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.array_join(
                            F.slice("__toks", i + F.lit(1), F.lit(seed)), " "
                        ).alias("gram"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<pos:int,gram:string>>")
            )
        ).alias("__g"),
    ).select(
        "__id",
        "n_toks",
        F.col("__g.pos").alias("pos"),
        F.col("__g.gram").alias("gram"),
    )
    # unsigned-shift the hash into [0, 2^63) so the bucket arithmetic
    # cannot wrap int64 — and the hash DOMAIN is therefore statically
    # known, so the seed rank takes the fixed-bounds fast path (no
    # min/max broadcast). The hash only BUCKETS the seed vocabulary
    # (identity stays the gram string), so a collision merely
    # co-buckets two grams — never conflates them.
    r, n_prev = _two_level_rank_fixed(
        g.select("gram").distinct(),
        F.shiftrightunsigned(F.xxhash64("gram"), 1),
        0,
        (1 << 63) - 1,
        ["gram"],
        buckets,
    )
    cur = (
        g.join(r, "gram")
        .select("__id", "n_toks", "pos", F.col("rank").alias("v"))
        .localCheckpoint(eager=True)
    )
    for k in range(seed_log2, window_log2):
        half = 1 << k
        shifted = cur.select(
            "__id",
            (F.col("pos") - F.lit(half)).alias("pos"),
            F.col("v").alias("__v2"),
        )
        pairs = cur.join(shifted, ["__id", "pos"], "left").select(
            "__id",
            "n_toks",
            "pos",
            F.col("v").alias("__v1"),
            F.coalesce("__v2", F.lit(-1)).alias("__v2"),
        )
        # __v1 is a dense 1-based rank from the previous round, so its
        # bounds [1, n_prev] are known without touching the data —
        # fixed-bounds fast path again, and the next round's bound is
        # this round's (free) distinct-pair count
        m, n_prev = _two_level_rank_fixed(
            pairs.select("__v1", "__v2").distinct(),
            F.col("__v1"),
            1,
            max(n_prev, 1),
            ["__v1", "__v2"],
            buckets,
        )
        cur = (
            pairs.join(m, ["__v1", "__v2"])
            .select("__id", "n_toks", "pos", F.col("rank").alias("v"))
            .localCheckpoint(eager=True)
        )
    return cur


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 16,
    min_count: int = 2,
    buckets: int = 64,
) -> DataFrame:
    """Maximal exactly-duplicated spans of >= ``span_len`` tokens
    (ExactSubstr): every position whose ``span_len``-token window
    occurs >= ``min_count`` times corpus-wide (within-document
    repeats count) starts a duplicated window; overlapping/adjacent
    windows merge into maximal [span_start, span_end) token
    intervals per document. ``span_len`` must be a power of two (the
    doubling truncation point).

    Returns (id, span_start, span_end, span_len, n_dup_starts),
    integer-exact. Plan: the doubling rounds above, ONE rank-count
    shuffle, a semi-join, and one doc-keyed gaps-and-islands window —
    duplicated-gram skew fans out one row per instance (linear,
    never pairwise)."""
    assert span_len & (span_len - 1) == 0, "span_len must be a power of 2"
    wlog = span_len.bit_length() - 1
    ranked = suffix_window_ranks(
        df, id_col, text_col, window_log2=wlog, buckets=buckets
    )
    full = ranked.filter(F.col("pos") <= F.col("n_toks") - span_len)
    dup = (
        full.groupBy("v")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("v")
    )
    starts = full.join(dup, "v", "left_semi").select("__id", "pos")
    return merge_start_islands(starts, id_col, span_len)


def merge_start_islands(
    starts: DataFrame, id_col: str, span_len: int
) -> DataFrame:
    """Merge (__id, pos) window starts into maximal
    [span_start, span_end) token intervals per document
    (gaps-and-islands on one doc-keyed window: a new island opens
    when the gap to the previous start exceeds the window length,
    since all intervals share that fixed length)."""
    w = Window.partitionBy("__id").orderBy("pos")
    isl = starts.withColumn(
        "__brk",
        F.when(
            F.col("pos") - F.lag("pos").over(w) > span_len, 1
        ).otherwise(0),
    ).withColumn(
        "__isl",
        F.sum("__brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        isl.groupBy("__id", "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(span_len)).alias("span_end"),
            F.count("*").alias("n_dup_starts"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
            (F.col("span_end") - F.col("span_start"))
            .cast("long")
            .alias("span_len"),
            F.col("n_dup_starts").cast("long"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 16,
    min_count: int = 2,
    buckets: int = 64,
) -> DataFrame:
    """The second half of the Lee et al. 2022 ExactSubstr pipeline:
    REMOVE the maximal duplicated spans ``duplicated_spans`` finds
    and reassemble each document from its surviving tokens (the
    n-gram sibling is ``dedup.remove_dup_spans``; this is the exact
    suffix-array version). Coverage comes from the merged island
    intervals — one row per covered TOKEN (linear fanout; islands
    are disjoint per document by construction, so no distinct is
    needed) — an anti-join drops covered tokens, and ordered
    reassembly is the sort-in-array aggregate (array_sort of
    (idx, word) structs), exact in any aggregation order.

    Returns (id, clean_text, n_removed) for EVERY input document
    (clean_text = original text's tokens when nothing was removed).
    """
    spans = duplicated_spans(
        df, id_col, text_col, span_len=span_len,
        min_count=min_count, buckets=buckets,
    )
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "",
    )
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
    tok = base.select(
        "__id", F.posexplode("__toks").alias("idx", "word")
    ).withColumn("idx", F.col("idx").cast("long"))
    cov = spans.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end") - 1)
        ).alias("idx"),
    )
    keep = tok.join(cov, ["__id", "idx"], "left_anti")
    clean = keep.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("__nk"),
    )
    return (
        base.select("__id", F.size("__toks").alias("__nt"))
        .join(clean, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("__nt") - F.coalesce(F.col("__nk"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def contaminated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench_col: str,
    span_len: int = 16,
    buckets: int = 64,
) -> DataFrame:
    """Exact-substring benchmark contamination (the decontamination
    pass of Lee et al. 2022 / the GPT-3 appendix done exactly): every
    maximal span of >= ``span_len`` tokens in a TRAINING document
    whose text occurs verbatim anywhere in the BENCHMARK partition
    (``bench_col`` boolean). One suffix ranking over the UNION corpus
    (ranks are corpus-global, so train and bench windows land in the
    same rank groups by construction); a rank group contaminates when
    it contains >= 1 bench position, and every train position in such
    a group starts a contaminated window. Returns the span rows of
    ``duplicated_spans`` for train documents only."""
    assert span_len & (span_len - 1) == 0, "span_len must be a power of 2"
    wlog = span_len.bit_length() - 1
    tagged = df.select(
        F.col(id_col).alias("__oid"),
        F.col(text_col).alias("__text"),
        F.col(bench_col).cast("boolean").alias("__bench"),
    )
    ranked = suffix_window_ranks(
        tagged, "__oid", "__text", window_log2=wlog, buckets=buckets
    )
    full = ranked.filter(F.col("pos") <= F.col("n_toks") - span_len).join(
        tagged.select(F.col("__oid").alias("__id"), "__bench"), "__id"
    )
    benched = (
        full.groupBy("v")
        .agg(F.max(F.col("__bench").cast("int")).alias("__has_bench"))
        .filter(F.col("__has_bench") == 1)
        .select("v")
    )
    starts = (
        full.filter(~F.col("__bench"))
        .join(benched, "v", "left_semi")
        .select("__id", "pos")
    )
    return merge_start_islands(starts, id_col, span_len)
