"""Query registry: every SURVEY §2 operator as a (Spark plan, DuckDB
oracle SQL) pair, run by ``__spark_entry__.py`` for the driver's
correctness gate.

Cross-engine determinism rules used throughout (the reason these
queries hash-match their oracles):
- Money/metric sums go through integer scaling
  (``ROUND(x*100)::BIGINT``) so SUM is exact integer arithmetic in
  both engines regardless of partial-aggregation order; the final
  division back to double is a single identical fp op.
- Every computed double is ROUND()ed identically on both sides.
- Every top-k orders by (value, unique-key) so ties are
  deterministic.
- Regexes use only syntax with identical semantics in Java regex
  (Spark) and RE2 (DuckDB); punctuation is an explicit ASCII class.
- Cross-engine hashes use md5 (both engines) — xxhash64 variants are
  engine-internal fast paths, exercised by pytest.
- Library-numeric results (LDA, coherence, KMeans IVF, BPE merges)
  are oracled as deterministic-bound certificates: one genuinely
  cross-engine exact value + booleans pinning the count machinery —
  every registered query has a DuckDB oracle.
- Aggregate/computed columns carry identical aliases on both sides.
- IEEE signed zero: Spark's ROUND (BigDecimal) never emits -0.0 but
  DuckDB's (raw double) does — oracle SQL appends `+ 0.0` after any
  ROUND whose input can be a tiny negative.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# registry plumbing lives in queries_base; the query definitions in
# the q_* domain modules (split out round 10, names byte-identical):
# importing them here populates REGISTRY as a side effect, in the
# original definition order.
from .queries_base import (  # noqa: F401  (re-exports)
    Query, REGISTRY, STOPWORDS_SQL, _sql_str_list, register,
)
from .operators.relational import cap_hot_keys  # noqa: F401  (re-export)
from .q_core import *  # noqa: F401,F403
from .q_text import *  # noqa: F401,F403
from .q_relational import *  # noqa: F401,F403
from .q_certificates import *  # noqa: F401,F403
from .q_traindata import *  # noqa: F401,F403
from .q_analytics import *  # noqa: F401,F403
from .q_graph import *  # noqa: F401,F403

# --------------------------------------------------------------------
# public accessors for __spark_entry__.py
# --------------------------------------------------------------------


# The driver's correctness gate checks the FIRST 50 entries of
# ``queries()``; everything after is invisible to it. This list
# curates that window: one representative per operator family, the
# full TPC-H spine, and every scale-critical operator — all with
# DuckDB oracles (hash-checkable), near-duplicate variants displaced
# to the tail (still registered, still pytest/local-checked via
# tools/check_oracles.py).
_WINDOW_ORDER = [
    # r12 rotation (evidence-age driven, per the r11 verdict). First
    # the queries added this round (no driver row yet):
    "item_item_recs_dimsum",
    "suffix_span_removal",
    "c4_badwords_ac",
    "butterfly_counts_sampled",
    # Then the three queries whose CODE changed this round (advice
    # fixes: DECIMAL/HUGEINT overflow lanes, integer-rank terciles,
    # oracle-mirrored degree cap) — their r11 evidence predates the
    # change, so they re-certify:
    "kneser_ney_bigram_lm",
    "kn_perplexity_buckets",
    "butterfly_counts_bipartite",
    # Then ALL 41 queries whose freshest driver evidence is round 7
    # (EVIDENCE.json r7 rows = CORRECTNESS_r07 keys minus later
    # rounds) — this retires round-7 evidence entirely; minimum
    # registry evidence age becomes r8.
    "ann_topk_batch",
    "approx_price_quantiles",
    "bpe_encode_subwords",
    "bpe_learned_merges",
    "cube_status_priority",
    "curriculum_order_bands",
    "dedup_embedding_cosine",
    "dedup_minhash_clusters",
    "deterministic_shuffle_order",
    "embedding_scalar_quant",
    "fuzzy_name_pairs",
    "gapfill_hourly_counts",
    "histogram_totalprice",
    "json_props_stats",
    "json_single_parse_stats",
    "multimodal_audio_decode",
    "multimodal_g711_decode",
    "multimodal_gif_decode",
    "multimodal_image_decode",
    "multimodal_image_resize",
    "multimodal_jpeg_color_decode",
    "multimodal_jpeg_decode",
    "multimodal_video_frame_decode",
    "new_users_per_day",
    "orders_with_bulk_items",
    "pagerank_copurchase",
    "price_quantiles",
    "rank_orders_in_priority",
    "semdedup_embeddings",
    "shortest_paths_suppliers",
    "similarity_ivf_fixed_topk",
    "similarity_ivf_topk",
    "similarity_ivfadc_topk",
    "sketch_distinct_users_daily",
    "streaming_image_decode",
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "streaming_user_stats",
    "textrank_keywords",
    "tpch_q1_pricing_summary",
    "value_histogram",
    # Then the oldest round-8 rows (all 48 r8 rows are equally old;
    # these two flagships fill the 50-slot window — the rest stay
    # local-checked via tools/check_oracles.py and rotate next
    # round).
    "tpch_q6_revenue_scan",
    "dedup_exact_content",
]



def _ordered_names() -> list[str]:
    tail = [n for n in REGISTRY if n not in set(_WINDOW_ORDER)]
    return [n for n in _WINDOW_ORDER if n in REGISTRY] + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].sql
        for name in _ordered_names()
        if REGISTRY[name].sql is not None
    }
