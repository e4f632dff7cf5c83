"""Topic coherence as a DataFrame computation (SURVEY §2.8 M3).

gensim's CoherenceModel(coherence='c_v') has no MLlib counterpart
(topic_modelling.ipynb:366-372, cell 8). We implement **UMass
coherence** — the standard corpus-count alternative (Mimno et al.
2011, "Optimizing Semantic Coherence in Topic Models") — entirely as
DataFrame aggregations, per SURVEY §7.4.3's documented swap:

  C_UMass(t) = mean over ordered pairs (w_i, w_j), i > j, of
               log( (D(w_i, w_j) + 1) / D(w_j) )

where D(w) = #docs containing w, D(wi,wj) = #docs containing both.

Plan shape (all relational, no Python):
  docs -> explode distinct tokens          (one shuffle: doc,term)
  term doc-freq    = groupBy(term).count()
  pair co-doc-freq = self-join on doc_id restricted to the topic's
                     top-N terms (N~10 -> at most k*N*(N-1)/2 pairs;
                     the join probe side is tiny and broadcast)
  coherence        = groupBy(topic).avg(log((pair+1)/df_j))

At 100 TB the doc-term explode dominates; it's one map + one
aggregation keyed by term, and only terms in the k*N top-term union
survive the (broadcast) semi-join before counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def umass_coherence(
    docs_tokens: DataFrame,
    topics_terms: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Compute per-topic UMass coherence.

    docs_tokens: (id_col, tokens_col: array<string>)
    topics_terms: (topic, term, rank) — rank 0 = highest weight.
    Returns (topic, coherence, n_pairs).
    """
    # distinct (doc, term) pairs, restricted to terms any topic uses
    wanted = topics_terms.select("term").distinct()
    doc_term = (
        docs_tokens.select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct(F.col(tokens_col))).alias("term"),
        )
        .join(F.broadcast(wanted), "term", "left_semi")
        .cache()
    )

    term_df = doc_term.groupBy("term").agg(F.count("*").alias("df"))

    # ordered topic term pairs (rank_i > rank_j => w_i later, w_j earlier)
    ti = topics_terms.select(
        F.col("topic"), F.col("term").alias("term_i"), F.col("rank").alias("rank_i")
    )
    tj = topics_terms.select(
        F.col("topic"), F.col("term").alias("term_j"), F.col("rank").alias("rank_j")
    )
    pairs = ti.join(tj, "topic").filter(F.col("rank_i") > F.col("rank_j"))

    # co-document frequency for exactly those pairs
    dt_i = doc_term.select(F.col("term").alias("term_i"), F.col("doc"))
    dt_j = doc_term.select(F.col("term").alias("term_j"), F.col("doc"))
    co = (
        pairs.select("topic", "term_i", "term_j")
        .join(dt_i, "term_i")
        .join(dt_j, ["term_j", "doc"])
        .groupBy("topic", "term_i", "term_j")
        .agg(F.count("*").alias("co_df"))
    )

    scored = (
        pairs.join(co, ["topic", "term_i", "term_j"], "left")
        .join(term_df.select(F.col("term").alias("term_j"), "df"), "term_j", "left")
        .withColumn("co_df", F.coalesce("co_df", F.lit(0)))
        .withColumn(
            "score",
            F.log((F.col("co_df") + 1) / F.col("df")),
        )
    )
    out = scored.groupBy("topic").agg(
        F.avg("score").alias("coherence"), F.count("*").alias("n_pairs")
    )
    doc_term.unpersist()
    return out


def topics_terms_from_model(model, vocab: list[str], num_words: int = 10) -> DataFrame:
    """(topic, term, rank) rows from an LDAModel's describeTopics."""
    topics = model.describeTopics(num_words)
    vocab_arr = F.lit(vocab)
    exploded = topics.select(
        "topic", F.posexplode("termIndices").alias("rank", "term_idx")
    )
    return exploded.select(
        "topic",
        F.element_at(vocab_arr, F.col("term_idx") + 1).alias("term"),
        "rank",
    )
