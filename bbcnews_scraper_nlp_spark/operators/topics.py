"""Topic modeling: the reference's gensim LDA pipeline rebuilt on
MLlib (SURVEY §2.8 M1-M5, M8).

Reference flow (topic_modelling.ipynb cells 5-31):
  tokenize -> Dictionary.filter_extremes(no_below=10, no_above=0.9)
  -> doc2bow -> LdaMulticore(k, passes=20, seed=42) -> per-doc argmax
  -> keywords string -> 12-row label join.

Spark-first mapping:
  clean tokens (ArrayType col) -> CountVectorizer(minDF=10, maxDF=0.9)
  -> LDA(k, maxIter, seed, optimizer='online') -> transform ->
  vector argmax (W3 semantics: first-max tie-break) -> broadcast join
  topic keywords.

Scale notes: CountVectorizer's vocabulary is a broadcast array (the
reference's global Dictionary); online LDA mini-batches across
partitions (gensim's chunksize/workers are subsumed by partitioning);
inference is a narrow map over the features column. The reference's
positional concat (J2) is redesigned: the document key column rides
through the whole pipeline so the final join is a real equi-join.
"""

from __future__ import annotations

from pyspark.ml.clustering import LDA, LDAModel
from pyspark.ml.feature import CountVectorizer, CountVectorizerModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_partitions(df: DataFrame, n_rows: int, rows_per_partition: int = 512) -> int:
    """Partition count for iterative MLlib fits (LDA/KMeans): each
    iteration launches one job over every partition, so per-job
    scheduling overhead scales with partition count while per-task
    work scales with rows per partition. Aim ≥ rows_per_partition
    rows/task (measured ~3x faster than 32 near-empty partitions at
    5k docs), capped at cluster width — at real corpus sizes the cap
    binds and the fit runs at full parallelism."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return max(1, min(parallelism, n_rows // rows_per_partition))


def fit_count_vectorizer(
    df: DataFrame,
    tokens_col: str = "tokens",
    features_col: str = "features",
    min_df: float = 10.0,
    max_df: float = 0.9,
    vocab_size: int = 1 << 18,
) -> CountVectorizerModel:
    """A4/A5: vocabulary build + prune, doc-term vectors.
    minDF/maxDF mirror Dictionary.filter_extremes(no_below=10,
    no_above=0.9) (topic_modelling.ipynb:319, cell 7)."""
    cv = CountVectorizer(
        inputCol=tokens_col,
        outputCol=features_col,
        minDF=min_df,
        maxDF=max_df,
        vocabSize=vocab_size,
    )
    return cv.fit(df)


def fit_lda(
    vectorized: DataFrame,
    k: int = 12,
    max_iter: int = 20,
    seed: int = 42,
    features_col: str = "features",
) -> LDAModel:
    """M1: LDA train. k=12/passes=20/seed=42 mirror the reference's
    production model (topic_modelling.ipynb:410-421, cell 10);
    'online' = distributed mini-batch EM, the scale path."""
    lda = LDA(
        k=k,
        maxIter=max_iter,
        seed=seed,
        optimizer="online",
        featuresCol=features_col,
    )
    return lda.fit(vectorized)


def topic_keywords(
    model: LDAModel, vocab: list[str], num_words: int = 10
) -> DataFrame:
    """M4: per-topic top-terms as a ', '-joined string
    (print_topics/show_topic, topic_modelling.ipynb cells 11/23)."""
    topics = model.describeTopics(num_words)
    vocab_arr = F.lit(vocab)
    words = F.transform(
        F.col("termIndices"), lambda i: F.element_at(vocab_arr, i + 1)
    )
    return topics.select(
        F.col("topic").alias("topic_num"),
        F.array_join(words, ", ").alias("keywords"),
    )


def dominant_topics(
    transformed: DataFrame,
    id_col: str,
    dist_col: str = "topicDistribution",
) -> DataFrame:
    """M5+W3: per-doc dominant topic = argmax of θ with
    first-occurrence tie-break (matching Python sorted stability,
    topic_modelling.ipynb cell 23), weight rounded to 4 like the
    reference's round(prop_topic, 4)."""
    arr = vector_to_array(F.col(dist_col))
    mx = F.array_max(arr)
    idx = (F.array_position(arr, mx) - 1).cast("int")
    return transformed.select(
        F.col(id_col),
        idx.alias("dominant_topic"),
        F.round(mx, 4).alias("weight"),
    )


def lda_pipeline(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    k: int = 12,
    max_iter: int = 20,
    seed: int = 42,
    min_df: float = 10.0,
    max_df: float = 0.9,
    num_words: int = 10,
    labels: DataFrame | None = None,
) -> DataFrame:
    """End-to-end M1-M5: returns (id, dominant_topic, weight,
    keywords[, topic_label]).

    The label join is J1: a broadcast left join against a k-row dim
    (topic_modelling.ipynb:1692-1696, cell 29)."""
    # cache the token arrays: CV fit, CV transform, and the LDA
    # minibatch iterations would otherwise each recompute the
    # upstream tokenize/clean chain
    df = df.cache()
    n_docs = df.count()
    cv_model = fit_count_vectorizer(
        df, tokens_col=tokens_col, min_df=min_df, max_df=max_df
    )
    target = fit_partitions(df, n_docs)
    vectorized = cv_model.transform(df)
    if target < vectorized.rdd.getNumPartitions():
        vectorized = vectorized.coalesce(target)
    vectorized = vectorized.cache()
    model = fit_lda(vectorized, k=k, max_iter=max_iter, seed=seed)
    transformed = model.transform(vectorized)
    dom = dominant_topics(transformed, id_col)
    vectorized.unpersist(blocking=False)
    df.unpersist(blocking=False)
    kw = topic_keywords(model, cv_model.vocabulary, num_words)
    out = dom.join(
        F.broadcast(kw), dom.dominant_topic == kw.topic_num, "left"
    ).drop("topic_num")
    if labels is not None:
        out = out.join(
            F.broadcast(labels), out.dominant_topic == labels.topic_num, "left"
        ).drop("topic_num")
    return out


def sweep_k(
    df: DataFrame,
    tokens_col: str,
    ks: list[int],
    max_iter: int = 10,
    seed: int = 42,
    min_df: float = 10.0,
    max_df: float = 0.9,
    metric: str = "perplexity",
    id_col: str = "doc_id",
    coherence_words: int = 10,
) -> list[tuple[int, float]]:
    """M2: hyperparameter sweep over k. Mirrors
    topic_modelling.ipynb:347-375 (cell 8), where the reference picks
    argmax c_v coherence.

    metric='perplexity': logPerplexity (lower=better, built-in).
    metric='cv': mean per-topic c_v coherence (higher=better) via
    coherence.cv_coherence — the faithful reproduction of the
    reference's selection criterion."""
    cv_model = fit_count_vectorizer(
        df, tokens_col=tokens_col, min_df=min_df, max_df=max_df
    )
    vectorized = cv_model.transform(df).cache()
    out = []
    try:
        for k in ks:
            model = fit_lda(vectorized, k=k, max_iter=max_iter, seed=seed)
            if metric == "cv":
                from .coherence import cv_coherence, topics_terms_from_model

                terms = topics_terms_from_model(
                    model, cv_model.vocabulary, num_words=coherence_words
                )
                score = (
                    cv_coherence(df, terms, id_col=id_col, tokens_col=tokens_col)
                    .agg(F.avg("coherence"))
                    .collect()[0][0]
                )
                out.append((k, float(score)))
            else:
                out.append((k, model.logPerplexity(vectorized)))
    finally:
        vectorized.unpersist()
    return out
