"""RAKE keyphrases: the registered query vs a literal-Python RAKE
with the same stopword set, length cap, and milli quantization."""

from __future__ import annotations

import collections

from bbcnews_scraper_nlp_spark.functions.text_clean import ALL_STOPWORDS
from bbcnews_scraper_nlp_spark.queries import REGISTRY


def _literal_rake(texts, top=20):
    stops = set(ALL_STOPWORDS)
    phrases = []
    for text in texts:
        cur = []
        for w in text.split(" "):
            if not w:
                continue
            if len(w) < 3 or w in stops:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    phrases = [p for p in phrases if len(p) <= 4]
    freq: collections.Counter = collections.Counter()
    deg: collections.Counter = collections.Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    ws = {w: 1000 * deg[w] // freq[w] for w in freq}
    scored = {(" ".join(p), sum(ws[w] for w in p)) for p in phrases}
    return sorted(scored, key=lambda x: (-x[1], x[0]))[:top]


def test_rake_matches_literal_python_on_testdata(spark, sf_dir):
    import duckdb

    texts = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT text FROM '{sf_dir}/documents.parquet'")
        .fetchall()
    ]
    expected = _literal_rake(texts)
    got = [
        (r["phrase"], r["score_milli"])
        for r in REGISTRY["rake_keyphrases"].fn(spark, sf_dir).collect()
    ]
    assert got == expected


def test_rake_planted_phrase_ranks_first(spark, tmp_path):
    # a repeated content-word phrase dominates scattered single words
    rows = [
        (1, "the quick brown fox and quick brown fox with lazy dog"),
        (2, "quick brown fox over there"),
        (3, "some other words entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # the query loads <sf_dir>/documents.parquet
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["rake_keyphrases"].fn(spark, str(tmp_path)).collect()
    assert out[0]["phrase"] == "quick brown fox"
