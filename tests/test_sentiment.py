"""Sentiment surfaces: pure-expression vs broadcast-join vs pandas
UDF — identical scores where semantics coincide; negation rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from bbcnews_scraper_nlp_spark.functions import sentiment as S


def test_expr_matches_python(spark):
    rows = [
        (0, "good fast table"),
        (1, "slow bad error"),
        (2, "no lexicon words here"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    toks = F.split(F.col("text"), " ")
    got = {
        r["id"]: (r["p"], r["s"])
        for r in df.select(
            "id",
            S.polarity_expr(toks).alias("p"),
            S.subjectivity_expr(toks).alias("s"),
        ).collect()
    }
    lex = S.DEFAULT_LEXICON
    for i, text in rows:
        hits = [lex[w] for w in text.split(" ") if w in lex]
        exp_p = sum(h[0] for h in hits) / len(hits) if hits else 0.0
        exp_s = sum(h[1] for h in hits) / len(hits) if hits else 0.0
        assert abs(got[i][0] - exp_p) < 1e-12
        assert abs(got[i][1] - exp_s) < 1e-12


def test_join_path_matches_expr_path(spark):
    df = spark.createDataFrame(
        [(0, "good fast table"), (1, "slow bad"), (2, "nothing matches")],
        "id long, text string",
    )
    toks_df = df.select("id", F.split("text", " ").alias("tokens"))
    lex_rows = [(w, p, s) for w, (p, s) in S.DEFAULT_LEXICON.items()]
    lex_df = spark.createDataFrame(lex_rows, "word string, polarity double, subjectivity double")
    joined = {
        r["id"]: (r["polarity"], r["subjectivity"])
        for r in S.score_with_lexicon_join(toks_df, "tokens", ["id"], lex_df).collect()
    }
    expr = {
        r["id"]: (r["p"], r["s"])
        for r in df.select(
            "id",
            S.polarity_expr(F.split("text", " ")).alias("p"),
            S.subjectivity_expr(F.split("text", " ")).alias("s"),
        ).collect()
    }
    for i in joined:
        assert abs(joined[i][0] - expr[i][0]) < 1e-12
        assert abs(joined[i][1] - expr[i][1]) < 1e-12


def test_pandas_udf_negation(spark):
    df = spark.createDataFrame([("not good",), ("good",)], "text string")
    udf = S.make_sentiment_pandas_udf()
    out = [r["s"]["polarity"] for r in df.select(udf("text").alias("s")).collect()]
    # "not good" -> -0.5 * 0.7; "good" -> 0.7
    assert abs(out[0] - (-0.35)) < 1e-12
    assert abs(out[1] - 0.7) < 1e-12
