"""Golden regression against the reference's shipped output
(`/root/reference/data/articles_sentiments.csv`, 20,350 rows — the
only executable golden the reference publishes, SURVEY §5).

We load the golden with the pinned SENTIMENTS_SCHEMA, run our trend
operator (daily mean + rolling-10, sentiment_analysis.ipynb cell 13),
and compare row-for-row against an independent pandas oracle on the
same file. Also asserts the corpus-level means documented in
BASELINE.md (0.0654 / 0.3966)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bbcnews_scraper_nlp_spark.operators.relational import rolling_mean_min_periods

GOLDEN = "/root/reference/data/articles_sentiments.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden not present"
)


@pytest.fixture(scope="module")
def golden_df(spark):
    return (
        spark.read.option("header", True)
        .csv(GOLDEN)
        .select(
            F.to_timestamp("date").alias("date"),
            F.col("polarity").cast("double"),
            F.col("subjectivity").cast("double"),
            "title",
            "url",
        )
    )


def test_corpus_means_match_baseline(golden_df):
    row = golden_df.agg(
        F.avg("polarity").alias("p"), F.avg("subjectivity").alias("s"),
        F.count("*").alias("n"),
    ).first()
    assert row["n"] == 20350
    assert abs(row["p"] - 0.0654) < 5e-4  # BASELINE.md documented means
    assert abs(row["s"] - 0.3966) < 5e-4


def test_trend_query_matches_pandas_oracle(golden_df):
    daily = golden_df.groupBy(F.to_date("date").alias("d")).agg(
        F.avg("polarity").alias("polarity"),
        F.avg("subjectivity").alias("subjectivity"),
    )
    trend = (
        rolling_mean_min_periods(daily, "d", ["polarity", "subjectivity"], 10)
        .orderBy("d")
        .collect()
    )

    pdf = pd.read_csv(GOLDEN, parse_dates=["date"])
    pdf["d"] = pdf["date"].dt.date
    pdaily = (
        pdf.groupby("d")[["polarity", "subjectivity"]].mean().sort_index()
    )
    proll = pdaily.rolling(window=10).mean()

    assert len(trend) == len(pdaily)
    for r in trend:
        for col in ("polarity", "subjectivity"):
            assert abs(r[col] - pdaily.loc[r["d"], col]) < 1e-9
            exp = proll.loc[r["d"], col]
            got = r[f"rolling_{col}"]
            if pd.isna(exp):
                assert got is None
            else:
                assert abs(got - exp) < 1e-9
