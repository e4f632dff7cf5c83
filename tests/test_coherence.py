"""c_v coherence vs a literal pure-Python oracle.

The oracle transcribes the measure's definition (Röder et al. 2015;
gensim CoherenceModel(coherence='c_v') semantics, the metric at
reference topic_modelling.ipynb:366-372 cell 8): explicit boolean
sliding windows, NPMI, one-set-segmentation indirect cosine. The
Spark operator must match it to fp tolerance — its interval-union
plan is an optimization, not an approximation.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from bbcnews_scraper_nlp_spark.operators.coherence import cv_coherence

EPS = 1e-12


def _cv_oracle(docs, topics, window):
    windows = []
    for toks in docs:
        n = len(toks)
        if n <= window:
            windows.append(set(toks))
        else:
            for s in range(n - window + 1):
                windows.append(set(toks[s : s + window]))
    w_total = len(windows)
    all_terms = {t for ts in topics.values() for t in ts}
    cnt: Counter = Counter()
    co: Counter = Counter()
    for w in windows:
        present = sorted(all_terms & w)
        for t in present:
            cnt[t] += 1
        for i, a in enumerate(present):
            for b in present[i + 1 :]:
                co[(a, b)] += 1

    def npmi(a, b):
        pa, pb = cnt[a] / w_total, cnt[b] / w_total
        if pa == 0 or pb == 0:
            return 0.0
        cab = cnt[a] if a == b else co[(min(a, b), max(a, b))]
        pab = cab / w_total
        return math.log((pab + EPS) / (pa * pb)) / -math.log(pab + EPS)

    out = {}
    for topic, terms in topics.items():
        vecs = {a: [npmi(a, b) for b in terms] for a in terms}
        v_w = [sum(vecs[a][j] for a in terms) for j in range(len(terms))]
        nw = math.sqrt(sum(y * y for y in v_w))
        cos = []
        for a in terms:
            dot = sum(x * y for x, y in zip(vecs[a], v_w))
            na = math.sqrt(sum(x * x for x in vecs[a]))
            cos.append(dot / (na * nw))
        out[topic] = sum(cos) / len(cos)
    return out


def _topics_df(spark, topics):
    rows = [
        (topic, term, rank)
        for topic, terms in topics.items()
        for rank, term in enumerate(terms)
    ]
    return spark.createDataFrame(rows, "topic int, term string, rank int")


VOCAB = (
    "goal team match cup league vote bill policy minister bank "
    "price stock trade rain sun cloud wind storm river hill"
).split()


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(7)
    docs = []
    for i in range(60):
        # lengths straddle the test window sizes: some docs shorter
        # than the window (single whole-doc window), some much longer
        n = rng.choice([3, 8, 40, 120])
        docs.append([rng.choice(VOCAB) for _ in range(n)])
    return docs


@pytest.mark.parametrize("window", [5, 110])
def test_cv_matches_literal_oracle(spark, corpus, window):
    topics = {
        0: ["goal", "team", "match", "cup"],
        1: ["vote", "bill", "policy", "rain"],
        2: ["bank", "price", "stock", "trade"],
    }
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, tokens array<string>"
    )
    got = {
        r["topic"]: r["coherence"]
        for r in cv_coherence(df, _topics_df(spark, topics), window=window).collect()
    }
    want = _cv_oracle(corpus, topics, window)
    assert set(got) == set(want)
    for t in want:
        assert got[t] == pytest.approx(want[t], abs=1e-9), f"topic {t} w={window}"


def test_cv_absent_term_is_handled(spark, corpus):
    topics = {0: ["goal", "team", "zzz_never_seen"]}
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, tokens array<string>"
    )
    out = cv_coherence(df, _topics_df(spark, topics), window=10).collect()
    assert len(out) == 1
    # absent term contributes zero NPMI components, not a crash/NULL
    assert out[0]["coherence"] == out[0]["coherence"]  # not NaN
    assert out[0]["n_terms"] == 3


def test_cv_planted_beats_mixed(spark):
    rng = random.Random(3)
    clusters = {
        0: "football goal striker keeper penalty".split(),
        1: "election ballot senate governor law".split(),
    }
    docs = []
    for i in range(200):
        c = i % 2
        docs.append([rng.choice(clusters[c]) for _ in range(30)])
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, tokens array<string>"
    )
    planted = {0: clusters[0], 1: clusters[1]}
    mixed = {
        0: clusters[0][:3] + clusters[1][:2],
        1: clusters[1][3:] + clusters[0][3:],
    }
    got_p = {
        r["topic"]: r["coherence"]
        for r in cv_coherence(df, _topics_df(spark, planted), window=20).collect()
    }
    got_m = {
        r["topic"]: r["coherence"]
        for r in cv_coherence(df, _topics_df(spark, mixed), window=20).collect()
    }
    assert min(got_p.values()) > max(got_m.values())
