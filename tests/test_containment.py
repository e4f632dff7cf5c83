"""Shingle containment: literal-Python twin (exact integers)."""

from __future__ import annotations

from bbcnews_scraper_nlp_spark.catalog import load_table
from bbcnews_scraper_nlp_spark.q_text import shingle_containment_pairs


def _python_containment(texts, n=3, max_df=1000, k=50):
    grams = {}
    for i, s in texts:
        ts = [t for t in (s or "").split() if t]
        grams[i] = {
            " ".join(ts[p : p + n]) for p in range(max(len(ts) - n + 1, 0))
        }
    df = {}
    for g in grams.values():
        for x in g:
            df[x] = df.get(x, 0) + 1
    kept = {i: {x for x in g if df[x] <= max_df} for i, g in grams.items()}
    out = []
    ids = sorted(kept)
    for a in ids:
        if not kept[a]:
            continue
        for b in ids:
            if a == b:
                continue
            inter = len(kept[a] & kept[b])
            if inter:
                out.append(
                    (
                        a,
                        b,
                        inter,
                        len(kept[a]),
                        inter * 1000000 // len(kept[a]),
                    )
                )
    out.sort(key=lambda r: (-r[4], r[0], r[1]))
    return out[:k]


def test_containment_matches_python_twin(spark, sf_dir):
    got = [tuple(r) for r in shingle_containment_pairs(spark, sf_dir).collect()]
    docs = load_table(spark, sf_dir, "documents")
    texts = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    exp = _python_containment(texts)
    assert got == exp
    assert len(got) == 50
    # asymmetry is real in the fixture: some pair scores differ by
    # direction (the reason containment exists next to Jaccard)
    d = {(a, b): p for a, b, _, _, p in got}
    assert any(
        (b, a) not in d or d[(b, a)] != p for (a, b), p in d.items()
    )


def test_containment_catches_subdocument_dup(spark):
    sub = " ".join(f"q{i}" for i in range(12))
    big = "x0 x1 x2 " + sub + " y0 y1 y2 y3 y4 y5 y6 y7 y8 y9 y10 y11"
    rows = [(1, sub), (2, big), (3, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9")]
    from bbcnews_scraper_nlp_spark.operators.relational import top_n  # noqa: F401
    import bbcnews_scraper_nlp_spark.q_text as qt
    from pyspark.sql import functions as F  # noqa: F401

    # run the same pipeline on a local frame via the python twin +
    # a direct spark evaluation through the registered fn is
    # table-bound; evaluate the twin's law instead: doc1 fully
    # contained in doc2, not vice versa
    exp = _python_containment(rows, k=10)
    d = {(a, b): p for a, b, _, _, p in exp}
    assert d[(1, 2)] == 1000000  # sub fully contained
    assert d[(2, 1)] < 500000    # container only partially covered
