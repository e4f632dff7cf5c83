"""Interpolated Kneser-Ney bigram LM: literal-Fraction twin and the
proper-distribution law Σ_b P(b|a) = 1 (exact, before quantization)."""

from __future__ import annotations

from fractions import Fraction

from bbcnews_scraper_nlp_spark.catalog import load_table
from bbcnews_scraper_nlp_spark.q_text import kneser_ney_bigram_lm


def _python_kn(texts):
    """Exact-rational interpolated KN (d = 3/4), Chen-Goodman eq.
    4.25: returns {(a,b): (c_ab, c_a, n1_fwd, n1_rev, P as Fraction)}
    plus NT."""
    bi: dict[tuple, int] = {}
    for _, s in texts:
        ts = [t for t in (s or "").split() if t]
        for x, y in zip(ts, ts[1:]):
            bi[(x, y)] = bi.get((x, y), 0) + 1
    c_a: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1r: dict[str, int] = {}
    for (a, b), c in bi.items():
        c_a[a] = c_a.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1r[b] = n1r.get(b, 0) + 1
    nt = len(bi)
    d = Fraction(3, 4)
    out = {}
    for (a, b), c in bi.items():
        p = (max(Fraction(c) - d, 0)) / c_a[a] + d * n1f[a] / c_a[a] * Fraction(
            n1r[b], nt
        )
        out[(a, b)] = (c, c_a[a], n1f[a], n1r[b], p)
    return out, nt


def test_kn_is_a_proper_distribution_exact():
    texts = [(0, "a b a b c"), (1, "b a a c b"), (2, "c c a b b a")]
    kn, _ = _python_kn(texts)
    by_ctx: dict[str, Fraction] = {}
    seen_b: dict[str, set] = {}
    for (a, b), (_, _, _, _, p) in kn.items():
        by_ctx[a] = by_ctx.get(a, 0) + p
        seen_b.setdefault(a, set()).add(b)
    # observed successors sum to < 1; the deficit is exactly the
    # backoff mass spread over UNSEEN (a, b) pairs — add it back via
    # the continuation term and the total must be exactly 1
    _, ntv = _python_kn(texts)
    n1r: dict[str, int] = {}
    for (a, b), (_, _, _, r, _) in kn.items():
        n1r[b] = r
    for a, seen in seen_b.items():
        _, c_a, n1f_a, _, _ = next(
            v for (x, _), v in kn.items() if x == a
        )
        unseen_mass = sum(
            Fraction(3, 4) * n1f_a / c_a * Fraction(n1r[b], ntv)
            for b in n1r
            if b not in seen
        )
        assert by_ctx[a] + unseen_mass == 1, a


def test_kn_query_matches_fraction_twin(spark, sf_dir):
    rows = kneser_ney_bigram_lm(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    texts = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    kn, nt = _python_kn(texts)
    assert len(rows) == 100
    prev = None
    for r in rows:
        c, ca, f, rv, p = kn[(r["a"], r["b"])]
        assert (r["c_ab"], r["c_a"], r["n1_fwd"], r["n1_rev"]) == (c, ca, f, rv)
        # pkn_ppm is the floor of the exact rational in ppm
        assert r["pkn_ppm"] == (p.numerator * 1000000) // p.denominator
        key = (-r["c_ab"], r["a"], r["b"])
        assert prev is None or prev < key  # top-100 order, full tie-break
        prev = key


def test_kn_perplexity_buckets_internally_consistent(spark, sf_dir):
    """Bucket labels must be the exact rank-tercile classification of
    the query's own integer ce_micro column ((ce_micro, doc_id) rank
    vs ceil(n/3)/ceil(2n/3) thresholds — the engine-invariant cut
    that replaced interpolated percentiles), ce_micro must be the
    floored micronat form of cross_entropy, terciles near-balanced,
    and every scored doc present (docs with >= 2 tokens)."""
    from bbcnews_scraper_nlp_spark.q_text import kn_perplexity_buckets

    rows = kn_perplexity_buckets(spark, sf_dir).collect()
    n = len(rows)
    assert n > 400
    order = sorted(rows, key=lambda r: (r["ce_micro"], r["doc_id"]))
    k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
    for rk, r in enumerate(order, start=1):
        want = "head" if rk <= k1 else "middle" if rk <= k2 else "tail"
        assert r["ppl_bucket"] == want, (rk, r)
        # ce_micro is exactly the floored micronat mean: ce_micro <=
        # cross_entropy * 1e6 < ce_micro + 1 (up to fp display error)
        assert abs(r["ce_micro"] - r["cross_entropy"] * 1e6) < 1.0 + 1e-6
    from collections import Counter

    c = Counter(r["ppl_bucket"] for r in rows)
    assert max(c.values()) - min(c.values()) <= 2  # exact terciles
