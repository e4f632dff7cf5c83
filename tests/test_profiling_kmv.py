"""KMV sketch: exactness below k, estimator formula, mergeability."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bbcnews_scraper_nlp_spark.operators.profiling import (
    KMV_SALT,
    KMV_SPACE,
    kmv_estimate,
    kmv_hash,
    kmv_sketch,
)


def _hv(key) -> int:
    return int(hashlib.md5(f"{KMV_SALT}{key}".encode()).hexdigest()[:12], 16)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "g string, k bigint")


def test_hash_matches_literal_md5_prefix(spark):
    got = (
        spark.createDataFrame([(7,), (123456789,)], "k bigint")
        .select(kmv_hash(F.col("k")).alias("hv"))
        .collect()
    )
    assert [r["hv"] for r in got] == [_hv(7), _hv(123456789)]


def test_below_k_sketch_is_exact_distinct_set(spark):
    pairs = [("a", i) for i in range(10)] + [("a", 3), ("a", 7)]  # dups
    sk = kmv_sketch(_df(spark, pairs), "k", ["g"], k=64)
    got = sorted(r["hv"] for r in sk.collect())
    assert got == sorted(_hv(i) for i in range(10))
    est = kmv_estimate(sk, ["g"], k=64).collect()[0]["est"]
    assert est == 10  # exact branch


def test_full_sketch_estimator_formula(spark):
    n, k = 500, 16
    pairs = [("a", i) for i in range(n)]
    sk = kmv_sketch(_df(spark, pairs), "k", ["g"], k=k)
    hvs = sorted(_hv(i) for i in range(n))[:k]
    assert sorted(r["hv"] for r in sk.collect()) == hvs
    est = kmv_estimate(sk, ["g"], k=k).collect()[0]["est"]
    assert est == (k - 1) * KMV_SPACE // hvs[-1]
    # the estimate lands in the right ballpark (k=16 -> ~25% rse)
    assert n * 0.4 < est < n * 2.5


def test_union_sketch_equals_sketch_of_union(spark):
    # k-min of (k-min(A) U k-min(B)) == k-min(A U B): mergeability
    k = 8
    a = [("a", i) for i in range(50)]
    b = [("b", i) for i in range(25, 75)]
    ska = kmv_sketch(_df(spark, a), "k", ["g"], k=k)
    skb = kmv_sketch(_df(spark, b), "k", ["g"], k=k)
    merged = sorted(
        r["hv"]
        for r in ska.select("hv")
        .union(skb.select("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
        .collect()
    )
    direct = kmv_sketch(
        _df(spark, [("u", x[1]) for x in a + b]), "k", ["g"], k=k
    )
    assert merged == sorted(r["hv"] for r in direct.collect())


def test_grouped_sketches_independent(spark):
    pairs = [("a", i) for i in range(5)] + [("b", i) for i in range(100, 103)]
    sk = kmv_sketch(_df(spark, pairs), "k", ["g"], k=4)
    got = {r["g"]: r["est"] for r in kmv_estimate(sk, ["g"], k=4).collect()}
    assert got["b"] == 3  # below k: exact
    assert got["a"] >= 1  # full sketch: estimator branch


def test_setops_exact_below_k(spark):
    """With both groups below k the union sketch IS the union set and
    the intersection estimate is exact: x·est div n with est = n."""
    from bbcnews_scraper_nlp_spark.operators.profiling import kmv_setops

    a_keys = list(range(10))
    b_keys = list(range(5, 18))  # overlap = 5..9 (5 keys)
    pairs = [("a", k) for k in a_keys] + [("b", k) for k in b_keys]
    sk = kmv_sketch(_df(spark, pairs), "k", ["g"], k=64)
    got = {r["scope"]: r["est"] for r in
           kmv_setops(sk, "g", "a", "b", k=64).collect()}
    assert got["union:a+b"] == len(set(a_keys) | set(b_keys))
    assert got["intersect:a+b"] == len(set(a_keys) & set(b_keys))


def test_setops_empty_groups_guarded(spark):
    """Both groups absent -> n = 0 -> union and intersect both 0
    (the ADVICE r8 divide-by-zero guard)."""
    from bbcnews_scraper_nlp_spark.operators.profiling import kmv_setops

    pairs = [("c", k) for k in range(8)]
    sk = kmv_sketch(_df(spark, pairs), "k", ["g"], k=64)
    got = {r["scope"]: r["est"] for r in
           kmv_setops(sk, "g", "a", "b", k=64).collect()}
    assert got == {"union:a+b": 0, "intersect:a+b": 0}
