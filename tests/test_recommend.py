"""Item-item CF: integer cosine ranking on planted baskets."""

from __future__ import annotations

from bbcnews_scraper_nlp_spark.operators.recommend import item_item_topk


def _ia(spark, pairs):
    return spark.createDataFrame(pairs, "user string, item string")


def test_copurchase_ranking(spark):
    # u1..u3 buy {a, b}; u3 also buys c -> b is a's strongest rec
    pairs = [
        ("u1", "a"), ("u1", "b"),
        ("u2", "a"), ("u2", "b"),
        ("u3", "a"), ("u3", "b"), ("u3", "c"),
    ]
    got = {
        (r["item"], r["rank"]): (r["rec"], r["sim_ppm"])
        for r in item_item_topk(_ia(spark, pairs), k=2).collect()
    }
    # cos²(a,b) = 3²/(3·3) = 1 -> 1_000_000 ppm exactly
    assert got[("a", 1)] == ("b", 1_000_000)
    # cos²(a,c) = 1²/(3·1)
    assert got[("a", 2)] == ("c", 1_000_000 // 3)


def test_tie_breaks_by_item_id(spark):
    # b and c are symmetric partners of a -> rank order is b then c
    pairs = [("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "c")]
    got = [
        (r["rec"], r["rank"])
        for r in item_item_topk(_ia(spark, pairs), k=3)
        .filter("item = 'a'")
        .orderBy("rank")
        .collect()
    ]
    assert got == [("b", 1), ("c", 2)]


def test_no_self_and_no_unobserved_pairs(spark):
    # d shares no user with a -> no (a, d) row; no (x, x) rows at all
    pairs = [("u1", "a"), ("u1", "b"), ("u2", "d")]
    rows = item_item_topk(_ia(spark, pairs), k=5).collect()
    assert all(r["item"] != r["rec"] for r in rows)
    assert not [r for r in rows if {r["item"], r["rec"]} == {"a", "d"}]


def test_matches_literal_python(spark):
    import itertools

    pairs = sorted(
        {(f"u{i % 7}", f"i{(i * 3) % 11}") for i in range(40)}
    )
    by_user: dict[str, set[str]] = {}
    for u, i in pairs:
        by_user.setdefault(u, set()).add(i)
    deg: dict[str, int] = {}
    co: dict[tuple[str, str], int] = {}
    for u, items in by_user.items():
        for i in items:
            deg[i] = deg.get(i, 0) + 1
        for i, j in itertools.permutations(items, 2):
            co[(i, j)] = co.get((i, j), 0) + 1
    expected = {}
    for i in deg:
        scored = sorted(
            (
                (-(c * c * 1_000_000 // (deg[a] * deg[b])), b)
                for (a, b), c in co.items()
                if a == i
            ),
        )[:3]
        expected[i] = [(b, -s) for s, b in scored]
    got: dict[str, list] = {}
    for r in (
        item_item_topk(_ia(spark, pairs), k=3).orderBy("item", "rank").collect()
    ):
        got.setdefault(r["item"], []).append((r["rec"], r["sim_ppm"]))
    assert got == {i: v for i, v in expected.items() if v}

def test_min_co_prune_preserves_topk(spark):
    # a's top-2 neighbors (b: co=3, c: co=2) both have co >= 2; the
    # singleton partner d (co=1) is below every top-2 similarity, so
    # the support prune must not change the top-2 at all
    pairs = [
        ("u1", "a"), ("u1", "b"),
        ("u2", "a"), ("u2", "b"),
        ("u3", "a"), ("u3", "b"), ("u3", "c"),
        ("u4", "a"), ("u4", "c"),
        ("u5", "a"), ("u5", "d"),
    ]
    base = sorted(
        (r["item"], r["rank"], r["rec"], r["sim_ppm"])
        for r in item_item_topk(_ia(spark, pairs), k=2).collect()
        if r["item"] == "a"
    )
    pruned = sorted(
        (r["item"], r["rank"], r["rec"], r["sim_ppm"])
        for r in item_item_topk(_ia(spark, pairs), k=2, min_co=2).collect()
        if r["item"] == "a"
    )
    assert base == pruned
    assert [p[2] for p in base] == ["b", "c"]


def test_min_co_prune_drops_singletons(spark):
    # with min_co=2 the co=1 pair (a, d) must vanish entirely —
    # d has no surviving neighbor, so it emits no recs at all
    pairs = [
        ("u1", "a"), ("u1", "b"),
        ("u2", "a"), ("u2", "b"),
        ("u3", "a"), ("u3", "d"),
    ]
    out = item_item_topk(_ia(spark, pairs), k=3, min_co=2).collect()
    items = {r["item"] for r in out}
    recs = {(r["item"], r["rec"]) for r in out}
    assert ("a", "d") not in recs and ("d", "a") not in recs
    assert "d" not in items
