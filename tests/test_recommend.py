"""Item-item CF: integer cosine ranking on planted baskets."""

from __future__ import annotations

from bbcnews_scraper_nlp_spark.operators.recommend import (
    item_item_dimsum,
    item_item_topk,
)


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


# ---------------------------------------------------------------
# DIMSUM magnitude-proportional sampling (item_item_dimsum)
# ---------------------------------------------------------------

_PAIRS = sorted({(f"u{i % 7}", f"i{(i * 3) % 11}") for i in range(40)})


def _dimsum_py(pairs, k=3, gamma=6):
    """Literal-Python twin of item_item_dimsum: same per-ENTRY md5
    draws, same integer comparisons, same single-formula two-lane
    estimator."""
    import hashlib
    import itertools

    by_user: dict[str, set[str]] = {}
    for u, i in pairs:
        by_user.setdefault(u, set()).add(i)
    deg: dict[str, int] = {}
    for items in by_user.values():
        for i in items:
            deg[i] = deg.get(i, 0) + 1
    g2 = gamma * gamma

    def drew(u, i):
        n = deg[i]
        if n <= g2:
            return True
        h = int(
            hashlib.md5(f"dimsum-v1:{u}:{i}".encode()).hexdigest()[:5],
            16,
        )
        return h * h * n < g2 * (1 << 40)

    co: dict[tuple[str, str], int] = {}
    for u, items in by_user.items():
        kept = sorted(i for i in items if drew(u, i))
        for i, j in itertools.permutations(kept, 2):
            co[(i, j)] = co.get((i, j), 0) + 1
    out: dict[str, list] = {}
    for i in deg:
        scored = []
        for (a, b), c in co.items():
            if a != i:
                continue
            ni, nj = deg[a], deg[b]
            s = c * c * 1_000_000 // (min(ni, g2) * min(nj, g2))
            samp = 1 if (ni > g2 or nj > g2) else 0
            scored.append((-s, b, samp))
        scored.sort()
        if scored:
            out[i] = [(b, -s, samp) for s, b, samp in scored[:k]]
    return out


def test_dimsum_exact_lane_equals_exact_variant(spark):
    # every item degree here is <= 7 <= gamma² = 1024: p = 1 on every
    # entry, the draw never fires, and DIMSUM must be row-identical
    # (ranks, recs, sim_ppm) to the exact CF — the "well-supported
    # pairs are never degraded" guarantee
    exact = sorted(
        (r["item"], r["rank"], r["rec"], r["sim_ppm"])
        for r in item_item_topk(_ia(spark, _PAIRS), k=3).collect()
    )
    ds = item_item_dimsum(_ia(spark, _PAIRS), k=3, gamma=32).collect()
    assert all(r["sampled"] == 0 for r in ds)
    got = sorted(
        (r["item"], r["rank"], r["rec"], r["sim_ppm"]) for r in ds
    )
    assert got == exact


def test_dimsum_matches_literal_python_both_lanes(spark):
    # gamma=1 (γ²=1) forces the estimator lane on every multi-user
    # item; gamma=32 keeps everything exact — both must equal the
    # literal-Python twin bit-for-bit (the determinism the hash
    # certificate needs)
    for gamma in (1, 32):
        expected = _dimsum_py(_PAIRS, k=3, gamma=gamma)
        got: dict[str, list] = {}
        rows = (
            item_item_dimsum(_ia(spark, _PAIRS), k=3, gamma=gamma)
            .orderBy("item", "rank")
            .collect()
        )
        for r in rows:
            got.setdefault(r["item"], []).append(
                (r["rec"], r["sim_ppm"], r["sampled"])
            )
        assert got == expected, f"gamma={gamma}"
    # and the gamma=1 run really exercised the sampled lane
    assert any(
        s for v in _dimsum_py(_PAIRS, k=3, gamma=1).values()
        for (_, _, s) in v
    )


def test_dimsum_sampling_actually_drops_entries(spark):
    # one hot pair: 64 users all buy both x and y -> deg = 64 each,
    # 64 > γ² = 16, per-entry p = 4/8 = 1/2, pair survives at p=1/4 —
    # the kept co count must be strictly below 64 (the pair stage
    # really shrank) and the estimator co_s²·10⁶/(16·16) within a
    # loose factor of the true cosine² = 10⁶ (deterministic draws ->
    # stable assertion)
    pairs = [(f"u{n}", it) for n in range(64) for it in ("x", "y")]
    rows = item_item_dimsum(_ia(spark, pairs), k=1, gamma=4).collect()
    by_item = {r["item"]: r for r in rows}
    assert by_item["x"]["sampled"] == 1
    sim = by_item["x"]["sim_ppm"]
    co_s = round((sim * 256 / 1_000_000) ** 0.5)
    assert 0 < co_s < 64
    assert 250_000 <= sim <= 4_000_000  # within 4x of true 10⁶
