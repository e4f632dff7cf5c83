"""Dedup operators: planted near-duplicates, recall/precision vs the
exact-Jaccard oracle, determinism across runs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bbcnews_scraper_nlp_spark.operators import dedup as D

VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega red blue green".split()
)


def _corpus(spark, n_docs=60, n_dups=12, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(60)]
        rows.append((i, " ".join(words)))
    # planted near-dups: copy with 2 words changed
    for j in range(n_dups):
        base_id, base_text = rows[j]
        words = base_text.split()
        words[5] = "changed"
        words[17] = "altered"
        rows.append((1000 + base_id, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string"), n_dups


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    out = D.exact_dedup(df, "text", "doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3]


def test_minhash_lsh_finds_planted_dups(spark):
    df, n_dups = _corpus(spark)
    pairs = D.minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.5
    ).collect()
    found = {(r["id_1"], r["id_2"]) for r in pairs}
    planted = {(j, 1000 + j) for j in range(n_dups)}
    recall = len(found & planted) / n_dups
    assert recall >= 0.9, f"recall {recall}: {sorted(found)[:5]}"
    # verify stage guarantees precision: every reported pair really
    # has Jaccard >= threshold per the exact relational oracle
    exact = {
        (r["id_1"], r["id_2"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0).collect()
    }
    for p in found:
        assert exact.get(p, 0.0) >= 0.5 - 1e-9


def test_minhash_deterministic_across_runs(spark):
    df, _ = _corpus(spark)
    a = sorted(
        map(tuple, D.minhash_lsh_pairs(df, "doc_id", "text").collect())
    )
    b = sorted(
        map(tuple, D.minhash_lsh_pairs(df, "doc_id", "text").collect())
    )
    assert a == b


def test_simhash_near_dups(spark):
    df, n_dups = _corpus(spark)
    pairs = D.simhash_pairs(df, "doc_id", "text", max_hamming=8).collect()
    found = {(r["id_1"], r["id_2"]) for r in pairs}
    planted = {(j, 1000 + j) for j in range(n_dups)}
    assert len(found & planted) >= n_dups * 0.7
    for r in pairs:
        assert 0 <= r["hamming"] <= 8


def test_ngram_prefix_filter_output_identical(spark):
    df, _ = _corpus(spark)
    for thr in (0.2, 0.5, 0.8):
        naive = sorted(
            map(
                tuple,
                D.ngram_jaccard_pairs(
                    df, "doc_id", "text", n=3, threshold=thr, prefix_filter=False
                ).collect(),
            )
        )
        pruned = sorted(
            map(
                tuple,
                D.ngram_jaccard_pairs(
                    df, "doc_id", "text", n=3, threshold=thr, prefix_filter=True
                ).collect(),
            )
        )
        assert naive == pruned, f"threshold {thr}"


def test_ngram_jaccard_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z y x w v")],
        "doc_id long, text string",
    )
    out = D.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_1"], r["id_2"]) == (1, 2) and abs(r["jaccard"] - 1.0) < 1e-9


# --------------------------------------------------------------------
# connected components / duplicate clustering
# --------------------------------------------------------------------


def _py_components(edges, nodes):
    """Pure-Python union-find oracle: node -> min id of component."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in nodes}


def test_cc_path_graph_converges_logarithmically(spark):
    # A 200-node chain: the adversarial-diameter case. Plain
    # min-propagation would need 200 rounds; pointer jumping must
    # collapse it within the operator's bounded round budget.
    from bbcnews_scraper_nlp_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src long, dst long"
    )
    got = {
        (r["node"], r["comp"]) for r in connected_components(edges).collect()
    }
    assert got == {(i, 0) for i in range(201)}


def test_cc_probe_cadence_exact_on_any_fixpoint_parity(spark):
    # r13 folded the convergence probe into the doubling join as a
    # `moved` flag; r14 reads it after EVERY jump (the flag read is a
    # narrow scan of the checkpointed blocks, while an unprobed jump
    # past the fixpoint costs a full identity join). Chains of these
    # lengths reach their fixpoint at different jump parities —
    # labels must be the exact component minimum either way.
    from bbcnews_scraper_nlp_spark.operators.dedup import connected_components

    for n in (2, 3, 5, 9):
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "src long, dst long"
        )
        got = {
            (r["node"], r["comp"])
            for r in connected_components(edges).collect()
        }
        assert got == {(i, 0) for i in range(n + 1)}, f"chain {n}"


def test_cc_matches_union_find_on_random_graph(spark):
    import random

    from bbcnews_scraper_nlp_spark.operators.dedup import connected_components

    rng = random.Random(42)
    nodes = list(range(300))
    edges = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(180)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    expected = _py_components(edges, {n for e in edges for n in e})
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == expected


def test_keep_cluster_canonical_one_per_cluster(spark):
    from bbcnews_scraper_nlp_spark.operators.dedup import keep_cluster_canonical

    # clusters: {1,2,3} (chain), {10,11}, singletons 20, 21
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_1 long, id_2 long"
    )
    kept = sorted(
        r["doc_id"] for r in keep_cluster_canonical(df, "doc_id", pairs).collect()
    )
    assert kept == [1, 10, 20, 21]


def test_md5_flavor_semantics_match(spark):
    # the md5 hash flavor (used by the oracled driver queries) must
    # deliver the same RECALL semantics as the xxhash64 production
    # default — different hash family, same algorithm
    df, n_dups = _corpus(spark)
    planted = {(j, 1000 + j) for j in range(n_dups)}

    mh = D.minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=64, bands=16,
        jaccard_threshold=0.5, shingle_hash="md5",
    ).collect()
    found = {(r["id_1"], r["id_2"]) for r in mh}
    assert len(found & planted) / n_dups >= 0.9

    sh = D.simhash_pairs(
        df, "doc_id", "text", max_hamming=8, token_hash="md5"
    ).collect()
    sfound = {(r["id_1"], r["id_2"]) for r in sh}
    assert len(sfound & planted) >= n_dups * 0.7

    # flavors are deterministic but mutually incomparable: same query
    # twice gives identical output
    again = {
        (r["id_1"], r["id_2"])
        for r in D.minhash_lsh_pairs(
            df, "doc_id", "text", num_hashes=64, bands=16,
            jaccard_threshold=0.5, shingle_hash="md5",
        ).collect()
    }
    assert again == found


def test_remove_dup_spans_planted(spark):
    from bbcnews_scraper_nlp_spark.operators.dedup import remove_dup_spans

    # docs 1 and 2 share an exact 6-token span ("one two three four
    # five six"): every token covered by a duplicated 4-gram is
    # removed FROM BOTH docs; unique prefixes/suffixes survive.
    rows = [
        (1, "alpha beta one two three four five six gamma"),
        (2, "delta one two three four five six epsilon zeta"),
        (3, "nothing here repeats at all today friends"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_dup_spans(df, "doc_id", "text", n=4, min_count=2).collect()
    }
    assert out[1] == ("alpha beta gamma", 6)
    assert out[2] == ("delta epsilon zeta", 6)
    assert out[3] == ("nothing here repeats at all today friends", 0)
    assert out[4] == ("", 0)
    # within-doc repetition also counts toward min_count
    rep = spark.createDataFrame(
        [(9, "a b c d x y a b c d")], "doc_id long, text string"
    )
    got = remove_dup_spans(rep, "doc_id", "text", n=4, min_count=2).collect()[0]
    assert got["clean_text"] == "x y"
    assert got["n_removed"] == 8


def test_blocked_fuzzy_pairs_within_block_only(spark):
    from bbcnews_scraper_nlp_spark.operators.dedup import blocked_fuzzy_pairs
    from pyspark.sql import functions as F

    rows = [
        ("red widget", "widget"),
        ("rad widget", "widget"),   # dist 1 from red widget
        ("ride widget", "widget"),  # dist 2 from red, 3 from rad
        ("red gadget", "gadget"),   # other block — never compared
        ("blue widget", "widget"),  # dist 4 from red widget — cut
        ("turquoise widget", "widget"),  # dist > 3 from all — cut
    ]
    df = spark.createDataFrame(rows, "n string, blk string")
    got = {
        (r["key_1"], r["key_2"]): r["dist"]
        for r in blocked_fuzzy_pairs(df, "n", "blk", max_dist=3).collect()
    }
    # cross-check every expected distance with a literal DP oracle
    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct))
                )
            prev = cur
        return prev[-1]

    names = [n for n, blk in rows if blk == "widget"]
    want = {
        (a, b): lev(a, b)
        for a in names
        for b in names
        if a < b and lev(a, b) <= 3
    }
    assert got == want
    assert ("red gadget", "red widget") not in got  # cross-block never compared
    assert all(d <= 3 for d in got.values())


def test_lsh_index_save_query_append_lifecycle(spark, tmp_path):
    import random

    from bbcnews_scraper_nlp_spark.operators.dedup import (
        append_lsh_index,
        query_lsh_index,
        save_lsh_index,
    )

    rng = random.Random(11)

    def fresh_doc():
        return " ".join(rng.choice(VOCAB) for _ in range(60))

    def mutate(text, k=2):
        words = text.split()
        for j in range(k):
            words[7 * j + 3] = "changed%d" % j
        return " ".join(words)

    path = str(tmp_path / "lshidx")
    b1_rows = [(i, fresh_doc()) for i in range(30)]
    batch1 = spark.createDataFrame(b1_rows, "doc_id long, text string")
    save_lsh_index(batch1, "doc_id", "text", path, bands=16)

    # batch2: doc 100 mutates batch1's doc 3 -> cross-batch near-dup
    d101 = fresh_doc()
    batch2 = spark.createDataFrame(
        [(100, mutate(b1_rows[3][1])), (101, d101)], "doc_id long, text string"
    )
    hits = query_lsh_index(batch2, "doc_id", "text", path, 0.5).collect()
    assert {(r["new_id"], r["index_id"]) for r in hits} == {(100, 3)}
    assert all(r["jaccard"] >= 0.5 for r in hits)

    # append batch2; a batch3 mutation of doc 101 must hit the index
    # WITHOUT any recompute of batch1/batch2 signatures
    append_lsh_index(batch2, "doc_id", "text", path)
    batch3 = spark.createDataFrame(
        [(200, mutate(d101, k=1))], "doc_id long, text string"
    )
    hits3 = {
        (r["new_id"], r["index_id"])
        for r in query_lsh_index(batch3, "doc_id", "text", path, 0.5).collect()
    }
    assert (200, 101) in hits3


def test_lsh_index_base_params_contract(spark, tmp_path):
    """A caller-supplied precomputed `base` must carry the params it
    was built with, and they must match the index meta — a mismatched
    signature space must fail loudly, not probe emptily."""
    import pytest as _pytest

    from bbcnews_scraper_nlp_spark.operators.dedup import (
        append_lsh_index,
        lsh_index_meta,
        lsh_signatures,
        query_lsh_index,
        save_lsh_index,
    )

    path = str(tmp_path / "lshidx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} delta epsilon") for i in range(5)],
        "doc_id long, text string",
    )
    save_lsh_index(docs, "doc_id", "text", path, num_hashes=32, bands=8)
    m = lsh_index_meta(spark, path)
    good = lsh_signatures(
        docs, "doc_id", "text", m["num_hashes"], m["shingle_mode"],
        m["shingle_n"], m["shingle_hash"],
    )
    # base without params -> refused
    with _pytest.raises(ValueError, match="base_params"):
        append_lsh_index(docs, "doc_id", "text", path, base=good)
    with _pytest.raises(ValueError, match="base_params"):
        query_lsh_index(docs, "doc_id", "text", path, base=good)
    # base with WRONG params -> refused
    bad = dict(m, num_hashes=64)
    with _pytest.raises(ValueError, match="num_hashes"):
        append_lsh_index(docs, "doc_id", "text", path, base=good, base_params=bad)
    # base with matching params -> accepted (no exception)
    query_lsh_index(docs, "doc_id", "text", path, base=good, base_params=m)
    append_lsh_index(docs.limit(0), "doc_id", "text", path, base=good.limit(0), base_params=m)
    # save with a base also demands params matching its kwargs
    with _pytest.raises(ValueError, match="base_params"):
        save_lsh_index(docs, "doc_id", "text", str(tmp_path / "i2"), base=good)
