"""Multinomial NB: planted-vocabulary recovery + literal-Python twin."""

from __future__ import annotations

import math

from bbcnews_scraper_nlp_spark.operators.classify import (
    nb_model,
    nb_train_predict,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )


def test_disjoint_vocab_perfect_diagonal(spark):
    # two classes with disjoint vocabularies -> resubstitution is
    # perfectly diagonal
    rows = [
        (i, "aaa bbb aaa", "x") for i in range(5)
    ] + [
        (10 + i, "ccc ddd ccc", "y") for i in range(5)
    ]
    out = nb_train_predict(_docs(spark, rows)).collect()
    assert all(r["pred"] == r["label"] for r in out)


def test_empty_doc_scores_prior_only(spark):
    # the empty doc gets the majority-prior class
    rows = [(1, "aaa", "x"), (2, "aaa", "x"), (3, "bbb", "y"), (4, "", "y")]
    out = {r["id"]: r for r in nb_train_predict(_docs(spark, rows)).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 4: no tokens; priors are equal (2 vs 2) -> tie breaks to
    # the minimum class label
    assert out[4]["pred"] == "x"


def test_matches_literal_python_nb(spark):
    # vs a literal milli-nat NB with the same Laplace smoothing
    rows = [
        (1, "red red blue", "warm"),
        (2, "red orange", "warm"),
        (3, "blue blue green", "cold"),
        (4, "green blue", "cold"),
        (5, "red blue blue", "cold"),
    ]
    toks = {r[0]: [w for w in r[1].split(" ") if w] for r in rows}
    labels = {r[0]: r[2] for r in rows}
    classes = sorted(set(labels.values()))
    vocab = {w for ws in toks.values() for w in ws}
    v = len(vocab)
    cnt: dict[tuple[str, str], int] = {}
    tot = {c: 0 for c in classes}
    for d, ws in toks.items():
        for w in ws:
            cnt[(w, labels[d])] = cnt.get((w, labels[d]), 0) + 1
            tot[labels[d]] += 1
    n_c = {c: sum(1 for d in labels if labels[d] == c) for c in classes}

    def q(x: float) -> int:
        return round(1000 * math.log(x))

    expected = {}
    for d, ws in toks.items():
        best = None
        for c in classes:  # sorted -> strict > keeps min class on tie
            s = q(n_c[c] / len(rows))
            for w in ws:
                if (w, c) in cnt:
                    s += q((cnt[(w, c)] + 1.0) / (tot[c] + v))
                else:
                    s += q(1.0 / (tot[c] + v))
            if best is None or s > best[1]:
                best = (c, s)
        expected[d] = best
    got = {
        r["id"]: (r["pred"], r["score_milli"])
        for r in nb_train_predict(_docs(spark, rows)).collect()
    }
    assert got == expected


def test_model_frames_shapes(spark):
    rows = [(1, "aaa bbb", "x"), (2, "bbb ccc", "y")]
    model, classes = nb_model(_docs(spark, rows))
    m = {(r["w"], r["cls"]) for r in model.collect()}
    # only SEEN (token, class) pairs materialize
    assert m == {("aaa", "x"), ("bbb", "x"), ("bbb", "y"), ("ccc", "y")}
    c = {r["cls"]: r for r in classes.collect()}
    assert set(c) == {"x", "y"}
    assert all(r["miss_milli"] < 0 and r["prior_milli"] < 0 for r in c.values())


def test_hashed_features_model_is_fixed_size(spark):
    rows = [
        (i, "aaa bbb aaa", "x") for i in range(5)
    ] + [
        (10 + i, "ccc ddd ccc", "y") for i in range(5)
    ]
    model, classes = nb_model(_docs(spark, rows), hash_buckets=4096)
    m = model.collect()
    # only SEEN (bucket, class) pairs materialize, and bucket ids are
    # the literal md5-mod values
    import hashlib

    def bkt(w):
        return int(hashlib.md5(f"fh-v1:{w}".encode()).hexdigest()[:12], 16) % 4096

    assert {(r["w"], r["cls"]) for r in m} == {
        (bkt("aaa"), "x"), (bkt("bbb"), "x"),
        (bkt("ccc"), "y"), (bkt("ddd"), "y"),
    }
    # disjoint vocab (no bucket collisions here) -> still diagonal
    out = nb_train_predict(_docs(spark, rows), hash_buckets=4096).collect()
    assert all(r["pred"] == r["label"] for r in out)


def test_kfold_subtraction_equals_direct_retrain(spark):
    """The leave-one-fold-out subtraction models must predict exactly
    what k direct retrains on the complement folds predict."""
    from bbcnews_scraper_nlp_spark.operators.classify import (
        nb_kfold_predict,
        nb_predict,
    )
    from bbcnews_scraper_nlp_spark.operators.traindata import kfold_split

    rows = [
        (i, t, c)
        for i, (t, c) in enumerate(
            [
                ("aaa bbb aaa ddd", "x"), ("aaa aaa ccc", "x"),
                ("bbb aaa eee", "x"), ("aaa fff bbb", "x"),
                ("ccc ddd ccc ggg", "y"), ("ddd ccc hhh", "y"),
                ("ccc ccc ddd", "y"), ("ddd ddd aaa", "y"),
                ("eee fff ggg hhh", "z"), ("fff eee eee", "z"),
                ("ggg fff hhh", "z"), ("hhh ggg eee fff", "z"),
            ]
        )
    ]
    docs = _docs(spark, rows)
    k = 3
    got = {
        r["id"]: (r["fold"], r["pred"], r["score_milli"])
        for r in nb_kfold_predict(docs, k=k).collect()
    }
    d = kfold_split(docs, "doc_id", k)
    for i in range(k):
        train = d.filter(d["fold"] != i).drop("fold")
        val = d.filter(d["fold"] == i).drop("fold")
        if val.count() == 0:
            continue
        model, classes = nb_model(train)
        direct = {
            r["id"]: (r["pred"], r["score_milli"])
            for r in nb_predict(val, model, classes).collect()
        }
        for did, (pred, score) in direct.items():
            gf, gp, gs = got[did]
            assert gf == i
            assert (gp, gs) == (pred, score), (did, i, (gp, gs), (pred, score))
