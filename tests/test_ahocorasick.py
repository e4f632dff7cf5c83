"""Aho-Corasick operator: relationally-built automaton vs the
literal-Python BFS construction, and matching vs brute-force scans."""

from __future__ import annotations

from collections import deque

from bbcnews_scraper_nlp_spark.operators.ahocorasick import (
    automaton_frame,
    match_counts,
)


def _python_automaton(patterns):
    """Textbook BFS goto/fail construction keyed by prefix strings."""
    nodes = {""}
    for p in patterns:
        for i in range(1, len(p) + 1):
            nodes.add(p[:i])
    children = {}
    for n in nodes:
        if n:
            children.setdefault(n[:-1], {})[n[-1]] = n
    fail = {"": ""}
    out = {n: set() for n in nodes}
    for n in nodes:
        if n in patterns:
            out[n].add(n)
    q = deque(children.get("", {}).values())
    for c in q:
        fail[c] = ""
    while q:
        cur = q.popleft()
        for ch, child in children.get(cur, {}).items():
            q.append(child)
            f = fail[cur]
            while f and ch not in children.get(f, {}):
                f = fail[f]
            # cand is strictly shorter than child, so never child itself
            fail[child] = children.get(f, {}).get(ch, "")
            out[child] |= out[fail[child]]
    return nodes, fail, out


def _brute_matches(text, patterns):
    hits = []
    for p in patterns:
        for i in range(len(text) - len(p) + 1):
            if text[i : i + len(p)] == p:
                hits.append((i + len(p), p))
    return sorted(hits)


CLASSIC = ["he", "she", "his", "hers"]


def test_relational_automaton_matches_bfs_construction(spark):
    rows = automaton_frame(spark, CLASSIC).collect()
    nodes, fail, out = _python_automaton(CLASSIC)
    assert {r["node"] for r in rows} == nodes - {""}
    for r in rows:
        assert r["fail"] == fail[r["node"]], r["node"]
        assert sorted(r["out"]) == sorted(out[r["node"]]), r["node"]
    # the textbook links, explicitly
    by = {r["node"]: r for r in rows}
    assert by["she"]["fail"] == "he" and by["she"]["out"] == ["he", "she"]
    assert by["hers"]["fail"] == "s"
    assert by["his"]["fail"] == "s"


def test_matching_vs_brute_force_planted(spark):
    pats = ["aa", "ab", "she", "he", "hers"]
    texts = [
        (0, "aaa"),          # overlapping same-pattern: "aa" twice
        (1, "ushers"),       # she/he/hers all end inside
        (2, "xyz"),          # no match
        (3, "aabab"),        # mixed
        (4, ""),             # empty text
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    auto = automaton_frame(spark, pats)
    got = {
        (r["doc_id"], r["pattern"]): (
            r["n_matches"],
            r["first_end"],
            r["last_end"],
        )
        for r in match_counts(df, "doc_id", "text", auto).collect()
    }
    exp = {}
    for i, t in texts:
        for e, p in _brute_matches(t, pats):
            n, fe, le = exp.get((i, p), (0, e, e))
            exp[(i, p)] = (n + 1, min(fe, e), max(le, e))
    assert got == exp
    assert got[(0, "aa")][0] == 2  # the overlap really counted twice


def test_query_matches_brute_force_on_testdata(spark, sf_dir):
    from bbcnews_scraper_nlp_spark.catalog import load_table
    from bbcnews_scraper_nlp_spark.q_text import (
        AC_PATTERNS,
        aho_corasick_matches,
    )

    got = {
        (r["doc_id"], r["pattern"]): (
            r["n_matches"],
            r["first_end"],
            r["last_end"],
        )
        for r in aho_corasick_matches(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exp = {}
    for r in docs.collect():
        for e, p in _brute_matches(r["text"] or "", AC_PATTERNS):
            key = (r["doc_id"], p)
            n, fe, le = exp.get(key, (0, e, e))
            exp[key] = (n + 1, min(fe, e), max(le, e))
    assert got == exp
    assert any(p == "she" for _, p in got) is False  # absent pattern absent
    assert len(got) > 100


def test_streaming_gate_equals_batch_matches(spark, sf_dir):
    """The streaming blocklist gate must emit exactly the batch AC
    query's rows — the backfill/live equality the router family
    certifies."""
    from bbcnews_scraper_nlp_spark.q_text import (
        aho_corasick_matches,
        streaming_blocklist_gate,
    )

    batch = {
        tuple(r) for r in aho_corasick_matches(spark, sf_dir).collect()
    }
    stream = {
        tuple(r) for r in streaming_blocklist_gate(spark, sf_dir).collect()
    }
    assert stream == batch and len(batch) > 100
