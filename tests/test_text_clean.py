"""clean() fidelity: char-for-char against a Python oracle
replicating dags/scripts/data_preparation.py:29-57 (SURVEY §7.4.1)."""

from __future__ import annotations

import re
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bbcnews_scraper_nlp_spark.functions.text_clean import (
    ALL_STOPWORDS,
    clean_text,
    word_count,
)


def oracle_clean(text: str) -> str:
    """Python twin of the reference's clean(): the ordered regex chain
    + token filter, written independently from the Spark expression."""
    t = text.lower().strip()
    t = re.sub(r"http\S+", "", t)
    t = re.sub(r"<.*?>", "", t)
    t = re.sub(r"[^ 0-9a-z]", " ", t)
    t = re.sub(r"\b(\d+\d)\b", "", t)
    t = re.sub(r"http|https|www", "", t)
    t = re.sub(r"\b[a-z]\b", "", t)
    t = re.sub(r" +", " ", t)
    t = t.translate(str.maketrans("", "", string.punctuation))
    stop = set(ALL_STOPWORDS)
    return " ".join(
        w for w in t.strip().split(" ") if len(w) > 2 and w not in stop
    )


CASES = [
    "Hello, World! This is a TEST.",
    "visit https://example.com/x?y=1 for more",
    "<b>bold</b> and <i>italic</i> tags",
    "numbers 7 42 123 and words",
    "a b c single letters gone",
    "  spaces   everywhere   ",
    "the and of stopwords only",
    "",
    "UPPER lower MiXeD case99 mix-99 end",
]


def test_clean_matches_reference_semantics(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "id long, text string")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", clean_text(F.col("text")).alias("c")).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == oracle_clean(c), f"case {i}: {c!r}"


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\r\x00"),
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_clean_property_matches_oracle(spark, texts):
    texts = [t.replace("\n", " ") for t in texts]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: r["c"]
        for r in df.select("id", clean_text(F.col("text")).alias("c")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == oracle_clean(t)


def test_clean_output_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(clean_text(F.col("text")).alias("c")).collect()
    stop = set(ALL_STOPWORDS)
    for r in out:
        c = r["c"]
        assert re.fullmatch(r"[ 0-9a-z]*", c), "charset violated"
        for w in c.split():
            assert len(w) > 2
            assert w not in stop


def test_word_count(spark):
    df = spark.createDataFrame([("a b c",), ("one",), ("",)], "text string")
    got = [r[0] for r in df.select(word_count(F.col("text"))).collect()]
    assert got == [3, 1, 1]  # len(''.split(' ')) == 1, matching pandas


def test_inverted_index_blocks_planted(spark):
    from bbcnews_scraper_nlp_spark.operators.textstats import (
        build_inverted_index,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a"),
            (2, "b a"),
            (3, "a a a"),
        ],
        "doc_id long, text string",
    )
    out = build_inverted_index(df, "text", "doc_id", block_size=3).collect()
    by = {(r["term"], r["block"]): r for r in out}
    # 'a': positions (1,0) (1,2) (2,1) (3,0) (3,1) (3,2) -> tf=6 df=3,
    # split into two blocks of 3 in (doc, pos) order
    assert by[("a", 0)]["df"] == 3 and by[("a", 0)]["tf"] == 6
    assert sorted(by[("a", 0)]["postings"]) == ["1:0", "1:2", "2:1"]
    assert sorted(by[("a", 1)]["postings"]) == ["3:0", "3:1", "3:2"]
    # 'b': (1,1) (2,0) -> one block
    assert by[("b", 0)]["df"] == 2 and by[("b", 0)]["tf"] == 2
    assert sorted(by[("b", 0)]["postings"]) == ["1:1", "2:0"]
    assert set(by) == {("a", 0), ("a", 1), ("b", 0)}


def test_chunk_doc_udtf_matches_native_plan(spark, sf_dir):
    from bbcnews_scraper_nlp_spark.functions.udtfs import register_udtfs
    from bbcnews_scraper_nlp_spark.queries import REGISTRY

    register_udtfs(spark)
    native = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in REGISTRY["chunk_documents"].fn(spark, sf_dir).collect()
    }
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "__docs_udtf"
    )
    via_udtf = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in spark.sql(
            "SELECT doc_id, c.chunk_idx, c.chunk_text "
            "FROM __docs_udtf, LATERAL chunk_doc(text, 500, 400) c"
        ).collect()
    }
    assert via_udtf == native


@given(
    text=st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
        max_size=2000,
    ),
    size=st.integers(min_value=2, max_value=600),
    stride_frac=st.floats(min_value=0.1, max_value=1.0),
)
def test_chunk_udtf_kernel_covers_text_property(text, size, stride_frac):
    from bbcnews_scraper_nlp_spark.functions.udtfs import ChunkDoc

    stride = max(1, int(size * stride_frac))
    chunks = list(ChunkDoc.func().eval(text, size, stride))
    # every chunk is the exact substring at its stride offset
    for i, c in chunks:
        assert c == text[i * stride : i * stride + size]
    # chunks jointly cover the full text
    covered = set()
    for i, _ in chunks:
        covered.update(range(i * stride, min(i * stride + size, len(text))))
    assert covered == set(range(len(text)))
    # indices are dense from 0
    assert [i for i, _ in chunks] == list(range(len(chunks)))


def _ref_bpe(word_counts, k):
    vocab = [(list(w), n) for w, n in word_counts]
    merges = []
    for _ in range(k):
        pc = {}
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                pc[pair] = pc.get(pair, 0) + n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        a, b = best
        new_vocab = []
        for syms, n in vocab:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, n))
        vocab = new_vocab
    return merges


def test_bpe_merges_match_literal_reference_small(spark):
    from bbcnews_scraper_nlp_spark.functions.tokenize import learn_bpe_merges

    rows = [(0, "low low low lower lower newest newest newest newest widest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = learn_bpe_merges(df, "text", n_merges=6)
    words = {}
    for w in rows[0][1].split():
        words[w] = words.get(w, 0) + 1
    want = _ref_bpe(list(words.items()), 6)
    assert got == want, (got, want)


def test_bpe_merges_distributed_overflow_path_matches_local(spark):
    # force the overflow path (vocab "too big" for the driver) and
    # pin it against both the local loop and the literal reference —
    # the two implementations must stay interchangeable
    from bbcnews_scraper_nlp_spark.functions.tokenize import learn_bpe_merges

    rows = [(0, "low low low lower lower newest newest newest newest widest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = learn_bpe_merges(df, "text", n_merges=6, driver_vocab_limit=0)
    words = {}
    for w in rows[0][1].split():
        words[w] = words.get(w, 0) + 1
    want = _ref_bpe(list(words.items()), 6)
    assert got == want, (got, want)


def test_bpe_merges_match_literal_reference_corpus(spark, sf_dir):
    import duckdb

    from bbcnews_scraper_nlp_spark.functions.tokenize import learn_bpe_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = learn_bpe_merges(docs, "text", n_merges=8)
    wc = duckdb.sql(
        f"SELECT w, count(*) AS n FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS w "
        f"FROM '{sf_dir}/documents.parquet') WHERE w <> '' GROUP BY w"
    ).fetchall()
    want = _ref_bpe(wc, 8)
    assert got == want, (got, want)


def test_bpe_merges_release_all_caches(spark):
    from bbcnews_scraper_nlp_spark.functions.tokenize import learn_bpe_merges

    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    rows = [(0, "low low low lower lower newest newest newest newest widest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    learn_bpe_merges(df, "text", n_merges=4)
    # every per-round vocab cache (and the seed vocab) must be
    # released when the function returns — it's called from a
    # long-lived driver
    assert jsc.getPersistentRDDs().size() == before


def _ref_bpe_apply(word: str, merges) -> list[str]:
    """Literal-Python BPE application: apply each merge in rank
    order, one left-to-right non-overlapping pass over the symbol
    list (Sennrich et al. 2016 apply semantics)."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_expr_matches_literal_apply(spark):
    """The replace-chain encode (two-space symbol string) must equal
    the list-walk reference on adversarial words: adjacent repeats
    (overlap handling), symbols that are suffixes of other symbols
    (boundary guards), chained merges whose outputs feed later
    merges, and non-participating words."""
    from bbcnews_scraper_nlp_spark.functions.tokenize import bpe_encode_expr
    from pyspark.sql import functions as F

    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("aa", "aa"),
              ("x", "a"), ("e", "r")]
    words = ["the", "thether", "aaaa", "aaaaa", "xaxa", "xaa",
             "bathe", "zzz", "a", "", "ther", "erer"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["enc"]
        for r in df.select(
            "word",
            F.split(
                F.trim(bpe_encode_expr(F.col("word"), merges)), "  "
            ).alias("enc"),
        ).collect()
    }
    for w in words:
        if not w:
            continue
        assert got[w] == _ref_bpe_apply(w, merges), (
            w, got[w], _ref_bpe_apply(w, merges)
        )


def test_bpe_encode_learned_merges_roundtrip(spark):
    """Encoding with LEARNED merges: every training word must encode
    to the symbols the learner's final vocab state implies — ties the
    learn and apply halves of the tokenizer together."""
    from bbcnews_scraper_nlp_spark.functions.tokenize import (
        bpe_encode_expr,
        learn_bpe_merges,
    )
    from pyspark.sql import functions as F

    text = "low low low lower lower newest newest newest newest widest"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = learn_bpe_merges(df, "text", n_merges=6)
    words = sorted(set(text.split()))
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["enc"]
        for r in wdf.select(
            "word",
            F.split(
                F.trim(bpe_encode_expr(F.col("word"), merges)), "  "
            ).alias("enc"),
        ).collect()
    }
    for w in words:
        assert got[w] == _ref_bpe_apply(w, merges), (w, got[w])


# ---------------------------------------------------------------
# unigram-LM tokenizer training (Kudo 2018) — literal EM twin
# ---------------------------------------------------------------


def _ref_unigram_segment(w, logp, max_len=6):
    """Independent best-segmentation oracle: brute-force every
    segmentation, maximize (score, reversed piece-length tuple) —
    the global form of the DP's longest-last-piece tie rule."""
    def segs(s):
        if not s:
            yield []
            return
        for l in range(1, min(len(s), max_len) + 1):
            if s[:l] in logp:
                for rest in segs(s[l:]):
                    yield [s[:l]] + rest

    best = max(
        segs(w),
        key=lambda ps: (
            sum(logp[p] for p in ps),
            tuple(len(p) for p in reversed(ps)),
        ),
    )
    return best, sum(logp[p] for p in best)


def _ref_unigram_em(types, vocab_size=64, max_len=6, em_iters=2,
                    seed_multi_limit=200):
    import math

    fm, fs = {}, {}
    for w, n in types:
        for i in range(len(w)):
            fs[w[i]] = fs.get(w[i], 0) + n
            for l in range(2, max_len + 1):
                if i + l > len(w):
                    break
                fm[w[i:i + l]] = fm.get(w[i:i + l], 0) + n
    counts = dict(fs)
    counts.update(sorted(fm.items(), key=lambda kv: (-kv[1], kv[0]))
                  [:seed_multi_limit])
    lls = []
    for _ in range(em_iters):
        total = sum(counts.values())
        logp = {p: round(1000 * math.log(c / total))
                for p, c in counts.items()}
        nc, ll = {}, 0
        for w, n in types:
            ps, sc = _ref_unigram_segment(w, logp, max_len)
            ll += n * sc
            for p in ps:
                nc[p] = nc.get(p, 0) + n
        lls.append(ll)
        counts = {p: c for p, c in nc.items() if c > 0}
        for c in fs:
            counts.setdefault(c, 1)
    multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))
    final = {p: counts[p] for p in fs}
    final.update(multi[:max(vocab_size - len(fs), 0)])
    total = sum(final.values())
    return ({p: round(1000 * math.log(c / total))
             for p, c in final.items()}, lls)


def test_unigram_viterbi_matches_bruteforce():
    import itertools
    import math

    from bbcnews_scraper_nlp_spark.functions.tokenize import (
        _unigram_viterbi,
    )

    # vocab engineered to create score ties (equal-logp pieces)
    logp = {"a": -100, "b": -100, "c": -100, "ab": -200, "bc": -200,
            "abc": -300, "abab": -350}
    for n in range(1, 7):
        for w in ("".join(t) for t in itertools.product("abc", repeat=n)):
            if not all(ch in logp for ch in w):
                continue
            got_ps, got_sc = _unigram_viterbi(w, logp, 6)
            want_ps, want_sc = _ref_unigram_segment(w, logp, 6)
            assert got_sc == want_sc, (w, got_sc, want_sc)
            assert got_ps == want_ps, (w, got_ps, want_ps)
    assert math.isfinite(1.0)  # guard: loop actually ran


def test_unigram_em_matches_literal_reference_small(spark):
    from bbcnews_scraper_nlp_spark.functions.tokenize import (
        learn_unigram_vocab,
    )

    rows = [(0, "low low low lower lower newest newest newest newest "
                "widest widest lowest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = learn_unigram_vocab(df, "text", vocab_size=16)
    words = {}
    for w in rows[0][1].split():
        words[w] = words.get(w, 0) + 1
    want_vocab, want_lls = _ref_unigram_em(
        sorted(words.items()), vocab_size=16
    )
    assert got["vocab"] == want_vocab, (got["vocab"], want_vocab)
    assert got["lls"] == want_lls
    assert got["lls"][-1] >= got["lls"][0]


def test_unigram_em_matches_literal_reference_corpus(spark, sf_dir):
    import duckdb

    from bbcnews_scraper_nlp_spark.functions.tokenize import (
        learn_unigram_vocab,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = learn_unigram_vocab(docs, "text", vocab_size=64)
    wc = duckdb.sql(
        "SELECT w, count(*) AS n FROM (SELECT "
        "unnest(string_split_regex(text, '\\s+')) AS w "
        f"FROM '{sf_dir}/documents.parquet') WHERE w <> '' GROUP BY w"
    ).fetchall()
    want_vocab, want_lls = _ref_unigram_em(
        [(w, int(n)) for w, n in wc], vocab_size=64
    )
    assert got["vocab"] == want_vocab
    assert got["lls"] == want_lls
    assert got["lls"][-1] >= got["lls"][0]
    # every multi-char piece is a substring of some corpus word
    words = [w for w, _ in wc]
    for p in got["vocab"]:
        assert len(p) == 1 or any(p in w for w in words), p


# ---------------------------------------------------------------------------
# WordPiece encode (round 10): Spark HOF fold vs the literal-Python twin,
# including the UNK branches the corpus never exercises
# ---------------------------------------------------------------------------


def test_wordpiece_expr_matches_literal_incl_unk(spark):
    from pyspark.sql import functions as F

    from bbcnews_scraper_nlp_spark.functions.tokenize import (
        wordpiece_encode_expr,
        wordpiece_literal,
    )
    from bbcnews_scraper_nlp_spark.q_certificates import (
        _WP_CONT,
        _WP_MAX_CHARS,
        _WP_START,
    )

    words = [
        "the", "thessaly", "unpreventable", "preordained", "a", "zz",
        "overreaction", "x1y",        # digit -> no cont match -> UNK
        "42", "%!",                   # no start match -> UNK
        "ingesting", "q" * 31,        # > max_chars -> UNK
        "q" * 30,                     # exactly max_chars -> 30 pieces
        "and", "anding", "shch",
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (r["e"]["n_pieces"], r["e"]["unk"])
        for r in df.select(
            "word",
            wordpiece_encode_expr(
                F.col("word"), _WP_START, _WP_CONT, _WP_MAX_CHARS
            ).alias("e"),
        ).collect()
    }
    for w in words:
        assert got[w] == wordpiece_literal(
            w, _WP_START, _WP_CONT, _WP_MAX_CHARS
        ), w
    # the branches actually fire
    assert got["x1y"] == (1, True)
    assert got["42"] == (1, True)
    assert got["q" * 31] == (1, True)
    assert got["q" * 30] == (30, False)
    # longest-match-first: "the" is ONE start piece, not t+h+e
    assert got["the"] == (1, False)
    # greedy is not optimal-shortest: known WordPiece property
    assert got["and"] == (1, False)
