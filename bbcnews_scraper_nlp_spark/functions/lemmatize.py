"""Lemmatization + POS filtering (reference P13/F10).

The reference runs NLTK ``pos_tag`` + WordNet lemmatization per row
(data_preparation.py:51-80). NLTK isn't a dependency of this engine;
the operators below keep the exact Spark surface (Arrow-batched
pandas UDFs with per-executor kernel init, the pattern a WordNet or
Spark-NLP model would plug into) with a deterministic rule-based
English kernel:

- POS heuristic: suffix/word-list tagger emitting the same tag
  alphabet NLTK uses (NN*, JJ*, RB*, VB*, ...).
- Lemmatizer: inflectional suffix stripping (plural -s/-es/-ies,
  -ing/-ed with stem repair, adverb -ly) — the classic "Porter-lite"
  rules, applied only to open-class words.

Swapping in a real model = replacing the two pure functions; the
Spark plumbing (batching, schema, partition parallelism) is final.
Scale: narrow map stage, Arrow transfer, no shuffle; kernel state is
module-level (initialized once per executor process, not per batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference keeps only these tags (data_preparation.py:52-53): nouns,
# adjectives, adverbs.
POS_WHITELIST = ("NN", "NNS", "NNP", "NNPS", "JJ", "JJR", "JJS", "RB", "RBR", "RBS")

_COMMON_VERBS = frozenset(
    "be is are was were been being have has had do does did go goes went gone "
    "make makes made take takes took say says said get gets got run runs ran "
    "see sees saw know knows knew think thinks thought come comes came want "
    "wants wanted use uses used find finds found give gives gave tell tells "
    "told work works worked call calls called try tries tried ask asks asked "
    "need needs needed feel feels felt become becomes became leave leaves left "
    "put puts mean means meant keep keeps kept let lets begin begins began "
    "seem seems seemed help helps helped show shows showed hear hears heard "
    "play plays played move moves moved live lives lived believe believes "
    "believed bring brings brought happen happens happened write writes wrote "
    "sit sits sat stand stands stood lose loses lost pay pays paid meet meets "
    "met include includes included continue continues continued set sets "
    "learn learns learned change changes changed lead leads led understand "
    "understands understood watch watches watched follow follows followed "
    "stop stops stopped create creates created speak speaks spoke read reads "
    "spend spends spent grow grows grew open opens opened walk walks walked "
    "win wins won offer offers offered remember remembers remembered".split()
)

_VOWELS = set("aeiou")


def heuristic_pos(word: str) -> str:
    """Deterministic suffix-based POS tag over NLTK's tag alphabet."""
    w = word.lower()
    if not w:
        return "NN"
    if w in _COMMON_VERBS:
        return "VB"
    if w.endswith("ly"):
        return "RB"
    if w.endswith(("er", "est")) and len(w) > 4:
        return "JJR" if w.endswith("er") else "JJS"
    if w.endswith(("ous", "ful", "ive", "able", "ible", "al", "ic", "ish")):
        return "JJ"
    if w.endswith("ing") and len(w) > 5:
        return "VBG"
    if w.endswith("ed") and len(w) > 4:
        return "VBD"
    if w.endswith(("ion", "ment", "ness", "ity", "ship", "hood")):
        return "NN"
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return "NNS"
    return "NN"


def rule_lemma(word: str, pos: str) -> str:
    """Inflectional suffix stripping by POS class (WordNet-shaped)."""
    w = word.lower()
    if pos.startswith("N"):
        if w.endswith("ies") and len(w) > 4:
            return w[:-3] + "y"
        if w.endswith(("ses", "xes", "zes", "ches", "shes")) and len(w) > 4:
            return w[:-2]
        if w.endswith("s") and not w.endswith(("ss", "us", "is")) and len(w) > 3:
            return w[:-1]
        return w
    if pos.startswith("V"):
        if w.endswith("ing") and len(w) > 5:
            stem = w[:-3]
            if len(stem) > 2 and stem[-1] == stem[-2]:  # runn-ing
                return stem[:-1]
            if stem and stem[-1] not in _VOWELS and len(stem) > 2 and stem[-2] in _VOWELS:
                return stem + "e" if w.endswith(("ating", "izing", "osing", "iving")) else stem
            return stem
        if w.endswith("ied") and len(w) > 4:
            return w[:-3] + "y"
        if w.endswith("ed") and len(w) > 4:
            stem = w[:-2]
            if len(stem) > 2 and stem[-1] == stem[-2]:
                return stem[:-1]
            return stem
        return w
    if pos.startswith("R") and w.endswith("ly") and len(w) > 4:
        return w[:-2]
    if pos.startswith("J"):
        if w.endswith("est") and len(w) > 5:
            return w[:-3]
        if w.endswith("er") and len(w) > 4:
            return w[:-2]
        return w
    return w


def _lemmatize_text(text: str, keep_pos: tuple[str, ...] | None) -> str:
    out = []
    for tok in (text or "").split():
        pos = heuristic_pos(tok)
        if keep_pos is not None and pos not in keep_pos:
            continue
        out.append(rule_lemma(tok, pos))
    return " ".join(out)


def make_lemmatize_udf(pos_whitelist: tuple[str, ...] | None = None):
    """pandas UDF: lemmatize; optionally POS-filter first (F10+P13).

    ``pos_whitelist=None`` lemmatizes everything; pass POS_WHITELIST
    to reproduce the reference's noun/adj/adverb keep-list.
    """

    @F.pandas_udf(T.StringType())
    def lemmatize(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _lemmatize_text(t, pos_whitelist))

    return lemmatize


def pos_filter_udf() -> Column:
    """F10 alone: keep only whitelist-POS tokens, no lemmatization."""

    @F.pandas_udf(T.StringType())
    def pos_filter(texts: pd.Series) -> pd.Series:
        def run(t: str) -> str:
            return " ".join(
                tok for tok in (t or "").split() if heuristic_pos(tok) in POS_WHITELIST
            )

        return texts.map(run)

    return pos_filter
