"""Physical-plan contracts for hot-path queries.

These lock in the plan properties PLANS.md claims — a regression that
reintroduces a Python eval node, loses a broadcast, or drops a
pushed filter should fail CI, not surface as a 10x slowdown at scale.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from bbcnews_scraper_nlp_spark.queries import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize(
    "name",
    ["p13_lemmatize", "sentiment_full_lexicon", "f1_contains_filter",
     "a6_top_orders", "tpch_q6_revenue_scan"],
)
def test_no_python_eval_nodes(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, (
        f"{name} regressed to a Python eval node"
    )


def test_sentiment_lexicon_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sentiment_full_lexicon")
    assert "BroadcastHashJoin" in plan  # 2.1k-row lexicon must broadcast
    # shuffles: widen repartition + the per-doc re-aggregation, plus
    # the lexicon BroadcastExchange — the join must NOT add a fact-side
    # Exchange (count node-detail headers, each node appears once)
    nodes = re.findall(r"^\(\d+\) (?:Broadcast)?Exchange", plan, re.M)
    assert len(nodes) <= 3, nodes


def test_f1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "f1_contains_filter")
    assert re.search(r"PushedFilters:.*StringContains", plan), plan[:800]


def test_top_orders_uses_takeordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "a6_top_orders")
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no global sort


def test_q6_predicates_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6_revenue_scan")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThanOrEqual" in m.group(1) and "LessThan" in m.group(1)
