"""Registry plumbing shared by every query domain module: the
(Spark plan, DuckDB oracle SQL) pair type, the REGISTRY, and the
@register decorator. Split out of queries.py (round 10) so the
domain modules form a linear import chain with no circularity."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .functions.text_clean import ALL_STOPWORDS


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only driver check


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = Query(fn, sql)
        return fn

    return deco


def _sql_str_list(words) -> str:
    quoted = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"[{quoted}]"


STOPWORDS_SQL = _sql_str_list(ALL_STOPWORDS)
