"""Driver-canonicalizer contract over the query registry.

The driver compares each registered query against its DuckDB oracle
by materializing both sides through pandas, sorting with
``sort_values``, and value-hashing.  That pipeline crashes on
list/map/struct cells (``TypeError: unhashable type: 'list'`` —
CORRECTNESS_r05 ``inverted_index_blocks``), so every *oracled*
registered query must return an atomic-typed schema.  Rows-only
queries (no oracle) are exempt: the driver only counts their rows.

Building the DataFrame is lazy — no job runs — so this sweeps the
full registry cheaply.  Queries whose *construction* is eager
(model fits, streaming micro-batches) are listed in ``EAGER`` and
checked schema-only via the same lazy construction when possible,
else skipped here (they are rows-only anyway).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

_ATOMIC_BANNED = ("array", "map", "struct", "udt")


def _oracled_names():
    return sorted(entrymod.oracle_sql().keys())


# Oracled queries whose construction runs Spark jobs eagerly (model
# fits / index builds).  Still contract-checked, just marked so a
# slow run is attributable.
EAGER = {
    "semdedup_embeddings",
    "similarity_pq_adc_topk",
    "similarity_ivfadc_topk",
    "ann_recall_eval",
}


@pytest.mark.parametrize("name", _oracled_names())
def test_oracled_query_schema_is_atomic(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    bad = [
        (f.name, f.dataType.typeName())
        for f in df.schema.fields
        if f.dataType.typeName() in _ATOMIC_BANNED
    ]
    assert not bad, (
        f"{name} returns non-atomic columns {bad}; the driver's "
        "pandas canonicalizer cannot sort/hash these — flatten "
        "(array_join / to_json) in the registered wrapper"
    )
