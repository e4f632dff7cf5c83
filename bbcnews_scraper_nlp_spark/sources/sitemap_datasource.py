"""Custom PySpark DataSource for sitemap XML (Spark 4 Python
DataSource API) — the engine-native form of SURVEY §2.1 S1-S3.

`sources/sitemap.py` consumes `(shard, xml)` rows and parses with
Catalyst regexes; this module instead plugs sitemap shards into
``spark.read.format("sitemap")`` directly:

- planning: one ``InputPartition`` PER SHARD FILE — Spark schedules
  shards across executors, so a 10^5-shard crawl archive (S3's
  numbered-shard loop) reads with full cluster parallelism and no
  driver-side loop;
- reading: stdlib ``re`` over each shard body, yielding
  ``(shard_path, lastmod, url)`` rows — the same fields the
  reference's BeautifulSoup loop extracts (bbc_news_dag.py:28-34),
  Arrow-batched back to the JVM;
- pushdown: none needed — downstream Catalyst filters (news-prefix,
  lastmod cutoff) run on the columnar output; the scan itself is
  already minimal (three strings per URL entry).

The HTTP fetch stays out-of-engine by design (see sitemap.py
docstring): hand the reader a directory/glob of fetched shard files
via the ``path`` option.
"""

from __future__ import annotations

import glob
import re
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_URL_BLOCK = re.compile(r"(?s)<url>(.*?)</url>")
_LOC = re.compile(r"<loc>(.*?)</loc>")
_LASTMOD = re.compile(r"<lastmod>(.*?)</lastmod>")

SITEMAP_SCHEMA = "shard_path string, lastmod string, url string"


class SitemapShard(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SitemapReader(DataSourceReader):
    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError("sitemap source requires a `path` option")
        self.pattern = options["path"]

    def partitions(self) -> list[SitemapShard]:
        paths = sorted(glob.glob(self.pattern))
        if not paths:
            raise FileNotFoundError(
                f"no sitemap shards match {self.pattern!r}"
            )
        return [SitemapShard(p) for p in paths]

    def read(self, partition: SitemapShard) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            body = fh.read()
        for block in _URL_BLOCK.findall(body):
            loc = _LOC.search(block)
            lastmod = _LASTMOD.search(block)
            yield (
                partition.path,
                lastmod.group(1) if lastmod else None,
                loc.group(1) if loc else None,
            )


class SitemapDataSource(DataSource):
    """``spark.read.format("sitemap").option("path", glob).load()``"""

    @classmethod
    def name(cls) -> str:
        return "sitemap"

    def schema(self) -> str:
        return SITEMAP_SCHEMA

    def reader(self, schema: StructType) -> SitemapReader:
        return SitemapReader(self.options)


def register_sitemap_source(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(SitemapDataSource)
