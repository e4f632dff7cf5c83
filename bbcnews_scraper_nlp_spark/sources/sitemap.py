"""Sitemap XML ingestion (SURVEY §2.1 S1-S3, §2.2 F1/F2).

The reference fetches sitemap-index + shard XML over HTTP and parses
``<url><loc>…</loc><lastmod>…</lastmod></url>`` records with
BeautifulSoup (bbc_news_dag.py:22-52, archive_scraper.py:16-52).

Engine design:
- Fetching is an out-of-engine ingest concern; the engine consumes a
  DataFrame of raw XML bodies (shard_id, xml) — from local fixture
  files, a driver-side fetch, or any connector.
- Parsing is pure Catalyst: ``<url>`` blocks via regexp_extract_all,
  fields via regexp_extract — one codegen'd projection, partition
  per shard, linear at any shard count (S3's numbered-shard loop
  becomes one read over all shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

URL_BLOCK_PATTERN = "(?s)<url>(.*?)</url>"
NEWS_URL_SUBSTR = "www.bbc.com/news/"


def read_sitemap_files(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Whole-file read of sitemap shards -> (shard_path, xml)."""
    df = spark.read.text(paths, wholetext=True)
    return df.select(
        F.input_file_name().alias("shard_path"), F.col("value").alias("xml")
    )


def parse_sitemap(pages: DataFrame, xml_col: str = "xml") -> DataFrame:
    """S2: XML -> (lastmod, url) rows.

    explode per-<url> blocks, then extract child tags. Equivalent to
    bs(xml).find_all('url') + .loc/.lastmod (bbc_news_dag.py:28-34)
    but fully JVM-side.
    """
    blocks = pages.select(
        F.explode(
            F.regexp_extract_all(xml_col, F.lit(URL_BLOCK_PATTERN), 1)
        ).alias("block")
    )
    return blocks.select(
        F.regexp_extract("block", "<lastmod>(.*?)</lastmod>", 1).alias("lastmod"),
        F.regexp_extract("block", "<loc>(.*?)</loc>", 1).alias("url"),
    )


def filter_news_links(
    links: DataFrame, cutoff_lastmod: str | None = None
) -> DataFrame:
    """F1+F2: keep bbc news urls, optionally newer than a cutoff
    (lexicographic ISO-8601 compare, archive_scraper.py:28)."""
    out = links.filter(F.col("url").contains(NEWS_URL_SUBSTR))
    if cutoff_lastmod is not None:
        out = out.filter(F.col("lastmod") > F.lit(cutoff_lastmod))
    return out
