"""HTML article field extraction (SURVEY §2.1 S4).

The reference's Scrapy spider extracts 10 fields per page with CSS /
XPath selectors (ArticlesSpider.py:18-33). The engine consumes
pre-fetched (url, html) rows — fetching is ingest, not query — and
extracts fields in an Arrow-batched ``mapInPandas`` stage using
Python's stdlib html.parser (no lxml dependency), preceded by the
anti-join dedup so no byte of HTML is parsed twice
(middlewares.py:6-16's dedup-before-fetch, encoded as plan order).

Selector map (reference selector -> extractor):
  date          time::attr(datetime)              first <time datetime=…>
  title         h1#main-heading::text             <h1 id="main-heading">
  subtitle      b[class*="sc-1"]::text            first <b class~sc-1>
  authors       strong::text (all)                all <strong> texts
  text          div[data-component=text-block] p  paragraph texts joined
                (minus last, ' ' — P2)
  topic_name    a[class*="ed0077"]::text (all)    anchor texts by class
  topic_url     same anchors ::attr(href)
  images        img::attr(src) (all)
  menu_submenu  derived from url (P1)
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ARTICLE_FIELDS_SCHEMA = (
    "url string, date string, title string, subtitle string, "
    "authors array<string>, text string, topic_name array<string>, "
    "topic_url array<string>, images array<string>"
)


class _ArticleParser(HTMLParser):
    """Single-pass stdlib parser collecting the spider's targets."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.date: str | None = None
        self.title_parts: list[str] = []
        self.subtitle_parts: list[str] = []
        self.authors: list[str] = []
        self.paragraphs: list[str] = []
        self.topic_name: list[str] = []
        self.topic_url: list[str] = []
        self.images: list[str] = []
        self._stack: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        cls = a.get("class", "")
        if tag == "time" and self.date is None and "datetime" in a:
            self.date = a["datetime"]
        elif tag == "h1" and a.get("id") == "main-heading":
            self._stack.append("title")
            return
        elif tag == "b" and "sc-1" in cls and not self.subtitle_parts:
            self._stack.append("subtitle")
            return
        elif tag == "strong":
            self._stack.append("author")
            return
        elif tag == "p":
            self._stack.append("para")
            self.paragraphs.append("")
            return
        elif tag == "a" and "ed0077" in cls:
            self.topic_url.append(a.get("href", ""))
            self._stack.append("topic")
            return
        elif tag == "img" and "src" in a:
            self.images.append(a["src"])
        self._stack.append("")

    def handle_endtag(self, tag):
        if self._stack:
            self._stack.pop()

    def handle_data(self, data):
        ctx = self._stack[-1] if self._stack else ""
        if ctx == "title":
            self.title_parts.append(data)
        elif ctx == "subtitle":
            self.subtitle_parts.append(data)
        elif ctx == "author":
            if data.strip():
                self.authors.append(data.strip())
        elif ctx == "para":
            self.paragraphs[-1] += data
        elif ctx == "topic":
            if data.strip():
                self.topic_name.append(data.strip())


def _extract_one(url: str, html: str) -> tuple:
    p = _ArticleParser()
    try:
        p.feed(html or "")
    except Exception:
        pass
    # P2: join paragraphs minus the trailing one (ArticlesSpider.py:28)
    text = " ".join(p.paragraphs[:-1]) if len(p.paragraphs) > 1 else ""
    return (
        url,
        p.date,
        "".join(p.title_parts).strip() or None,
        "".join(p.subtitle_parts).strip() or None,
        p.authors,
        text,
        p.topic_name,
        p.topic_url,
        p.images,
    )


def extract_article_fields(pages: DataFrame) -> DataFrame:
    """mapInPandas over (url, html) -> the 9 scraped fields (+
    menu_submenu derived downstream via P1). Narrow stage, Arrow
    batches, per-partition parallel parse."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "url", "date", "title", "subtitle", "authors",
            "text", "topic_name", "topic_url", "images",
        ]
        for pdf in batches:
            rows = [_extract_one(u, h) for u, h in zip(pdf["url"], pdf["html"])]
            yield pd.DataFrame(rows, columns=cols)

    return pages.mapInPandas(run, ARTICLE_FIELDS_SCHEMA)


def derive_menu_submenu(df: DataFrame, url_col: str = "url") -> DataFrame:
    """P1: menu_submenu from the url — strip the news prefix, split on
    '-', drop the trailing id, rejoin (ArticlesSpider.py:24)."""
    path = F.regexp_replace(url_col, r"^https://www\.bbc\.com/news/", "")
    toks = F.split(path, "-")
    return df.withColumn(
        "menu_submenu", F.array_join(F.slice(toks, 1, F.size(toks) - 1), "-")
    )
