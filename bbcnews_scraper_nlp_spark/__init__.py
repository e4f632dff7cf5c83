"""bbcnews_scraper_nlp_spark — a PySpark-native analytics engine.

Re-expresses the computational surface of the reference pipeline
(ElfatihZiad/BBCNews-scraper-nlp: Scrapy crawl -> Mongo -> pandas/NLTK
cleaning -> gensim LDA -> TextBlob sentiment -> trend aggregation) as
lazy, distributed, Catalyst-optimized Spark SQL + MLlib, plus the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference never had.

Design rules (see SURVEY.md §4/§7):
- DataFrame/SQL first; Catalyst plans everything relational.
- Pandas UDFs only where built-ins genuinely can't express semantics.
- Cheap native filters BEFORE expensive UDF stages (Catalyst cannot
  push predicates through black-box Python).
- Broadcast small dimensions; anti-join dedup before expensive work.
- No driver-side loops over collect(); no RDDs.
"""

__version__ = "0.1.0"
