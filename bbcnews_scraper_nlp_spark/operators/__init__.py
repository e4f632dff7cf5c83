from . import dedup, relational, similarity, textstats  # noqa: F401
