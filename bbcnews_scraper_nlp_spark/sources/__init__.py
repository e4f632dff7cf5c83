from . import html_extract, sitemap, stage_io  # noqa: F401
