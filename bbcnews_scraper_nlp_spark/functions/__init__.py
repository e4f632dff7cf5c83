from . import sentiment, text_clean, tokenize  # noqa: F401
