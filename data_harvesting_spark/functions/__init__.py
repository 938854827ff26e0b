from data_harvesting_spark.functions.text import (
    normalize_text,
    text_hash,
    token_count,
    quality_features,
    language_guess,
)

__all__ = [
    "normalize_text",
    "text_hash",
    "token_count",
    "quality_features",
    "language_guess",
]
