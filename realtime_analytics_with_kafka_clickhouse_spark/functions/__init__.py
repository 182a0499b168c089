from .scalars import (
    dsum,
    davg,
    money_round,
    parse_iso_ts_with_fallback,
    to_start_of_hour,
    to_yyyymm,
)
from .hashing import stable_hash64, word_hash_expr

__all__ = [
    "dsum",
    "davg",
    "money_round",
    "parse_iso_ts_with_fallback",
    "to_start_of_hour",
    "to_yyyymm",
    "stable_hash64",
    "word_hash_expr",
]
