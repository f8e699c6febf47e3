from .textnorm import PUNCT_CUTSET, normalize_word, tokenize
from .hashing import md5_long, stable_bucket

__all__ = ["PUNCT_CUTSET", "normalize_word", "tokenize", "md5_long", "stable_bucket"]
