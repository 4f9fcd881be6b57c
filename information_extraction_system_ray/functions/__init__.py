from . import asof, dedup, evaluate, hashing, salted, similarity, text

__all__ = ["asof", "dedup", "evaluate", "hashing", "salted", "similarity",
           "text"]
