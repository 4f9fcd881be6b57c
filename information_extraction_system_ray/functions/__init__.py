from . import dedup, evaluate, hashing, salted, similarity, text

__all__ = ["dedup", "evaluate", "hashing", "salted", "similarity", "text"]
