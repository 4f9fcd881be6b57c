from . import dedup, hashing, similarity, text

__all__ = ["dedup", "hashing", "similarity", "text"]
