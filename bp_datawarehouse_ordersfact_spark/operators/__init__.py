from . import aggregates, dedup, explode, joins, similarity, windows

__all__ = ["aggregates", "dedup", "explode", "joins", "similarity", "windows"]
