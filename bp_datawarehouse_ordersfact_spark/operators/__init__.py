from . import (
    aggregates,
    dedup,
    explode,
    graph,
    joins,
    scd,
    similarity,
    temporal,
    windows,
)

__all__ = [
    "aggregates",
    "dedup",
    "explode",
    "graph",
    "joins",
    "scd",
    "similarity",
    "temporal",
    "windows",
]
