from . import (
    aggregates,
    dedup,
    explode,
    graph,
    joins,
    ml,
    multimodal,
    scd,
    similarity,
    sketches,
    temporal,
    windows,
)

__all__ = [
    "aggregates",
    "dedup",
    "explode",
    "graph",
    "joins",
    "ml",
    "multimodal",
    "scd",
    "similarity",
    "sketches",
    "temporal",
    "windows",
]
