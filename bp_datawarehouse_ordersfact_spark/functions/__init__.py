from . import cleaning, conditional, dates, nulls, rounding, text, vectors, zorder

__all__ = [
    "cleaning", "conditional", "dates", "nulls", "rounding", "text",
    "vectors", "zorder",
]
