from . import cleaning, conditional, dates, nulls, text, vectors

__all__ = ["cleaning", "conditional", "dates", "nulls", "text", "vectors"]
