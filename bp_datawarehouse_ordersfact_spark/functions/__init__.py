from . import (
    cleaning,
    conditional,
    dates,
    encoding,
    html,
    nulls,
    rounding,
    text,
    urls,
    vectors,
    zorder,
)

__all__ = [
    "cleaning", "conditional", "dates", "encoding", "html", "nulls",
    "rounding", "text", "urls", "vectors", "zorder",
]
