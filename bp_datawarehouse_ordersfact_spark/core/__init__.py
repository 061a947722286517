from .session import get_spark, stop_spark
from .io import load_table, load_tables, normalize_ntz, TABLES
from .persist import release_results

__all__ = [
    "get_spark",
    "stop_spark",
    "load_table",
    "load_tables",
    "normalize_ntz",
    "release_results",
    "TABLES",
]
