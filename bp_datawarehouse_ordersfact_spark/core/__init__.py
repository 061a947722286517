from .session import get_spark, stop_spark
from .io import load_table, load_tables, TABLES

__all__ = ["get_spark", "stop_spark", "load_table", "load_tables", "TABLES"]
