"""Source connectors (SURVEY.md §2.1 S1–S6)."""

from . import bigquery, files, kafka_shaped, rest

__all__ = ["bigquery", "files", "kafka_shaped", "rest"]
