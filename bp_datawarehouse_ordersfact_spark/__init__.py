"""bp_datawarehouse_ordersfact_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference pandas ETL pipeline (bleakrivercompany/bp-datawarehouse-OrdersFACT),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
broadcast dimension joins, window functions instead of groupby+join-back,
`posexplode` instead of wide-flatten/unpivot, and Arrow-batched Pandas UDFs
only where built-ins genuinely cannot express the semantics.

Layout:
    core/       SparkSession factory, canonical schemas, table IO
    functions/  column-expression library (string/date/case/null/text/vector)
    operators/  composable DataFrame->DataFrame operators (joins, aggs,
                windows, dedup, similarity, explode-normalization)
    sources/    external sources (paginated REST scan, catalog IO)
    plans/      the domain pipeline (ingest -> merge -> dims -> facts)
    streaming/  Structured Streaming jobs (windowed aggs, stateful ops)
    queries.py  the driver-facing query registry + DuckDB oracle SQL
"""

__version__ = "0.1.0"
