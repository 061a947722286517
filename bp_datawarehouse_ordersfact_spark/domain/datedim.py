"""Date dimension with the reference's bespoke fiscal-quarter columns.

The reference READS a prebuilt Date_Dim it cannot regenerate
(``dw5_order_royalty_fact.py:116-117``; columns from usage
``:124,291-293,327-332``). Here the dimension is a deterministic function
of a date range — ``sequence + explode`` — including:

- ``monthyear`` — the MKEY join key (``MonthName‖Year``, T8
  ``dw5_order_royalty_fact.py:122``)
- ``WC_Quarter`` — calendar quarter label ``YYYYQn``
- ``SCB_Sales_Qtr`` — SCB sales attribution quarter: the quarter of the
  month THREE months forward (the distributor pays one quarter in
  arrears — the same lag C21 applies with ``add_months``
  ``dw5_order_royalty_fact.py:736-743``)
- ``SCB_Return_Qtr`` — returns attribute to the calendar quarter

Rows outside the generated range surface as the reference's sentinel
fills (``9999Q99``/``Smarch`` — N1 ``dw5_order_royalty_fact.py:431-479``)
applied by the consumer, not by this builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_date_dim(spark: SparkSession, start: str, end: str) -> DataFrame:
    d = F.col("d")

    def quarter_label(col) -> F.Column:
        return F.concat(
            F.year(col).cast("string"), F.lit("Q"), F.quarter(col).cast("string")
        )

    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(start).cast("date"),
                    F.lit(end).cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("d")
        )
        .select(
            d.alias("date"),
            F.date_format(d, "MMMM").alias("monthname"),
            F.year(d).cast("int").alias("year"),
            F.concat(F.date_format(d, "MMMM"), F.year(d).cast("string")).alias(
                "monthyear"
            ),
            quarter_label(d).alias("WC_Quarter"),
            quarter_label(F.add_months(d, 3)).alias("SCB_Sales_Qtr"),
            quarter_label(d).alias("SCB_Return_Qtr"),
        )
    )
