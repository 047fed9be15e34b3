"""JSON parsing coverage (S12's explode+filter shape and F8's inverse):
the events.props column carries JSON objects; parse, extract, filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.plans.registry import register
from cioos_siooc_data_transform_spark.session import read_table as _t


@register(
    "json_props_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           (CAST(json_extract(props, '$.k') AS BIGINT) % 10 = 0) AS k_round
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_id", k.alias("k_value"), (k % 10 == 0).alias("k_round"))
        .filter(F.col("k_value") >= 50)
    )
