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


# ---------------------------------------------------------------------------
# Higher-order array functions (transform / filter / aggregate / zip_with /
# sort / flatten) ↔ DuckDB list functions.
# ---------------------------------------------------------------------------
@register(
    "array_functions",
    oracle="""
    WITH base AS (
      SELECT l_orderkey,
             list_sort(list(l_quantity ORDER BY l_linenumber, l_partkey, l_quantity)) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(qtys) AS INTEGER) AS n,
           round(list_sum(list_transform(qtys, x -> x * 2.0)), 2) AS doubled_sum,
           CAST(len(list_filter(qtys, x -> x >= 25.0)) AS INTEGER) AS n_large,
           qtys[1] AS q_min,
           qtys[-1] AS q_max
    FROM base
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.col("l_quantity"))
        ).alias("qtys")
    )
    doubled = F.aggregate(
        F.transform(F.col("qtys"), lambda x: x * 2.0),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return grouped.select(
        "l_orderkey",
        F.size("qtys").alias("n"),
        F.round(doubled, 2).alias("doubled_sum"),
        F.size(F.filter(F.col("qtys"), lambda x: x >= 25.0)).alias("n_large"),
        F.element_at("qtys", 1).alias("q_min"),
        F.element_at("qtys", -1).alias("q_max"),
    )


@register(
    "json_malformed_tolerance",
    oracle="""
    WITH j AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN '{"a": ' || CAST(doc_id AS VARCHAR)
                  ELSE '{"a": ' || CAST(doc_id AS VARCHAR)
                       || ', "b": "' || lang || '"}'
             END AS payload
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN json_valid(payload)
                THEN CAST(json_extract(payload, '$.a') AS BIGINT) END AS a,
           CASE WHEN json_valid(payload)
                THEN CAST(json_extract_string(payload, '$.b') AS VARCHAR) END AS b,
           json_valid(payload) AS is_valid
    FROM j
    """,
)
def json_malformed_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant JSON ingest: every 7th payload is deliberately truncated
    (unclosed object); from_json in its default PERMISSIVE mode yields a
    null-fielded struct for those rows instead of failing the job — the
    behavior a 100 TB ingest needs, where aborting on row 3 trillion is
    not an option. Validity is derived from the guaranteed-present field,
    mirroring DuckDB's json_valid guard. Row-local, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    payload = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit('{"a": '), F.col("doc_id").cast("string")),
    ).otherwise(
        F.concat(
            F.lit('{"a": '),
            F.col("doc_id").cast("string"),
            F.lit(', "b": "'),
            F.col("lang"),
            F.lit('"}'),
        )
    )
    parsed = F.from_json(payload, "a bigint, b string")
    return docs.select(
        "doc_id",
        parsed.getField("a").alias("a"),
        parsed.getField("b").alias("b"),
        parsed.getField("a").isNotNull().alias("is_valid"),
    )
