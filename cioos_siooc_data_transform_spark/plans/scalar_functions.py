"""Scalar-function [Q] operators (SURVEY.md §2.7, F1-F10) exercised on the
synthetic tables with DuckDB oracle twins.

The input columns are *constructed* from synthetic-table columns (the
testdata has no DMS strings or timezone prefixes), with the construction
mirrored exactly in the oracle so the conversion logic itself is what gets
compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.functions.convert import (
    dms_to_decimal,
    epoch_seconds,
    time_increment_seconds,
    to_utc_fixed_offset,
)
from cioos_siooc_data_transform_spark.functions.formatting import (
    basename_key,
    event_id_default,
    mission_id,
)
from cioos_siooc_data_transform_spark.functions.units import canonical_unit
from cioos_siooc_data_transform_spark.plans.registry import register


from cioos_siooc_data_transform_spark.session import read_table as _t


# ---------------------------------------------------------------------------
# F1: DMS → decimal degrees (IDT/ObsFile.py:261-274).
# ---------------------------------------------------------------------------
@register(
    "dms_to_decimal",
    oracle="""
    SELECT c_custkey,
           round((CAST(c_custkey % 90 AS DOUBLE) + fmod(abs(c_acctbal), 60.0) / 60.0)
                 * (CASE WHEN (CASE c_custkey % 4 WHEN 0 THEN 'N' WHEN 1 THEN 'S'
                                WHEN 2 THEN 'E' ELSE 'W' END) IN ('S','W')
                    THEN -1 ELSE 1 END), 6) AS dec_deg,
           CASE c_custkey % 4 WHEN 0 THEN 'N' WHEN 1 THEN 'S' WHEN 2 THEN 'E' ELSE 'W' END
             AS hemisphere
    FROM customer
    """,
)
def dms_to_decimal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    deg = (F.col("c_custkey") % 90).cast("double")
    minutes = F.abs(F.col("c_acctbal")) % F.lit(60.0)
    hem = (
        F.when(F.col("c_custkey") % 4 == 0, "N")
        .when(F.col("c_custkey") % 4 == 1, "S")
        .when(F.col("c_custkey") % 4 == 2, "E")
        .otherwise("W")
    )
    return cust.select(
        "c_custkey",
        F.round(dms_to_decimal(deg, minutes, hem), 6).alias("dec_deg"),
        hem.alias("hemisphere"),
    )


# ---------------------------------------------------------------------------
# F2: fixed-offset timezone → UTC (IDT/ObsFile.py:185-203; deliberately NOT
# IANA/DST-aware, SURVEY.md §1.3.1).
# ---------------------------------------------------------------------------
@register(
    "tz_fixed_offset",
    oracle="""
    SELECT event_id, zone, ts + to_hours(off) AS ts_utc FROM (
      SELECT event_id, ts,
             CASE user_id % 8 WHEN 0 THEN 'UTC' WHEN 1 THEN 'GMT' WHEN 2 THEN 'PST'
                  WHEN 3 THEN 'PDT' WHEN 4 THEN 'MST' WHEN 5 THEN 'MDT'
                  WHEN 6 THEN 'AST' ELSE 'ADT' END AS zone,
             CASE user_id % 8 WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 8
                  WHEN 3 THEN 7 WHEN 4 THEN 7 WHEN 5 THEN 6
                  WHEN 6 THEN 4 ELSE 3 END AS off
      FROM events
    )
    """,
)
def tz_fixed_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    zones = F.array(*[F.lit(z) for z in ["UTC", "GMT", "PST", "PDT", "MST", "MDT", "AST", "ADT"]])
    zone = F.element_at(zones, (F.col("user_id") % 8 + 1).cast("int"))
    return events.select(
        "event_id",
        zone.alias("zone"),
        to_utc_fixed_offset(F.col("ts"), zone).alias("ts_utc"),
    )


# ---------------------------------------------------------------------------
# F3: TIME INCREMENT 5-field decode (IDT/ObsFile.py:149-159) — the Spark side
# genuinely splits the string and folds the weight dot-product with array
# expressions; the oracle computes the same sum in the same order.
# ---------------------------------------------------------------------------
@register(
    "time_increment_decode",
    oracle="""
    SELECT event_id,
           concat_ws(' ', d, h, m, s, ms) AS increment_raw,
           CAST(round(((((0.0 + d * 86400.0) + h * 3600.0) + m * 60.0) + s * 1.0)
                      + ms * 0.001, 6) AS DOUBLE) AS increment_s
    FROM (
      SELECT event_id, user_id % 2 AS d, user_id % 24 AS h,
             event_id % 60 AS m, event_id % 45 AS s, user_id % 1000 AS ms
      FROM events
    )
    """,
)
def time_increment_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    parts = events.select(
        "event_id",
        (F.col("user_id") % 2).alias("d"),
        (F.col("user_id") % 24).alias("h"),
        (F.col("event_id") % 60).alias("m"),
        (F.col("event_id") % 45).alias("s"),
        (F.col("user_id") % 1000).alias("ms"),
    )
    raw = F.concat_ws(" ", "d", "h", "m", "s", "ms")
    return parts.select(
        "event_id",
        raw.alias("increment_raw"),
        F.round(time_increment_seconds(raw), 6).alias("increment_s"),
    )


# ---------------------------------------------------------------------------
# F4: epoch seconds (IDT/OceanNcVar.py:65-72).
# ---------------------------------------------------------------------------
@register(
    "epoch_seconds",
    oracle="""
    SELECT event_id, epoch_ms(ts) / 1000.0 AS epoch_s FROM events
    """,
)
def epoch_seconds_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.select("event_id", epoch_seconds(F.col("ts")).alias("epoch_s"))


# ---------------------------------------------------------------------------
# F5: zero-padded id formatting (IDT/write_ctd_ncfile.py:50-51, 87).
# ---------------------------------------------------------------------------
@register(
    "id_formatting",
    oracle="""
    SELECT o_orderkey,
           printf('%04d-%03d', o_orderkey % 10000, o_custkey % 1000) AS mission_id,
           lpad(CAST(o_orderkey % 100 AS VARCHAR), 4, '0') AS event_padded
    FROM orders
    """,
)
def id_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        mission_id(F.col("o_orderkey") % 10000, F.col("o_custkey") % 1000).alias("mission_id"),
        F.lpad((F.col("o_orderkey") % 100).cast("string"), 4, "0").alias("event_padded"),
    )


# ---------------------------------------------------------------------------
# F6: substring / regexp extraction (IDT/ObsFile.py:63, header version
# line[20:24]; event from filename).
# ---------------------------------------------------------------------------
@register(
    "substring_extract",
    oracle="""
    SELECT c_custkey,
           substring(c_name, 1, 8) AS name_prefix,
           CAST(nullif(regexp_extract(c_name, 'Customer#(\\d+)', 1), '')
                AS BIGINT) AS custno
    FROM customer
    """,
)
def substring_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_extract(F.col("c_name"), r"Customer#(\d+)", 1).cast("long").alias("custno"),
    )


# ---------------------------------------------------------------------------
# F8: JSON header serialization (IDT/write_ctd_ncfile.py:36).
# ---------------------------------------------------------------------------
@register(
    "json_serialize",
    oracle="""
    SELECT c_custkey,
           CAST(to_json(struct_pack(name := c_name, segment := c_mktsegment)) AS VARCHAR)
             AS hdr_json
    FROM customer
    """,
)
def json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.to_json(
            F.struct(F.col("c_name").alias("name"), F.col("c_mktsegment").alias("segment"))
        ).alias("hdr_json"),
    )


# ---------------------------------------------------------------------------
# F9: unit canonicalization (IDT/OceanNcVar.py:86-89, 160-258).
# ---------------------------------------------------------------------------
@register(
    "unit_canonicalization",
    oracle="""
    SELECT p_partkey, raw_unit,
           CASE lower(raw_unit)
             WHEN 'dbar' THEN 'decibar' WHEN 'dbars' THEN 'decibar'
             WHEN 'decibar' THEN 'decibar' WHEN 'ml/l' THEN 'mL/L'
             WHEN 'umol/kg' THEN 'umol/kg' WHEN 'psu' THEN 'PSS-78'
           END AS canon_unit
    FROM (
      SELECT p_partkey,
             CASE p_type WHEN 'ECONOMY' THEN 'dbar' WHEN 'MEDIUM' THEN 'dbars'
                  WHEN 'SMALL' THEN 'decibar' WHEN 'PROMO' THEN 'mL/L'
                  WHEN 'STANDARD' THEN 'umol/kg' ELSE 'PSU' END AS raw_unit
      FROM part
    )
    """,
)
def unit_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    raw = (
        F.when(F.col("p_type") == "ECONOMY", "dbar")
        .when(F.col("p_type") == "MEDIUM", "dbars")
        .when(F.col("p_type") == "SMALL", "decibar")
        .when(F.col("p_type") == "PROMO", "mL/L")
        .when(F.col("p_type") == "STANDARD", "umol/kg")
        .otherwise("PSU")
    )
    return part.select(
        "p_partkey", raw.alias("raw_unit"), canonical_unit(raw).alias("canon_unit")
    )


# ---------------------------------------------------------------------------
# F10 + P7: basename key extraction and event-id defaulting
# (IDT/utils.py:91-92, IDT/write_ctd_ncfile.py:79-85).
# ---------------------------------------------------------------------------
@register(
    "basename_key_extract",
    oracle="""
    SELECT o_orderkey, path,
           regexp_extract(path, '([^/]+?)(?:\\.[^./]*)?$', 1) AS file_key,
           coalesce(nullif(regexp_extract(path, '-(\\d+)\\.[A-Za-z]+$', 1), ''), '0000')
             AS event_id
    FROM (
      SELECT o_orderkey,
             concat('/data/in/', CAST(o_orderkey AS VARCHAR), '-',
                    CAST(o_custkey % 1000 AS VARCHAR), '.ctd') AS path
      FROM orders
    )
    """,
)
def basename_key_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    path = F.concat(
        F.lit("/data/in/"),
        F.col("o_orderkey").cast("string"),
        F.lit("-"),
        (F.col("o_custkey") % 1000).cast("string"),
        F.lit(".ctd"),
    )
    base = orders.select("o_orderkey", path.alias("path"))
    return base.select(
        "o_orderkey",
        "path",
        basename_key(F.col("path")).alias("file_key"),
        event_id_default(F.lit(None), F.col("path")).alias("event_id"),
    )


# ---------------------------------------------------------------------------
# String-function breadth: split_part / translate / repeat / reverse /
# left-right slicing (F7-family beyond trim/upper).
# ---------------------------------------------------------------------------
@register(
    "string_functions",
    oracle="""
    SELECT o_orderkey,
           split_part(o_orderpriority, '-', 1) AS prio_num,
           split_part(o_orderpriority, '-', 2) AS prio_word,
           translate(o_orderstatus, 'OFP', 'ofp') AS status_lower,
           repeat(o_orderstatus, 3) AS status_x3,
           reverse(CAST(o_orderkey AS VARCHAR)) AS key_reversed
    FROM orders
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)).alias("prio_num"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).alias("prio_word"),
        F.translate(F.col("o_orderstatus"), "OFP", "ofp").alias("status_lower"),
        F.repeat(F.col("o_orderstatus"), 3).alias("status_x3"),
        F.reverse(F.col("o_orderkey").cast("string")).alias("key_reversed"),
    )


# ---------------------------------------------------------------------------
# Date/time field extraction + day arithmetic (F2/F4-family breadth).
# ---------------------------------------------------------------------------
@register(
    "datetime_functions",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(extract(year FROM o.o_orderdate) AS INTEGER) AS order_year,
           CAST(extract(month FROM o.o_orderdate) AS INTEGER) AS order_month,
           CAST(extract(day FROM o.o_orderdate) AS INTEGER) AS order_day,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INTEGER) AS ship_delay_days,
           CAST(o.o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("ship_delay_days"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )
