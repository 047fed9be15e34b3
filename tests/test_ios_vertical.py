"""Spark end-to-end tests for the IOS vertical: discover → parse →
catalog/channels/measurements → BODC coding → geo join → sink shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

IDT = "/root/reference/cioos_data_transform/ios_data_transform/ios_data_transform/tests/test_files"


@pytest.fixture(scope="module")
def parsed(spark):
    from cioos_siooc_data_transform_spark.sources.ios_source import read_ios

    df = read_ios(spark, IDT, ["ctd", "che", "cur"]).cache()
    df.count()
    yield df
    df.unpersist()


def test_catalog(parsed):
    from cioos_siooc_data_transform_spark.sources.ios_source import ios_catalog

    cat = ios_catalog(parsed)
    assert cat.count() == 35
    assert cat.filter(F.col("error").isNotNull()).count() == 0
    row = cat.filter(F.col("file_id") == "2017-020-0474").first()
    assert row["n_records"] == 189 and row["parse_strategy"] == "fixed_width"
    strategies = {
        r["parse_strategy"] for r in cat.select("parse_strategy").distinct().collect()
    }
    assert "fortran" in strategies and "fixed_width" in strategies


def test_measurements_long_format(parsed):
    from cioos_siooc_data_transform_spark.sources.ios_source import (
        ios_measurements,
        ios_measurements_masked,
    )

    meas = ios_measurements(parsed)
    counts = dict(
        meas.groupBy("file_id").count().collect()[0:0]
    )  # force no-op; real assertions below
    per_file = {r["file_id"]: r["count"] for r in meas.groupBy("file_id").count().collect()}
    assert per_file["2017-020-0474"] == 189 * 12
    assert per_file["A1_19921028_19930504_0035m"] == 9022 * 5

    first = (
        meas.filter((F.col("file_id") == "2017-020-0474") & (F.col("record_idx") == 0))
        .orderBy("channel_idx")
        .collect()
    )
    assert [r["value_num"] for r in first[:3]] == [3.1, 3.1, 6.2644]

    masked = ios_measurements_masked(parsed)
    cur_nulls = masked.filter(
        (F.col("file_id") == "A1_19921028_19930504_0035m") & F.col("value_num").isNull()
    ).count()
    assert cur_nulls == 464  # -99999 pad cells → NULL (P4/J5)


def test_bodc_codes(parsed):
    from cioos_siooc_data_transform_spark.operators.bodc import assign_bodc_codes
    from cioos_siooc_data_transform_spark.sources.ios_source import ios_channels

    codes = assign_bodc_codes(ios_channels(parsed))
    ctd = {
        r["channel_idx"]: r["var_code"]
        for r in codes.filter(F.col("file_id") == "2017-020-0474").collect()
    }
    # duplicate oxygen channels → distinct codes by units; ITS90 temp → TEMPS901
    assert ctd == {
        1: "PRESPR01", 2: "depth", 3: "TEMPS901", 7: "PSALST01",
        8: "DOXYZZ01", 9: "DOXMZZ01", 10: "CNDCST01",
    }
    bot = {
        r["channel_idx"]: r["var_code"]
        for r in codes.filter(F.col("file_id") == "1990-033-0002").collect()
    }
    assert bot == {
        2: "depth", 3: "NTRZAAZ1", 4: "SLCAAAZ1", 5: "PHOSAAZ1",
        7: "TEMPS601", 8: "PSALST01",
    }


def test_dropped_channels_audit(parsed):
    from cioos_siooc_data_transform_spark.operators.routing import dropped_channels
    from cioos_siooc_data_transform_spark.sources.ios_source import ios_channels

    dropped = dropped_channels(ios_channels(parsed))
    names = {
        r["name"]
        for r in dropped.filter(F.col("file_id") == "2017-020-0474").collect()
    }
    # same channels the reference's run log shows being dropped
    assert names == {
        "Transmissivity", "Fluorescence:URU:Seapoint", "PAR",
        "Turbidity:Seapoint", "Number_of_bin_records",
    }


def test_geo_code_assignment(spark, parsed):
    from cioos_siooc_data_transform_spark.sources.geojson_source import (
        assign_geo_code,
        read_geojson_polygons,
    )
    from cioos_siooc_data_transform_spark.sources.ios_source import ios_catalog

    polys = read_geojson_polygons(spark, f"{IDT}/ios_polygons.geojson")
    assert polys.count() == 51
    geo = {
        r["file_id"]: r["geo_code"]
        for r in assign_geo_code(ios_catalog(parsed), polys).collect()
    }
    assert geo["a1_20080429_20080518_0034m"] == (
        "Southern-Vancouver-Island-Shelf-(Stations-B-and-D)"
    )
    assert geo["2017-020-0474"] == "Canadian-Arctic-Archipelago-South"
    assert all(code for code in geo.values())


def test_observation_times(parsed):
    from cioos_siooc_data_transform_spark.sources.ios_source import (
        ios_observation_times,
    )

    ot = ios_observation_times(parsed)
    rows = (
        ot.filter(
            (F.col("file_id") == "a1_20080429_20080518_0034m")
            & (F.col("record_idx").isin(0, 1, 2646))
        )
        .orderBy("record_idx")
        .collect()
    )
    # start + i·600 s; last record equals the header's END TIME
    assert rows[0]["obs_ts"].isoformat() == "2008-04-29T20:40:01"
    assert rows[1]["obs_ts"].isoformat() == "2008-04-29T20:50:01"
    assert rows[2]["obs_ts"].isoformat() == "2008-05-18T05:40:01"


def test_header_json(parsed):
    from cioos_siooc_data_transform_spark.sources.ios_source import ios_header_json

    hj = ios_header_json(parsed)
    row = hj.filter(F.col("file_id") == "2017-020-0474").first()
    assert '"MISSION"' in row["header_json"]
    assert "2017-020" in row["header_json"]


def test_header_udtf(spark):
    from cioos_siooc_data_transform_spark.plans.ios_queries import SAMPLE_IOS
    from cioos_siooc_data_transform_spark.sources.header_udtf import (
        register_header_udtf,
    )

    register_header_udtf(spark)
    spark.createDataFrame([(SAMPLE_IOS,)], "text string").createOrReplaceTempView(
        "_udtf_files"
    )
    kv = spark.sql(
        "SELECT t.* FROM _udtf_files, LATERAL ios_header_kv(_udtf_files.text) t"
    )
    rows = {(r["section"], r["key"]): r["value"] for r in kv.collect()}
    assert rows[("ADMINISTRATION", "MISSION")] == "2024-001"
    assert rows[("LOCATION", "STATION")] == "T1"
    assert ("FILE", "$TABLE: CHANNELS") in rows


def test_geo_code_grid_path_equals_broadcast_path(spark, parsed):
    """The grid-cell equi-join strategy (engaged above
    GRID_POLYGON_THRESHOLD; forced here by claiming a large catalog)
    must produce EXACTLY the per-file geo codes of the default
    bbox-broadcast path on the full 51-polygon corpus — the blocking is
    a pre-filter, never a semantics change."""
    from cioos_siooc_data_transform_spark.sources.geojson_source import (
        assign_geo_code,
        read_geojson_polygons,
    )
    from cioos_siooc_data_transform_spark.sources.ios_source import ios_catalog

    polys = read_geojson_polygons(spark, f"{IDT}/ios_polygons.geojson")
    cat = ios_catalog(parsed)
    base = {
        r["file_id"]: r["geo_code"]
        for r in assign_geo_code(cat, polys).collect()
    }
    grid = {
        r["file_id"]: r["geo_code"]
        for r in assign_geo_code(cat, polys, num_polygons=100000).collect()
    }
    assert grid == base
    # finer grid cells must not change results either (cell size is a
    # performance knob, not a correctness knob)
    fine = {
        r["file_id"]: r["geo_code"]
        for r in assign_geo_code(
            cat, polys, num_polygons=100000, grid_deg=0.25
        ).collect()
    }
    assert fine == base


def test_geo_code_grid_path_plans_equi_join(spark, parsed):
    """Above the polygon-count threshold the candidate join must be an
    EQUI-join on the grid cell (hash-joinable, shuffle-scalable) — not
    the BroadcastNestedLoopJoin bbox scan, which is O(points x
    polygons) and needs the whole catalog in one broadcast."""
    from cioos_siooc_data_transform_spark.sources.geojson_source import (
        assign_geo_code,
        read_geojson_polygons,
    )
    from cioos_siooc_data_transform_spark.sources.ios_source import ios_catalog

    polys = read_geojson_polygons(spark, f"{IDT}/ios_polygons.geojson")
    cat = ios_catalog(parsed)
    plan = (
        assign_geo_code(cat, polys, num_polygons=100000)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_cx" in plan and "_cy" in plan
    default_plan = (
        assign_geo_code(cat, polys)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BroadcastNestedLoopJoin" in default_plan  # small-catalog path
