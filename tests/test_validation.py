from __future__ import annotations

from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.functions.config import parse_env_config

IDT = "/root/reference/cioos_data_transform/ios_data_transform/ios_data_transform/tests/test_files"


def test_validate_bounds_and_counts(spark):
    from cioos_siooc_data_transform_spark.operators.validation import (
        validate_channel_bounds,
        validate_record_counts,
    )
    from cioos_siooc_data_transform_spark.sources.ios_source import read_ios

    parsed = read_ios(spark, f"{IDT}/ctd_profile", ["ctd"]).cache()
    # header-declared counts match what we parse for the whole corpus
    assert validate_record_counts(parsed).count() == 0

    bounds = validate_channel_bounds(parsed)
    checked = bounds.filter(F.col("out_of_bounds").isNotNull())
    assert checked.count() > 0
    # exactly one genuine precision quirk in the corpus: 2017-020-0474's
    # Turbidity declares max 0.571 but its data block is rendered to one
    # decimal (max 0.6) — the validator must surface it
    flagged = checked.filter(F.col("out_of_bounds")).collect()
    assert [(r["file_id"], r["name"]) for r in flagged] == [
        ("2017-020-0474", "Turbidity:Seapoint")
    ]
    row = bounds.filter(
        (F.col("file_id") == "2017-020-0474") & (F.col("channel_idx") == 1)
    ).first()
    assert row["obs_min"] == 3.1  # pressure min matches the CHANNELS table
    parsed.unpersist()


def test_parse_env_config():
    text = """# comment
ios_raw_folder : /data/raw
out_path: /data/out

ignored_after_blank : yes
"""
    cfg = parse_env_config(text)
    assert cfg == {"ios_raw_folder": "/data/raw", "out_path": "/data/out"}
