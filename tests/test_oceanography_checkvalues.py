"""Published check values for the oceanographic formulas (scientific
correctness, independent of the DuckDB mirror)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cioos_siooc_data_transform_spark.functions.oceanography import (
    depth_from_pressure,
    mackenzie_sound_speed,
    potential_temperature,
    practical_salinity,
)


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_mackenzie_check_value(spark):
    # Mackenzie (1981): c(25 °C, 35 PSU, 1000 m) = 1550.744 m/s
    c = _eval(spark, mackenzie_sound_speed(F.lit(25.0), F.lit(35.0), F.lit(1000.0)))
    assert c == pytest.approx(1550.744, abs=1e-3)


def test_pss78_definition_point(spark):
    # PSS-78: SP(Rt=1, t=15 °C) = 35 exactly (definition of the scale)
    sp = _eval(spark, practical_salinity(F.lit(1.0), F.lit(15.0)))
    assert sp == pytest.approx(35.0, abs=1e-6)


def test_unesco_depth_check_value(spark):
    # UNESCO 1983 (Saunders & Fofonoff): z(10000 dbar, 30°) = 9712.653 m
    z = _eval(spark, depth_from_pressure(F.lit(10000.0), F.lit(30.0)))
    assert z == pytest.approx(9712.653, abs=0.01)


def test_potential_temperature_surface_identity(spark):
    # θ(S, T, p=0) ≡ T at the reference pressure
    th = _eval(spark, potential_temperature(F.lit(10.0), F.lit(35.0), F.lit(0.0)))
    assert th == pytest.approx(10.0, abs=1e-12)
    # Bryden (1973) published check value: θ(S=25, T=10 °C, p=1000 dbar)
    # = 8.4678516 °C
    th2 = _eval(spark, potential_temperature(F.lit(10.0), F.lit(25.0), F.lit(1000.0)))
    assert th2 == pytest.approx(8.4678516, abs=1e-6)
