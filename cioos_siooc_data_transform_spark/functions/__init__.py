"""Scalar column-expression library (SURVEY.md §2.7).

All functions build Catalyst column expressions (JVM-side, whole-stage
codegen) — no Python UDFs in this module.
"""

from cioos_siooc_data_transform_spark.functions.convert import (  # noqa: F401
    dms_to_decimal,
    epoch_seconds,
    fixed_offset_hours,
    time_increment_seconds,
    to_utc_fixed_offset,
)
from cioos_siooc_data_transform_spark.functions.formatting import (  # noqa: F401
    basename_key,
    event_id_default,
    mission_id,
    profile_id,
)
from cioos_siooc_data_transform_spark.functions.units import (  # noqa: F401
    canonical_pressure_unit,
    canonical_unit,
)
