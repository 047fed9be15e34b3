"""No registered query may emit a result type the driver's pandas
canonicalizer cannot hash or reprs differently across engines:
array/struct/map cells crash pandas sort_values (unhashable), and
DateType collects as datetime.date in Spark but Timestamp in DuckDB.
Schema-only check — plans are analyzed, not executed."""

from __future__ import annotations

from pyspark.sql.types import ArrayType, DateType, MapType, StructType

_FORBIDDEN = (ArrayType, StructType, MapType, DateType)


def test_no_query_emits_canon_unsafe_types(registry_plans):
    offenders = []
    for name in sorted(registry_plans):
        for f in registry_plans[name].schema.fields:
            if isinstance(f.dataType, _FORBIDDEN):
                offenders.append((name, f.name, str(f.dataType)))
    assert not offenders, f"canon-unsafe output columns: {offenders}"
