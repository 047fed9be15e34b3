"""cioos_siooc_data_transform_spark — PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and data-processing
capabilities of the reference ETL pipeline (cioos-siooc/cioos-siooc_data_transform:
IOS oceanographic ASCII → CF NetCDF conversion), re-expressed as Catalyst-plannable
DataFrame operations, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout:
  sources/    — IOS ASCII parser (mapInPandas), GeoJSON polygons, file catalog
  functions/  — scalar column expressions (DMS, fixed-offset tz, formatting, units)
  operators/  — joins, aggregations, windows, routing, dedup, similarity, text
  plans/      — the driver-facing query registry (queries + DuckDB oracle twins)
  streaming/  — incremental file pickup, tumbling/session windows
  sinks/      — CF-attribute-carrying Parquet writers
"""

__version__ = "0.1.0"

from cioos_siooc_data_transform_spark.session import get_spark  # noqa: F401
