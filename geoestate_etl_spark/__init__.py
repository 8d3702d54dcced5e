"""GeoEstate-ETL-Spark: a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL pipeline (ArsenVasylyshyn/GeoEstate-ETL,
surveyed in SURVEY.md) as composable, idiomatic PySpark DataFrame
operators, plus large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, event-time windows).

Design principles (100 TB-first):
- DataFrame/SQL declarative plans; Catalyst + AQE pick physical strategy.
- No ``collect()`` in any operator hot path; results stay distributed.
- Broadcast joins for dims, map-side partial aggregation, top-k via
  ``TakeOrderedAndProject`` (orderBy+limit), no unpartitioned windows
  in scale paths.
- Python UDFs only where built-ins can't express semantics, and then
  Arrow-vectorized (pandas_udf / mapInPandas).
"""

from geoestate_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
