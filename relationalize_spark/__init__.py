"""relationalize_spark — a PySpark-native engine with the query and
data-processing capabilities of tulip/relationalize.

Core surface:

- :func:`relationalize_spark.operators.relationalize.relationalize` —
  nested DataFrame -> dict of flat DataFrames (structs flattened,
  arrays split into rid-linked child tables).
- :class:`relationalize_spark.schema.Schema` — choice-supporting
  schema: inference, merge, convert, DDL.
- :mod:`relationalize_spark.operators` — dedup, similarity, text
  analysis, multimodal plumbing for large-scale data pipelines.
"""

from .schema import Schema
from .dialects import DIALECTS, POSTGRES, REDSHIFT, DUCKDB, SPARK_SQL
from .operators.relationalize import relationalize
from .operators.nest import unrelationalize
from .operators.infer import infer_and_convert, schema_of_dataframe
from .sources.jsonl import relationalize_json

__all__ = [
    "Schema",
    "relationalize",
    "unrelationalize",
    "relationalize_json",
    "infer_and_convert",
    "schema_of_dataframe",
    "DIALECTS",
    "POSTGRES",
    "REDSHIFT",
    "DUCKDB",
    "SPARK_SQL",
]

__version__ = "0.1.0"
