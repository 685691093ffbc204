from .jdbc import jdbc_column_types, postgres_load_plan, redshift_copy_sql, write_jdbc
from .writers import write_csv_sorted, write_jsonl, write_parquet, write_tables

__all__ = [
    "jdbc_column_types",
    "postgres_load_plan",
    "redshift_copy_sql",
    "write_jdbc",
    "write_csv_sorted",
    "write_jsonl",
    "write_parquet",
    "write_tables",
]
