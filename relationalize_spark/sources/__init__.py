from .jsonl import read_jsonl_variant, relationalize_json
from .readers import read_csv, read_jsonl, read_parquet
from .tables import load_table, load_tables, register_views

__all__ = [
    "read_jsonl_variant",
    "relationalize_json",
    "read_csv",
    "read_jsonl",
    "read_parquet",
    "load_table",
    "load_tables",
    "register_views",
]
