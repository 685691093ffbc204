"""Local JSONL -> relational tables + DDL.

The counterpart of the reference's local filesystem example
(reference examples/local_fs_example.py): read messy JSONL, discover
tables, resolve choice columns, write CSV with the sorted-header
contract, and print warehouse DDL. Run:

    python examples/local_jsonl_to_tables.py [input.jsonl] [out_dir]
"""

import json
import sys
import tempfile

sys.path.insert(0, ".")

from relationalize_spark.plans.session import get_spark
from relationalize_spark.sinks.writers import write_csv_sorted
from relationalize_spark.sources.jsonl import relationalize_json

DEMO_ROWS = [
    {"user_id": "u1", "created_at": 1596751499, "tags": ["a", "b"],
     "contact": {"email": "u1@example.com"}},
    {"user_id": "u2", "created_at": "2020-08-06T21:04:58", "tags": [],
     "contact": {"email": "u2@example.com", "phone": 5551234}},
]


def main() -> None:
    if len(sys.argv) > 1:
        src = sys.argv[1]
    else:
        src = tempfile.mktemp(suffix=".jsonl")
        with open(src, "w") as f:
            f.writelines(json.dumps(r) + "\n" for r in DEMO_ROWS)
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()

    spark = get_spark(app="local-jsonl-example")
    result = relationalize_json(src, "users", spark=spark, key_cols=None)
    for name, df in result.tables.items():
        schema = result.schemas[name]
        print(f"== {name}: {schema.columns}")
        df.show(truncate=False)
        write_csv_sorted(df, f"{out_dir}/{name}", schema=schema)
        print(schema.generate_ddl(name))
    print(f"CSV written under {out_dir}")


if __name__ == "__main__":
    main()
