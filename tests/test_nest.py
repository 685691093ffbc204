"""unrelationalize: the inverse of the relationalize split-out.

Round-trip property: for any input whose nesting is arrays/maps (not
structs — flattening is lossy by design, see operators/nest.py),
``unrelationalize(relationalize(df)) == df`` including element order,
empty-vs-null distinction, and arrays-of-arrays chains.
"""

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.nest import unrelationalize
from relationalize_spark.operators.relationalize import relationalize


SCHEMA = (
    "id int, items array<struct<a:int,b:string>>, tags array<string>, "
    "props map<string,int>, mat array<array<int>>"
)

ROWS = [
    (1, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}], ["u", "v"], {"k1": 10}, [[1, 2], [3]]),
    (2, [], None, {}, []),
    (3, None, ["w"], None, None),
    (4, [{"a": None, "b": None}], ["", "dup", "dup"], {"k2": None}, [[]]),
]


@pytest.fixture(scope="module")
def tables(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return df, relationalize(df, "t", key_cols=["id"])


def test_round_trip_values(spark, tables):
    df, tbls = tables
    back = unrelationalize(tbls, "t").select(*df.columns)
    assert sorted(back.collect()) == sorted(df.collect())


def test_round_trip_schema(spark, tables):
    df, tbls = tables
    back = unrelationalize(tbls, "t")
    assert dict(back.dtypes) == dict(df.dtypes)


def test_element_order_preserved(spark):
    # Reverse-ordered arrays must come back reversed, not sorted.
    df = spark.createDataFrame([(1, [9, 5, 7, 1])], "id int, xs array<int>")
    back = unrelationalize(relationalize(df, "t", key_cols=["id"]), "t")
    assert back.select("xs").first().xs == [9, 5, 7, 1]


def test_empty_vs_null(spark, tables):
    _, tbls = tables
    back = unrelationalize(tbls, "t")
    by_id = {r.id: r for r in back.collect()}
    assert by_id[2].items == [] and by_id[2].tags is None and by_id[2].props == {}
    assert by_id[3].items is None and by_id[3].props is None
    assert by_id[2].mat == [] and by_id[3].mat is None


def test_array_of_arrays_chain(spark, tables):
    _, tbls = tables
    # The grandchild table exists on the way out and folds on the way
    # back.
    assert "t_mat__val_" in tbls
    back = unrelationalize(tbls, "t")
    by_id = {r.id: r for r in back.collect()}
    assert by_id[1].mat == [[1, 2], [3]]
    assert by_id[4].mat == [[]]


def test_partial_fold_of_child_table(spark, tables):
    # Folding from a child root: the grandchild array rebuilds inside
    # the child table itself.
    _, tbls = tables
    child = unrelationalize(tbls, "t", _table="t_mat")
    row = child.where(F.col("mat__val_").isNotNull()).first()
    assert isinstance(row["mat__val_"], list)


def test_nested_struct_array_inside_map_values(spark):
    df = spark.createDataFrame(
        [(1, {"a": [1, 2]}, None), (2, {"b": []}, None), (3, None, None)],
        "id int, m map<string,array<int>>, pad string",
    )
    tbls = relationalize(df, "r", key_cols=["id"])
    back = unrelationalize(tbls, "r")
    by_id = {r.id: r for r in back.collect()}
    assert by_id[1].m == {"a": [1, 2]}
    assert by_id[2].m == {"b": []}
    assert by_id[3].m is None
