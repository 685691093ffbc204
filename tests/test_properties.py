"""Property-based tests for the choice-type algebra.

The distributed inference (operators/infer.py) is only correct if the
union is a true commutative/associative/idempotent semilattice —
Spark may combine partial aggregates in any grouping and order. These
properties are exactly what hypothesis checks here.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

# Wall-clock deadlines are meaningless next to JVM/GC pauses in this
# suite; keep hypothesis about logic, not latency.
settings.register_profile("no-deadline", deadline=None)
settings.load_profile("no-deadline")

from relationalize_spark import types as T
from relationalize_spark.schema import Schema

base_tags = st.sampled_from(["bool", "int", "float", "str", "none", "datetime", "date"])
tag_sets = st.lists(base_tags, min_size=1, max_size=6)


def tag_of(tags):
    return T.normalize(tags)


@given(tag_sets, tag_sets)
def test_unify_commutative(a, b):
    assert T.unify(tag_of(a), tag_of(b)) == T.unify(tag_of(b), tag_of(a))


@given(tag_sets, tag_sets, tag_sets)
def test_unify_associative(a, b, c):
    x, y, z = tag_of(a), tag_of(b), tag_of(c)
    assert T.unify(T.unify(x, y), z) == T.unify(x, T.unify(y, z))


@given(tag_sets)
def test_unify_idempotent(a):
    x = tag_of(a)
    assert T.unify(x, x) == x


@given(tag_sets)
def test_normalize_equals_fold(a):
    """Normalizing a set at once == folding unify pairwise — the
    guarantee that collect_set + driver-fold matches row-by-row
    observation."""
    folded = a[0]
    for t in a[1:]:
        folded = T.unify(folded, t)
    assert folded == tag_of(a)


@settings(max_examples=50)
@given(st.lists(st.dictionaries(st.sampled_from("abcd"), st.one_of(
    st.none(), st.booleans(), st.integers(-5, 5),
    st.floats(allow_nan=False, allow_infinity=False, width=16), st.text(max_size=3),
), max_size=4), min_size=1, max_size=6))
def test_observe_sequence_equals_merge_of_singletons(records):
    """Sequential observation == merging per-record schemas — the
    map-reduce equivalence the reference asserts for one split
    (reference test/schema.test.py:85-98), generalized."""
    sequential = Schema()
    singletons = []
    for r in records:
        sequential.observe(r)
        s = Schema()
        s.observe(r)
        singletons.append(s)
    assert Schema.merge(*singletons) == sequential


# -- fuzzy-join blocking lemma ---------------------------------------------
# Pure-python model of operators/fuzzy.deletion_keys: two strings
# within Levenshtein distance k MUST share a delete-<=k variant, or
# the Spark-side equi-join on variant hashes would silently lose the
# pair. Hypothesis drives random strings through random edit scripts.

_alpha = "abcXY "


def _deletes(s: str, k: int) -> set[str]:
    out = {s}
    frontier = {s}
    for _ in range(k):
        frontier = {v[:i] + v[i + 1 :] for v in frontier for i in range(len(v))}
        out |= frontier
    return out


def _random_edit(s, kind, pos, ch):
    if kind == "del" and s:
        i = pos % len(s)
        return s[:i] + s[i + 1 :]
    if kind == "ins":
        i = pos % (len(s) + 1)
        return s[:i] + ch + s[i:]
    if s:  # sub
        i = pos % len(s)
        return s[:i] + ch + s[i + 1 :]
    return ch


edit = st.tuples(
    st.sampled_from(["del", "ins", "sub"]),
    st.integers(min_value=0, max_value=63),
    st.sampled_from(_alpha),
)


@settings(max_examples=300, deadline=None)
@given(st.text(_alpha, max_size=12), st.lists(edit, min_size=0, max_size=2))
def test_deletion_neighborhoods_catch_all_edits(s, edits):
    t = s
    for e in edits:
        t = _random_edit(t, *e)
    k = len(edits)  # true distance <= number of applied edits
    if k == 0:
        assert s in _deletes(s, 1)
        return
    assert _deletes(s, k) & _deletes(t, k), (s, t, k)


# -- r9: canonicalize_text engine parity -------------------------------------
# The canonical form must be a pure function with identical semantics
# in Python (the mirror below), Java regex (Spark), and RE2 (DuckDB).
# Property-test the Python mirror's algebraic contracts here; the
# Spark/DuckDB agreement is pinned by q146's value oracle and the
# unit tests.

import re as _re


_WS = " \t\n\x0B\f\r"  # explicit: Java \s and RE2 \s disagree on \x0b


def _py_canon(t: str) -> str:
    t = _re.sub(f"[^a-z0-9{_WS}]", "", t.lower())
    return _re.sub(f"[{_WS}]+", " ", t).strip(" ")


_printable = st.text(
    st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


@given(_printable)
def test_canonicalize_idempotent(t):
    assert _py_canon(_py_canon(t)) == _py_canon(t)


@given(_printable, _printable)
def test_canonicalize_invariant_under_case_punct_ws(a, b):
    # joining with any amount of whitespace + punctuation noise and
    # flipping case never changes the canonical form
    noisy = "  " + a.upper() + " !! ,, " + b.lower() + "\t"
    clean = a + " " + b
    assert _py_canon(noisy) == _py_canon(clean)


@settings(deadline=None, max_examples=25)
@given(
    st.lists(
        st.text(st.sampled_from("aB1 .!"), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_canonicalize_spark_matches_python_mirror(spark, texts):
    # randomized differential: the Catalyst expression IS the mirror
    from relationalize_spark.operators.text import canonicalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonicalize_text("t").alias("c")).collect()
    }
    assert got == {i: _py_canon(t) for i, t in enumerate(texts)}
