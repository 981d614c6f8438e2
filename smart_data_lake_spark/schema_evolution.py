"""Schema evolution — align an existing table's frame with a new frame.

Reference: `util/evolution/SchemaEvolution.scala:100-129,151-224` and
`util/evolution/ComplexTypeEvolution.scala`. Rules:
  * new column            → add to old side as null (back-fill)
  * deleted column        → keep on new side as null (or drop if configured)
  * numeric widening      → byte<short<int<long<float<double; int→decimal
  * anything → string     → allowed
  * nested struct/array/map evolve recursively.

The reference uses generated Scala UDFs for nested evolution; here nested
rebuild stays in Catalyst via cast on a reconstructed struct type (Spark can
cast struct→struct field-wise when names match), falling back to
`F.transform`/`withField` composition — no Python UDFs in the path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_ORDER = {
    T.ByteType(): 0,
    T.ShortType(): 1,
    T.IntegerType(): 2,
    T.LongType(): 3,
    T.FloatType(): 4,
    T.DoubleType(): 5,
}


class SchemaEvolutionError(Exception):
    pass


def _widen(old: T.DataType, new: T.DataType) -> T.DataType:
    """Common supertype of two types, or raise (SchemaEvolution.scala:100-129)."""
    if old == new:
        return new
    if isinstance(new, T.StringType) or isinstance(old, T.StringType):
        return T.StringType()
    if old in _NUMERIC_ORDER and new in _NUMERIC_ORDER:
        return new if _NUMERIC_ORDER[new] >= _NUMERIC_ORDER[old] else old
    if isinstance(old, T.DecimalType) and isinstance(new, (T.DecimalType, *map(type, _NUMERIC_ORDER))):
        return new if isinstance(new, T.DecimalType) else T.DoubleType()
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        return _evolve_struct_type(old, new)
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return T.ArrayType(_widen(old.elementType, new.elementType), True)
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        return T.MapType(_widen(old.keyType, new.keyType), _widen(old.valueType, new.valueType), True)
    if isinstance(old, T.DateType) and isinstance(new, T.TimestampType):
        return new
    raise SchemaEvolutionError(f"cannot evolve {old.simpleString()} -> {new.simpleString()}")


def _evolve_struct_type(old: T.StructType, new: T.StructType) -> T.StructType:
    """Union of fields in the reference's ordering contract: OLD-side order
    first (incl. deleted columns, kept with their old type), then the new
    side's additions in new order (SchemaEvolution.scala sortResultsByOldDf;
    SchemaEvolutionTest:161/389)."""
    new_by_name = {f.name: f for f in new.fields}
    fields = []
    for f_ in old.fields:
        if f_.name in new_by_name:
            fields.append(T.StructField(f_.name, _widen(f_.dataType, new_by_name[f_.name].dataType), True))
        else:
            fields.append(T.StructField(f_.name, f_.dataType, True))
    old_names = {x.name for x in old.fields}
    for f_ in new.fields:
        if f_.name not in old_names:
            fields.append(T.StructField(f_.name, f_.dataType, True))
    return T.StructType(fields)


@dataclass
class EvolutionResult:
    old_df: DataFrame
    new_df: DataFrame
    target_schema: T.StructType


def has_same_col_names_and_types(a: T.StructType, b: T.StructType) -> bool:
    """Order-insensitive schema identity on (name, type) pairs
    (SchemaEvolution.hasSameColNamesAndTypes, SchemaEvolutionTest:40-56)."""
    return {(f.name, f.dataType) for f in a.fields} == {(f.name, f.dataType) for f in b.fields}


def evolve(
    old_df: DataFrame,
    new_df: DataFrame,
    ignore_old_deleted_columns: bool = False,
    cols_to_ignore: list[str] | None = None,
) -> EvolutionResult:
    """Return both frames projected onto the evolved common schema
    (SchemaEvolution.process, SchemaEvolution.scala:151-224).

    `cols_to_ignore` are technical columns (dl_ts_captured, dl_hash, …):
    they take no part in the evolution comparison and are re-appended at the
    END of the result, after old-order columns and new columns
    (SchemaEvolutionTest:321 'New columns and technical cols to ignore',
    :389 output-ordering contract)."""
    ignore = [c for c in (cols_to_ignore or [])]
    ignore_set = {c.lower() for c in ignore}
    # ignored technical columns present on BOTH sides must agree on type —
    # they bypass evolution, so a silent type conflict would surface only as
    # a downstream union failure (reference asserts the same)
    old_types = {f.name.lower(): f.dataType for f in old_df.schema.fields}
    new_types = {f.name.lower(): f.dataType for f in new_df.schema.fields}
    for c in ignore_set & set(old_types) & set(new_types):
        if old_types[c] != new_types[c]:
            raise ValueError(
                f"cols_to_ignore column {c!r} has conflicting types: "
                f"{old_types[c].simpleString()} vs {new_types[c].simpleString()}"
            )
    old_data = old_df.drop(*[c for c in old_df.columns if c.lower() in ignore_set])
    new_data = new_df.drop(*[c for c in new_df.columns if c.lower() in ignore_set])
    target = _evolve_struct_type(old_data.schema, new_data.schema)
    if ignore_old_deleted_columns:
        new_names = {f.name for f in new_data.schema.fields}
        target = T.StructType([f for f in target.fields if f.name in new_names])

    def projected(df: DataFrame) -> DataFrame:
        kept = [c for c in df.columns if c.lower() in ignore_set]
        return project_to_schema(df, target, append_cols=kept)

    return EvolutionResult(
        old_df=projected(old_df),
        new_df=projected(new_df),
        target_schema=target,
    )


def project_to_schema(
    df: DataFrame, target: T.StructType, append_cols: list[str] | None = None
) -> DataFrame:
    """Project/cast a frame onto a target schema, adding missing columns as
    null and recursively casting nested types. Struct-to-struct cast handles
    the nested rebuild inside Catalyst (no UDF). `append_cols` (technical
    columns excluded from evolution) are passed through verbatim at the END
    — one select, so both paths share the cast logic."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f_ in target.fields:
        if f_.name in have:
            if have[f_.name].dataType == f_.dataType:
                cols.append(F.col(f"`{f_.name}`"))
            else:
                cols.append(_cast_nested(F.col(f"`{f_.name}`"), have[f_.name].dataType, f_.dataType).alias(f_.name))
        else:
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
    cols.extend(F.col(f"`{c}`") for c in (append_cols or []))
    return df.select(*cols)


def _cast_nested(col, source: T.DataType, target: T.DataType):
    if isinstance(source, T.StructType) and isinstance(target, T.StructType):
        # rebuild explicitly so *added* nested fields appear as nulls even
        # where a plain cast would fail on missing fields
        src_names = {f.name for f in source.fields}
        parts = []
        for f_ in target.fields:
            if f_.name in src_names:
                sub_src = next(x.dataType for x in source.fields if x.name == f_.name)
                parts.append(_cast_nested(col.getField(f_.name), sub_src, f_.dataType).alias(f_.name))
            else:
                parts.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        struct = F.struct(*parts)
        return F.when(col.isNull(), F.lit(None).cast(target)).otherwise(struct)
    if isinstance(source, T.ArrayType) and isinstance(target, T.ArrayType):
        return F.transform(col, lambda x: _cast_nested(x, source.elementType, target.elementType))
    if isinstance(source, T.MapType) and isinstance(target, T.MapType):
        return F.map_from_arrays(
            F.transform(F.map_keys(col), lambda k: _cast_nested(k, source.keyType, target.keyType)),
            F.transform(F.map_values(col), lambda v: _cast_nested(v, source.valueType, target.valueType)),
        )
    return col.cast(target)
