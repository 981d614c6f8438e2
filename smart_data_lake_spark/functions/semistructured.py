"""Schema-on-read operators for semi-structured (JSON string) columns.

The reference flattens nested/semi-structured payloads with its generic
DataFrame layer (Flatten transformer, `/root/reference/sdl-core/src/main/
scala/io/smartdatalake/workflow/action/generic/transformer/
FlattenDfTransformer.scala`; JSON sources parse on read). Re-expressed
Spark-first:

  * `extract_json_fields` — project typed columns out of a JSON string
    column with `get_json_object` (JVM-side JsonPath, whole-stage codegen;
    no Python, no UDF). The extraction composes with the scan — at 100 TB
    this is a per-row projection that never shuffles, and unused JSON
    payload bytes are still read (string column) but never parsed twice.
  * `infer_json_column_schema` — sample N values driver-side and let
    `spark.read.json` infer a schema, for exploratory schema-on-read. The
    sample is bounded (default 1000 rows) so driver work is constant; the
    returned StructType then drives a single `from_json` full-scan parse,
    which is the scalable path when MANY fields are needed at once
    (one parse per row instead of one per field).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def extract_json_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, tuple[str, str]],
) -> DataFrame:
    """Append one typed column per entry of ``fields``:
    name -> (json_path, spark_type). Missing paths yield NULL (JsonPath
    semantics), preserving rows — extraction never filters."""
    out = df
    for name, (path, dtype) in fields.items():
        out = out.withColumn(name, F.get_json_object(F.col(json_col), path).cast(dtype))
    return out


def parse_json_column(df: DataFrame, json_col: str, schema: StructType | str) -> DataFrame:
    """Parse the whole JSON column once with an explicit schema
    (`from_json`) into a struct column ``<json_col>_parsed`` — the
    one-parse-per-row path for wide extractions."""
    return df.withColumn(f"{json_col}_parsed", F.from_json(F.col(json_col), schema))


def infer_json_column_schema(
    spark: SparkSession, df: DataFrame, json_col: str, sample_rows: int = 1000
) -> StructType:
    """Infer a StructType for a JSON string column from a bounded sample.
    Driver-side cost is O(sample_rows) regardless of table size."""
    sample = [r[0] for r in df.select(json_col).where(F.col(json_col).isNotNull()).limit(sample_rows).collect()]
    if not sample:
        return StructType([])
    return spark.read.json(spark.sparkContext.parallelize(sample)).schema
