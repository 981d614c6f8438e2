"""Excel file DataObject.

Reference: `sdl-core/.../dataobject/ExcelFileDataObject.scala:56-73` (sheet
name, header row, row range — options of the spark-excel package).

Backend chain, most capable first:
1. spark-excel distributed reader (`use_spark_excel=True`, jar on classpath);
2. pandas.read_excel when openpyxl is importable;
3. the stdlib xlsx codec in `xlsx.py` (zipfile + ElementTree) — always
   available, used in this container. Reads are still distributed
   (binaryFile scan + Arrow-batched mapInPandas, one workbook per task) so a
   directory of thousands of workbooks parallelizes; the schema comes from a
   driver-side peek of ONE file. Writes produce a single workbook — an
   inherently single-file container format — and enforce Excel's own
   1,048,576-row limit rather than silently truncating.
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smart_data_lake_spark.config import register_data_object_type
from smart_data_lake_spark.dataobjects.base import CanCreateDataFrame, CanWriteDataFrame, DataObject
from smart_data_lake_spark.dataobjects.xlsx import read_xlsx_bytes, write_xlsx_bytes

EXCEL_MAX_ROWS = 1_048_575  # data rows (one row consumed by the header)


def _has_pandas_excel() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def _infer_spark_type(values: list[Any]) -> T.DataType:
    non_null = [v for v in values if v is not None]
    if not non_null:
        return T.StringType()
    if all(isinstance(v, bool) for v in non_null):
        return T.BooleanType()
    if all(isinstance(v, dt.datetime) for v in non_null):
        return T.TimestampType()
    if all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in non_null):
        return T.DoubleType()
    return T.StringType()


def _jsonable(v: Any) -> Any:
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    return v


@register_data_object_type
class ExcelFileDataObject(DataObject, CanCreateDataFrame, CanWriteDataFrame):
    def __init__(
        self,
        id: str,
        path: str,
        sheet_name: str | int = 0,
        header_row: int = 0,
        skip_rows: int = 0,
        use_spark_excel: bool = False,
        schema: str | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        self.path = path
        self.sheet_name = sheet_name
        self.header_row = header_row
        self.skip_rows = skip_rows
        self.use_spark_excel = use_spark_excel
        self.schema = schema

    def reader_options(self) -> dict[str, str]:
        """Options for the spark-excel distributed reader
        (ExcelFileDataObject.scala:56-73 option mapping)."""
        # spark-excel dataAddress grammar: "<sheet>!<cell>" where sheet is a
        # 0-based index or a quoted name; a bare integer is not a valid address
        address = (
            f"'{self.sheet_name}'!A{self.header_row + 1}"
            if isinstance(self.sheet_name, str)
            else f"{self.sheet_name}!A{self.header_row + 1}"
        )
        return {
            "dataAddress": address,
            "header": "true",
            "inferSchema": "false" if self.schema else "true",
        }

    def _paths(self) -> list[str]:
        if any(c in self.path for c in "*?["):
            return sorted(glob.glob(self.path))
        if os.path.isdir(self.path):
            return sorted(glob.glob(os.path.join(self.path, "*.xlsx")))
        return [self.path] if os.path.exists(self.path) else []

    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        if self.use_spark_excel:
            reader = spark.read.format("excel").options(**self.reader_options())
            if self.schema:
                reader = reader.schema(self.schema)
            return reader.load(self.path)
        if _has_pandas_excel():
            return self._read_via_pandas(spark)  # pragma: no cover — openpyxl absent here
        return self._read_via_stdlib(spark)

    def _read_via_pandas(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        import pandas as pd

        # skip_rows means "rows dropped AFTER the header" in this DataObject
        # (matching the stdlib backend and the reference's rowRange); pandas'
        # integer skiprows skips from the TOP instead, so pass the explicit
        # post-header row indexes to keep both backends identical
        skip = list(range(self.header_row + 1, self.header_row + 1 + self.skip_rows))
        frames = [
            pd.read_excel(p, sheet_name=self.sheet_name, header=self.header_row,
                          skiprows=skip or None)
            for p in self._paths()
        ]
        pdf = pd.concat(frames, ignore_index=True)
        return spark.createDataFrame(pdf, schema=self.schema)

    def _read_via_stdlib(self, spark: SparkSession) -> DataFrame:
        paths = self._paths()
        if not paths:
            raise FileNotFoundError(f"({self.id}) no workbooks at {self.path}")
        # one driver-side peek for columns + types; executors decode the rest
        with open(paths[0], "rb") as fh:
            columns, rows = read_xlsx_bytes(
                fh.read(), self.sheet_name, self.header_row, self.skip_rows
            )
        # parse with the permissive inferred schema (Excel numbers are always
        # doubles); an explicit user schema is applied as a cast afterwards
        sschema = T.StructType(
            [
                T.StructField(c, _infer_spark_type([r[i] if i < len(r) else None for r in rows]))
                for i, c in enumerate(columns)
            ]
        )
        target_schema = None
        if self.schema:
            target_schema = (
                T.StructType.fromDDL(self.schema) if isinstance(self.schema, str) else self.schema
            )
        cfg = json.dumps(
            {
                "sheet": self.sheet_name,
                "header_row": self.header_row,
                "skip_rows": self.skip_rows,
                "columns": columns,
                # inferred (from the first workbook) per-column kinds so the
                # executor decode can SURFACE type drift in later workbooks
                # (a numeric column holding text would otherwise be silently
                # nulled by from_json); date/timestamp drift still degrades
                # to null since cell values arrive as ISO strings
                "kinds": [f.dataType.simpleString() for f in sschema.fields],
            }
        )

        def _decode(batches: "Iterator") -> "Iterator":
            import pandas as pd

            opts = json.loads(cfg)
            for pdf in batches:
                docs = []
                for raw in pdf["content"]:
                    cols, body = read_xlsx_bytes(
                        bytes(raw), opts["sheet"], opts["header_row"], opts["skip_rows"]
                    )
                    if cols != opts["columns"]:
                        raise ValueError(
                            f"workbook column mismatch: {cols} != {opts['columns']}"
                        )
                    kinds = opts["kinds"]
                    for r in body:
                        rec = {}
                        for i, c in enumerate(cols):
                            v = _jsonable(r[i] if i < len(r) else None)
                            if (
                                v is not None
                                and kinds[i] in ("double", "bigint", "int")
                                and isinstance(v, str)
                            ):
                                raise ValueError(
                                    f"workbook type drift in column {c!r}: schema "
                                    f"(inferred from the first workbook) says {kinds[i]}, "
                                    f"found text {v!r}"
                                )
                            rec[c] = v
                        docs.append(json.dumps(rec))
                yield pd.DataFrame({"doc": docs})

        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.xlsx")
            .load(paths if len(paths) > 1 else paths[0])
            .select("content")
        )
        out = (
            files.mapInPandas(_decode, schema="doc string")
            .select(F.from_json("doc", sschema).alias("r"))
            .select("r.*")
        )
        if target_schema is not None:
            out = out.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target_schema.fields]
            )
        return out

    def write_dataframe(self, df, partition_values=None, save_mode=None, merge_options=None):
        if _has_pandas_excel():  # pragma: no cover — openpyxl absent here
            pdf = df.toPandas()
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            pdf.to_excel(self.path, sheet_name=str(self.sheet_name), index=False)
            return {"records_written": len(pdf)}
        rows = df.limit(EXCEL_MAX_ROWS + 1).collect()
        if len(rows) > EXCEL_MAX_ROWS:
            raise ValueError(
                f"({self.id}) DataFrame exceeds Excel's row limit ({EXCEL_MAX_ROWS}); "
                "an .xlsx sink is for small reference/report tables"
            )
        columns = df.columns
        data = write_xlsx_bytes(
            columns,
            [[row[c] for c in columns] for row in rows],
            sheet_name=str(self.sheet_name) if isinstance(self.sheet_name, str) else "Sheet1",
        )
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "wb") as fh:
            fh.write(data)
        return {"records_written": len(rows)}
