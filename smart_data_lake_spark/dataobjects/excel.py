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
        row_limit: int | None = None,
        start_column: str | None = None,
        end_column: str | None = None,
        partitions: list[str] | None = None,
        use_spark_excel: bool = False,
        schema: str | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        self.path = path
        self.sheet_name = sheet_name
        self.header_row = header_row
        self.skip_rows = skip_rows
        # ExcelOptions rowLimit / startColumn / endColumn
        # (ExcelFileDataObject.scala:56-73, ExcelFileDataObjectTest:94-125):
        # per-workbook row cap and an inclusive A..E column window
        self.row_limit = row_limit
        self.start_column = start_column
        self.end_column = end_column
        # hive-style partition dirs holding workbooks
        # (ExcelFileDataObjectTest:154)
        self.partitions = partitions or []
        self.use_spark_excel = use_spark_excel
        self.schema = schema

    @staticmethod
    def _col_index(letters: str) -> int:
        n = 0
        for ch in letters.strip().upper():
            n = n * 26 + (ord(ch) - ord("A") + 1)
        return n - 1

    def _apply_range(self, cols: list, body: list) -> tuple[list, list]:
        s = self._col_index(self.start_column) if self.start_column else 0
        e = self._col_index(self.end_column) + 1 if self.end_column else len(cols)
        if (s, e) != (0, len(cols)):
            cols = cols[s:e]
            body = [r[s:e] for r in body]
        if self.row_limit is not None:
            body = body[: self.row_limit]
        return cols, body

    def reader_options(self) -> dict[str, str]:
        """Options for the spark-excel distributed reader
        (ExcelFileDataObject.scala:56-73 option mapping)."""
        # spark-excel dataAddress grammar: "<sheet>!<cell>" (or a range) where
        # sheet is a 0-based index or a quoted name; the start/end column
        # window maps onto the range form "Sheet!B1:C1048576"
        start = self.start_column or "A"
        cell = f"{start}{self.header_row + 1}"
        if self.end_column:
            cell = f"{cell}:{self.end_column}1048576"
        address = (
            f"'{self.sheet_name}'!{cell}"
            if isinstance(self.sheet_name, str)
            else f"{self.sheet_name}!{cell}"
        )
        return {
            "dataAddress": address,
            "header": "true",
            "inferSchema": "false" if self.schema else "true",
        }

    def _paths(self, partition_values=None) -> list[str]:
        if any(c in self.path for c in "*?["):
            paths = sorted(glob.glob(self.path))
        elif os.path.isdir(self.path):
            if self.partitions:
                paths = sorted(
                    os.path.join(root, f)
                    for root, _d, fs in os.walk(self.path)
                    for f in fs
                    if f.endswith(".xlsx")
                )
            else:
                paths = sorted(glob.glob(os.path.join(self.path, "*.xlsx")))
        else:
            paths = [self.path] if os.path.exists(self.path) else []
        if partition_values and self.partitions:
            keep = []
            for p in paths:
                rel = os.path.relpath(p, self.path)
                segs = dict(
                    s.split("=", 1) for s in rel.split(os.sep)[:-1] if "=" in s
                )
                if any(
                    all(segs.get(k) == str(v) for k, v in pv.as_dict.items())
                    for pv in partition_values
                ):
                    keep.append(p)
            paths = keep
        return paths

    def _partition_values_of(self, path: str) -> dict:
        rel = os.path.relpath(path, self.path)
        segs = dict(s.split("=", 1) for s in rel.split(os.sep)[:-1] if "=" in s)
        return {k: segs.get(k) for k in self.partitions}

    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        if self.use_spark_excel:
            if self.partitions:
                raise NotImplementedError(
                    f"({self.id}) partitioned excel reads need the built-in "
                    "codec (use_spark_excel=False) — spark-excel has no "
                    "partition-dir discovery"
                )
            reader = spark.read.format("excel").options(**self.reader_options())
            if self.schema:
                reader = reader.schema(self.schema)
            df = reader.load(self.path)
            if self.row_limit is not None:
                df = df.limit(self.row_limit)
            return df
        if _has_pandas_excel():
            return self._read_via_pandas(spark)  # pragma: no cover — openpyxl absent here
        return self._read_via_stdlib(spark, partition_values)

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

    def _read_via_stdlib(self, spark: SparkSession, partition_values=None) -> DataFrame:
        paths = self._paths(partition_values)
        if not paths:
            if partition_values and self._paths(None):
                # workbooks exist, just not for the requested partitions: an
                # empty frame (schema known) or the DAG's no-data signal —
                # a routine empty-partition read must not crash the run
                if self.schema:
                    target = (
                        T.StructType.fromDDL(self.schema)
                        if isinstance(self.schema, str)
                        else self.schema
                    )
                    if self.partitions:
                        target = T.StructType(
                            list(target.fields)
                            + [
                                T.StructField(p, T.StringType())
                                for p in self.partitions
                                if p not in target.fieldNames()
                            ]
                        )
                    return spark.createDataFrame([], target)
                from smart_data_lake_spark.dataobjects.file import NoDataToProcessError

                raise NoDataToProcessError(
                    f"({self.id}) no workbooks for partitions {partition_values}"
                )
            raise FileNotFoundError(f"({self.id}) no workbooks at {self.path}")
        # one driver-side peek for columns + types; executors decode the rest
        with open(paths[0], "rb") as fh:
            columns, rows = read_xlsx_bytes(
                fh.read(), self.sheet_name, self.header_row, self.skip_rows
            )
        columns, rows = self._apply_range(columns, rows)
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
        if self.partitions:
            sschema = T.StructType(
                list(sschema.fields)
                + [T.StructField(p, T.StringType()) for p in self.partitions]
            )
        cfg = json.dumps(
            {
                "sheet": self.sheet_name,
                "header_row": self.header_row,
                "skip_rows": self.skip_rows,
                "start_col": self._col_index(self.start_column) if self.start_column else 0,
                "end_col": self._col_index(self.end_column) + 1 if self.end_column else None,
                "row_limit": self.row_limit,
                "partitions": self.partitions,
                "base_path": os.path.abspath(self.path),
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
                for raw, fpath in zip(pdf["content"], pdf["path"]):
                    cols, body = read_xlsx_bytes(
                        bytes(raw), opts["sheet"], opts["header_row"], opts["skip_rows"]
                    )
                    s, e = opts["start_col"], opts["end_col"]
                    if s or e is not None:
                        cols = cols[s:e]
                        body = [r[s:e] for r in body]
                    if opts["row_limit"] is not None:
                        body = body[: opts["row_limit"]]
                    if cols != opts["columns"]:
                        raise ValueError(
                            f"workbook column mismatch: {cols} != {opts['columns']}"
                        )
                    pv_of_file = {}
                    for seg in str(fpath).split("/")[:-1]:
                        if "=" in seg:
                            k, v = seg.split("=", 1)
                            if k in opts["partitions"]:
                                pv_of_file[k] = v
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
                        for p in opts["partitions"]:
                            rec[p] = pv_of_file.get(p)
                        docs.append(json.dumps(rec))
                yield pd.DataFrame({"doc": docs})

        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.xlsx")
            .load(paths if len(paths) > 1 else paths[0])
            .select("path", "content")
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
