"""Excel file DataObject.

Reference: `sdl-core/.../dataobject/ExcelFileDataObject.scala:56-73` (sheet
name, header row, row range, column range — options of the spark-excel
package).

Spark-first: with the `spark-excel` jar on the classpath the distributed
`format("excel")` reader is used; otherwise, pandas.read_excel (openpyxl)
reads driver-side and parallelizes — Excel sources are small config/reference
sheets by nature, never the 100 TB fact path. Neither backend is present in
this container: the class validates config and raises a clear error at IO
time (gated, per environment constraints).
"""

from __future__ import annotations

import glob
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from smart_data_lake_spark.config import register_data_object_type
from smart_data_lake_spark.dataobjects.base import CanCreateDataFrame, CanWriteDataFrame, DataObject


def _has_pandas_excel() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


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

    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        if self.use_spark_excel:
            reader = spark.read.format("excel").options(**self.reader_options())
            if self.schema:
                reader = reader.schema(self.schema)
            return reader.load(self.path)
        if not _has_pandas_excel():
            raise RuntimeError(
                f"({self.id}) reading Excel needs either the spark-excel package "
                "(use_spark_excel=True + jar on classpath) or openpyxl for the "
                "pandas fallback; neither is installed in this environment"
            )
        import pandas as pd  # pragma: no cover — openpyxl absent in container

        paths = sorted(glob.glob(self.path)) if any(c in self.path for c in "*?[") else [self.path]
        frames = [
            pd.read_excel(p, sheet_name=self.sheet_name, header=self.header_row, skiprows=self.skip_rows)
            for p in paths
            if os.path.exists(p)
        ]
        pdf = pd.concat(frames, ignore_index=True)
        return spark.createDataFrame(pdf, schema=self.schema)

    def write_dataframe(self, df, partition_values=None, save_mode=None, merge_options=None):
        if not _has_pandas_excel():
            raise RuntimeError(f"({self.id}) writing Excel requires openpyxl (not installed)")
        pdf = df.toPandas()  # pragma: no cover — openpyxl absent in container
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        pdf.to_excel(self.path, sheet_name=str(self.sheet_name), index=False)
        return {"records_written": len(pdf)}
