"""gomus Excel-report sheet ingest (SURVEY §2.1 S11).

Reference: ``FetchGomusReport`` downloads one XLSX and emits one CSV per
requested sheet index (``csv_from_excel(content, target, sheet_index)``,
src/gomus/_utils/fetch_report.py:18-87); downstream tasks then type the
columns — Excel serial dates included (src/gomus/orders.py:86-87).

Spark-first: a workbook is modelled as a line table ``(sheet_index,
row_index, line)`` — exactly what a distributed XLSX reader (or the
sheet→CSV dump the reference produces) yields.  Selecting a sheet is a
pushed-down filter; header skipping is a row-index predicate (never a
driver-side slice); typing is one ``from_csv`` projection.  At 100 TB of
workbooks the same plan applies per file via ``input_file_name``
grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.parsing import excel_serial_to_date


def sheet_rows(workbook: DataFrame, sheet_index: int,
               skip_rows: int = 1) -> DataFrame:
    """Select one sheet and drop its header rows.  ``workbook`` has
    columns (sheet_index, row_index, line)."""
    return workbook.filter(
        (F.col("sheet_index") == sheet_index)
        & (F.col("row_index") >= skip_rows))


def parse_sheet(workbook: DataFrame, sheet_index: int, schema: str,
                skip_rows: int = 1, sep: str = ",") -> DataFrame:
    """S11: sheet select + CSV-typed projection, keeping the reference's
    sheet-index abstraction.  ``schema`` is a ``from_csv`` DDL string."""
    rows = sheet_rows(workbook, sheet_index, skip_rows)
    parsed = rows.select(
        F.from_csv("line", schema, {"sep": sep}).alias("r"))
    return parsed.select("r.*")


def decode_excel_serial(df: DataFrame, column: str) -> DataFrame:
    """Excel serial day-number -> DATE (epoch 1899-12-30), the
    ``xldate_as_datetime`` cast of src/gomus/orders.py:86-87 /
    events.py:109-110."""
    col: Column = F.col(column).cast("int")
    return df.withColumn(column, excel_serial_to_date(col))
