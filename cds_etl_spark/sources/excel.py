"""Excel edge adapter (O1/O2).

The reference ingests submitter xlsx workbooks via
`pd.read_excel(..., keep_default_na=False)`
(cds-transformation_v1.3.py:129-132). xlsx is an inherently
driver-side, non-splittable format (one workbook ≤ ~1M rows), so this
adapter reads it with openpyxl on the driver and hands Spark an
Arrow-backed DataFrame — an EDGE adapter only; the scale path is
Parquet/CSV through `spark.read` (sources/files.py). Import-gated: if
openpyxl is absent the engine still works for every other source.

`keep_default_na=False` parity: cells come through as raw values;
empty cells are empty strings, not nulls — downstream
`normalize_strings` applies the single null policy, same as the
reference's late normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_excel_sheet(
    spark: SparkSession, path: str, sheet_name: str = "Metadata"
) -> DataFrame:
    try:
        import openpyxl
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "Excel ingestion requires openpyxl (driver-side edge adapter); "
            "use Parquet/CSV sources for the scale path"
        ) from e

    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    ws = wb[sheet_name]
    rows = ws.iter_rows(values_only=True)
    header = [str(h) if h is not None else "" for h in next(rows)]
    data = [
        tuple("" if v is None else v if isinstance(v, (int, float)) else str(v) for v in row)
        for row in rows
    ]
    wb.close()
    # All-string ingest mirrors keep_default_na=False object columns;
    # numeric cells keep their type (pandas does the same).
    return spark.createDataFrame(data, schema=header)
