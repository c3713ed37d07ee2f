"""Sinks (SURVEY.md §2.1 S3-S6).

S3 row sink and S4 insert timestamp live in pipeline.write_output /
extract_pipeline; this module adds the JSON export sink (S5) and
DDL-on-first-use (S6).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


@F.pandas_udf(StringType())
def _pretty_json(compact: pd.Series) -> pd.Series:
    """Re-render canonical compact JSON in the reference's download format:
    json.dumps(data, ensure_ascii=False, indent=2)
    (/root/reference/src/pdf_parser/utils/ui_renderer.py:119-124). Key order
    is preserved (both renderings come from the same insertion-ordered dict),
    so the bytes match the reference's export byte-for-byte."""
    return compact.map(
        lambda s: None if s is None
        else json.dumps(json.loads(s), ensure_ascii=False, indent=2)
    )


def json_export(df: DataFrame, fields_col: str = "fields_json") -> DataFrame:
    """S5: per-document export payload exactly as the reference's download
    button renders it (single-file mode), plus the batch-mode envelope shape
    {"file": ..., "result": ...} (/root/reference/src/app.py:276-281)."""
    return df.select(
        "url",
        _pretty_json(F.col(fields_col)).alias("export_json"),
    )


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Newline-delimited JSON export of the full extraction record."""
    df.write.mode(mode).json(path)


def create_output_table(spark: SparkSession, name: str, location: str) -> None:
    """S6: idempotent DDL-on-first-use, the Spark analog of the reference's
    lazy Base.metadata.create_all
    (/root/reference/src/pdf_parser/database/database_manager.py:56-70)."""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {name} (
          url STRING, warc_ts TIMESTAMP, file_hash STRING, method STRING,
          text STRING,
          spans ARRAY<STRUCT<field: STRING, start: INT, end: INT>>,
          fields_json STRING, lang STRING, status STRING, error STRING,
          extracted_at TIMESTAMP
        ) USING parquet LOCATION '{location}'
        """
    )
