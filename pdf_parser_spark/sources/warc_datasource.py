"""WARC as a first-class Spark data source (public Spark 4 DataSource API).

`spark.read.format("warc").load(dir)` after registration — the connector
shape users expect from an engine, built on pyspark.sql.datasource. One
input partition per archive file (WARC archives are gzip members, not
block-splittable, so file granularity IS the parallel unit; thousands of
crawl segments give thousands of partitions), each partition streaming the
from-scratch parser in sources/warc.py. Compare read_warc(), which gets the
same result via binaryFile + mapInPandas: the DataSource form additionally
gives Catalyst a named relation with a fixed schema, composes with
`.option()` plumbing, and needs no intermediate whole-file binary rows.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .warc import parse_warc_bytes

__all__ = ["WarcDataSource", "register_warc_source"]

_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.glob = options.get("glob", "*.warc*")

    def partitions(self):
        if not self.path:
            raise ValueError("warc source requires a path (load(dir))")
        files = sorted(
            glob.glob(os.path.join(self.path, "**", self.glob), recursive=True)
        )
        return [_WarcFilePartition(f) for f in files]

    def read(self, partition):
        with open(partition.path, "rb") as f:
            data = f.read()
        for url, ts, doc in parse_warc_bytes(data):
            yield (url if url else partition.path, ts, doc, "", None)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _WarcReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration: spark.read.format('warc') afterwards."""
    spark.dataSource.register(WarcDataSource)
