"""Driver-contract invariants for __spark_entry__ (regression guards).

Round 1's only hard failures were queries returning array<float> columns:
the driver's canonicalizer sorts on raw cell values and Python lists are
unhashable there. These guards keep every future queries() addition inside
the contract without waiting for a driver round.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def contract(spark):
    return entrymod.queries(), entrymod.oracle_sql()


class TestEntryContract:
    def test_every_query_has_an_oracle(self, contract):
        qs, oracles = contract
        assert set(qs) == set(oracles)

    def test_no_query_returns_array_or_map_columns(self, spark, contract):
        qs, _ = contract
        offenders = []
        for name, fn in qs.items():
            schema = fn(spark, SF_DIR).schema
            for f in schema.fields:
                if isinstance(f.dataType, (ArrayType, MapType)):
                    offenders.append((name, f.name, f.dataType.simpleString()))
        assert offenders == []

    def test_entry_returns_stable_schema(self, spark):
        df = entrymod.entry(spark)
        assert df.columns == [
            "url", "file_hash", "method", "text", "fields_json", "status", "error",
        ]
