"""Shared fixtures. Spark session is session-scoped to amortize JVM startup."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_parser_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_001():
    from pdf_parser_spark.corpus import ensure_corpus

    return ensure_corpus(0.001)


# canonical 4-line claim text, mirroring /root/reference/tests/conftest.py:126-134
@pytest.fixture
def sample_text():
    return (
        "Customer Name: John Smith\n"
        "Policy Number: POL-123456\n"
        "Claim Amount: $1,500.00\n"
        "Date: 2024-01-01"
    )
