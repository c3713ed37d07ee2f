"""pdf_parser_spark — a PySpark-native web-scale main-content extraction engine.

Re-expresses the extraction semantics of the reference app (iWhyDuck/pdf-parser,
studied at /root/reference) as an idiomatic Spark job over Common-Crawl-style
page tables: bytes-in -> validated -> text -> field-values -> persisted rows,
with per-row error isolation, lineage counters, and idempotent resume.

Layout:
    kernels/    pure-Python, Spark-free extraction kernels (unit-testable)
    operators/  web-scale dataset operators (dedup, similarity, text stats)
    corpus.py   deterministic synthetic page-corpus generator
    pipeline.py the Spark plan (filters -> router -> mapInPandas kernels -> sink)
    session.py  SparkSession builder tuned for binary-heavy rows
"""

__version__ = "0.1.0"
