"""Freeze the sf0.01-trained LM + BPE models into the repo.

The char-trigram LM and BPE merge table are trained by a distributed Spark
pass (lm.train_char_trigram_lm / bpe.word_frequencies+bpe_train) whose output
is deterministic (desc-count, asc-key tie-breaking). Freezing the trained
model to JSON makes the scoring/encoding queries (a) reproducible in the
DuckDB oracle — the same frozen counts are embedded in the SQL — and (b)
cheaper at bench time (no retraining per run). This mirrors production
practice: the quality LM and tokenizer are trained once on a reference slice
and shipped as artifacts, not retrained inside every scoring job.

Run:  python tools/freeze_models.py          # retrains at sf0.01, rewrites
Test: tests/test_lm.py / test_bpe.py assert frozen == freshly-trained.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.operators import bpe as B  # noqa: E402
from pdf_parser_spark.operators import lm as L  # noqa: E402
from pdf_parser_spark.operators.models import BPE_PATH, LM_PATH  # noqa: E402
from pdf_parser_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    tri_counts, _bi, _vocab = L.train_char_trigram_lm(docs)
    with open(LM_PATH, "w") as f:
        json.dump({"tri": tri_counts}, f, ensure_ascii=False, sort_keys=True)
    print(f"LM: {len(tri_counts)} trigrams -> {LM_PATH}")

    merges = B.bpe_train(B.word_frequencies(docs, top_k=5000), num_merges=200)
    with open(BPE_PATH, "w") as f:
        json.dump({"merges": merges}, f, ensure_ascii=False)
    print(f"BPE: {len(merges)} merges -> {BPE_PATH}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
