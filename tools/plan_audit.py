"""Physical-plan audit: exchanges / pushdown / pruning / join strategy per
query. Backs the 'Plan audit' section of BENCH.md.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pdf_parser_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

DEFAULT = [
    "extract_classic_pipeline", "p4_regex_fields", "p12_display_name_join",
    "w1_topk_limit", "dedup_exact", "dedup_minhash_lsh_pairs",
    "dedup_minhash_lsh_pairs_capped", "ann_bruteforce_topk", "ann_knn_join",
    "ann_bucketed_near_dup", "text_quality_score", "f1_f2_size_filter",
    "pipeline_extract_dedup_chunk", "shape_pack_documents",
    "temporal_asof_join", "temporal_interval_join",
    "clean_gopher_gate",  # r5: must stay one fused JVM projection
    "clean_decontaminate",  # r5: gram join must broadcast the bench side
    "dedup_span_coverage",  # r5: 8-byte-key shuffles, no broadcast of big sides
    "ann_semdedup",  # r5: assignment fused JVM projection; pair join on cluster
    "pipeline_training_mix",  # r5: three curation gates in ONE composed plan
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    from pdf_parser_spark.corpus import ensure_corpus

    ensure_corpus(SF_DIR)
    q = entrymod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = q[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        schemas = re.findall(r"ReadSchema: (.*)", plan)
        print(
            f"== {name}: exchanges={plan.count('Exchange')}"
            f" broadcastJoin={plan.count('BroadcastHashJoin')}"
            f" sortMergeJoin={plan.count('SortMergeJoin')}"
            f" topK={plan.count('TakeOrderedAndProject')}"
        )
        for p, s in zip(pushed or ["-"] * len(schemas), schemas):
            print(f"   pushed=[{p[:70]}] read={s[:100]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
