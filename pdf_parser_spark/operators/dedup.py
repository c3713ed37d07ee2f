"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
  * exact dedup is one hash-aggregate (map-side partial agg is free);
  * MinHash is explode(shingles) -> one groupBy(doc) with K min() aggregates
    (no UDF: the per-seed hash is a JVM expression), then LSH banding turns
    the O(n^2) pair search into an equi-join on band keys — the only
    shuffle-heavy step joins tiny bucket groups, never the corpus;
  * SimHash is a vectorized Pandas UDF (numpy bit-voting; no per-row Python);
  * exact n-gram Jaccard uses an inverted shingle index (explode + self-join
    on shingle) so only co-occurring pairs are scored.

Cross-engine determinism: hashes are 60-bit ints from md5 hex prefixes, which
DuckDB computes identically (('0x'||substring(md5(s),1,15))::BIGINT), so the
driver's value-hash oracle can check MinHash signatures exactly.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .textstats import _ASCII_WS, normalized

__all__ = [
    "md5_hash60", "xxhash60", "exact_dedup", "word_shingles",
    "minhash_signatures", "minhash_lsh_pairs", "jaccard_pairs", "simhash64",
    "simhash_dups", "connected_components", "dup_clusters",
]


def md5_hash60(col: Column) -> Column:
    """Deterministic 60-bit hash portable across Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def xxhash60(col: Column) -> Column:
    """Production hash: xxhash64 (JVM-native, ~20x cheaper than md5) masked
    to the same 60-bit domain. Use for real corpora; md5_hash60 exists so
    the DuckDB oracle can reproduce signatures bit-for-bit."""
    return F.xxhash64(col).bitwiseAND(F.lit((1 << 60) - 1))


_HASH_FNS = {"md5": md5_hash60, "xxhash": xxhash60}


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical normalized content; keep the smallest id as canonical.

    One shuffle (hash aggregate); partial aggregation runs map-side.

    NULL text is coalesced to '' BEFORE hashing: sha2(NULL) is NULL, which
    would silently collapse every NULL-text document into one NULL
    fingerprint group invisible to downstream keep-logic. With the coalesce
    they group under the empty-content fingerprint, visibly counted.
    """
    fp = F.substring(
        F.sha2(F.coalesce(normalized(F.col(text_col)), F.lit("")), 256), 1, 16
    )
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# --------------------------------------------------------------------------
# Shingling + MinHash + LSH
# --------------------------------------------------------------------------

def word_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document, as (id, shingle) rows.

    Pure JVM: split -> sequence -> transform(slice+concat_ws) -> explode.

    Documents with fewer than n tokens yield NO shingles: sequence(1, 0)
    would otherwise produce a DESCENDING [1, 0] whose 0 start crashes
    slice() — a short/empty document must never kill a task (found by the
    differential fuzz gate, tests/test_oracle_fuzz.py).
    """
    tokens = F.split(normalized(F.col(text_col)), " ")
    idx = F.when(
        F.size(tokens) >= n,
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3,
                       num_hashes: int = 8, hash_fn: str = "md5") -> DataFrame:
    """K-permutation MinHash: sig_i = min over shingles of hash60(shingle#i).

    One explode + one groupBy with K min() aggregates — all JVM expressions,
    map-side combinable, exactly one shuffle.
    """
    h = _HASH_FNS[hash_fn]
    sh = word_shingles(df, text_col, id_col, n)
    aggs = [
        F.min(h(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n: int = 3, num_hashes: int = 16, bands: int = 4,
                      hash_fn: str = "md5",
                      max_bucket: Optional[int] = None) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding over MinHash signatures.

    Documents sharing any band key become a candidate pair; at scale each
    band bucket is tiny, so the self-join explodes only real collisions.
    Returns distinct (id_a, id_b) with id_a < id_b.

    max_bucket: skew guard for 10^12-doc corpora — a band bucket holding M
    members yields M^2/2 candidate pairs, so one degenerate bucket (e.g. all
    empty documents share a signature) can dominate the whole job. Buckets
    larger than max_bucket are dropped; their members are by construction
    near-identical to thousands of others, so exact_dedup (one cheap hash
    aggregate) already collapses them. None = no cap (oracle-exact mode).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, hash_fn)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        # md5 band key (not Spark's internal hash) so DuckDB oracles can
        # reproduce the exact candidate set
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("key")
            ).alias(f"b{b}")
        )
    banded = sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk"))
    banded = banded.select(id_col, "bk.band", "bk.key")
    if max_bucket is not None:
        # bucket-size filter as a window count: ONE shuffle of `banded` by
        # (band, key), which is also the self-join key — vs the previous
        # groupBy+join form that shuffled banded twice and joined (measured
        # 28 -> fewer exchanges; same rows, the oracle's QUALIFY count)
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key")
        banded = (
            banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .where(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, threshold: float = 0.6,
                  max_df: Optional[int] = None) -> DataFrame:
    """Exact n-gram Jaccard similarity via an inverted shingle index.

    common(a,b) from the self-join on shingle; |A|,|B| from a per-doc count;
    J = common / (|A| + |B| - common). Only co-occurring pairs are scored.

    max_df: skew guard — a shingle appearing in M documents contributes
    M^2/2 join rows, so stop-shingles ("of the and") dominate web corpora.
    Shingles with document frequency > max_df are dropped from the index
    BEFORE the self-join; |A|/|B| are computed on the same filtered shingle
    sets, so the similarity stays a true Jaccard over the pruned universe
    (the standard prefix-filtering compromise). None = exact (oracle mode).
    """
    sh = word_shingles(df, text_col, id_col, n)
    if max_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(dfreq.where(F.col("_df") <= max_df), "shingle").drop("_df")
    sh = sh.cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    l, r = sh.alias("l"), sh.alias("r")
    common = (
        l.join(r, (F.col("l.shingle") == F.col("r.shingle"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# Duplicate clusters: connected components over the near-dup pair graph
# --------------------------------------------------------------------------

def connected_components(
    nodes: DataFrame, edges: DataFrame, id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Min-label propagation to a fixpoint: every node ends up labelled with
    the smallest id reachable from it. Returns (id_col, component).

    Iterative-algorithm-on-Spark shape: a driver loop of joins, with
    localCheckpoint() per round to truncate the lineage (else the plan
    doubles every iteration) and a LongAccumulator-free convergence test via
    a changed-count aggregate. Rounds needed = graph diameter, which for
    near-dup clusters is tiny (dups cluster into cliques/stars); each round
    is one shuffle join on (node -> label), never on payloads.
    """
    both = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint()
    for _ in range(max_iters):
        neighbor_min = (
            both.join(labels, both.dst == labels.node)
            .groupBy("src").agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                (F.coalesce("nbr_label", "label") < F.col("label")).alias("_chg"),
            )
        )
        updated = updated.localCheckpoint()
        changed = updated.where(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if changed == 0:
            break
    else:
        # the loop exhausted max_iters with labels still moving: returning
        # silently would hand the caller wrong components with no signal
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing); the pair graph has a longer "
            "diameter than near-dup clusters should — raise max_iters"
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))


def dup_clusters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, num_hashes: int = 16, bands: int = 8,
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """End-to-end near-dup clustering: MinHash+LSH pairs -> components.

    The canonical keep-one-per-cluster rule is then `component == doc_id`
    (smallest id survives), matching exact_dedup's keep_id convention.

    max_bucket forwards to minhash_lsh_pairs' skew guard — the clustering
    path is the one users run end-to-end, so at scale pass the same cap the
    capped pairs query uses (a degenerate band bucket of M members otherwise
    feeds M^2/2 edges into component propagation). None = oracle-exact mode.
    """
    pairs = minhash_lsh_pairs(
        df, text_col, id_col, n, num_hashes, bands, max_bucket=max_bucket
    )
    return connected_components(df.select(id_col), pairs, id_col)


# --------------------------------------------------------------------------
# SimHash (vectorized Pandas UDF — bit voting needs numpy, not a SQL shape)
# --------------------------------------------------------------------------

@F.pandas_udf(LongType())
def _simhash64_udf(texts: pd.Series) -> pd.Series:
    import hashlib

    import numpy as np

    shifts = np.arange(64, dtype=np.uint64)
    out = []
    for t in texts:
        # ASCII-whitespace split, matching the JVM ops' \s+ (Java and RE2
        # \s are ASCII); str.split() would also break on U+00A0 etc.,
        # silently diverging from every SQL engine on NBSP-laden web text
        toks = set(x for x in _ASCII_WS.split(("" if t is None else str(t)).lower()) if x)
        if not toks:
            out.append(0)
            continue
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                for tok in toks
            ],
            dtype=np.uint64,
        )
        bits = (hs[:, None] >> shifts) & np.uint64(1)          # (n_tok, 64)
        votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)    # +1/-1 voting
        sim = int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        out.append(sim - (1 << 64) if sim >= (1 << 63) else sim)  # to signed
    return pd.Series(out, dtype="int64")


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (Arrow-batched; numpy bit voting)."""
    return df.select(F.col(id_col), _simhash64_udf(F.col(text_col)).alias("simhash"))


def simhash_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 max_hamming: int = 3,
                 max_block: Optional[int] = None) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming.

    Scale path: block on 4 16-bit sub-keys (pigeonhole: any pair within
    Hamming<=3 of 64 bits agrees on at least one 16-bit block), then verify
    distance with bit_count on the xor — JVM-side.

    max_block: skew cap mirroring minhash_lsh_pairs' max_bucket — a
    degenerate block (every empty document simhashes to 0) yields M^2/2
    verify pairs; blocks above the cap are dropped, their members being
    exact-dup material that exact_dedup already collapses. None = exact.
    """
    sig = simhash64(df, text_col, id_col)
    blocks = F.array(*[
        F.struct(
            F.lit(b).alias("blk"),
            F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
        )
        for b in range(4)
    ])
    banded = sig.select(id_col, "simhash", F.explode(blocks).alias("bk"))
    banded = banded.select(id_col, "simhash", "bk.blk", "bk.key")
    if max_block is not None:
        sizes = banded.groupBy("blk", "key").agg(F.count(F.lit(1)).alias("_bsz"))
        banded = (
            banded.join(sizes.where(F.col("_bsz") <= max_block), ["blk", "key"])
            .drop("_bsz")
        )
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(r, (F.col("l.blk") == F.col("r.blk")) & (F.col("l.key") == F.col("r.key"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs
