"""Corpus-cleaning operators from the public training-data literature
(C4 [Raffel et al. 2020], Gopher [Rae et al. 2021], RefinedWeb [Penedo et
al. 2023]): URL canonicalization, PII scrubbing, repetition-based quality
flags, and domain-level rollups. All JVM expressions (codegen-friendly,
no Python in the hot path) with exact DuckDB-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url", "host_of", "scrub_pii", "repetition_flags",
    "stopword_stats", "line_dedup", "domain_stats", "domain_filter",
    "GOPHER_STOPWORDS",
]

# the Gopher rule's word list (Rae et al. 2021 §A1.1: "contain at least two
# of the following English words: the, be, to, of, and, that, have, with")
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# PII patterns (shared verbatim with the DuckDB oracles; RE2-safe, no
# backrefs). Order matters: emails before phones (an email may contain
# digit runs a phone pattern would partially eat).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d .-]{7,14}\d"
IPV4_RE = r"\b(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})\b"


def host_of(url: Column) -> Column:
    """Lowercased hostname without a default-port suffix."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://([^/?#]+)", 1))
    return F.regexp_replace(host, r":(80|443)$", "")


def canonicalize_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical form for dedup/join keys: lowercase scheme+host, default
    ports stripped, fragment dropped, trailing slash trimmed (path only).

    Two pages differing only in these never differ in content, so the
    canonical url is the natural dedup/bucketing key at crawl scale.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+)://", 1))
    rest = F.regexp_extract(u, r"^[a-zA-Z]+://[^/?#]+([^#]*)", 1)  # path+query
    rest = F.regexp_replace(rest, r"^/$", "")  # bare trailing slash
    canon = F.when(
        scheme == "", u  # not a hierarchical url: pass through untouched
    ).otherwise(F.concat(scheme, F.lit("://"), host_of(u), rest))
    return df.withColumn("canonical_url", canon)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask emails, phone-like digit runs, and IPv4 addresses with typed
    placeholder tokens (the standard pre-training redaction pass). Adds
    `text_scrubbed` plus per-kind match counts for audit/lineage.
    """
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    # counts follow the same redaction order as the replacements, so an
    # IPv4 (digit runs with dots) is never double-counted as a phone
    return df.withColumn("text_scrubbed", scrubbed).withColumn(
        "n_pii",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
        + F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0))
        + F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0)),
    )


def repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_frac: float = 0.30,
    max_top_word_frac: float = 0.20,
    max_symbol_word_ratio: float = 0.10,
) -> DataFrame:
    """Gopher-style repetition/quality signals, pure array expressions:

    - dup_line_frac: 1 - distinct(lines)/lines (boilerplate pages repeat
      nav/footer lines)
    - top_word_frac: frequency of the most common word / total words
      (keyword-stuffed spam)
    - symbol_word_ratio: '#'/'...' style symbols per word

    Emits the raw fractions and a combined `keep` verdict with the paper's
    default-ish thresholds (tunable per corpus).
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    dup_line_frac = F.when(n_lines <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double")
    )

    words = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    # modal-word frequency in O(n log n): sort, then one linear fold
    # tracking (prev, current run, best run) — not the O(n^2)
    # count-each-distinct shape, which dies on long documents
    folded = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_word_frac = F.when(n_words <= 0, F.lit(0.0)).otherwise(
        folded["best"] / n_words.cast("double")
    )

    n_symbols = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\."), 0))
    symbol_ratio = F.when(n_words <= 0, F.lit(0.0)).otherwise(
        n_symbols / n_words.cast("double")
    )

    return df.select(
        F.col(id_col),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(top_word_frac, 6).alias("top_word_frac"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        (
            (dup_line_frac <= max_dup_line_frac)
            & (top_word_frac <= max_top_word_frac)
            & (symbol_ratio <= max_symbol_word_ratio)
        ).alias("keep"),
    )


def stopword_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_kinds: int = 2,
) -> DataFrame:
    """Gopher's stopword rule: keep documents containing at least min_kinds
    DISTINCT words from the 8-word English stopword list, plus the stopword
    token fraction as a quality signal. Token-exact matching (pure JVM
    array ops) — \\b-regex counting diverges between Unicode-aware (Java)
    and ASCII (RE2) word boundaries on non-ASCII-adjacent text."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(*GOPHER_STOPWORDS))
    ).cast("double")
    kinds = None
    for w in GOPHER_STOPWORDS:
        hit = (F.array_contains(toks, w)).cast("int")
        kinds = hit if kinds is None else kinds + hit
    return df.select(
        F.col(id_col),
        F.round(n_stop / F.greatest(n_tok, F.lit(1.0)), 6).alias("stop_frac"),
        kinds.alias("n_stop_kinds"),
        (kinds >= min_kinds).alias("keep"),
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 1,
) -> DataFrame:
    """CCNet-style cross-document line dedup: drop every line that occurs in
    more than max_doc_freq documents (site boilerplate, cookie banners,
    nav text), then reassemble each document's remaining lines in their
    original order.

    Shape at scale: posexplode -> one distinct-doc count per line (two
    map-side-combinable aggregates) -> filter -> one groupBy(doc) that
    array_sorts (pos, line) structs back into text. Shuffles carry lines,
    never whole documents, and the frequency side can be computed on a
    sample or a sketch at 10^12 docs without changing the plan shape.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    freq = lines.groupBy("line").agg(
        F.countDistinct(id_col).alias("_df")
    )
    kept = lines.join(freq.where(F.col("_df") <= max_doc_freq), "line")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines_total"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            F.coalesce("n_lines_total", F.lit(0)).alias("n_lines_total"),
        )
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-host rollup (docs, mean length) — the RefinedWeb-style signal for
    domain-level curation. One hash aggregate, map-side combinable."""
    return (
        df.select(host_of(F.col(url_col)).alias("host"), F.col(text_col))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg(F.length(text_col)), 4).alias("mean_chars"),
        )
    )


def domain_filter(
    df: DataFrame,
    min_docs: int = 1,
    max_docs: int | None = None,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose host falls inside a doc-count band (drop one-off
    spam hosts and mega-hosts that would dominate the mixture). The stats
    side is tiny (one row per host), so the join back broadcasts."""
    stats = domain_stats(df, url_col, text_col)
    cond = F.col("docs") >= min_docs
    if max_docs is not None:
        cond = cond & (F.col("docs") <= max_docs)
    keep_hosts = stats.where(cond).select("host")
    return df.withColumn("_host", host_of(F.col(url_col))).join(
        F.broadcast(keep_hosts), F.col("_host") == F.col("host"), "left_semi"
    ).drop("_host")
