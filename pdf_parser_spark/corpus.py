"""Deterministic synthetic Common-Crawl-style corpus (pure Python + pyarrow).

Synthesizes the input table with exactly the shape from BASELINE.json
`input_hint`: (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
lang STRING). No external data: PDFs come from kernels/pdfgen.py, HTML from a
seeded template mixer. A sibling `goldens.parquet` records the expected
extraction output per url (frozen M0 goldens, SURVEY.md §7.1), used by tests
and the DuckDB oracle.

Everything is a pure function of (sf, seed): re-generation is idempotent and
safe under concurrent first use (atomic rename of a DONE marker directory).

Row mix per 20-row block (deterministic by i % 20):
  idx 0..11   HTML page w/ boilerplate + claim-form article   -> html branch
  idx 12..15  PDF (cid/simple × flate/raw alternating)        -> pdf branch
  idx 16      PDF bytes but url ends .txt (wrong extension)   -> error row
  idx 17      not-a-PDF bytes with .pdf url (bad magic)       -> error row
  idx 18      too-small document (< 100 bytes)                -> error row
  idx 19      pre-extracted text row (html empty, text set);
              every 4th of these has whitespace-only text     -> error row
Mega-documents (incompressible multi-MB pad) appear every `mega_every` rows
to exercise skew/salting.
"""

from __future__ import annotations

import os
import random
import tempfile
from datetime import datetime, timedelta
from typing import Any, Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from .kernels.fields import canonical_json, extract_fields
from .kernels.pdfgen import build_pdf

__all__ = ["generate_corpus", "ensure_corpus", "corpus_dir_for", "CORPUS_ROOT", "SEED"]

SEED = 42
CORPUS_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".corpus")

_EPOCH = datetime(2024, 1, 1, 0, 0, 0)

_FIRST = ["Jan", "Anna", "José", "Łukasz", "Marie", "Søren", "Nina", "Pierre",
          "Agnieszka", "Tomáš", "Ewa", "Karl", "Zofia", "André", "Björn", "Celine"]
_LAST = ["Kowalski", "Nowak", "García", "Müller", "Dvořák", "Lindqvist",
         "Wiśniewski", "Dupont", "Jensen", "Novák", "Bauer", "Fernández"]
_CLAIM_TYPES = ["Vehicle Damage", "Property Loss", "Medical Expense", "Travel Delay"]
_CITIES = ["Kraków", "Warszawa", "Praha", "Málaga", "Köln", "Göteborg"]
_FILLER = [
    "The incident occurred during heavy rainfall and was reported promptly.",
    "Photos and a police report have been submitted as supporting documentation.",
    "An adjuster will contact the customer within two business days.",
    "Vehicle inspection has been scheduled at the nearest branch office.",
    "All statements were verified against the original policy documents.",
    "Further correspondence will be sent to the address on file.",
]
_NAV_WORDS = ["Home", "Products", "Claims", "Support", "About", "Login", "Careers", "Blog"]

# rows per scale factor: ~TPC-H-ish growth, small enough to generate quickly
_SF_ROWS = {0.001: 100, 0.01: 500, 0.1: 6000, 1.0: 60000, 3.0: 180000}
# sf3 keeps sf1's per-doc shape (pad + mega cadence) so throughput numbers
# are comparable across the two scales — only the corpus volume grows
_SF_MEGA = {0.001: 0, 0.01: 250, 0.1: 300, 1.0: 300, 3.0: 300}  # every Nth row is a mega-doc
_SF_MEGA_BYTES = {0.001: 0, 0.01: 200_000, 0.1: 2_000_000, 1.0: 2_000_000, 3.0: 2_000_000}
_SF_PAD = {0.001: 0, 0.01: 2_000, 0.1: 30_000, 1.0: 30_000, 3.0: 30_000}  # baseline per-doc pad bytes


def _claim_lines(rng: random.Random, i: int) -> Tuple[List[str], Dict[str, str]]:
    """Claim-form body lines + the golden field dict they should extract to."""
    name = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
    policy = f"POL-{rng.randrange(10**8, 10**9)}"
    amount = f"{rng.randrange(1, 20)},{rng.randrange(100, 999)}.{rng.randrange(10, 99)}"
    city = rng.choice(_CITIES)
    lines = [
        "INSURANCE CLAIM FORM",
        f"Document ID: CLM-2024-{i:06d}",
        "Customer Information",
        f"Customer Name: {name}",
        f"Policy Number: {policy}",
        f"Address: ul. Krakowska {rng.randrange(1, 99)}, {city}",
        "Claim Details",
        f"Claim Type: {rng.choice(_CLAIM_TYPES)}",
        f"Claim Amount: ${amount}",
        "Status: Under Review",
    ]
    golden = {"customer_name": name, "policy_number": policy, "claim_amount": amount}
    return lines, golden


def _prose(rng: random.Random, n: int) -> List[str]:
    return [rng.choice(_FILLER) for _ in range(n)]


def _make_pdf(rng: random.Random, i: int, pad: int) -> Tuple[bytes, str, Dict[str, str]]:
    body, golden = _claim_lines(rng, i)
    extra = _prose(rng, 4)
    pages = [body[:6], body[6:] + extra]
    if rng.random() < 0.3:
        pages.append(_prose(rng, 5))
    all_text = "".join(l for p in pages for l in p)
    latin1_ok = all(ord(c) < 256 for c in all_text)
    font_mode = "cid" if (i % 2 == 0 or not latin1_ok) else "simple"
    compress = (i % 4) != 3
    pdf = build_pdf(
        pages, font_mode=font_mode, compress=compress,
        pad_bytes=pad, pad_seed=i,
    )
    expected = "\n".join("\n".join(p) for p in pages)
    return pdf, expected, golden


def _make_html(rng: random.Random, i: int, pad: int) -> Tuple[bytes, str, Dict[str, str]]:
    body, golden = _claim_lines(rng, i)
    title = body[0]
    # parenthesis terminates the Customer Name capture class ([A-Za-zÀ-ž ,.'-]);
    # the other field patterns self-terminate (\w/digits), so plain prose is fine
    paras = [
        f"{line} ({' '.join(_prose(rng, 2))})"
        if line.startswith("Customer Name:")
        else " ".join([line] + _prose(rng, 2))
        for line in body[1:]
    ]
    nav = "".join(f'<li><a href="/{w.lower()}">{w}</a></li>' for w in _NAV_WORDS)
    side = "".join(f'<a href="/rel/{k}">Related article {k}</a> ' for k in range(6))
    pad_comment = ""
    if pad:
        pad_comment = "<!-- " + rng.getrandbits(8 * (pad // 2)).to_bytes(pad // 2, "big").hex() + " -->"
    html = (
        "<!DOCTYPE html><html><head><title>%s</title>"
        "<style>body{font:14px sans-serif}</style>"
        "<script>var t=%d;</script></head><body>"
        '<header><ul class="menu">%s</ul></header>'
        "<nav>%s</nav>"
        "<article><h1>%s</h1>%s</article>"
        '<aside class="sidebar">%s</aside>'
        "%s"
        '<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a> © Example Corp</footer>'
        "</body></html>"
    ) % (
        title, i, nav, nav, title,
        "".join(f"<p>{p}</p>" for p in paras),
        side, pad_comment,
    )
    expected = "\n".join([title] + paras)
    return html.encode("utf-8"), expected, golden


def corpus_size(sf: float) -> int:
    return _SF_ROWS.get(sf) or max(100, int(60000 * sf))


def generate_rows(
    sf: float, seed: int = SEED, lo: int = 0, hi: Optional[int] = None
) -> List[Dict[str, Any]]:
    """Rows [lo, hi) of the corpus. Each row is a pure function of (seed, i),
    so any index range can be generated independently (parallel shards)."""
    n = corpus_size(sf)
    hi = n if hi is None else min(hi, n)
    mega_every = _SF_MEGA.get(sf, 0)
    mega_bytes = _SF_MEGA_BYTES.get(sf, 0)
    base_pad = _SF_PAD.get(sf, 0)
    rows: List[Dict[str, Any]] = []
    for i in range(lo, hi):
        rng = random.Random((seed << 20) ^ i)
        kind = i % 20
        ts = _EPOCH + timedelta(seconds=i)
        pad = base_pad and rng.randrange(0, base_pad)
        # mega rows must land on kinds 0..15 (html/pdf) — kinds 16..19 ignore
        # pad (an offset of mega_every-1 used to hit kind 19 every time, so no
        # mega doc was ever actually emitted); offset mega_every//2 lands on
        # an html row for every configured mega_every
        if mega_every and i % mega_every == mega_every // 2:
            pad = mega_bytes
        url: str
        html: bytes
        text = ""
        golden_text: Optional[str] = None
        golden_fields: Optional[Dict[str, str]] = None
        if kind <= 11:
            html, golden_text, golden_fields = _make_html(rng, i, pad)
            url = f"https://fixtures.test/site{i % 7}/page{i:08d}.html"
        elif kind <= 15:
            html, golden_text, golden_fields = _make_pdf(rng, i, pad)
            url = f"https://fixtures.test/docs/doc{i:08d}.pdf"
        elif kind == 16:  # valid PDF bytes, wrong extension
            html, golden_text, golden_fields = _make_pdf(rng, i, 0)
            url = f"https://fixtures.test/docs/doc{i:08d}.txt"
            golden_text, golden_fields = None, None
        elif kind == 17:  # bad magic under a .pdf url
            html = b"This is not a PDF file" + b"x" * 100
            url = f"https://fixtures.test/docs/doc{i:08d}.pdf"
        elif kind == 18:  # too small
            html = b"x" * 42
            url = f"https://fixtures.test/docs/doc{i:08d}.pdf"
        else:  # pre-extracted text row
            html = b""
            url = f"https://fixtures.test/feed/item{i:08d}"
            if (i // 20) % 4 == 3:
                text = "   \n\t   "  # whitespace-only: empty-text guard
            else:
                body, golden_fields = _claim_lines(rng, i)
                text = "\n".join(body)
                golden_text = text
        lang = "pl" if i % 3 == 0 else ("en" if i % 3 == 1 else "es")
        rows.append({
            "url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang,
            "_golden_text": golden_text,
            "_golden_fields_json": canonical_json(golden_fields) if golden_fields else None,
        })
    return rows


_PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_GOLDEN_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("golden_text", pa.string()),
    ("golden_fields_json", pa.string()),
])


def _gen_shard(args: Tuple[float, int, int, int, int, str]) -> Tuple[List[str], List[Optional[str]], List[Optional[str]]]:
    """Worker: generate rows [lo,hi), write one pages shard, return goldens."""
    sf, seed, lo, hi, shard, pages_dir = args
    chunk = generate_rows(sf, seed, lo, hi)
    if chunk:
        tbl = pa.Table.from_pydict(
            {k: [r[k] for r in chunk] for k in ("url", "warc_ts", "html", "text", "lang")},
            schema=_PAGES_SCHEMA,
        )
        pq.write_table(tbl, os.path.join(pages_dir, f"part-{shard:04d}.parquet"),
                       row_group_size=64, compression="snappy")
    return (
        [r["url"] for r in chunk],
        [r["_golden_text"] for r in chunk],
        [r["_golden_fields_json"] for r in chunk],
    )


def generate_corpus(out_dir: str, sf: float, seed: int = SEED, shards: int = 8) -> str:
    """Write pages.parquet/ (sharded) + goldens.parquet under out_dir. Atomic.

    Shards are generated in parallel processes for large sf — sound because
    every row is a pure function of (seed, i)."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    n = corpus_size(sf)
    # sanity: goldens must agree with the field kernel on golden text
    for r in generate_rows(sf, seed, 0, 50):
        if r["_golden_fields_json"] and r["_golden_text"]:
            got = canonical_json(extract_fields(r["_golden_text"]))
            assert got == r["_golden_fields_json"], (r["url"], got, r["_golden_fields_json"])
    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".corpus-tmp-", dir=os.path.dirname(out_dir) or ".")
    pages_dir = os.path.join(tmp, "pages.parquet")
    os.makedirs(pages_dir, exist_ok=True)
    if n >= 20000:
        shards = max(shards, 32)
    per = (n + shards - 1) // shards
    tasks = [
        (sf, seed, s * per, min((s + 1) * per, n), s, pages_dir)
        for s in range(shards)
        if s * per < n
    ]
    if n >= 5000:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=min(len(tasks), os.cpu_count() or 8)) as ex:
            results = list(ex.map(_gen_shard, tasks))
    else:
        results = [_gen_shard(t) for t in tasks]
    gtbl = pa.Table.from_pydict(
        {
            "url": [u for r in results for u in r[0]],
            "golden_text": [t for r in results for t in r[1]],
            "golden_fields_json": [j for r in results for j in r[2]],
        },
        schema=_GOLDEN_SCHEMA,
    )
    pq.write_table(gtbl, os.path.join(tmp, "goldens.parquet"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(f"sf={sf} seed={seed} rows={n}\n")
    os.makedirs(os.path.dirname(out_dir), exist_ok=True)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        pass  # concurrent generator won; ours is equivalent (deterministic)
    return out_dir


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01


def corpus_dir_for(sf: float) -> str:
    return os.path.join(CORPUS_ROOT, f"sf{sf}")


def ensure_corpus(sf_dir_or_sf) -> str:
    """Map a testdata sf dir (or a float sf) to a generated corpus dir."""
    sf = sf_dir_or_sf if isinstance(sf_dir_or_sf, float) else _sf_from_dir(str(sf_dir_or_sf))
    out = corpus_dir_for(sf)
    return generate_corpus(out, sf)
