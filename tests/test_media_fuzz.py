"""Differential fuzz for the media header walkers: the REAL driver
pairings — queries()['media_image_dimensions'/'media_wav_metadata'] on
Spark vs their oracle_sql() on DuckDB — over RANDOM seeded payloads, not
the fixed fixtures. This is the gate class that catches shared-wrong-
convention bugs the fixtures can't (r2 lesson): a walker and its oracle
drifting together on offsets/guards only shows up on inputs neither was
tuned for.

Generators emit structurally WELL-FORMED containers (the documented
oracle contract: canonical 32-bit ISO-BMFF sizes, sorted TIFF tags, JPEG
streams without fill bytes or pre-SOS standalone markers, rounding never
at .5) with adversarial VALUES: dimensions across int32, 36-bit sample
totals, thumbnail-vs-primary ispe races, truncations at box/page edges,
unknown brands/codecs, granule -1 pages.
"""

from __future__ import annotations

import math
import os
import random
import struct

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

SEED = 20260818


# ---------------------------------------------------------------- images
def _box(t: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + t + body


def _rand_heif(rng: random.Random) -> bytes:
    brand = rng.choice([b"avif", b"heic", b"mif1", b"avis", b"isom", b"mp42"])
    ftyp = _box(b"ftyp", brand + struct.pack(">I", rng.randrange(2))
                + brand + b"mif1")
    ispes = b""
    for _ in range(rng.randrange(3)):
        w = rng.choice([0, 1, 7, 255, 65536, 2**31 - 1, 2**31, 2**32 - 1,
                        rng.randrange(1, 10000)])
        h = rng.choice([0, 1, 13, 4096, 2**31 - 1, rng.randrange(1, 10000)])
        ispes += _box(b"ispe", struct.pack(">III", 0, w, h))
    junk = _box(bytes(rng.choice(b"abcdefgh") for _ in range(4)),
                bytes(rng.randrange(256) for _ in range(rng.randrange(9))))
    ipco = _box(b"ipco", rng.choice([ispes + junk, junk + ispes, ispes]))
    iprp = _box(b"iprp", ipco + _box(b"ipma", b"\x00" * 8))
    pre = _box(b"free", b"\x00" * rng.randrange(8))
    meta_children = [_box(b"hdlr", b"\x00" * 21), _box(b"pitm", b"\x00" * 6)]
    if rng.random() < 0.85:
        meta_children.append(iprp)
    rng.shuffle(meta_children)
    meta = _box(b"meta", struct.pack(">I", 0) + b"".join(meta_children))
    out = ftyp + (pre if rng.random() < 0.4 else b"") + meta \
        + _box(b"mdat", bytes(rng.randrange(10)))
    if rng.random() < 0.25:  # truncate, possibly mid-box
        out = out[: rng.randrange(4, len(out))]
    return out


def _rand_jpeg(rng: random.Random) -> bytes:
    # marker stream per the oracle contract: no fill bytes, no standalone
    # markers before SOS, < 64 segments (the recursive-CTE iteration cap)
    out = b"\xff\xd8"
    for _ in range(rng.randrange(4)):
        seg = bytes(rng.randrange(256) for _ in range(rng.randrange(20)))
        out += bytes([0xFF, rng.choice([0xE0, 0xE1, 0xEC, 0xFE])])
        out += struct.pack(">H", 2 + len(seg)) + seg
    roll = rng.random()
    if roll < 0.6:
        sof = rng.choice([0xC0, 0xC2])
        w = rng.choice([1, 255, 256, 65535, rng.randrange(1, 65536)])
        h = rng.choice([1, 257, 65535, rng.randrange(1, 65536)])
        out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 8, 8, h, w, 1)
    elif roll < 0.8:
        out += b"\xff\xda\x00\x04\x01\x00"  # SOS before any SOF
    if rng.random() < 0.3:
        out = out[: rng.randrange(2, len(out) + 1)]
    return out


def _rand_tiff(rng: random.Random) -> bytes:
    le = rng.random() < 0.5
    e = "<" if le else ">"
    entries = []
    # sorted tags per TIFF 6.0 (the Python walker's early-break contract)
    if rng.random() < 0.9:
        if rng.random() < 0.5:
            entries.append(struct.pack(e + "HHIHH", 256, 3, 1,
                                       rng.randrange(0, 65536), 0))
        else:
            entries.append(struct.pack(
                e + "HHII", 256, 4, 1,
                rng.choice([0, 1, 2**31 - 1, 2**31, 2**32 - 1,
                            rng.randrange(1, 100000)])))
    if rng.random() < 0.9:
        entries.append(struct.pack(e + "HHII", 257, 4, 1,
                                   rng.choice([0, 5, 2**31,
                                               rng.randrange(1, 100000)])))
    entries.append(struct.pack(e + "HHII", 259, 3, 1, 1))
    hdr = (b"II*\x00" if le else b"MM\x00*") + struct.pack(e + "I", 8)
    out = (hdr + struct.pack(e + "H", len(entries)) + b"".join(entries)
           + struct.pack(e + "I", 0))
    if rng.random() < 0.2:
        out = out[: rng.randrange(4, len(out))]
    return out


def _rand_fixed_offset_image(rng: random.Random) -> bytes:
    kind = rng.randrange(6)
    if kind == 5:  # lossy VP8: scale bits set, keyframe bit, sync code
        w = rng.randrange(1, 16384)
        h = rng.randrange(1, 16384)
        frame = (bytes([rng.choice([0x50, 0x00, 0x51]), 4, 0])
                 + rng.choice([b"\x9d\x01\x2a", b"\x9c\x01\x2a"])
                 + struct.pack("<H", w | (rng.randrange(4) << 14))
                 + struct.pack("<H", h | (rng.randrange(4) << 14))
                 + bytes(6))
        body = b"WEBP" + b"VP8 " + struct.pack("<I", len(frame)) + frame
        return b"RIFF" + struct.pack("<I", len(body)) + body
    if kind == 0:  # PNG, dims across the int32 edge
        w = rng.choice([1, 70000, 2**31 - 1, 2**31, 2**32 - 1])
        h = rng.choice([1, 3, 2**31 - 1, 2**32 - 1])
        return (b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"
                + struct.pack(">II", w, h) + bytes(5) + bytes(8))
    if kind == 1:  # GIF
        return (rng.choice([b"GIF87a", b"GIF89a"])
                + struct.pack("<HH", rng.randrange(65536),
                              rng.randrange(65536)) + bytes(4))
    if kind == 2:  # BMP incl. top-down and >int32 widths
        w = rng.choice([1, 129, 2**31 - 1, 2**31 + 5])
        h = rng.choice([47, -33, -(2**31 - 1)])
        info = struct.pack("<IIiHHIIiiII" if w >= 2**31 else "<IiiHHIIiiII",
                           rng.choice([40, 108]), w, h, 1, 24, 0, 0,
                           2835, 2835, 0, 0)
        return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info + bytes(6)
    if kind == 3:  # ICO, 0-means-256
        e1 = struct.pack("<BBBBHHII", rng.choice([0, 16, 255]),
                         rng.choice([0, 19]), 0, 0, 1, 32, 16, 22)
        return struct.pack("<HHH", 0, 1, 1) + e1 + bytes(4)
    # VP8L packed 14-bit dims with random version bits in the top nibble
    w = rng.randrange(1, 16384 + 1)
    h = rng.randrange(1, 16384 + 1)
    b21 = (w - 1) & 0xFF
    b22 = ((w - 1) >> 8) | (((h - 1) & 3) << 6)
    b23 = ((h - 1) >> 2) & 0xFF
    b24 = ((h - 1) >> 10) | (rng.randrange(16) << 4)
    body = b"VP8L" + struct.pack("<I", 6) + bytes([0x2F, b21, b22, b23, b24, 0])
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def _image_rows(rng: random.Random, n: int) -> list:
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.3:
            payload = _rand_heif(rng)
        elif r < 0.5:
            payload = _rand_jpeg(rng)
        elif r < 0.65:
            payload = _rand_tiff(rng)
        elif r < 0.9:
            payload = _rand_fixed_offset_image(rng)
        else:
            payload = bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
        rows.append((f"https://fuzz.test/img/{i:04d}", payload))
    return rows


# ---------------------------------------------------------------- audio
def _untie(num: int, den: int) -> int:
    """Nudge num so num*1000/den never lands exactly on .5 (Python
    banker-rounds, DuckDB rounds half away — the documented fixture
    contract keeps ties out of the data)."""
    while den > 0 and (num * 2000) % (2 * den) == den:
        num += 1
    return num


def _rand_flac(rng: random.Random) -> bytes:
    rate = rng.choice([0, 8000, 44100, 48000, 96000, 2**20 - 1])
    ch = rng.randrange(1, 9)
    bits = rng.choice([4, 8, 16, 24, 32])
    total = rng.choice([0, 1, 44100, 2**32 + 5, 2**36 - 1,
                        rng.randrange(1, 2**36)])
    if rate:
        total = min(_untie(total, rate), 2**36 - 1)
    first_type = 0 if rng.random() < 0.9 else rng.randrange(1, 7)
    packed = ((rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total)
    body = (struct.pack(">HH", 16, 65535) + bytes(6)
            + packed.to_bytes(8, "big") + bytes(16))
    out = (b"fLaC" + bytes([first_type | (0x80 if rng.random() < 0.5 else 0)])
           + (34).to_bytes(3, "big") + body
           + bytes(rng.randrange(30)))
    if rng.random() < 0.2:
        out = out[: rng.randrange(4, len(out))]
    return out


def _ogg_page(rng, htype, granule, seq, pkt):
    segs, rem = [], len(pkt)
    while True:
        segs.append(min(rem, 255))
        rem -= segs[-1]
        if segs[-1] < 255:
            break
    return (b"OggS" + bytes([0 if rng.random() < 0.9 else 1, htype])
            + struct.pack("<QII", granule, rng.randrange(2**32), seq)
            + bytes(4) + bytes([len(segs)]) + bytes(segs) + pkt)


def _rand_ogg(rng: random.Random) -> bytes:
    roll = rng.random()
    if roll < 0.45:
        rate = rng.choice([8000, 12000, 24000, 48000, 2**32 - 1])
        preskip = rng.choice([0, 120, 312, 65535])
        idpkt = (b"OpusHead" + bytes([1, rng.randrange(1, 9)])
                 + struct.pack("<H", preskip) + struct.pack("<I", rate)
                 + bytes(3))
        tick = 48000
    elif roll < 0.8:
        rate = rng.choice([0, 8000, 11025, 44100])
        preskip = 0
        idpkt = (b"\x01vorbis" + struct.pack("<I", 0)
                 + bytes([rng.randrange(1, 9)]) + struct.pack("<I", rate)
                 + bytes(10))
        tick = rate
    else:
        idpkt = bytes(rng.randrange(256) for _ in range(rng.randrange(30)))
        tick = 0
    out = _ogg_page(rng, 2, 0, 0, idpkt)
    g = 0
    for seq in range(1, rng.randrange(2, 6)):
        if rng.random() < 0.15:
            g2 = 2**64 - 1  # -1: no packet ends on this page
        else:
            g = g + rng.randrange(1, 100000)
            if tick:
                g = min(_untie(g - preskip, tick) + preskip, 2**63 - 1)
            g2 = g
        out += _ogg_page(rng, 0, g2, seq,
                         bytes(rng.randrange(256)
                               for _ in range(rng.randrange(1, 400))))
    if rng.random() < 0.25:
        out = out[: rng.randrange(8, len(out))]
    return out


def _audio_rows(rng: random.Random, n: int) -> list:
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.4:
            payload = _rand_flac(rng)
        elif r < 0.8:
            payload = _rand_ogg(rng)
        else:
            payload = bytes(rng.randrange(256) for _ in range(rng.randrange(50)))
        rows.append((f"https://fuzz.test/av/{i:04d}", payload))
    return rows


# ------------------------------------------------------------------ exif
# Well-formed-per-contract EXIF: canonical APP1 positions (first segment,
# or after the fixed 18-byte JFIF APP0), unique sorted tags, printable
# ASCII with a single trailing NUL, every structure fully in bounds (the
# out-of-bounds paths are the kernel's typed failures, pinned in
# tests/test_exif.py). Adversarial VALUES: wrong-typed tags, unknown
# types, numeric arrays that spill out of line, dims across uint32,
# empty IFDs, sub-IFD placed BEFORE IFD0.
_EXIF_CHARS = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
               " 0123456789:._-")


def _exif_pack_ifd(e: str, base: int, specs: list) -> bytes:
    """specs = [(tag, typ, raw_value_bytes, count)]; base = IFD offset
    relative to the TIFF header. Spill lands right after the IFD."""
    n = len(specs)
    val_off = base + 2 + 12 * n + 4
    body, spill = b"", b""
    for tag, typ, raw, cnt in specs:
        if len(raw) <= 4:
            field = raw + b"\x00" * (4 - len(raw))
        else:
            field = struct.pack(e + "I", val_off + len(spill))
            spill += raw
        body += struct.pack(e + "HHI", tag, typ, cnt) + field
    return struct.pack(e + "H", n) + body + struct.pack(e + "I", 0) + spill


def _exif_specs(rng: random.Random, e: str, tags: list) -> list:
    specs = []
    for tag in tags:
        kind = rng.random()
        if kind < 0.12:  # unknown type: must be skipped by both sides
            specs.append((tag, rng.choice([0, 11, 13, 200]),
                          bytes(rng.randrange(256) for _ in range(4)), 1))
            continue
        str_tag = tag in (271, 272, 305, 306, 36867)
        if kind < 0.27:  # wrong-typed probe: value must land as NULL
            str_tag = not str_tag
        if str_tag:
            s = "".join(rng.choice(_EXIF_CHARS)
                        for _ in range(rng.randrange(0, 19)))
            raw = s.encode() + b"\x00"
            specs.append((tag, 2, raw, len(raw)))
        else:
            typ = rng.choice([3, 3, 4])
            cnt = rng.choice([1, 1, 1, 2, 3])
            hi = 65536 if typ == 3 else 2 ** 32
            vals = [rng.choice([0, 1, 6, 255, hi - 1,
                                rng.randrange(hi)])] \
                + [rng.randrange(hi) for _ in range(cnt - 1)]
            fmt = "H" if typ == 3 else "I"
            raw = b"".join(struct.pack(e + fmt, v) for v in vals)
            specs.append((tag, typ, raw, cnt))
    return specs


def _rand_exif_tiff(rng: random.Random) -> bytes:
    e = rng.choice(["<", ">"])
    order = b"II" if e == "<" else b"MM"
    ifd0_tags = sorted(rng.sample([271, 272, 274, 305, 306, 0x9999],
                                  rng.randrange(0, 6)))
    blob_parts = []
    sub_off = None
    if rng.random() < 0.7:
        sub_tags = sorted(rng.sample([36867, 40962, 40963],
                                     rng.randrange(0, 4)))
        sub_off = 8
        sub = _exif_pack_ifd(e, 8, _exif_specs(rng, e, sub_tags))
        blob_parts.append(sub)
        ifd0_off = 8 + len(sub)
    else:
        ifd0_off = 8 + rng.choice([0, 4])  # optional pad before IFD0
        blob_parts.append(b"\x00" * (ifd0_off - 8))
    specs = _exif_specs(rng, e, ifd0_tags)
    if sub_off is not None:
        specs.append((0x8769, 4, struct.pack(e + "I", sub_off), 1))
    blob_parts.append(_exif_pack_ifd(e, ifd0_off, specs))
    return (order + struct.pack(e + "H", 42)
            + struct.pack(e + "I", ifd0_off) + b"".join(blob_parts))


_FUZZ_JFIF_APP0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
                   + bytes((1, 2, 0)) + struct.pack(">HH", 72, 72)
                   + bytes((0, 0)))


def _rand_exif_payload(rng: random.Random) -> bytes:
    r = rng.random()
    if r < 0.1:
        return bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
    if r < 0.18:
        return b"\xff\xd8" + _FUZZ_JFIF_APP0 + b"\xff\xd9"  # no EXIF
    tiff = _rand_exif_tiff(rng)
    if r < 0.42:
        return tiff  # bare TIFF container
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    tail = b"\xff\xd9" if rng.random() < 0.7 else b""
    if r < 0.72:
        return b"\xff\xd8" + app1 + tail
    return b"\xff\xd8" + _FUZZ_JFIF_APP0 + app1 + tail


# ------------------------------------------------------------------- pdf
# Well-formed-per-contract PDFs (the pdfinfo oracle's canonical layout:
# Info=1/Catalog=2/Pages=3, one space after keys, flat trailer, ASCII
# strings escaping only parens) with adversarial VALUES: absent keys,
# empty Info, hex-vs-literal strings, escaped parens, zero/large counts,
# encrypt flags, headerless/trailerless rejects.
_PDF_WORDS = ["Report", "Q3", "draft", "final", "claims", "2024",
              "summary", "x-12", "a:b", "under_score", "dots..."]


def _pdf_string_value(rng: random.Random) -> str:
    parts = [rng.choice(_PDF_WORDS) for _ in range(rng.randrange(1, 4))]
    s = " ".join(parts)
    if rng.random() < 0.4:
        s += rng.choice([" (inner)", " (v2) (rc)"])
    return s


def _pdf_escape(s: str) -> bytes:
    return s.replace("(", "\\(").replace(")", "\\)").encode("ascii")


def _rand_pdf_payload(rng: random.Random) -> bytes:
    r = rng.random()
    if r < 0.08:
        return bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
    if r < 0.14:
        return b"%PDF-1.4\nheader but no trailer at all"
    version = rng.choice([b"1.0", b"1.4", b"1.7", b"2.0"])
    objs = []
    trailer_extra = b""
    has_info = rng.random() < 0.75
    if has_info:
        fields = b""
        for key in (b"Title", b"Author", b"Producer", b"CreationDate"):
            roll = rng.random()
            if roll < 0.35:
                continue  # absent key
            val = _pdf_string_value(rng)
            if roll < 0.55:  # hex string form
                fields += (b"/" + key + b" <"
                           + val.encode("ascii").hex().upper().encode()
                           + b"> ")
            else:
                fields += b"/" + key + b" (" + _pdf_escape(val) + b") "
        objs.append((1, b"<< " + fields + b">>"))
        trailer_extra += b" /Info 1 0 R"
    objs.append((2, b"<< /Type /Catalog /Pages 3 0 R >>"))
    count = rng.choice([0, 1, 7, 999, 10 ** 9])
    pages = b"<< /Type /Pages /Kids []"
    if rng.random() < 0.85:
        pages += b" /Count %d" % count
    objs.append((3, pages + b" >>"))
    if rng.random() < 0.25:
        objs.append((9, b"<< /Filter /Standard >>"))
        trailer_extra += b" /Encrypt 9 0 R"
    out = b"%PDF-" + version + b"\n"
    for num, body in objs:
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    out += (b"trailer\n<< /Size %d /Root 2 0 R" % (len(objs) + 1)
            + trailer_extra + b" >>\nstartxref\n%d\n%%%%EOF\n" % len(out))
    return out


# -------------------------------------------------------------- plumbing
def _write_media(tmpdir: str, sub: str, rows: list,
                 extra_goldens: tuple = ()) -> str:
    d = os.path.join(tmpdir, sub)
    os.makedirs(d, exist_ok=True)
    tbl = pa.Table.from_pydict(
        {"url": [r[0] for r in rows], "payload": [r[1] for r in rows]},
        schema=pa.schema([("url", pa.string()), ("payload", pa.binary())]),
    )
    pq.write_table(tbl, os.path.join(d, "media.parquet"))
    # satisfy ensure_img_fixture's exists-check so it never regenerates
    for name in extra_goldens:
        pq.write_table(pa.Table.from_pydict({"url": ["x"]}),
                       os.path.join(d, name))
    return os.path.join(d, "media.parquet")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _diff(sdf: pd.DataFrame, ddf: pd.DataFrame) -> list:
    bad = []
    if list(sdf.columns) != list(ddf.columns) or len(sdf) != len(ddf):
        return [("shape", list(sdf.columns), len(sdf),
                 list(ddf.columns), len(ddf))]
    for i in range(len(sdf)):
        for c in sdf.columns:
            x, y = sdf[c].iloc[i], ddf[c].iloc[i]
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NA
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NA
            if xn and yn:
                continue
            if xn != yn or str(x) != str(y):
                bad.append((sdf["url"].iloc[i], c, x, y))
    return bad


@pytest.mark.parametrize("seed", [SEED])
def test_image_dimensions_differential_fuzz(spark, tmp_path_factory, seed):
    rng = random.Random(seed)
    d = str(tmp_path_factory.mktemp("media_fuzz_img"))
    path = _write_media(
        d, "img", _image_rows(rng, 120),
        extra_goldens=("media_goldens.parquet", "frame_goldens.parquet",
                       "thumb_goldens.parquet"),
    )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    orig = entrymod.ensure_corpus
    entrymod.ensure_corpus = lambda _sf: d
    try:
        sdf = _canon(qs["media_image_dimensions"](spark, d).toPandas())
    finally:
        entrymod.ensure_corpus = orig
    sql = oracles["media_image_dimensions"].replace(entrymod.IMG_01, path)
    ddf = _canon(duckdb.connect().execute(sql).df())
    bad = _diff(sdf, ddf)
    assert bad == [], bad[:10]


@pytest.mark.parametrize("seed", [SEED])
def test_av_metadata_differential_fuzz(spark, tmp_path_factory, seed):
    rng = random.Random(seed + 1)
    d = str(tmp_path_factory.mktemp("media_fuzz_av"))
    path = _write_media(d, "av", _audio_rows(rng, 120))
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    orig = entrymod.ensure_corpus
    entrymod.ensure_corpus = lambda _sf: d
    try:
        sdf = _canon(qs["media_wav_metadata"](spark, d).toPandas())
    finally:
        entrymod.ensure_corpus = orig
    sql = oracles["media_wav_metadata"].replace(entrymod.AV_01, path)
    ddf = _canon(duckdb.connect().execute(sql).df())
    bad = _diff(sdf, ddf)
    assert bad == [], bad[:10]


@pytest.mark.parametrize("seed", [SEED])
def test_exif_metadata_differential_fuzz(spark, tmp_path_factory, seed):
    rng = random.Random(seed + 2)
    d = str(tmp_path_factory.mktemp("media_fuzz_exif"))
    rows = [(f"https://fuzz.test/exif/{i:04d}", _rand_exif_payload(rng))
            for i in range(120)]
    path = _write_media(d, "exif", rows)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    orig = entrymod.ensure_corpus
    entrymod.ensure_corpus = lambda _sf: d
    try:
        sdf = _canon(qs["media_exif_metadata"](spark, d).toPandas())
    finally:
        entrymod.ensure_corpus = orig
    sql = oracles["media_exif_metadata"].replace(entrymod.EXIF_01, path)
    ddf = _canon(duckdb.connect().execute(sql).df())
    bad = _diff(sdf, ddf)
    assert bad == [], bad[:10]


@pytest.mark.parametrize("seed", [SEED])
def test_pdf_info_differential_fuzz(spark, tmp_path_factory, seed):
    rng = random.Random(seed + 3)
    d = str(tmp_path_factory.mktemp("media_fuzz_pdf"))
    rows = [(f"https://fuzz.test/pdf/{i:04d}", _rand_pdf_payload(rng))
            for i in range(120)]
    path = _write_media(d, "pdfinfo", rows)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    orig = entrymod.ensure_corpus
    entrymod.ensure_corpus = lambda _sf: d
    try:
        sdf = _canon(qs["pdf_info_metadata"](spark, d).toPandas())
    finally:
        entrymod.ensure_corpus = orig
    sql = oracles["pdf_info_metadata"].replace(entrymod.PDFINFO_01, path)
    ddf = _canon(duckdb.connect().execute(sql).df())
    bad = _diff(sdf, ddf)
    assert bad == [], bad[:10]
