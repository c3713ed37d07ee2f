"""Deterministic image-payload fixture for the real-decode media path.

Writes two parquet files under <corpus_dir>/img/:

- media.parquet (url, payload): real PNGs in several shapes/color types
  (encoded by the from-scratch kernels/png.py encoder, itself round-trip
  tested against the decoder), a corrupt PNG (valid signature, truncated
  IDAT), a JPEG-magic payload, and junk bytes — the fallback rows.
- media_goldens.parquet (url, n_bytes, feature_dim, features_i): the
  expected media_features(real_decode=True) output, features projected to
  floor(f * 1e6) integers joined as CSV (floor is IEEE-exact in both
  engines, unlike rounding-at-ties).

Goldens are baked at fixture-generation time from the same deterministic
kernel path the Spark query runs (the goldens pattern the extraction
pipeline uses: kernels/png.py carries its own differential tests, and
pixel_features has hand-computed unit vectors). The DuckDB oracle is a
plain SELECT over media_goldens.parquet, so a driver row proves real
pixel features — not the digest placeholder — flow through the Spark plan
for PNG rows while non-PNG rows keep the documented fallback. Idempotent.
"""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["ensure_img_fixture", "IMG_FEATURE_DIM"]

IMG_FEATURE_DIM = 16


def _pngs() -> list:
    from ..kernels.png import encode_png

    out = []
    # gradient grayscale (uneven dims exercise array_split remainders)
    g = np.add.outer(np.arange(13) * 9, np.arange(29) * 5).astype(np.uint8)
    out.append(("a-gradient-gray", encode_png(g, filter_type=1)))
    # RGB checkerboard
    yy, xx = np.indices((16, 16))
    board = ((yy // 4 + xx // 4) % 2) * 255
    rgb = np.stack([board, 255 - board, np.full_like(board, 85)], axis=2)
    out.append(("b-checker-rgb", encode_png(rgb.astype(np.uint8), filter_type=2)))
    # seeded RGBA noise via an LCG (no RNG object: pure function of index)
    n = 11 * 7 * 4
    lcg = (np.arange(n, dtype=np.uint64) * 6364136223846793005 + 1442695040888963407)
    noise = ((lcg >> 33) & 0xFF).astype(np.uint8).reshape(11, 7, 4)
    out.append(("c-noise-rgba", encode_png(noise, filter_type=3)))
    # single row / single column edges
    out.append(("d-row", encode_png(np.arange(40, dtype=np.uint8)[None, :])))
    out.append(("e-col", encode_png(np.arange(23, dtype=np.uint8)[:, None],
                                    filter_type=4)))
    return out


def _jpegs() -> list:
    from ..kernels.jpeg import encode_jpeg, encode_jpeg_progressive

    yy, xx = np.indices((21, 34))
    rgb = np.stack(
        [(yy * 5 + 20) % 230, (xx * 3 + 60) % 230, ((yy + xx) * 4) % 230],
        axis=2,
    ).astype(np.uint8)
    gray = (np.add.outer(np.arange(15) * 13, np.arange(19) * 7) % 256).astype(np.uint8)
    return [
        ("i-photo444", encode_jpeg(rgb, quality=92)),
        ("j-photo420", encode_jpeg(rgb, quality=85, subsample=(2, 2),
                                   restart_interval=2)),
        ("k-gray", encode_jpeg(gray, quality=90)),
        ("o-progressive", encode_jpeg_progressive(rgb, quality=88)),
    ]


def _gifs() -> list:
    from ..kernels.gif import encode_gif

    # animated: moving block over a gradient background, 6 frames
    frames = []
    for k in range(6):
        a = np.zeros((18, 24, 3), np.uint8)
        a[:, :, 2] = (np.arange(24) * 10 % 250)[None, :]
        a[2 + k:7 + k, 3 * k:3 * k + 5] = [250, 40, 10]
        frames.append(a)
    yy, xx = np.indices((12, 16))
    static = np.stack(
        [((yy + xx) * 16 % 240), yy * 0 + 33, xx * 12 % 240], axis=2
    ).astype(np.uint8)
    return [
        ("l-anim", encode_gif(frames, delay_cs=5)),
        ("m-static", encode_gif(static)),
    ]


def _webps() -> list:
    from ..kernels.webp import encode_webp_vp8l

    out = []
    # small-palette icon (color-indexing transform + sub-byte bundling)
    yy, xx = np.indices((14, 22))
    icon_idx = ((yy // 3 + xx // 5) % 3).astype(np.uint8)
    pal = np.array([[250, 40, 10, 255], [20, 200, 90, 255], [8, 8, 8, 128]],
                   dtype=np.uint8)
    out.append(("p-palette", encode_webp_vp8l(pal[icon_idx], palette=True)))
    # photo-ish gradient: subtract-green + predictor + color cache + LZ77
    g = np.stack([
        (yy * 11 + 13) % 251, (xx * 7 + 40) % 251, ((yy + xx) * 5) % 251,
        np.full_like(yy, 255),
    ], axis=2).astype(np.uint8)
    out.append(("q-gradient", encode_webp_vp8l(
        g, subtract_green=True, predictor=7, cache_bits=5, use_lz77=True)))
    # RGBA with real transparency, literal-coded
    a = np.zeros((9, 17, 4), np.uint8)
    a[..., 0] = (xx[:9, :17] * 15) % 256
    a[..., 1] = 77
    a[..., 2] = (yy[:9, :17] * 29) % 256
    a[..., 3] = np.where((xx[:9, :17] + yy[:9, :17]) % 4 == 0, 60, 255)
    out.append(("r-alpha", encode_webp_vp8l(a)))
    return out


def _webp_anim() -> bytes:
    """A real animated WebP (VP8X + ANIM + ANMF×3) assembled chunk-by-
    chunk HERE (independent of the kernel's container parser — the
    differential-anchor rule); only the per-frame VP8L pixel streams come
    from the kernel encoder, whose conventions the spec anchors in
    tests/test_webp.py pin. Frame 2 is a 2-pixel-aligned offset patch,
    frame 3 disposes to the ANIM background first."""
    import struct

    from ..kernels.webp import encode_vp8l

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def anmf(x, y, img, dur, no_blend=True, dispose_bg=False):
        h, w = img.shape[:2]
        hdr = ((x // 2).to_bytes(3, "little")
               + (y // 2).to_bytes(3, "little")
               + (w - 1).to_bytes(3, "little")
               + (h - 1).to_bytes(3, "little") + dur.to_bytes(3, "little")
               + bytes(((2 if no_blend else 0) | (1 if dispose_bg else 0),)))
        return chunk(b"ANMF", hdr + chunk(b"VP8L", encode_vp8l(img)))

    yy, xx = np.indices((10, 14))
    base = np.stack([(yy * 9 + 30) % 251, (xx * 13 + 5) % 251,
                     ((yy + xx) * 7) % 251, np.full_like(yy, 255)],
                    axis=2).astype(np.uint8)
    patch = np.stack([np.full((4, 6), 200), np.full((4, 6), 40),
                      np.full((4, 6), 90), np.full((4, 6), 255)],
                     axis=2).astype(np.uint8)
    last = ((base.astype(np.int32) + 101) % 251).astype(np.uint8)
    last[..., 3] = 255
    vp8x = chunk(b"VP8X", bytes((0x02, 0, 0, 0))
                 + (14 - 1).to_bytes(3, "little")
                 + (10 - 1).to_bytes(3, "little"))
    anim = chunk(b"ANIM", struct.pack("<IH", 0xFF204060, 0))
    body = (b"WEBP" + vp8x + anim
            + anmf(0, 0, base, 100, dispose_bg=True)
            + anmf(4, 2, patch, 60)
            + anmf(0, 0, last, 80))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _headers_only() -> list:
    """Formats covered by the no-decode dimension gate but not by a codec:
    hand-built headers with known dimensions (BMP both row orders, ICO
    directory incl. the 0-means-256 rule, TIFF both byte orders and both
    SHORT/LONG value types, extended VP8X WebP canvas). Payload bodies are
    minimal/truncated on purpose — the gate must not need them, and the
    feature path must take the digest fallback without a task failure."""
    import struct

    out = []

    def bmp(w: int, h: int) -> bytes:
        # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40); h < 0 = top-down
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835,
                           2835, 0, 0)
        body = b"\x00" * 12  # deliberately fewer than the pixel rows
        return (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                + info + body)

    out.append(("t-bmp", bmp(129, 47)))
    out.append(("u-bmp-topdown", bmp(64, -33)))
    # ICO: reserved=0, type=1, count=2; first dir entry wins the gate.
    # width byte 0 means 256 (the classic ICO rule); entries point at a
    # truncated payload
    entry1 = struct.pack("<BBBBHHII", 0, 19, 0, 0, 1, 32, 16, 38)
    entry2 = struct.pack("<BBBBHHII", 16, 16, 0, 0, 1, 32, 16, 54)
    out.append(("v-ico", struct.pack("<HHH", 0, 1, 2) + entry1 + entry2
                + b"\x00" * 16))

    def tiff(le: bool, w, h) -> bytes:
        # header + one IFD; w is SHORT-typed, h is LONG-typed (both
        # inline). Entries sorted by tag per TIFF 6.0.
        e = "<" if le else ">"
        hdr = (b"II*\x00" if le else b"MM\x00*") + struct.pack(e + "I", 8)
        entries = [
            struct.pack(e + "HHIHH", 256, 3, 1, w, 0),
            struct.pack(e + "HHII", 257, 4, 1, h),
            struct.pack(e + "HHII", 259, 3, 1, 1),  # compression=none
        ]
        return (hdr + struct.pack(e + "H", len(entries))
                + b"".join(entries) + struct.pack(e + "I", 0))

    out.append(("w-tiff-le", tiff(True, 77, 3000)))
    out.append(("x-tiff-be", tiff(False, 513, 21)))
    # extended WebP: VP8X chunk with canvas width-1/height-1 as LE 24-bit
    # (animation flag set; no frame chunks needed for the gate)
    vp8x = struct.pack("<B3s", 0x02, b"\x00" * 3) + \
        struct.pack("<I", 399)[:3] + struct.pack("<I", 259)[:3]
    riff_body = b"WEBP" + b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    out.append(("y-vp8x-anim",
                b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body))

    # simple LOSSY WebP ('VP8 ' keyframe): 3-byte frame tag (bit 0 = 0
    # keyframe), 0x9D012A sync, then 14-bit LE width/height whose upper
    # 2 bits are the scale field — set to nonzero on purpose so the gate
    # must mask them off; body truncated (lossy decode is the documented
    # digest fallback)
    def vp8_lossy(w: int, h: int, xscale: int = 1, yscale: int = 2) -> bytes:
        frame = (b"\x50\x04\x00" + b"\x9d\x01\x2a"
                 + struct.pack("<H", w | (xscale << 14))
                 + struct.pack("<H", h | (yscale << 14)) + b"\x00" * 8)
        body = b"WEBP" + b"VP8 " + struct.pack("<I", len(frame)) + frame
        return b"RIFF" + struct.pack("<I", len(body)) + body

    out.append(("ye-vp8-lossy", vp8_lossy(481, 359)))
    # bad sync code: must NOT be classified webp-vp8 (kind 'other')
    bad = bytearray(vp8_lossy(100, 100))
    bad[24] = 0x9C
    out.append(("yf-vp8-badsync", bytes(bad)))
    return out


def _heifs() -> list:
    """Minimal-but-structurally-real HEIF/AVIF headers for the no-decode
    dimension gate (built HERE, independently of the multimodal box-walk
    sniffer — the differential-anchor rule). Each file is ftyp + meta
    (FullBox: hdlr/pitm come before iprp so the walk must skip siblings;
    ipco carries a codec-config stub alongside ispe) + an mdat stub; no
    pixel payload is claimed, so the feature path takes the digest
    fallback like the other header-only rows."""
    import struct

    def box(t: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + t + body

    def ispe(w: int, h: int) -> bytes:
        return box(b"ispe", struct.pack(">III", 0, w, h))

    def heif(brand: bytes, ispes, codec: bytes, with_iprp: bool = True) -> bytes:
        ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
        hdlr = box(b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"pict"
                   + b"\x00" * 12 + b"\x00")
        pitm = box(b"pitm", struct.pack(">IH", 0, 1))
        meta_body = struct.pack(">I", 0) + hdlr + pitm
        if with_iprp:
            ipco = box(b"ipco", b"".join(ispe(w, h) for w, h in ispes)
                       + box(codec, b"\x81\x04\x0c\x00"))
            ipma = box(b"ipma", struct.pack(">II", 0, 1)
                       + struct.pack(">HBB", 1, 2, 0x01) + b"\x02")
            meta_body += box(b"iprp", ipco + ipma)
        return ftyp + box(b"meta", meta_body) + box(b"mdat", b"\x00" * 24)

    return [
        # primary image + a smaller thumbnail ispe: the largest-area rule
        # must pick the primary, not the first-encountered thumbnail
        ("za-avif", heif(b"avif", [(320, 240), (4032, 3024)], b"av1C")),
        ("zb-heic", heif(b"heic", [(1440, 960)], b"hvcC")),
        # meta without an iprp: a valid HEIF brand whose dims are unknown
        ("zc-mif1-noprops", heif(b"mif1", [], b"av1C", with_iprp=False)),
        # plain MP4 video brand: ftyp is NOT enough — the gate must leave
        # playable video as 'other' rather than mislabel it a still image
        ("zd-isom", heif(b"isom", [(640, 480)], b"avcC")),
    ]


def _feature_ints(payload: bytes, dim: int) -> str:
    from ..operators.multimodal import _fake_features, decode_image, pixel_features

    try:
        feats = pixel_features(decode_image(payload), dim)
    except Exception:
        feats = _fake_features(payload, dim)
    return ",".join(str(math.floor(float(f) * 1_000_000)) for f in feats)


FRAME_N, FRAME_DIM = 4, 8
THUMB_W, THUMB_H = 16, 12


def _frame_golden_rows(url: str, payload: bytes) -> list:
    from ..operators.multimodal import frame_feature_rows

    rows = frame_feature_rows(payload, FRAME_N, FRAME_DIM, real_decode=True)
    return [
        (url, i, ",".join(str(math.floor(float(f) * 1_000_000)) for f in feats))
        for i, feats in enumerate(rows)
    ]


def ensure_img_fixture(corpus_dir: str) -> str:
    out_dir = os.path.join(corpus_dir, "img")
    path = os.path.join(out_dir, "media.parquet")
    gpath = os.path.join(out_dir, "media_goldens.parquet")
    fpath = os.path.join(out_dir, "frame_goldens.parquet")
    tpath = os.path.join(out_dir, "thumb_goldens.parquet")
    if all(os.path.exists(p) for p in (path, gpath, fpath, tpath)):
        return path
    rows = [(f"https://fixtures.test/img/{name}.png", data)
            for name, data in _pngs()]
    # fallback rows: corrupt PNG (signature, truncated IDAT), corrupt JPEG
    # (SOI magic, junk segments), junk — all must yield digest features,
    # never kill the task
    good = rows[0][1]
    rows.append(("https://fixtures.test/img/f-truncated.png", good[: len(good) // 2]))
    rows.append(("https://fixtures.test/img/g-corrupt.jpg",
                 b"\xff\xd8\xff\xe0" + b"not really a jpeg" * 3))
    rows.append(("https://fixtures.test/img/h-junk.bin", b"\x00\x01binary junk"))
    # real baseline JPEGs (kernels/jpeg.py encoder): 4:4:4, 4:2:0 with
    # restart markers, grayscale — decode for real into pixel features
    rows += [(f"https://fixtures.test/img/{name}.jpg", data)
             for name, data in _jpegs()]
    # real GIFs (kernels/gif.py): an animated 6-frame and a static image —
    # the first frame feeds media_features, all frames feed frame_sample —
    # plus a corrupt GIF fallback row
    gifs = _gifs()
    rows += [(f"https://fixtures.test/img/{name}.gif", data)
             for name, data in gifs]
    rows.append(("https://fixtures.test/img/n-corrupt.gif",
                 gifs[0][1][: len(gifs[0][1]) // 3]))
    # real lossless WebPs (kernels/webp.py VP8L): palette/bundling,
    # transform-stacked gradient, RGBA alpha — plus a corrupt-VP8L fallback
    # row (valid RIFF/WEBP container, truncated stream)
    webps = _webps()
    rows += [(f"https://fixtures.test/img/{name}.webp", data)
             for name, data in webps]
    rows.append(("https://fixtures.test/img/s-corrupt.webp",
                 webps[1][1][: len(webps[1][1]) // 2]))
    # header-only formats for the no-decode dimension gate (BMP/ICO/TIFF/
    # VP8X): dims come from fixed offsets or bounded header walks; the
    # feature path takes the digest fallback for all of them
    ext = {"t-bmp": "bmp", "u-bmp-topdown": "bmp", "v-ico": "ico",
           "w-tiff-le": "tif", "x-tiff-be": "tif", "y-vp8x-anim": "webp",
           "ye-vp8-lossy": "webp", "yf-vp8-badsync": "webp"}
    rows += [(f"https://fixtures.test/img/{name}.{ext[name]}", data)
             for name, data in _headers_only()]
    # HEIF/AVIF headers for the dimension gate: ispe box walk, thumbnail
    # vs primary disambiguation, brand gating (isom video stays 'other')
    hext = {"za-avif": "avif", "zb-heic": "heic",
            "zc-mif1-noprops": "heif", "zd-isom": "mp4"}
    rows += [(f"https://fixtures.test/img/{name}.{hext[name]}", data)
             for name, data in _heifs()]
    # a REAL animated WebP: VP8X canvas + 3 composited ANMF frames
    # (offset patch, dispose-to-background) — decodes for real through
    # decode_webp_frames; frame goldens sample its composited frames
    rows.append(("https://fixtures.test/img/z-anim.webp", _webp_anim()))
    os.makedirs(out_dir, exist_ok=True)

    def _write(p: str, tbl: pa.Table) -> None:
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        os.close(fd)
        pq.write_table(tbl, tmp)
        os.replace(tmp, p)  # atomic: concurrent ensure calls stay idempotent

    _write(path, pa.Table.from_pydict(
        {"url": [r[0] for r in rows], "payload": [r[1] for r in rows]},
        schema=pa.schema([("url", pa.string()), ("payload", pa.binary())]),
    ))
    _write(gpath, pa.Table.from_pydict(
        {
            "url": [r[0] for r in rows],
            "n_bytes": [len(r[1]) for r in rows],
            "feature_dim": [IMG_FEATURE_DIM] * len(rows),
            "features_i": [_feature_ints(r[1], IMG_FEATURE_DIM) for r in rows],
        },
        schema=pa.schema([
            ("url", pa.string()), ("n_bytes", pa.int64()),
            ("feature_dim", pa.int32()), ("features_i", pa.string()),
        ]),
    ))
    from ..operators.multimodal import thumbnail_bytes

    _write(tpath, pa.Table.from_pydict(
        {
            "url": [r[0] for r in rows],
            "out_w": [THUMB_W] * len(rows),
            "out_h": [THUMB_H] * len(rows),
            "thumb": [thumbnail_bytes(r[1], THUMB_W, THUMB_H, real_decode=True)
                      for r in rows],
        },
        schema=pa.schema([
            ("url", pa.string()), ("out_w", pa.int32()),
            ("out_h", pa.int32()), ("thumb", pa.binary()),
        ]),
    ))
    frows = [fr for url, payload in rows for fr in _frame_golden_rows(url, payload)]
    _write(fpath, pa.Table.from_pydict(
        {
            "url": [r[0] for r in frows],
            "frame_idx": [r[1] for r in frows],
            "features_i": [r[2] for r in frows],
        },
        schema=pa.schema([
            ("url", pa.string()), ("frame_idx", pa.int32()),
            ("features_i", pa.string()),
        ]),
    ))
    return path
