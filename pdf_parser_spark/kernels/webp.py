"""From-scratch WebP lossless (VP8L) codec — pure Python + numpy.

Implements the public "WebP Lossless Bitstream Specification" (RFC 9649
container + the VP8L stream): LSB-first bit stream, canonical prefix codes
(simple 1/2-symbol and full code-length-code forms), color cache, LZ77
backward references with the two-dimensional close-neighborhood distance
mapping, optional meta-prefix (entropy) image, and all four transforms —
predictor (14 modes), cross-color, subtract-green, and color indexing with
sub-byte pixel bundling.

The encoder exists to make the decoder testable without external
libraries: it can emit plain literals, color-cache hits, real LZ77 copies
(both >120 distance codes and close-neighborhood plane codes), and each
transform, so round-trip property tests cover every decoder path. It is a
valid-subset encoder, not an optimizing one.

Reference parity note: the reference engine (iWhyDuck/pdf-parser) has no
media path at all; this extends the multimodal operator surface
(operators/multimodal.py) the same way kernels/{png,jpeg,gif,mp4}.py do.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "WebPError",
    "decode_webp",
    "decode_webp_frames",
    "parse_webp_container",
    "decode_vp8l",
    "encode_webp_vp8l",
    "encode_vp8l",
    "webp_dimensions",
]

RIFF_MAGIC = b"RIFF"
WEBP_FOURCC = b"WEBP"
VP8L_SIGNATURE = 0x2F

# green alphabet: 256 literals + 24 length prefix codes (+ cache)
NUM_LITERALS = 256
NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40
MAX_CODE_LENGTH = 15

# code-length-code symbol order (spec §"Decoding the code lengths")
CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                     13, 14, 15)
# repeat symbols: 16 = repeat previous 3-6 (2 extra bits),
# 17 = repeat zero 3-10 (3 bits), 18 = repeat zero 11-138 (7 bits)
REPEAT_EXTRA = {16: 2, 17: 3, 18: 7}
REPEAT_OFFSET = {16: 3, 17: 3, 18: 11}

PRED_BLACK = 0xFF000000


class WebPError(ValueError):
    pass


# ---------------------------------------------------------------------------
# close-neighborhood distance map
# ---------------------------------------------------------------------------

def _build_distance_map() -> List[Tuple[int, int]]:
    """The 120 (dx, dy) offsets behind distance codes 1..120.

    The spec's table enumerates the closest prior pixels ordered by
    Euclidean distance, nearer rows first within a tie, smaller |dx| next,
    positive dx before negative. Generating it from that rule (verified
    against the spec table's published prefix) avoids transcription errors
    in a 120-entry constant.
    """
    cand = []
    for dy in range(0, 9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx, dy))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], abs(p[0]),
                             0 if p[0] > 0 else 1))
    return cand[:120]


DISTANCE_MAP = _build_distance_map()
_DISTANCE_CODE = {off: i + 1 for i, off in enumerate(DISTANCE_MAP)}


def _plane_code_to_distance(xsize: int, plane_code: int) -> int:
    # Spec: dist = xoffset + yoffset * xsize, where positive xoffset means
    # columns to the LEFT of the current pixel (kCodeToPlane xoffset =
    # 8 - (code & 0xF)); the pair order in DISTANCE_MAP matches the spec
    # table, so dx here IS that xoffset. Clamp to >= 1 per the spec.
    if plane_code > 120:
        return plane_code - 120
    dx, dy = DISTANCE_MAP[plane_code - 1]
    return max(1, dy * xsize + dx)


# ---------------------------------------------------------------------------
# bit IO (LSB-first within bytes; prefix codes are emitted/read MSB-first)
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i = self.pos >> 3
            if byte_i >= len(self.data):
                raise WebPError("VP8L stream truncated")
            v |= ((self.data[byte_i] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def bit(self) -> int:
        byte_i = self.pos >> 3
        if byte_i >= len(self.data):
            raise WebPError("VP8L stream truncated")
        b = (self.data[byte_i] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.bitpos = 0

    def write_bits(self, value: int, n: int) -> None:
        """LSB-first field write (headers, extra bits)."""
        for i in range(n):
            if self.bitpos == 0:
                self.buf.append(0)
            if (value >> i) & 1:
                self.buf[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code write: the code's MSB goes into the stream first."""
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

def _canonical_from_lengths(lengths: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length); canonical assignment by (length, symbol)."""
    pairs = [(l, s) for s, l in enumerate(lengths) if l > 0]
    pairs.sort()
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _PrefixDecoder:
    """Bit-at-a-time canonical decoder (tree as a dict on (len, code))."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: List[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise WebPError("prefix code with no symbols")
        if len(nz) == 1:
            # degenerate code: zero bits per symbol
            self.single: Optional[int] = nz[0][0]
            self.table: Dict[Tuple[int, int], int] = {}
            return
        self.single = None
        # kraft check: over-subscribed or incomplete codes are corrupt
        kraft = sum(1 / (1 << l) for _, l in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise WebPError("invalid prefix code (kraft sum != 1)")
        self.table = {
            (l, c): s for s, (c, l) in _canonical_from_lengths(
                [l for l in lengths]).items()
        }

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, MAX_CODE_LENGTH + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise WebPError("prefix code read overflow")


class _SimpleDecoder:
    __slots__ = ("symbols",)

    def __init__(self, symbols: List[int]):
        self.symbols = symbols

    def read(self, br: _BitReader) -> int:
        if len(self.symbols) == 1:
            return self.symbols[0]
        return self.symbols[br.bit()]


def _read_prefix_code(br: _BitReader, alphabet_size: int):
    if br.bit():  # simple code
        num_symbols = br.bits(1) + 1
        first_len = 8 if br.bit() else 1
        symbols = [br.bits(first_len)]
        if num_symbols == 2:
            symbols.append(br.bits(8))
        for s in symbols:
            if s >= alphabet_size:
                raise WebPError("simple-code symbol out of range")
        return _SimpleDecoder(symbols)
    # normal code: code-length code first
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl_dec = _PrefixDecoder(cl_lengths)
    # optional cap on the number of coded lengths
    if br.bit():
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_dec.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        else:
            repeat = br.bits(REPEAT_EXTRA[cl]) + REPEAT_OFFSET[cl]
            fill = prev_len if cl == 16 else 0
            if symbol + repeat > alphabet_size:
                raise WebPError("code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixDecoder(lengths)


# ---------------------------------------------------------------------------
# entropy-coded image (the recursive core: main image, tile images, palette)
# ---------------------------------------------------------------------------

def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits

def _cache_hash(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _length_prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


class _HuffmanGroup:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br: _BitReader, cache_bits: int):
        green_size = NUM_LITERALS + NUM_LENGTH_CODES + (
            (1 << cache_bits) if cache_bits else 0)
        self.green = _read_prefix_code(br, green_size)
        self.red = _read_prefix_code(br, NUM_LITERALS)
        self.blue = _read_prefix_code(br, NUM_LITERALS)
        self.alpha = _read_prefix_code(br, NUM_LITERALS)
        self.dist = _read_prefix_code(br, NUM_DISTANCE_CODES)


def _decode_image_stream(br: _BitReader, w: int, h: int,
                         top_level: bool = False) -> np.ndarray:
    """Decode one entropy-coded ARGB image (no transforms) -> uint32[h*w].

    Spec grammar: `spatially-coded-image = color-cache-info meta-prefix
    data` — the color cache comes FIRST, and only the top-level image has
    a meta-prefix bit (sub-images — entropy image, transform tiles,
    palette — are `entropy-coded-image = color-cache-info prefix-codes
    lz77-coded-image`)."""
    # color cache
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise WebPError("color cache bits out of range")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta prefix image (top level only)
    meta_bits = 0
    meta_img: Optional[np.ndarray] = None
    if top_level and br.bit():
        meta_bits = br.bits(3) + 2
        mw, mh = _subsample_size(w, meta_bits), _subsample_size(h, meta_bits)
        meta_img = _decode_image_stream(br, mw, mh)

    if meta_img is None:
        groups = [_HuffmanGroup(br, cache_bits)]
        meta_idx = None
    else:
        ids = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(ids.max()) + 1
        groups = [_HuffmanGroup(br, cache_bits) for _ in range(n_groups)]
        mw = _subsample_size(w, meta_bits)
        meta_idx = ids

    total = w * h
    out = np.zeros(total, dtype=np.uint32)
    pos = 0
    grp = groups[0]
    while pos < total:
        if meta_idx is not None:
            x, y = pos % w, pos // w
            grp = groups[int(
                meta_idx[(y >> meta_bits) * mw + (x >> meta_bits)])]
        s = grp.green.read(br)
        if s < NUM_LITERALS:
            g = s
            r = grp.red.read(br)
            b = grp.blue.read(br)
            a = grp.alpha.read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_hash(px, cache_bits)] = px
        elif s < NUM_LITERALS + NUM_LENGTH_CODES:
            length = _length_prefix_value(s - NUM_LITERALS, br)
            dist_code = _length_prefix_value(grp.dist.read(br), br)
            dist = _plane_code_to_distance(w, dist_code)
            if dist > pos:
                raise WebPError("LZ77 distance before start of image")
            if pos + length > total:
                raise WebPError("LZ77 copy past end of image")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_hash(px, cache_bits)] = px
        else:
            if cache is None:
                raise WebPError("cache symbol without color cache")
            idx = s - NUM_LITERALS - NUM_LENGTH_CODES
            out[pos] = cache[idx]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# transforms (inverse on decode)
# ---------------------------------------------------------------------------

TRANSFORM_PREDICTOR = 0
TRANSFORM_COLOR = 1
TRANSFORM_SUBTRACT_GREEN = 2
TRANSFORM_COLOR_INDEXING = 3


def _avg2(a: int, b: int) -> int:
    # per-channel average on packed ARGB
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        out |= max(0, min(255, v)) << shift
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        # C-style truncation toward zero for the signed half-delta
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= max(0, min(255, a + half)) << shift
    return out


def _select(l: int, t: int, tl: int) -> int:
    p_l = p_t = 0
    for shift in (24, 16, 8, 0):
        lc = (l >> shift) & 0xFF
        tc = (t >> shift) & 0xFF
        tlc = (tl >> shift) & 0xFF
        p = lc + tc - tlc
        p_l += abs(p - lc)
        p_t += abs(p - tc)
    return l if p_l < p_t else t


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return PRED_BLACK
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise WebPError(f"predictor mode {mode} out of range")


def _add_pixels(a: int, b: int) -> int:
    # per-channel modular add of packed ARGB
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) & 0xFF) << shift
    return out


def _inverse_predictor(pix: np.ndarray, w: int, h: int, bits: int,
                       tiles: np.ndarray) -> np.ndarray:
    tw = _subsample_size(w, bits)
    out = pix.copy()
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = PRED_BLACK
            elif y == 0:
                pred = int(out[i - 1])          # left
            elif x == 0:
                pred = int(out[i - w])          # top
            else:
                mode = (int(tiles[(y >> bits) * tw + (x >> bits)]) >> 8) & 0xFF
                l = int(out[i - 1])
                t = int(out[i - w])
                tl = int(out[i - w - 1])
                # rightmost column: top-right wraps to the CURRENT row's
                # first pixel (i - w + 1 == y * w, already decoded) — the
                # spec/libwebp read top_row[x + 1], which in the contiguous
                # framebuffer is data[y * xsize], not the top pixel
                tr = int(out[i - w + 1])
                pred = _predict(mode, l, t, tl, tr)
            out[i] = _add_pixels(int(pix[i]), pred)
    return out


def _ct_delta(t: int, c: int) -> int:
    # (int8)t * (int8)c >> 5 with arithmetic shift
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(pix: np.ndarray, w: int, h: int, bits: int,
                             tiles: np.ndarray) -> np.ndarray:
    tw = _subsample_size(w, bits)
    out = pix.copy()
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = int(tiles[(y >> bits) * tw + (x >> bits)])
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            px = int(out[i])
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[i] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _inverse_subtract_green(pix: np.ndarray) -> np.ndarray:
    g = (pix >> np.uint32(8)) & np.uint32(0xFF)
    r = (((pix >> np.uint32(16)) & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    b = ((pix & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    return (pix & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _palette_xbits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inverse_color_indexing(pix: np.ndarray, w: int, h: int,
                            palette: np.ndarray, xbits: int) -> np.ndarray:
    n = len(palette)
    if xbits == 0:
        idx = ((pix >> np.uint32(8)) & np.uint32(0xFF)).astype(np.int64)
    else:
        packed_w = _subsample_size(w, xbits)
        per = 1 << xbits
        ibits = 8 >> xbits
        mask = (1 << ibits) - 1
        greens = ((pix >> np.uint32(8)) & np.uint32(0xFF)).astype(np.int64)
        greens = greens.reshape(h, packed_w)
        cols = np.arange(w)
        sub = (cols & (per - 1)) * ibits
        idx = (greens[:, cols >> xbits] >> sub[None, :]) & mask
        idx = idx.reshape(-1)
    # out-of-range indices decode as transparent black (libwebp behavior)
    valid = idx < n
    safe = np.where(valid, idx, 0)
    out = palette[safe]
    out[~valid] = 0
    return out.astype(np.uint32)


# ---------------------------------------------------------------------------
# decoder entry points
# ---------------------------------------------------------------------------

def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a raw VP8L stream to an (h, w, 4) uint8 RGBA array."""
    if not data or data[0] != VP8L_SIGNATURE:
        raise WebPError("not a VP8L stream (bad signature byte)")
    br = _BitReader(data)
    br.bits(8)  # signature
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()            # alpha-is-used hint
    version = br.bits(3)
    if version != 0:
        raise WebPError(f"VP8L version {version} unsupported")

    # transforms (each type at most once; applied inverse in LIFO order)
    transforms: List[tuple] = []
    seen = set()
    cur_w = w
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise WebPError("duplicate transform")
        seen.add(ttype)
        if ttype == TRANSFORM_PREDICTOR or ttype == TRANSFORM_COLOR:
            bits = br.bits(3) + 2
            tw, th = _subsample_size(cur_w, bits), _subsample_size(h, bits)
            tiles = _decode_image_stream(br, tw, th)
            transforms.append((ttype, bits, tiles))
        elif ttype == TRANSFORM_SUBTRACT_GREEN:
            transforms.append((ttype,))
        elif ttype == TRANSFORM_COLOR_INDEXING:
            n_colors = br.bits(8) + 1
            deltas = _decode_image_stream(br, n_colors, 1)
            # per-channel modular prefix sum of delta-coded entries
            pal = np.zeros(n_colors, dtype=np.uint32)
            acc = 0
            for i in range(n_colors):
                acc = _add_pixels(acc, int(deltas[i]))
                pal[i] = acc
            xbits = _palette_xbits(n_colors)
            transforms.append((ttype, pal, xbits))
            cur_w = _subsample_size(cur_w, xbits)
        else:  # pragma: no cover - 2-bit field is exhaustive
            raise WebPError("unknown transform")

    pix = _decode_image_stream(br, cur_w, h, top_level=True)

    for t in reversed(transforms):
        if t[0] == TRANSFORM_COLOR_INDEXING:
            pix = _inverse_color_indexing(pix, w, h, t[1], t[2])
            cur_w = w
        elif t[0] == TRANSFORM_SUBTRACT_GREEN:
            pix = _inverse_subtract_green(pix)
        elif t[0] == TRANSFORM_PREDICTOR:
            pix = _inverse_predictor(pix, cur_w, h, t[1], t[2])
        elif t[0] == TRANSFORM_COLOR:
            pix = _inverse_color_transform(pix, cur_w, h, t[1], t[2])

    rgba = np.empty((h, w, 4), dtype=np.uint8)
    pix = pix.reshape(h, w)
    rgba[..., 0] = (pix >> np.uint32(16)) & np.uint32(0xFF)
    rgba[..., 1] = (pix >> np.uint32(8)) & np.uint32(0xFF)
    rgba[..., 2] = pix & np.uint32(0xFF)
    rgba[..., 3] = (pix >> np.uint32(24)) & np.uint32(0xFF)
    return rgba


def _vp8l_chunk(data: bytes) -> bytes:
    if len(data) < 12 or data[:4] != RIFF_MAGIC or data[8:12] != WEBP_FOURCC:
        raise WebPError("not a RIFF/WEBP container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return body
        if fourcc == b"VP8 " or fourcc == b"VP8X":
            pos += 8 + size + (size & 1)
            continue
        pos += 8 + size + (size & 1)
    raise WebPError("no VP8L chunk (lossy VP8 WebP is out of scope)")


def _le24(b: bytes, o: int) -> int:
    return b[o] | (b[o + 1] << 8) | (b[o + 2] << 16)


def parse_webp_container(data: bytes) -> dict:
    """Structural walk of a WebP container (no pixel decode).

    Simple files report the VP8L/VP8 stream; extended (VP8X) files report
    canvas size, feature flags, the ANIM background/loop fields, and every
    ANMF frame's placement rectangle, duration, blend/dispose flags, and
    embedded bitstream. Raises WebPError for non-WebP payloads.
    """
    if len(data) < 12 or data[:4] != RIFF_MAGIC or data[8:12] != WEBP_FOURCC:
        raise WebPError("not a RIFF/WEBP container")
    out: dict = {"kind": None, "canvas_w": None, "canvas_h": None,
                 "flags": {}, "background_bgra": None, "loop_count": None,
                 "frames": [], "stream": None, "stream_fourcc": None}
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise WebPError("truncated chunk")
        if fourcc in (b"VP8L", b"VP8 ") and out["kind"] is None:
            out["kind"] = "simple"
            out["stream"], out["stream_fourcc"] = body, fourcc.strip().decode()
        elif fourcc == b"VP8X":
            if size < 10:
                raise WebPError("short VP8X chunk")
            out["kind"] = "extended"
            fl = body[0]
            out["flags"] = {"icc": bool(fl & 0x20), "alpha": bool(fl & 0x10),
                            "exif": bool(fl & 0x08), "xmp": bool(fl & 0x04),
                            "animation": bool(fl & 0x02)}
            out["canvas_w"] = 1 + _le24(body, 4)
            out["canvas_h"] = 1 + _le24(body, 7)
        elif fourcc == b"ANIM":
            if size < 6:
                raise WebPError("short ANIM chunk")
            out["background_bgra"] = int.from_bytes(body[0:4], "little")
            out["loop_count"] = int.from_bytes(body[4:6], "little")
        elif fourcc == b"ANMF":
            if size < 16:
                raise WebPError("short ANMF chunk")
            frame = {
                # x/y are stored in 2-pixel units (spec)
                "x": 2 * _le24(body, 0), "y": 2 * _le24(body, 3),
                "w": 1 + _le24(body, 6), "h": 1 + _le24(body, 9),
                "duration_ms": _le24(body, 12),
                # last header byte: 6 reserved bits, B (1 = do NOT
                # blend), D (1 = dispose to background color)
                "no_blend": bool(body[15] & 0x02),
                "dispose_bg": bool(body[15] & 0x01),
                "fourcc": None, "stream": None,
            }
            # frame data: optional ALPH, then VP8/VP8L sub-chunk
            fp = 16
            while fp + 8 <= size:
                sub = body[fp:fp + 4]
                ssz = int.from_bytes(body[fp + 4:fp + 8], "little")
                if sub in (b"VP8L", b"VP8 "):
                    frame["fourcc"] = sub.strip().decode()
                    frame["stream"] = body[fp + 8:fp + 8 + ssz]
                    break
                fp += 8 + ssz + (ssz & 1)
            out["frames"].append(frame)
        pos += 8 + size + (size & 1)
    if out["kind"] is None:
        raise WebPError("no VP8L chunk (lossy VP8 WebP is out of scope)")
    return out


def _blend_rect(canvas: np.ndarray, frame: np.ndarray, x: int, y: int) -> None:
    """Alpha-blend `frame` onto canvas at (x, y) per the spec's formula
    (real-number math, rounded half away from zero — exact whenever the
    inputs make the formula integral, which every anchor test does)."""
    h, w = frame.shape[:2]
    dst = canvas[y:y + h, x:x + w].astype(np.float64)
    src = frame.astype(np.float64)
    sa = src[..., 3:4] / 255.0
    da = dst[..., 3:4] / 255.0
    oa = sa + da * (1.0 - sa)
    rgb = np.zeros_like(src[..., :3])
    nz = oa[..., 0] > 0
    rgb[nz] = (src[..., :3][nz] * sa[nz] + dst[..., :3][nz] * da[nz]
               * (1.0 - sa[nz])) / oa[nz]
    out = np.concatenate([rgb, oa * 255.0], axis=2)
    canvas[y:y + h, x:x + w] = np.floor(out + 0.5).astype(np.uint8)


def decode_webp_frames(data: bytes) -> List[np.ndarray]:
    """Composited RGBA frames of a WebP file.

    Simple VP8L files yield one frame. Extended animated files walk the
    ANMF sequence over the VP8X canvas (initially transparent black):
    each frame's VP8L tile is placed at its 2-pixel-aligned offset,
    alpha-blended or overwritten per its B flag, the composited canvas is
    emitted, then the frame rectangle is optionally filled with the ANIM
    background color (D flag, spec semantics). Lossy VP8 frames raise
    the documented typed error — the digest fallback handles them.
    """
    info = parse_webp_container(data)
    if info["kind"] == "simple":
        if info["stream_fourcc"] != "VP8L":
            raise WebPError("lossy VP8 WebP is out of scope")
        return [decode_vp8l(info["stream"])]
    if not info["frames"]:
        # extended but not animated: single image sub-chunk at top level
        raise WebPError("VP8X container without ANMF frames or VP8L chunk")
    cw, ch = info["canvas_w"], info["canvas_h"]
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
    bg = info["background_bgra"] or 0
    bg_rgba = np.array([(bg >> 16) & 0xFF, (bg >> 8) & 0xFF, bg & 0xFF,
                        (bg >> 24) & 0xFF], dtype=np.uint8)
    out = []
    for f in info["frames"]:
        if f["fourcc"] != "VP8L":
            raise WebPError("lossy VP8 frame is out of scope")
        tile = decode_vp8l(f["stream"])
        if tile.shape[:2] != (f["h"], f["w"]):
            raise WebPError("ANMF frame size disagrees with its stream")
        x, y = f["x"], f["y"]
        if x + f["w"] > cw or y + f["h"] > ch:
            raise WebPError("ANMF frame exceeds the canvas")
        if f["no_blend"]:
            canvas[y:y + f["h"], x:x + f["w"]] = tile
        else:
            _blend_rect(canvas, tile, x, y)
        out.append(canvas.copy())
        if f["dispose_bg"]:
            canvas[y:y + f["h"], x:x + f["w"]] = bg_rgba
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP container to pixels: the VP8L stream of a simple
    file, or the FIRST composited frame of an extended/animated file."""
    try:
        return decode_vp8l(_vp8l_chunk(data))
    except WebPError:
        return decode_webp_frames(data)[0]


def webp_dimensions(data: bytes) -> Tuple[int, int]:
    body = _vp8l_chunk(data)
    if not body or body[0] != VP8L_SIGNATURE:
        raise WebPError("bad VP8L signature")
    br = _BitReader(body)
    br.bits(8)
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    return w, h


# ---------------------------------------------------------------------------
# encoder (valid-subset; exists to exercise every decoder path)
# ---------------------------------------------------------------------------

def _huffman_lengths(freqs: Dict[int, int], max_len: int = MAX_CODE_LENGTH
                     ) -> Dict[int, int]:
    """Package-merge length-limited Huffman code lengths."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    # package-merge
    items = sorted((freqs[s], s) for s in syms)
    packages = [[(f, (s,)) for f, s in items]]
    for _ in range(max_len - 1):
        prev = packages[-1]
        merged = []
        for i in range(0, len(prev) - 1, 2):
            f = prev[i][0] + prev[i + 1][0]
            merged.append((f, prev[i][1] + prev[i + 1][1]))
        nxt = sorted([(f, (s,)) for f, s in items] + merged)
        packages.append(nxt)
    take = 2 * len(syms) - 2
    counts: Dict[int, int] = {s: 0 for s in syms}
    for f, group in packages[-1][:take]:
        for s in group:
            counts[s] += 1
    return counts


def _emit_prefix_code(bw: _BitWriter, lengths: Dict[int, int],
                      alphabet_size: int) -> Dict[int, Tuple[int, int]]:
    """Write a prefix-code header; return symbol -> (code, len) for payload."""
    syms = sorted(s for s, l in lengths.items() if l > 0)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        # simple code
        bw.write_bits(1, 1)
        bw.write_bits(len(syms) - 1, 1)
        first = syms[0]
        if first <= 1:
            bw.write_bits(0, 1)          # 1-bit first symbol
            bw.write_bits(first, 1)
        else:
            bw.write_bits(1, 1)
            bw.write_bits(first, 8)
        if len(syms) == 2:
            bw.write_bits(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    # normal code
    bw.write_bits(0, 1)
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    # code-length-code over the length symbols (no repeat codes: simplest
    # valid form; every length is emitted literally)
    cl_freq: Dict[int, int] = {}
    for l in full:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    # find how many kCodeLengthOrder entries we must transmit
    order_pos = {s: i for i, s in enumerate(CODE_LENGTH_ORDER)}
    num_cl = max(order_pos[s] for s in cl_lengths) + 1
    num_cl = max(num_cl, 4)
    bw.write_bits(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write_bits(cl_lengths.get(CODE_LENGTH_ORDER[i], 0), 3)
    cl_codes = _canonical_from_lengths(
        [cl_lengths.get(s, 0) for s in range(19)])
    if len(cl_codes) == 1:
        # single-symbol prefix codes read ZERO bits (libwebp convention)
        cl_codes = {next(iter(cl_codes)): (0, 0)}
    bw.write_bits(0, 1)  # no max_symbol cap: all lengths follow
    for l in full:
        c, n = cl_codes[l]
        bw.write_code(c, n)
    codes = _canonical_from_lengths(full)
    if len(codes) == 1:
        codes = {next(iter(codes)): (0, 0)}
    return codes


def _tokenize(pix: np.ndarray, w: int, cache_bits: int,
              use_lz77: bool, use_neighbor_codes: bool) -> List[tuple]:
    tokens: List[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    last3: Dict[tuple, int] = {}
    total = len(pix)
    pos = 0
    while pos < total:
        length = 0
        dist = 0
        if use_lz77 and pos + 3 <= total:
            key = (int(pix[pos]), int(pix[pos + 1]), int(pix[pos + 2]))
            prev = last3.get(key)
            if prev is not None:
                d = pos - prev
                m = 0
                while (pos + m < total and m < 4096
                       and pix[prev + m] == pix[pos + m]):
                    m += 1
                if m >= 3:
                    length, dist = m, d
        if length:
            dy, rem = divmod(dist, w)
            dx = rem
            if rem > w // 2:
                dy, dx = dy + 1, rem - w
            code = None
            if use_neighbor_codes and dy <= 8 and -8 <= dx <= 8:
                code = _DISTANCE_CODE.get((dx, dy))
                # plane codes must round-trip to the same distance
                if code is not None and _plane_code_to_distance(
                        w, code) != dist:
                    code = None
            if code is None:
                code = dist + 120
            for k in range(length):
                p = pos + k
                if p + 2 < total:
                    last3[(int(pix[p]), int(pix[p + 1]), int(pix[p + 2]))] = p
                if cache is not None:
                    px = int(pix[p])
                    cache[_cache_hash(px, cache_bits)] = px
            tokens.append(("copy", length, code))
            pos += length
            continue
        px = int(pix[pos])
        if cache is not None:
            idx = _cache_hash(px, cache_bits)
            if cache[idx] == px:
                tokens.append(("cache", idx))
            else:
                cache[idx] = px
                tokens.append(("lit", px))
        else:
            tokens.append(("lit", px))
        if pos + 2 < total:
            last3[(int(pix[pos]), int(pix[pos + 1]), int(pix[pos + 2]))] = pos
        pos += 1
    return tokens


def _length_prefix_code(value: int) -> Tuple[int, int, int]:
    """value (>=1) -> (prefix_code, extra_bits_value, extra_bits_count)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    bits = v.bit_length() - 2
    code = 2 * bits + ((v >> bits) & 1) + 2
    extra = v & ((1 << bits) - 1)
    return code, extra, bits


def _emit_image_stream(bw: _BitWriter, pix: np.ndarray, w: int,
                       cache_bits: int = 0, use_lz77: bool = False,
                       use_neighbor_codes: bool = False,
                       top_level: bool = False) -> None:
    # spec order: color-cache-info, then (top level only) meta-prefix bit
    if cache_bits:
        bw.write_bits(1, 1)
        bw.write_bits(cache_bits, 4)
    else:
        bw.write_bits(0, 1)
    if top_level:
        bw.write_bits(0, 1)                  # no meta prefix image

    tokens = _tokenize(pix, w, cache_bits, use_lz77, use_neighbor_codes)

    gf: Dict[int, int] = {}
    rf: Dict[int, int] = {}
    bf: Dict[int, int] = {}
    af: Dict[int, int] = {}
    df: Dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            gf[(px >> 8) & 0xFF] = gf.get((px >> 8) & 0xFF, 0) + 1
            rf[(px >> 16) & 0xFF] = rf.get((px >> 16) & 0xFF, 0) + 1
            bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
            af[(px >> 24) & 0xFF] = af.get((px >> 24) & 0xFF, 0) + 1
        elif t[0] == "copy":
            lcode, _, _ = _length_prefix_code(t[1])
            gf[NUM_LITERALS + lcode] = gf.get(NUM_LITERALS + lcode, 0) + 1
            dcode, _, _ = _length_prefix_code(t[2])
            df[dcode] = df.get(dcode, 0) + 1
        else:
            s = NUM_LITERALS + NUM_LENGTH_CODES + t[1]
            gf[s] = gf.get(s, 0) + 1
    # every code group must be present; default unused ones to symbol 0
    for f in (gf, rf, bf, af, df):
        if not f:
            f[0] = 1

    green_size = NUM_LITERALS + NUM_LENGTH_CODES + (
        (1 << cache_bits) if cache_bits else 0)
    g_codes = _emit_prefix_code(bw, _huffman_lengths(gf), green_size)
    r_codes = _emit_prefix_code(bw, _huffman_lengths(rf), NUM_LITERALS)
    b_codes = _emit_prefix_code(bw, _huffman_lengths(bf), NUM_LITERALS)
    a_codes = _emit_prefix_code(bw, _huffman_lengths(af), NUM_LITERALS)
    d_codes = _emit_prefix_code(bw, _huffman_lengths(df), NUM_DISTANCE_CODES)

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            c, n = g_codes[(px >> 8) & 0xFF]
            bw.write_code(c, n)
            c, n = r_codes[(px >> 16) & 0xFF]
            bw.write_code(c, n)
            c, n = b_codes[px & 0xFF]
            bw.write_code(c, n)
            c, n = a_codes[(px >> 24) & 0xFF]
            bw.write_code(c, n)
        elif t[0] == "copy":
            lcode, lev, lec = _length_prefix_code(t[1])
            c, n = g_codes[NUM_LITERALS + lcode]
            bw.write_code(c, n)
            bw.write_bits(lev, lec)
            dcode, dev, dec = _length_prefix_code(t[2])
            c, n = d_codes[dcode]
            bw.write_code(c, n)
            bw.write_bits(dev, dec)
        else:
            c, n = g_codes[NUM_LITERALS + NUM_LENGTH_CODES + t[1]]
            bw.write_code(c, n)


def _forward_subtract_green(pix: np.ndarray) -> np.ndarray:
    g = (pix >> np.uint32(8)) & np.uint32(0xFF)
    r = (((pix >> np.uint32(16)) & np.uint32(0xFF)) - g) & np.uint32(0xFF)
    b = ((pix & np.uint32(0xFF)) - g) & np.uint32(0xFF)
    return (pix & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _sub_pixels(a: int, b: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) - ((b >> shift) & 0xFF)) & 0xFF) << shift
    return out


def _forward_predictor(pix: np.ndarray, w: int, h: int, mode: int,
                       bits: int) -> Tuple[np.ndarray, np.ndarray]:
    """Residuals for a single uniform predictor mode + its tile image."""
    res = pix.copy()
    for y in range(h - 1, -1, -1):
        for x in range(w - 1, -1, -1):
            i = y * w + x
            if x == 0 and y == 0:
                pred = PRED_BLACK
            elif y == 0:
                pred = int(pix[i - 1])
            elif x == 0:
                pred = int(pix[i - w])
            else:
                l = int(pix[i - 1])
                t = int(pix[i - w])
                tl = int(pix[i - w - 1])
                # mirrors the decoder's right-edge TR wraparound (above):
                # for x == w - 1 this reads the current row's first pixel
                tr = int(pix[i - w + 1])
                pred = _predict(mode, l, t, tl, tr)
            res[i] = _sub_pixels(int(pix[i]), pred)
    tw, th = _subsample_size(w, bits), _subsample_size(h, bits)
    tiles = np.full(tw * th, PRED_BLACK | (mode << 8), dtype=np.uint32)
    return res, tiles


def _forward_color_transform(pix: np.ndarray, w: int, h: int,
                             deltas: Tuple[int, int, int], bits: int
                             ) -> Tuple[np.ndarray, np.ndarray]:
    g2r, g2b, r2b = deltas
    res = pix.copy()
    for i in range(len(pix)):
        px = int(pix[i])
        a = (px >> 24) & 0xFF
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        # forward: subtract the deltas the decoder will add back (decoder
        # computes from the TRANSFORMED green and reconstructed red)
        b2 = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
        r2 = (r - _ct_delta(g2r, g)) & 0xFF
        res[i] = (a << 24) | (r2 << 16) | (g << 8) | b2
    tw, th = _subsample_size(w, bits), _subsample_size(h, bits)
    cte = PRED_BLACK | (r2b << 16) | (g2b << 8) | g2r
    tiles = np.full(tw * th, cte, dtype=np.uint32)
    return res, tiles


def encode_vp8l(rgba: np.ndarray, *, subtract_green: bool = False,
                cache_bits: int = 0, use_lz77: bool = False,
                use_neighbor_codes: bool = False, palette: bool = False,
                predictor: Optional[int] = None,
                color_transform: Optional[Tuple[int, int, int]] = None
                ) -> bytes:
    """Encode (h, w, 4) uint8 RGBA to a raw VP8L stream (valid subset)."""
    if rgba.ndim != 3 or rgba.shape[2] not in (3, 4):
        raise WebPError("encode_vp8l wants (h, w, 3|4) uint8")
    h, w = rgba.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise WebPError("dimensions out of VP8L 14-bit range")
    if rgba.shape[2] == 3:
        rgba = np.dstack([rgba, np.full((h, w), 255, dtype=np.uint8)])
    pix = (rgba[..., 3].astype(np.uint32) << 24) \
        | (rgba[..., 0].astype(np.uint32) << 16) \
        | (rgba[..., 1].astype(np.uint32) << 8) \
        | rgba[..., 2].astype(np.uint32)
    pix = pix.reshape(-1)

    bw = _BitWriter()
    bw.write_bits(VP8L_SIGNATURE, 8)
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(int(np.any(rgba[..., 3] != 255)), 1)
    bw.write_bits(0, 3)  # version

    cur_w = w
    if palette:
        colors = np.unique(pix)
        if len(colors) > 256:
            raise WebPError("palette mode needs <= 256 distinct colors")
        lut = {int(c): i for i, c in enumerate(colors)}
        bw.write_bits(1, 1)
        bw.write_bits(TRANSFORM_COLOR_INDEXING, 2)
        bw.write_bits(len(colors) - 1, 8)
        deltas = np.zeros(len(colors), dtype=np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            deltas[i] = _sub_pixels(int(c), prev)
            prev = int(c)
        _emit_image_stream(bw, deltas, len(colors))
        idx = np.array([lut[int(p)] for p in pix], dtype=np.uint32)
        xbits = _palette_xbits(len(colors))
        if xbits:
            per = 1 << xbits
            ibits = 8 >> xbits
            packed_w = _subsample_size(w, xbits)
            rows = idx.reshape(h, w)
            packed = np.zeros((h, packed_w), dtype=np.uint32)
            for sub in range(per):
                cols = np.arange(sub, w, per)
                packed[:, (cols >> xbits)] |= rows[:, cols] << (sub * ibits)
            idx = packed.reshape(-1)
            cur_w = packed_w
        pix = (np.uint32(PRED_BLACK) | (idx << np.uint32(8))).astype(np.uint32)
    if color_transform is not None:
        bits = 4
        res, tiles = _forward_color_transform(pix, cur_w, h, color_transform,
                                              bits)
        bw.write_bits(1, 1)
        bw.write_bits(TRANSFORM_COLOR, 2)
        bw.write_bits(bits - 2, 3)
        _emit_image_stream(bw, tiles, _subsample_size(cur_w, bits))
        pix = res
    if subtract_green:
        bw.write_bits(1, 1)
        bw.write_bits(TRANSFORM_SUBTRACT_GREEN, 2)
        pix = _forward_subtract_green(pix)
    if predictor is not None:
        bits = 4
        res, tiles = _forward_predictor(pix, cur_w, h, predictor, bits)
        bw.write_bits(1, 1)
        bw.write_bits(TRANSFORM_PREDICTOR, 2)
        bw.write_bits(bits - 2, 3)
        _emit_image_stream(bw, tiles, _subsample_size(cur_w, bits))
        pix = res
    bw.write_bits(0, 1)  # end of transforms

    _emit_image_stream(bw, pix, cur_w, cache_bits=cache_bits,
                       use_lz77=use_lz77,
                       use_neighbor_codes=use_neighbor_codes,
                       top_level=True)
    return bw.bytes()


def encode_webp_vp8l(rgba: np.ndarray, **kwargs) -> bytes:
    """Encode RGBA pixels into a RIFF/WEBP container with a VP8L chunk."""
    body = encode_vp8l(rgba, **kwargs)
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff_size = 4 + len(chunk)
    return RIFF_MAGIC + riff_size.to_bytes(4, "little") + WEBP_FOURCC + chunk
