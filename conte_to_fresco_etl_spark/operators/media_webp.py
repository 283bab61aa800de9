"""Native WebP **lossless** (VP8L) codec — no external libraries.

``decode_webp`` implements the public VP8L bitstream (RFC 9649 /
"WebP Lossless Bitstream Specification"): RIFF/VP8X container walk,
LSB-first bit reading, canonical prefix codes (simple and normal forms,
code-length-coded with 16/17/18 repeats), optional meta-prefix image,
color cache, LZ77 backward references with the 120-entry 2D distance
map, and all four transforms (predictor with its 14 modes, cross-color,
subtract-green, color-indexing with sub-byte packing).  Lossy ``VP8 ``
payloads raise the codec plug-point error (that path needs a real DSP
library and stays behind ``strict_codec``'s contract).

``encode_webp`` is the test fixture: a real, spec-shaped VP8L encoder
(forward transforms, balanced complete prefix codes, optional color
cache / LZ77 / meta groups) used to pin the decoder with round-trips —
the same encoder-fixture posture as ``encode_jpeg`` / ``encode_flac``.

Scale posture: identical to every codec in ``media.py`` — payloads are
opaque bytes decoded per Arrow batch inside ``mapInPandas``; nothing
here touches the driver.  Reference parity note: the reference repo has
no media pipeline at all; this module exists for the training-data
extension (SURVEY.md §2 media rows).
"""

from __future__ import annotations

import struct

import numpy as np

# Code-length code symbol order (RFC 9649 §4.2.1.1).
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

#: 2D offsets for LZ77 distance codes 1..120 (RFC 9649 §4.2.2.2):
#: every (dx, dy) with dy in 0..7, dx in -7..8 strictly "behind" the
#: current pixel, ordered by squared distance, then dy descending,
#: then dx descending (positive before negative) — the generated list
#: reproduces the spec's table exactly.
_DIST_MAP: list[tuple[int, int]] = sorted(
    (
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)

_HASH_MUL = 0x1E35A7BD  # color-cache hash multiplier (RFC 9649 §4.2.3)


# ---------------------------------------------------------------------------
# LSB-first bit I/O
# ---------------------------------------------------------------------------

class _LsbReader:
    """VP8L bit reader: bytes are consumed LSB-first; prefix-code bits
    are read one at a time (MSB of the canonical code arrives first)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("truncated VP8L stream")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class _LsbWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):  # MSB of the code first
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------

def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), deflate-style canonical assignment
    (sorted by (length, symbol), codes increment, left-shift on length
    increase)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    cur = 0
    for l, s in pairs:
        code <<= l - cur
        cur = l
        out[s] = (code, l)
        code += 1
    return out


class _PrefixCode:
    """Decoder-side prefix code: walk one bit at a time."""

    def __init__(self, lengths: list[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single: int | None = nz[0][0]
            self.table: dict[tuple[int, int], int] = {}
            return
        maxlen = max(l for _, l in nz)
        if sum(1 << (maxlen - l) for _, l in nz) != (1 << maxlen):
            raise ValueError("incomplete prefix code")
        self.single = None
        self.table = {
            (l, code): s
            for s, (code, l) in _canonical_codes(lengths).items()
        }

    def decode(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        for depth in range(1, 16):
            acc = (acc << 1) | br.read(1)
            sym = self.table.get((depth, acc))
            if sym is not None:
                return sym
        raise ValueError("prefix code desync")


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _PrefixCode:
    """One prefix code: simple form (1-2 symbols) or normal form
    (code-length-coded lengths with 16/17/18 repeats, RFC 9649
    §4.2.1)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ValueError("simple-code symbol out of range")
        pc = _PrefixCode.__new__(_PrefixCode)
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ValueError("simple-code symbol invalid")
            # stream order assigns the codes: first symbol reads as 0
            pc.single = None
            pc.table = {(1, 0): s0, (1, 1): s1}
        else:
            pc.single = s0
            pc.table = {}
        return pc
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # explicit symbol-count cap
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_code.decode(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:
            symbol += 11 + br.read(7)
    return _PrefixCode(lengths)


def _prefix_value(br: _LsbReader, code: int) -> int:
    """LZ77 length/distance prefix decode (RFC 9649 §4.2.2.1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """Inverse of :func:`_prefix_value`: value -> (code, extra, nbits)."""
    t = value - 1
    if t < 4:
        return t, 0, 0
    k = t.bit_length() - 1
    if t < (3 << (k - 1)):
        return 2 * k, t - (1 << k), k - 1
    return 2 * k + 1, t - (3 << (k - 1)), k - 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _decode_image_stream(
    br: _LsbReader, w: int, h: int, level0: bool
) -> np.ndarray:
    """Entropy-coded ARGB image (RFC 9649 §5); returns int32 (h*w, 4)
    in [a, r, g, b] order.  ``level0`` streams carry transforms and may
    carry a meta-prefix image; sub-resolution streams carry neither."""
    transforms: list[tuple[int, object]] = []
    xsize = w
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if any(t == ttype for t, _ in transforms):
                raise ValueError("duplicate VP8L transform")
            if ttype == 0 or ttype == 1:  # predictor / cross-color
                bits = br.read(3) + 2
                sw = (xsize + (1 << bits) - 1) >> bits
                sh = (h + (1 << bits) - 1) >> bits
                sub = _decode_image_stream(br, sw, sh, False)
                transforms.append((ttype, (bits, sw, sub)))
            elif ttype == 2:  # subtract green
                transforms.append((2, None))
            else:  # color indexing
                psize = br.read(8) + 1
                praw = _decode_image_stream(br, psize, 1, False)
                pal = np.cumsum(praw, axis=0, dtype=np.int64) & 0xFF
                if psize <= 2:
                    pbits = 3
                elif psize <= 4:
                    pbits = 2
                elif psize <= 16:
                    pbits = 1
                else:
                    pbits = 0
                transforms.append((3, (pal.astype(np.int32), pbits, xsize)))
                xsize = (xsize + (1 << pbits) - 1) >> pbits
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("invalid color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.read(1):  # meta-prefix image
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        mimg = _decode_image_stream(br, mw, mh, False)
        meta = ((mimg[:, 1].astype(np.int64) << 8) | mimg[:, 2]).reshape(
            mh, mw
        )
        num_groups = int(meta.max()) + 1
    green_size = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )
    n = xsize * h
    px = np.zeros((n, 4), dtype=np.int32)
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0

    def cache_insert(argb: int) -> None:
        cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> shift] = argb

    pos = 0
    gcode, rcode, bcode, acode, dcode = groups[0]
    while pos < n:
        if meta is not None:
            x = pos % xsize
            y = pos // xsize
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            gcode, rcode, bcode, acode, dcode = groups[gi]
        s = gcode.decode(br)
        if s < 256:
            g = s
            r = rcode.decode(br)
            b = bcode.decode(br)
            a = acode.decode(br)
            px[pos] = (a, r, g, b)
            if cache_bits:
                cache_insert((a << 24) | (r << 16) | (g << 8) | b)
            pos += 1
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, dcode.decode(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(dy * xsize + dx, 1)
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of range")
            for _ in range(length):
                px[pos] = px[pos - dist]
                if cache_bits:
                    a, r, g, b = (int(v) for v in px[pos])
                    cache_insert((a << 24) | (r << 16) | (g << 8) | b)
                pos += 1
        else:
            if s - 280 >= cache_size:
                raise ValueError("color-cache index out of range")
            argb = cache[s - 280]
            px[pos] = (
                (argb >> 24) & 0xFF,
                (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF,
                argb & 0xFF,
            )
            cache_insert(argb)
            pos += 1
    # inverse transforms, reverse of reading order (RFC 9649 §4)
    for ttype, data in reversed(transforms):
        if ttype == 3:
            pal, pbits, full_w = data
            img = px.reshape(h, xsize, 4)
            if pbits:
                per = 1 << pbits
                bits = 8 >> pbits
                mask = (1 << bits) - 1
                idx = np.zeros((h, xsize * per), dtype=np.int32)
                for i in range(per):  # LSB-first sub-byte packing
                    idx[:, i::per] = (img[:, :, 2] >> (i * bits)) & mask
                idx = idx[:, :full_w]
            else:
                idx = img[:, :, 2]
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("palette index out of range")
            px = pal[idx.reshape(-1)]
            xsize = full_w
        elif ttype == 2:
            px[:, 1] = (px[:, 1] + px[:, 2]) & 0xFF
            px[:, 3] = (px[:, 3] + px[:, 2]) & 0xFF
        elif ttype == 1:
            bits, sw, sub = data
            img = px.reshape(h, xsize, 4)
            by = np.arange(h) >> bits
            bx = np.arange(xsize) >> bits
            cte = sub.reshape(-1, sw, 4)[by][:, bx]  # (h, w, 4)
            g2r = cte[:, :, 3].astype(np.int8).astype(np.int32)
            g2b = cte[:, :, 2].astype(np.int8).astype(np.int32)
            r2b = cte[:, :, 1].astype(np.int8).astype(np.int32)
            green = img[:, :, 2].astype(np.int8).astype(np.int32)
            red = (img[:, :, 1] + ((g2r * green) >> 5)) & 0xFF
            reds = red.astype(np.int8).astype(np.int32)
            blue = (
                img[:, :, 3] + ((g2b * green) >> 5) + ((r2b * reds) >> 5)
            ) & 0xFF
            img[:, :, 1] = red
            img[:, :, 3] = blue
            px = img.reshape(-1, 4)
        else:  # predictor
            bits, sw, sub = data
            modes = sub[:, 2].reshape(-1, sw)
            px = _inverse_predictor(px, xsize, h, modes, bits)
    return px


def _avg2(a: tuple, b: tuple) -> tuple:
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _inverse_predictor(
    px: np.ndarray, w: int, h: int, modes: np.ndarray, bits: int
) -> np.ndarray:
    """Sequential predictor inversion (RFC 9649 §4.2): residual + pred
    mod 256 per channel; linear addressing makes the rightmost column's
    top-right neighbor wrap to the current row's first pixel."""
    out = px.copy()

    def at(i: int) -> tuple:
        return tuple(int(v) for v in out[i])

    for pos in range(w * h):
        x = pos % w
        y = pos // w
        if pos == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = at(pos - 1)
        elif x == 0:
            pred = at(pos - w)
        else:
            mode = int(modes[y >> bits, x >> bits])
            left = at(pos - 1)
            top = at(pos - w)
            tl = at(pos - w - 1)
            tr = at(pos - w + 1)  # wraps to row start at x == w-1
            if mode == 0:
                pred = (255, 0, 0, 0)
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(left, tr), top)
            elif mode == 6:
                pred = _avg2(left, tl)
            elif mode == 7:
                pred = _avg2(left, top)
            elif mode == 8:
                pred = _avg2(tl, top)
            elif mode == 9:
                pred = _avg2(top, tr)
            elif mode == 10:
                pred = _avg2(_avg2(left, tl), _avg2(top, tr))
            elif mode == 11:
                dl = sum(abs(l - c) for l, c in zip(left, tl))
                dt = sum(abs(t - c) for t, c in zip(top, tl))
                pred = top if dl <= dt else left
            elif mode == 12:
                pred = tuple(
                    min(255, max(0, l + t - c))
                    for l, t, c in zip(left, top, tl)
                )
            elif mode == 13:
                ave = _avg2(left, top)
                pred = tuple(
                    min(255, max(0, a + _trunc_half(a - c)))
                    for a, c in zip(ave, tl)
                )
            else:
                raise ValueError(f"invalid predictor mode {mode}")
        out[pos] = [(int(r) + p) & 0xFF for r, p in zip(out[pos], pred)]
    return out


def _trunc_half(t: int) -> int:
    """C-style (truncate toward zero) division by 2."""
    return t // 2 if t >= 0 else -((-t) // 2)


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless WebP (VP8L) to an (h, w, 3|4) float32 array —
    RGBA when the stream's alpha-hint bit is set, RGB otherwise.  The
    VP8X extended container is walked to find the VP8L chunk; lossy
    ``VP8 `` streams raise the plug-point error (``strict_codec``
    convention: that path needs a real codec library)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    i = 12
    vp8l = None
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            from conte_to_fresco_etl_spark.operators.media_vp8 import (
                decode_vp8,
            )

            return decode_vp8(body)
        i += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("WebP container has no VP8L chunk")
    if not vp8l or vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _LsbReader(vp8l, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_used = br.read(1)
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    px = _decode_image_stream(br, w, h, True)
    img = px.reshape(h, w, 4).astype(np.float32)
    if alpha_used:
        return img[:, :, [1, 2, 3, 0]]  # ARGB -> RGBA
    return img[:, :, [1, 2, 3]]


# ---------------------------------------------------------------------------
# Encoder fixture
# ---------------------------------------------------------------------------

def _complete_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Kraft-complete code lengths using only two adjacent lengths
    (ceil(log2 k) and one less) — not optimal, always valid, depth <= 9
    for the 280-symbol green alphabet.  Single-symbol alphabets whose
    symbol exceeds the simple-code 8-bit limit get a 1-bit pad symbol."""
    syms = sorted(freqs, key=lambda s: (-freqs[s], s))
    if len(syms) == 1:
        if syms[0] < 256:
            return {syms[0]: 1}  # simple-code form handles it
        pad = 0 if syms[0] != 0 else 1
        return {syms[0]: 1, pad: 1}
    k = len(syms)
    l = (k - 1).bit_length()
    promoted = (1 << l) - k  # symbols lifted to length l-1
    return {
        s: (l - 1 if i < promoted else l) for i, s in enumerate(syms)
    }


def _write_prefix_code(
    bw: _LsbWriter, lengths: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit a prefix code (simple form when possible) and return the
    symbol -> (code, nbits) map for payload writing."""
    syms = sorted(lengths)
    if len(syms) == 1 and syms[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        return {syms[0]: (0, 0)}
    if len(syms) == 2 and syms[1] < 256:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        bw.write(syms[1], 8)
        full = [0] * alphabet_size
        full[syms[0]] = full[syms[1]] = 1
        return _canonical_codes(full)
    bw.write(0, 1)  # normal form
    cl_freq: dict[int, int] = {}
    full = [0] * alphabet_size
    for s, l in lengths.items():
        full[s] = l
    last = max(lengths)
    for s in range(last + 1):
        cl_freq[full[s]] = cl_freq.get(full[s], 0) + 1
    if len(cl_freq) == 1:
        # a 1-symbol CL code reads as 0 bits; pad to a complete 1-bit
        # pair so each written length consumes exactly one bit
        cl_freq[0 if 0 not in cl_freq else 1] = 1
    cl_lengths = _complete_lengths(cl_freq)
    cl_full = [0] * 19
    for s, l in cl_lengths.items():
        cl_full[s] = l
    bw.write(15, 4)  # num_code_lengths = 19
    for s in _CL_ORDER:
        bw.write(cl_full[s], 3)
    cl_codes = _canonical_codes(cl_full)
    if last + 1 < alphabet_size:
        # cap the coded symbol count so trailing zeros aren't written
        nsyms = last + 1
        length_nbits = max(2, ((nsyms - 2).bit_length() + 1) & ~1)
        bw.write(1, 1)
        bw.write((length_nbits - 2) // 2, 3)
        bw.write(nsyms - 2, length_nbits)
    else:
        bw.write(0, 1)
    for s in range(last + 1):
        code, nb = cl_codes[full[s]]
        bw.write_code(code, nb)
    return _canonical_codes(full)


def _dist_to_code(dist: int, xsize: int) -> int:
    for i, (dx, dy) in enumerate(_DIST_MAP):
        if max(dy * xsize + dx, 1) == dist:
            return i + 1
    return dist + 120


def _tokenize(
    flat: np.ndarray, xsize: int, cache_bits: int, lz77: bool
) -> list[tuple]:
    """Pixel stream -> tokens: ('lit', a, r, g, b) / ('copy', len,
    dist) / ('cache', idx), mirroring the decoder's cache model."""
    n = len(flat)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    argbs = (
        (flat[:, 0].astype(np.int64) << 24)
        | (flat[:, 1].astype(np.int64) << 16)
        | (flat[:, 2].astype(np.int64) << 8)
        | flat[:, 3].astype(np.int64)
    )
    toks: list[tuple] = []
    i = 0
    while i < n:
        if lz77 and i >= 1:
            best_len = 0
            best_dist = 0
            for dist in (xsize, 1, 2 * xsize, 3 * xsize, 4 * xsize):
                if dist == 0 or dist > i:
                    continue
                run = 0
                while i + run < n and run < 4096 and argbs[i + run] == argbs[
                    i + run - dist
                ]:
                    run += 1
                if run > best_len:
                    best_len, best_dist = run, dist
            if best_len >= 4:
                toks.append(("copy", best_len, best_dist))
                if cache_size:
                    for j in range(i, i + best_len):
                        v = int(argbs[j])
                        cache[((_HASH_MUL * v) & 0xFFFFFFFF) >> shift] = v
                i += best_len
                continue
        v = int(argbs[i])
        if cache_size:
            hidx = ((_HASH_MUL * v) & 0xFFFFFFFF) >> shift
            if cache[hidx] == v:
                toks.append(("cache", hidx))
                i += 1
                continue
            cache[hidx] = v
        a, r, g, b = (int(c) for c in flat[i])
        toks.append(("lit", a, r, g, b))
        i += 1
    return toks


def _write_image_stream(
    bw: _LsbWriter,
    px: np.ndarray,
    w: int,
    h: int,
    level0: bool,
    transforms: list[tuple] | None = None,
    cache_bits: int = 0,
    lz77: bool = True,
    meta_bits: int = 0,
) -> None:
    """Encode an int32 (h*w, 4) ARGB image.  ``transforms`` is the
    pre-applied forward list [(type, wire_data)] in stream order."""
    if level0:
        for ttype, data in transforms or []:
            bw.write(1, 1)
            bw.write(ttype, 2)
            if ttype in (0, 1):
                bits, sw, sh, sub = data
                bw.write(bits - 2, 3)
                _write_image_stream(bw, sub, sw, sh, False, lz77=False)
            elif ttype == 3:
                pal_delta, psize = data
                bw.write(psize - 1, 8)
                _write_image_stream(
                    bw, pal_delta, psize, 1, False, lz77=False
                )
        bw.write(0, 1)  # end of transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    groups = 1
    if level0:
        if meta_bits:
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            if mw < 2:
                raise ValueError("meta_bits too large for image width")
            gx = np.arange(mw) >= (mw + 1) // 2  # left/right split
            meta_img = np.zeros((mh * mw, 4), dtype=np.int32)
            meta_img[:, 0] = 255
            meta_img[:, 2] = np.tile(gx.astype(np.int32), mh)
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            _write_image_stream(bw, meta_img, mw, mh, False, lz77=False)
            groups = 2
        else:
            bw.write(0, 1)
    toks = _tokenize(px, w, cache_bits, lz77)

    def group_of(pos: int) -> int:
        if groups == 1:
            return 0
        x = pos % w
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        return int((x >> meta_bits) >= (mw + 1) // 2)

    cache_size = (1 << cache_bits) if cache_bits else 0
    gfreq = [dict() for _ in range(groups)]
    rfreq = [dict() for _ in range(groups)]
    bfreq = [dict() for _ in range(groups)]
    afreq = [dict() for _ in range(groups)]
    dfreq = [dict() for _ in range(groups)]

    def bump(d: dict, k: int) -> None:
        d[k] = d.get(k, 0) + 1

    pos = 0
    for t in toks:
        gi = group_of(pos)
        if t[0] == "lit":
            _, a, r, g, b = t
            bump(gfreq[gi], g)
            bump(rfreq[gi], r)
            bump(bfreq[gi], b)
            bump(afreq[gi], a)
            pos += 1
        elif t[0] == "copy":
            _, length, dist = t
            bump(gfreq[gi], 256 + _prefix_encode(length)[0])
            bump(dfreq[gi], _prefix_encode(_dist_to_code(dist, w))[0])
            pos += length
        else:
            bump(gfreq[gi], 280 + t[1])
            pos += 1
    green_size = 256 + 24 + cache_size
    codes = []
    for gi in range(groups):
        if not gfreq[gi]:
            gfreq[gi][0] = 1
        for d in (rfreq, bfreq, afreq, dfreq):
            if not d[gi]:
                d[gi][0] = 1
        codes.append(
            (
                _write_prefix_code(
                    bw, _complete_lengths(gfreq[gi]), green_size
                ),
                _write_prefix_code(bw, _complete_lengths(rfreq[gi]), 256),
                _write_prefix_code(bw, _complete_lengths(bfreq[gi]), 256),
                _write_prefix_code(bw, _complete_lengths(afreq[gi]), 256),
                _write_prefix_code(bw, _complete_lengths(dfreq[gi]), 40),
            )
        )
    pos = 0
    for t in toks:
        gc, rc, bc, ac, dc = codes[group_of(pos)]
        if t[0] == "lit":
            _, a, r, g, b = t
            bw.write_code(*gc[g])
            bw.write_code(*rc[r])
            bw.write_code(*bc[b])
            bw.write_code(*ac[a])
            pos += 1
        elif t[0] == "copy":
            _, length, dist = t
            code, extra, nb = _prefix_encode(length)
            bw.write_code(*gc[256 + code])
            if nb:
                bw.write(extra, nb)
            code, extra, nb = _prefix_encode(_dist_to_code(dist, w))
            bw.write_code(*dc[code])
            if nb:
                bw.write(extra, nb)
            pos += length
        else:
            bw.write_code(*gc[280 + t[1]])
            pos += 1


def _forward_predictor(
    img: np.ndarray, w: int, h: int, bits: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block best-mode predictor (exhaustive over the 14 modes);
    returns (residuals (h*w,4), mode image).  Lossless reconstruction
    equals the original, so predictions vectorize from the source."""
    a = img.reshape(h, w, 4).astype(np.int32)
    flat = a.reshape(-1, 4)
    n = h * w
    idx = np.arange(n)
    left_i = np.maximum(idx - 1, 0)
    top_i = np.maximum(idx - w, 0)
    tl_i = np.maximum(idx - w - 1, 0)
    tr_i = np.minimum(idx - w + 1, n - 1)
    L = flat[left_i].astype(np.int32)
    T = flat[top_i].astype(np.int32)
    TL = flat[tl_i].astype(np.int32)
    TR = flat[tr_i].astype(np.int32)
    black = np.zeros_like(flat)
    black[:, 0] = 255
    preds = [
        black,
        L,
        T,
        TR,
        TL,
        (((L + TR) >> 1) + T) >> 1,
        (L + TL) >> 1,
        (L + T) >> 1,
        (TL + T) >> 1,
        (T + TR) >> 1,
        (((L + TL) >> 1) + ((T + TR) >> 1)) >> 1,
        None,  # select, below
        np.clip(L + T - TL, 0, 255),
        None,  # clamp-half, below
    ]
    dl = np.abs(L - TL).sum(axis=1)
    dt = np.abs(T - TL).sum(axis=1)
    preds[11] = np.where((dl <= dt)[:, None], T, L)
    ave = (L + T) >> 1
    d = ave - TL
    half = np.where(d >= 0, d // 2, -((-d) // 2))
    preds[13] = np.clip(ave + half, 0, 255)
    bs = 1 << bits
    sw = (w + bs - 1) >> bits
    sh = (h + bs - 1) >> bits
    modes = np.zeros((sh, sw), dtype=np.int32)
    x = idx % w
    y = idx // w
    # per-block best mode by residual magnitude (edge-overridden pixels
    # excluded: (0,0) is black, row 0 uses L, column 0 uses T by spec)
    costs = np.zeros((14, n), dtype=np.int64)
    for m in range(14):
        r = (flat - preds[m]) & 0xFF
        costs[m] = np.minimum(r, 256 - r).sum(axis=1)  # wrap distance
    for byi in range(sh):
        for bxi in range(sw):
            sel = (
                (y >> bits == byi)
                & (x >> bits == bxi)
                & (y > 0)
                & (x > 0)
            )
            if sel.any():
                modes[byi, bxi] = int(costs[:, sel].sum(axis=1).argmin())
    mode_px = modes[y >> bits, x >> bits]
    chosen = np.zeros_like(flat)
    for m in range(14):
        sel = mode_px == m
        chosen[sel] = preds[m][sel]
    chosen[y == 0] = preds[1][y == 0]
    chosen[x == 0] = preds[2][x == 0]
    chosen[0] = black[0]
    res = (flat - chosen) & 0xFF
    mimg = np.zeros((sh * sw, 4), dtype=np.int32)
    mimg[:, 0] = 255
    mimg[:, 2] = modes.reshape(-1)
    return res, mimg


def encode_webp(
    img: np.ndarray,
    *,
    palette: bool = False,
    predictor_bits: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    subtract_green: bool = False,
    cache_bits: int = 0,
    lz77: bool = True,
    meta_bits: int = 0,
) -> bytes:
    """Encode a uint8 (h, w, 3|4) array as lossless WebP (VP8L).  A
    test fixture, not a production encoder: balanced complete prefix
    codes, simple LZ77 (left/up runs), one forward transform of each
    requested kind.  ``palette`` is mutually exclusive with the
    pixel-geometry transforms (sub-byte packing changes the coded
    width)."""
    arr = np.asarray(img, dtype=np.int64)
    h, w = arr.shape[:2]
    has_alpha = arr.shape[2] == 4
    argb = np.zeros((h * w, 4), dtype=np.int32)
    argb[:, 0] = arr[:, :, 3].reshape(-1) if has_alpha else 255
    argb[:, 1] = arr[:, :, 0].reshape(-1)
    argb[:, 2] = arr[:, :, 1].reshape(-1)
    argb[:, 3] = arr[:, :, 2].reshape(-1)
    transforms: list[tuple] = []
    xsize = w
    px = argb
    if palette:
        if predictor_bits or color_transform or subtract_green:
            raise ValueError("palette excludes other transforms")
        keys = (
            (px[:, 0].astype(np.int64) << 24)
            | (px[:, 1].astype(np.int64) << 16)
            | (px[:, 2].astype(np.int64) << 8)
            | px[:, 3].astype(np.int64)
        )
        uniq, inv = np.unique(keys, return_inverse=True)
        psize = len(uniq)
        if psize > 256:
            raise ValueError("palette too large")
        pal = np.zeros((psize, 4), dtype=np.int32)
        pal[:, 0] = (uniq >> 24) & 0xFF
        pal[:, 1] = (uniq >> 16) & 0xFF
        pal[:, 2] = (uniq >> 8) & 0xFF
        pal[:, 3] = uniq & 0xFF
        delta = np.zeros_like(pal)
        delta[0] = pal[0]
        delta[1:] = (pal[1:] - pal[:-1]) & 0xFF
        if psize <= 2:
            pbits = 3
        elif psize <= 4:
            pbits = 2
        elif psize <= 16:
            pbits = 1
        else:
            pbits = 0
        transforms.append((3, (delta, psize)))
        idx = inv.reshape(h, w).astype(np.int32)
        if pbits:
            per = 1 << pbits
            bits = 8 >> pbits
            packed_w = (w + per - 1) // per
            packed = np.zeros((h, packed_w), dtype=np.int32)
            for i in range(per):
                col = idx[:, i::per]
                packed[:, : col.shape[1]] |= col << (i * bits)
            idx2 = packed
            xsize = packed_w
        else:
            idx2 = idx
        px = np.zeros((h * xsize, 4), dtype=np.int32)
        px[:, 0] = 255
        px[:, 2] = idx2.reshape(-1)
    if subtract_green:
        px = px.copy()
        px[:, 1] = (px[:, 1] - px[:, 2]) & 0xFF
        px[:, 3] = (px[:, 3] - px[:, 2]) & 0xFF
        transforms.append((2, None))
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bits = 4
        sw = (xsize + 15) >> bits
        sh = (h + 15) >> bits
        cte = np.zeros((sw * sh, 4), dtype=np.int32)
        cte[:, 0] = 255
        cte[:, 1] = r2b & 0xFF
        cte[:, 2] = g2b & 0xFF
        cte[:, 3] = g2r & 0xFF
        green = px[:, 2].astype(np.int8).astype(np.int32)
        red0 = px[:, 1].astype(np.int8).astype(np.int32)
        px = px.copy()
        d_g2r = (np.int32(np.int8(g2r)) * green) >> 5
        d_g2b = (np.int32(np.int8(g2b)) * green) >> 5
        d_r2b = (np.int32(np.int8(r2b)) * red0) >> 5
        px[:, 1] = (px[:, 1] - d_g2r) & 0xFF
        px[:, 3] = (px[:, 3] - d_g2b - d_r2b) & 0xFF
        transforms.append((1, (bits, sw, sh, cte)))
    if predictor_bits is not None:
        res, mimg = _forward_predictor(px, xsize, h, predictor_bits)
        bs = predictor_bits
        sw = (xsize + (1 << bs) - 1) >> bs
        sh = (h + (1 << bs) - 1) >> bs
        transforms.append((0, (bs, sw, sh, mimg)))
        px = res
    bw = _LsbWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    _write_image_stream(
        bw,
        px,
        xsize,
        h,
        True,
        transforms=transforms,
        cache_bits=cache_bits,
        lz77=lz77,
        meta_bits=meta_bits,
    )
    body = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
