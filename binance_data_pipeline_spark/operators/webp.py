"""Dependency-free WebP lossless (VP8L) codec — the last named gap in
the multimodal codec tier (operators/multimodal.py): RIFF/WEBP
container (plain and VP8X-extended), and the full VP8L bitstream —
LSB-first bit packing, simple and normal (code-length-coded) prefix
codes, meta prefix groups, the color cache, LZ77 backward references
with the short-distance neighbor map, and all four transforms
(predictor, color, subtract-green, color-indexing with sub-byte pixel
bundling). Lossy VP8 chunks raise NotImplementedError toward the
injected-decoder (PIL) escape hatch.

What is per-spec, and what is inferred (no libwebp in this container
to cross-check; the tests therefore pin the encoder/decoder pair
bit-exactly and every structural feature via hand-built streams):

  * Bit order, header layout, prefix-code formats (simple + the
    19-symbol code-length code in its fixed order with 16/17/18
    repeats), LZ77 prefix/extra-bit scheme, color-cache hash
    (0x1e35a7bd multiplier), transform semantics and their inverse
    order follow the public VP8L specification.
  * The 120-entry short-distance neighbor map is GENERATED from the
    spec's construction (candidates dy=0,dx=1..8 plus dy=1..7,
    dx=-8..7, ordered by dx^2+dy^2 with larger dy first and positive
    dx before negative on ties) — the generated prefix matches the
    spec's published table as far as quoted in this module's tests.
  * The Select predictor's tie-break and bundled-pixel bit order
    (first pixel in the least-significant bits) are implemented per
    the spec's pseudocode as understood; both are exercised by the
    pair tests.

Reference scope note: the binance reference pipeline has no media
handling (698 LoC of pandas/Kafka/dbt); this module extends the
multimodal-column surface the build brief requires.
"""

from __future__ import annotations

import struct

__all__ = ["decode_webp", "encode_webp"]

WEBP_RIFF = b"RIFF"
WEBP_SIG = b"WEBP"

#: code-length-code symbol order (spec constant)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _dist_map() -> list:
    """The 120 (dx, dy) short-distance codes (see module docstring)."""
    cands = [(dx, 0) for dx in range(1, 9)]
    cands += [(dx, dy) for dy in range(1, 8) for dx in range(-8, 8)]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return cands[:120]


_DIST_MAP = _dist_map()


class _BitReader:
    """LSB-first bit reader (DEFLATE convention)."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        i = self.pos
        if (i >> 3) >= len(self.d):
            raise ValueError("corrupt VP8L: bitstream overrun")
        self.pos = i + 1
        return (self.d[i >> 3] >> (i & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for k in range(n):
            v |= self.bit() << k
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def bits(self, value: int, n: int) -> None:
        self._acc |= (value & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def code(self, code: int, length: int) -> None:
        """Prefix codes are written MSB-of-code first."""
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def tobytes(self) -> bytes:
        out = bytearray(self.out)
        if self._n:
            out.append(self._acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code), DEFLATE canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    for ln in range(1, max(lengths, default=0) + 1):
        for sym, l_ in enumerate(lengths):
            if l_ == ln:
                out[sym] = (ln, code)
                code += 1
        code <<= 1
    return out


class _PrefixCode:
    """Decode helper: either a 0-bit trivial code (one symbol) or a
    (length, code) -> symbol walk reading MSB-of-code first."""

    def __init__(self, lengths=None, single=None, pair=None) -> None:
        self.single = single
        self.pair = pair  # (sym0, sym1): 1-bit code
        self.table = None
        if lengths is not None:
            nz = [l_ for l_ in lengths if l_]
            if not nz:
                raise ValueError("corrupt VP8L: empty prefix code")
            if len(nz) == 1:
                self.single = lengths.index(1) if 1 in lengths else None
                if self.single is None:
                    # single symbol must have length 1 per canonical rules;
                    # accept any declared length as the trivial code
                    self.single = next(
                        i for i, l_ in enumerate(lengths) if l_
                    )
                return
            if sum(1 << (15 - l_) for l_ in nz) != 1 << 15:
                raise ValueError("corrupt VP8L: non-complete prefix code")
            self.table = {
                (ln, code): sym
                for sym, (ln, code) in _canonical(lengths).items()
            }
            self.maxlen = max(nz)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        if self.pair is not None:
            return self.pair[br.bit()]
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt VP8L: no prefix code matched")


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.bit():  # simple code
        n_sym = br.bit() + 1
        if br.bit():  # first symbol on 8 bits
            s0 = br.bits(8)
        else:
            s0 = br.bit()
        if n_sym == 2:
            s1 = br.bits(8)
            if max(s0, s1) >= alphabet:
                raise ValueError("corrupt VP8L: simple code symbol range")
            return _PrefixCode(pair=(s0, s1))
        if s0 >= alphabet:
            raise ValueError("corrupt VP8L: simple code symbol range")
        return _PrefixCode(single=s0)
    # normal: code-length code, then symbol lengths
    n_clc = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(n_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _PrefixCode(lengths=clc_lengths)
    if br.bit():  # limited number of coded symbols
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            if i + rep > alphabet:
                raise ValueError("corrupt VP8L: code length repeat overrun")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
        if i > alphabet:
            raise ValueError("corrupt VP8L: code length overrun")
    return _PrefixCode(lengths=lengths)


# ---------------------------------------------------------------------------
# Entropy-coded image decode (shared by main + sub-images)
# ---------------------------------------------------------------------------


def _lz77_value(br: _BitReader, prefix: int) -> int:
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.bits(extra) + 1


def _plane_to_distance(code: int, w: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(dy * w + dx, 1)


def _cache_hash(px: int, bits: int) -> int:
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(br: _BitReader, w: int, h: int, main: bool):
    """Decode one entropy-coded ARGB image of w*h pixels into a flat
    uint32 array. For the main image, meta prefix groups are allowed;
    every image may carry a color cache."""
    import numpy as np

    cache_bits = 0
    if br.bit():  # color cache (read BEFORE the meta-prefix bit)
        cache_bits = br.bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"corrupt VP8L: color cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if main and br.bit():  # meta prefix codes (entropy image)
        meta_bits = br.bits(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_px = _decode_entropy_image(br, mw, mh, main=False)
        meta = (((meta_px >> 16) & 0xFF) << 8 | ((meta_px >> 8) & 0xFF)).astype(
            np.int64
        )
        n_groups = int(meta.max()) + 1
        meta_w = mw

    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + (1 << cache_bits if cache_bits else 0))
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    npix = w * h
    out = np.zeros(npix, np.uint32)
    pos = 0
    while pos < npix:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            if gi >= n_groups:
                raise ValueError("corrupt VP8L: meta group out of range")
            green, red, blue, alpha, dist = groups[gi]
        else:
            green, red, blue, alpha, dist = groups[0]
        s = green.read(br)
        if s < 256:
            r = red.read(br)
            b = blue.read(br)
            a = alpha.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[_cache_hash(px, cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _lz77_value(br, s - 256)
            dcode = _lz77_value(br, dist.read(br))
            d = _plane_to_distance(dcode, w)
            if d > pos or pos + length > npix:
                raise ValueError("corrupt VP8L: backward reference range")
            for _ in range(length):
                px = int(out[pos - d])
                out[pos] = px
                if cache is not None:
                    cache[_cache_hash(px, cache_bits)] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("corrupt VP8L: cache symbol without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# Transforms (inverse, decode side)
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return ((a & 0xFF) + (b & 0xFF)) >> 1


def _predict(mode: int, l, t, tl, tr):
    """One of the 14 predictors, applied per channel (values are full
    ARGB uint32)."""

    def per_channel(f):
        v = 0
        for sh in (24, 16, 8, 0):
            v |= (f((l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF,
                    (tr >> sh) & 0xFF) & 0xFF) << sh
        return v

    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return per_channel(lambda a, b, c, d: _avg2(_avg2(a, d), b))
    if mode == 6:
        return per_channel(lambda a, b, c, d: _avg2(a, c))
    if mode == 7:
        return per_channel(lambda a, b, c, d: _avg2(a, b))
    if mode == 8:
        return per_channel(lambda a, b, c, d: _avg2(c, b))
    if mode == 9:
        return per_channel(lambda a, b, c, d: _avg2(b, d))
    if mode == 10:
        return per_channel(
            lambda a, b, c, d: _avg2(_avg2(a, c), _avg2(b, d))
        )
    if mode == 11:  # Select: gradient distance, tie prefers TOP
        pl = pt = 0
        for sh in (24, 16, 8, 0):
            a, b, c = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
            p = a + b - c
            pl += abs(p - a)
            pt += abs(p - b)
        return t if pt <= pl else l
    if mode == 12:  # ClampAddSubtractFull
        return per_channel(
            lambda a, b, c, d: min(255, max(0, a + b - c))
        )
    if mode == 13:  # ClampAddSubtractHalf (C-style truncating /2)
        def f(a, b, c, d):
            ave = _avg2(a, b)
            diff = ave - c
            half = diff // 2 if diff >= 0 else -((-diff) // 2)
            return min(255, max(0, ave + half))

        return per_channel(f)
    raise ValueError(f"corrupt VP8L: predictor mode {mode}")


def _inverse_predictor(argb, w: int, h: int, modes, bits: int):
    mw = -(-w // (1 << bits))
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(argb[pos - 1])  # left
        elif x == 0:
            pred = int(argb[pos - w])  # top
        else:
            mode = (int(modes[(y >> bits) * mw + (x >> bits)]) >> 8) & 0xFF
            # rightmost column: pos-w+1 lands on the CURRENT row's first
            # (already decoded) pixel — the spec's contiguous-buffer rule
            tr = int(argb[pos - w + 1])
            pred = _predict(
                mode, int(argb[pos - 1]), int(argb[pos - w]),
                int(argb[pos - w - 1]), tr,
            )
        cur = int(argb[pos])
        px = 0
        for sh in (24, 16, 8, 0):
            px |= ((((cur >> sh) + (pred >> sh)) & 0xFF) << sh)
        argb[pos] = px
    return argb


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inverse_color_transform(argb, w: int, h: int, elems, bits: int):
    mw = -(-w // (1 << bits))
    for pos in range(w * h):
        x, y = pos % w, pos // w
        e = int(elems[(y >> bits) * mw + (x >> bits)])
        # element layout: g2r in the BLUE channel, g2b in GREEN,
        # r2b in RED (the libwebp ColorCodeToMultipliers order)
        g2r = _s8(e & 0xFF)
        g2b = _s8((e >> 8) & 0xFF)
        r2b = _s8((e >> 16) & 0xFF)
        px = int(argb[pos])
        g = _s8((px >> 8) & 0xFF)
        r = ((px >> 16) & 0xFF) + ((g2r * g) >> 5)
        r &= 0xFF
        b = (px & 0xFF) + ((g2b * g) >> 5) + ((r2b * _s8(r)) >> 5)
        b &= 0xFF
        argb[pos] = (px & 0xFF00FF00) | (r << 16) | b
    return argb


def _inverse_subtract_green(argb):
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) & 0xFF) + g
    b = (argb & 0xFF) + g
    return (argb & 0xFF00FF00) | ((r & 0xFF) << 16) | (b & 0xFF)


def _bundle_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inverse_color_indexing(argb, w: int, h: int, packed_w: int, palette):
    import numpy as np

    wb = _bundle_bits(len(palette))
    out = np.zeros(w * h, np.uint32)
    if wb == 0:
        idx = (argb >> 8) & 0xFF
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("corrupt VP8L: palette index out of range")
        return palette[idx]
    per = 1 << wb  # pixels per packed unit
    bpp = 8 >> wb
    mask = (1 << bpp) - 1
    for y in range(h):
        for x in range(w):
            unit = int(argb[y * packed_w + (x >> wb)])
            green = (unit >> 8) & 0xFF
            j = x & (per - 1)
            i = (green >> (j * bpp)) & mask
            if i >= len(palette):
                raise ValueError("corrupt VP8L: palette index out of range")
            out[y * w + x] = palette[i]
    return out


# ---------------------------------------------------------------------------
# Container + full decode
# ---------------------------------------------------------------------------


def decode_webp(payload: bytes):
    """Decode a WebP to (w, h, HxWx3 uint8). VP8L (lossless) decodes
    natively, plain or inside a VP8X container; lossy VP8 raises
    NotImplementedError (PIL escape hatch)."""
    import numpy as np

    if payload[:4] != WEBP_RIFF or payload[8:12] != WEBP_SIG:
        raise ValueError("not a WebP payload")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("corrupt WebP: truncated chunk")
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) — inject a PIL-backed decoder"
            )
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("corrupt WebP: no VP8L/VP8 chunk")
    if not vp8l or vp8l[0] != 0x2F:
        raise ValueError("corrupt VP8L: bad signature byte")

    br = _BitReader(vp8l[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise NotImplementedError("VP8L version != 0")
    if w * h > 1 << 26:
        raise ValueError(f"implausible WebP dimensions {w}x{h}")

    # transforms (main image only), each at most once, reading order
    transforms = []
    cur_w = w
    seen = set()
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("corrupt VP8L: repeated transform")
        seen.add(ttype)
        if ttype == 2:  # subtract green
            transforms.append((2, None, None))
        elif ttype in (0, 1):  # predictor / color
            bits = br.bits(3) + 2
            mw = -(-cur_w // (1 << bits))
            mh = -(-h // (1 << bits))
            sub = _decode_entropy_image(br, mw, mh, main=False)
            transforms.append((ttype, bits, sub))
        else:  # color indexing
            n_colors = br.bits(8) + 1
            deltas = _decode_entropy_image(br, n_colors, 1, main=False)
            pal = np.zeros(n_colors, np.uint32)
            prev = 0
            for i in range(n_colors):
                d = int(deltas[i])
                px = 0
                for sh in (24, 16, 8, 0):
                    px |= ((((prev >> sh) + (d >> sh)) & 0xFF) << sh)
                pal[i] = px
                prev = px
            wb = _bundle_bits(n_colors)
            packed_w = -(-cur_w // (1 << wb))
            transforms.append((3, (cur_w, packed_w), pal))
            cur_w = packed_w

    argb = _decode_entropy_image(br, cur_w, h, main=True)

    for ttype, p1, p2 in reversed(transforms):
        if ttype == 3:
            full_w, packed_w = p1
            argb = _inverse_color_indexing(argb, full_w, h, packed_w, p2)
            cur_w = full_w
        elif ttype == 2:
            argb = _inverse_subtract_green(argb)
        elif ttype == 1:
            argb = _inverse_color_transform(argb, cur_w, h, p2, p1)
        else:
            argb = _inverse_predictor(argb, cur_w, h, p2, p1)

    px = np.zeros((h, w, 3), np.uint8)
    grid = argb.reshape(h, w)
    px[:, :, 0] = (grid >> 16) & 0xFF
    px[:, :, 1] = (grid >> 8) & 0xFF
    px[:, :, 2] = grid & 0xFF
    return w, h, px


# ---------------------------------------------------------------------------
# Encoder (VP8L, lossless — roundtrip oracle + structural test vectors)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Depth-limited Huffman code lengths (package-merge would be
    optimal; repeated frequency-halving on overflow is close enough and
    always terminates)."""
    import heapq

    n = len(freqs)
    while True:
        heap = []
        for i, f in enumerate(freqs):
            if f:
                heap.append((f, i, (i,)))
        if not heap:
            return [0] * n
        if len(heap) == 1:
            out = [0] * n
            out[heap[0][1]] = 1
            return out
        heapq.heapify(heap)
        depth = {}
        seq = 0
        while len(heap) > 1:
            f1, _, s1 = heapq.heappop(heap)
            f2, _, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                depth[s] = depth.get(s, 0) + 1
            seq += 1
            heapq.heappush(heap, (f1 + f2, n + seq, s1 + s2))
        if max(depth.values()) <= max_len:
            out = [0] * n
            for s, d in depth.items():
                out[s] = d
            return out
        freqs = [(f + 1) >> 1 if f else 0 for f in freqs]


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> dict:
    """Write a prefix code (simple form when <=2 symbols, normal
    otherwise); returns symbol -> (length, code) for the payload."""
    nz = [i for i, l_ in enumerate(lengths) if l_]
    if len(nz) == 1 and nz[0] < 256:
        s0 = nz[0]
        bw.bits(1, 1)  # simple
        bw.bits(0, 1)  # one symbol
        if s0 < 2:
            bw.bits(0, 1)
            bw.bits(s0, 1)
        else:
            bw.bits(1, 1)
            bw.bits(s0, 8)
        return {s0: (0, 0)}
    if len(nz) == 2:
        s0, s1 = nz
        if s0 < 256 and s1 < 256:
            bw.bits(1, 1)  # simple
            bw.bits(1, 1)  # two symbols
            if s0 < 2:
                bw.bits(0, 1)
                bw.bits(s0, 1)
            else:
                bw.bits(1, 1)
                bw.bits(s0, 8)
            bw.bits(s1, 8)
            return {s0: (1, 0), s1: (1, 1)}
    bw.bits(0, 1)  # normal
    # symbol lengths -> code-length-code stream (16/17/18 repeats)
    events = []  # (clc_symbol, extra_value, extra_bits)
    i = 0
    n = len(lengths)
    prev_nz = 8
    while i < n:
        l_ = lengths[i]
        if l_ == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 11 + 127)
                events.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 3 + 7)
                events.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                events.append((0, 0, 0))
            i = j
            continue
        events.append((l_, 0, 0))
        prev = l_
        i += 1
        run = 0
        while i + run < n and lengths[i + run] == prev:
            run += 1
        used = 0
        while run - used >= 3:
            r = min(run - used, 3 + 3)
            events.append((16, r - 3, 2))
            used += r
        i += used
    clc_freq = [0] * 19
    for s, _, _ in events:
        clc_freq[s] += 1
    clc_lengths = _huffman_lengths(clc_freq, 7)
    if sum(1 for l_ in clc_lengths if l_) == 1:
        # a single-symbol code-length code cannot be read back (the
        # canonical reader needs length >= 1 and completeness); force a
        # second symbol with an unused entry
        only = next(i for i, l_ in enumerate(clc_lengths) if l_)
        clc_lengths[only] = 1
        clc_lengths[0 if only != 0 else 1] = 1
    n_clc = 19
    while n_clc > 4 and clc_lengths[_CLC_ORDER[n_clc - 1]] == 0:
        n_clc -= 1
    bw.bits(n_clc - 4, 4)
    for i in range(n_clc):
        bw.bits(clc_lengths[_CLC_ORDER[i]], 3)
    clc_codes = _canonical(clc_lengths)
    bw.bits(0, 1)  # no max-symbol limit: full alphabet coded
    for s, extra, ebits in events:
        ln, code = clc_codes[s]
        bw.code(code, ln)
        if ebits:
            bw.bits(extra, ebits)
    if len(nz) == 1:
        # the decoder reads a single-symbol code with ZERO payload bits
        return {nz[0]: (0, 0)}
    return _canonical(lengths)


def encode_webp(
    pixels, palette: str = "auto", subtract_green: bool = True,
    cache_bits: int = 0, predictor: bool = False,
) -> bytes:
    """Encode an HxWx3 uint8 RGB array as lossless WebP (VP8L).
    Pixel-exact roundtrip. ``palette``: "auto" uses color-indexing
    (with sub-byte bundling) when <=256 distinct colors, "never"
    disables it, "force" raises if >256 colors. ``cache_bits`` > 0
    enables the color cache (1-11). ``predictor`` applies the
    left-predictor transform (mode 1 everywhere) — these options exist
    to exercise every decoder path with real streams."""
    import numpy as np

    px = np.asarray(pixels, np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_webp expects an HxWx3 RGB array")
    h, w, _ = px.shape
    if not (0 < w <= 16384 and 0 < h <= 16384):
        raise ValueError(f"dimensions out of VP8L range: {w}x{h}")

    argb = (
        (0xFF << 24)
        | (px[:, :, 0].astype(np.uint32) << 16)
        | (px[:, :, 1].astype(np.uint32) << 8)
        | px[:, :, 2].astype(np.uint32)
    ).reshape(-1)

    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)  # no alpha
    bw.bits(0, 3)  # version

    colors = np.unique(argb)
    use_palette = (
        palette in ("auto", "force") and len(colors) <= 256
    )
    if palette == "force" and not use_palette:
        raise ValueError(f"{len(colors)} colors exceed the 256-entry palette")

    cur_w = w
    if use_palette:
        bw.bits(1, 1)
        bw.bits(3, 2)  # color indexing
        bw.bits(len(colors) - 1, 8)
        lut = {int(c): i for i, c in enumerate(colors)}
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= ((((int(c) >> sh) - (prev >> sh)) & 0xFF) << sh)
            deltas.append(d)
            prev = int(c)
        _encode_entropy_image(
            bw, np.array(deltas, np.uint32), len(colors), 1, 0
        )
        wb = _bundle_bits(len(colors))
        idx = np.vectorize(lut.get)(argb.astype(np.int64)).reshape(h, w)
        if wb:
            per = 1 << wb
            bpp = 8 >> wb
            packed_w = -(-w // per)
            packed = np.zeros((h, packed_w), np.uint32)
            for j in range(per):
                cols = idx[:, j::per]
                packed[:, : cols.shape[1]] |= cols.astype(np.uint32) << (
                    j * bpp
                )
            cur_w = packed_w
            body = (0xFF000000 | (packed << 8)).reshape(-1).astype(np.uint32)
        else:
            body = (0xFF000000 | (idx.astype(np.uint32) << 8)).reshape(-1)
    else:
        body = argb.copy()
        if predictor:
            bw.bits(1, 1)
            bw.bits(0, 2)  # predictor transform
            bits = 4
            bw.bits(bits - 2, 3)
            mw = -(-w // (1 << bits))
            mh = -(-h // (1 << bits))
            # mode 1 (left) everywhere, stored in the green channel
            modes = np.full(mw * mh, 0xFF000000 | (1 << 8), np.uint32)
            _encode_entropy_image(bw, modes, mw, mh, 0)
            res = body.reshape(h, w).astype(np.int64)
            out = np.zeros_like(res)
            for pos_y in range(h):
                for pos_x in range(w):
                    pos = pos_y * w + pos_x
                    if pos == 0:
                        pred = 0xFF000000
                    elif pos_y == 0:
                        pred = int(res[0, pos_x - 1])
                    elif pos_x == 0:
                        pred = int(res[pos_y - 1, 0])
                    else:
                        pred = int(res[pos_y, pos_x - 1])  # mode 1
                    cur = int(res[pos_y, pos_x])
                    v = 0
                    for sh in (24, 16, 8, 0):
                        v |= ((((cur >> sh) - (pred >> sh)) & 0xFF) << sh)
                    out[pos_y, pos_x] = v
            body = out.reshape(-1).astype(np.uint32)
        if subtract_green:
            bw.bits(1, 1)
            bw.bits(2, 2)  # subtract green
            g = (body >> 8) & 0xFF
            r = (((body >> 16) & 0xFF) - g) & 0xFF
            b = ((body & 0xFF) - g) & 0xFF
            body = (body & 0xFF00FF00) | (r << 16) | b
    bw.bits(0, 1)  # no more transforms

    _encode_entropy_image(bw, body, cur_w, h, cache_bits, is_main=True)

    data = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    riff = WEBP_RIFF + struct.pack("<I", 4 + len(chunk)) + WEBP_SIG + chunk
    return riff


def _encode_entropy_image(
    bw, argb, w: int, h: int, cache_bits: int, is_main: bool = False
) -> None:
    """Literal + optional-color-cache entropy coding, one prefix-code
    group (no meta groups, no LZ77 on the encode side — the decoder
    handles those; the tests build LZ77/meta streams by hand). Only the
    main image carries the meta-prefix bit, mirroring the decoder."""
    if cache_bits:
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"cache_bits out of range: {cache_bits}")
        bw.bits(1, 1)
        bw.bits(cache_bits, 4)
    else:
        bw.bits(0, 1)
    if is_main:
        bw.bits(0, 1)  # no meta prefix codes

    cache = [None] * (1 << cache_bits) if cache_bits else None
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)

    # one histogram pass (emitting cache hits greedily), one write pass
    syms = []  # (channel, value): channel 0=green-code 1=r 2=b 3=a
    gfreq = [0] * green_alpha
    rfreq = [0] * 256
    bfreq = [0] * 256
    afreq = [0] * 256
    for v in argb:
        v = int(v)
        if cache is not None:
            hidx = _cache_hash(v, cache_bits)
            if cache[hidx] == v:
                syms.append((0, 280 + hidx))
                gfreq[280 + hidx] += 1
                continue
            cache[hidx] = v
        a, r, g, b = (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF
        syms.append((1, (g, r, b, a)))
        gfreq[g] += 1
        rfreq[r] += 1
        bfreq[b] += 1
        afreq[a] += 1

    gcodes = _write_prefix_code(bw, _huffman_lengths(gfreq))
    rcodes = _write_prefix_code(bw, _huffman_lengths(rfreq))
    bcodes = _write_prefix_code(bw, _huffman_lengths(bfreq))
    acodes = _write_prefix_code(bw, _huffman_lengths(afreq))
    # distance code never used, but must be present: single symbol 0
    _write_prefix_code(bw, [1] + [0] * 39)

    for kind, val in syms:
        if kind == 0:
            ln, code = gcodes[val]
            bw.code(code, ln)
        else:
            g, r, b, a = val
            for codes, v in ((gcodes, g), (rcodes, r), (bcodes, b), (acodes, a)):
                ln, code = codes[v]
                bw.code(code, ln)
