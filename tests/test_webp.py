"""WebP VP8L lossless codec (operators/webp.py) — container, prefix
codes (simple + normal), transforms, color cache, palette bundling,
and LZ77 backward references with both distance forms. Oracles: the
encoder/decoder pair is pixel-exact across every feature combination,
and decoder-only features (LZ77, meta groups, color transform) are
pinned by hand-built bitstreams.

Extension surface: the binance reference has no media handling; this
backs the multimodal column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import struct
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pytest

from binance_data_pipeline_spark.operators.webp import (
    _DIST_MAP,
    _BitWriter,
    _write_prefix_code,
    decode_webp,
    encode_webp,
)


def _pal_img(rng, k, h, w):
    pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
    return pal[rng.integers(0, k, (h, w))]


def test_webp_roundtrip_exact_across_features():
    """Truecolor (with/without subtract-green), palettes at every
    bundling width (1/2/4/8-bit indices), color cache, the predictor
    transform, flat color (single-symbol codes), 1x1."""
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    grad = np.stack(
        [np.mgrid[0:33, 0:26][1] * 255 // 25,
         np.mgrid[0:33, 0:26][0] * 255 // 32,
         (np.mgrid[0:33, 0:26][0] + np.mgrid[0:33, 0:26][1]) * 3 % 256],
        axis=2,
    ).astype(np.uint8)
    cases = [
        (noise, {}),
        (noise, dict(subtract_green=False)),
        (_pal_img(rng, 2, 21, 19), {}),
        (_pal_img(rng, 4, 21, 19), {}),
        (_pal_img(rng, 16, 21, 19), {}),
        (_pal_img(rng, 200, 21, 19), {}),
        (grad, dict(palette="never")),
        (grad, dict(palette="never", cache_bits=6)),
        (noise, dict(palette="never", cache_bits=4)),
        (grad, dict(palette="never", predictor=True)),
        (grad, dict(palette="never", predictor=True, cache_bits=5)),
        (np.full((9, 9, 3), 123, np.uint8), dict(palette="never")),
        (np.full((9, 9, 3), 123, np.uint8), {}),
        (np.array([[[7, 200, 33]]], np.uint8), {}),
    ]
    for img, kw in cases:
        b = encode_webp(img, **kw)
        w, h, out = decode_webp(b)
        assert (w, h) == (img.shape[1], img.shape[0]), kw
        assert np.array_equal(out, img), kw


def test_webp_container_and_vp8_escape_hatch():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = encode_webp(img)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    assert b"VP8L" in data
    (riff_len,) = struct.unpack("<I", data[4:8])
    assert riff_len == len(data) - 8  # container length is exact

    lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack(
        "<I", 4
    ) + b"\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(lossy)


def test_webp_distance_map_prefix_matches_spec():
    """The generated 120-entry short-distance table must reproduce the
    spec's published (dx, dy) ordering — pinned for the head of the
    table, where real encoders spend nearly all their codes."""
    assert _DIST_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


def _vp8l_stream(body_bits_writer, w, h):
    """Wrap hand-written VP8L body bits in the header + container."""
    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)
    bw.bits(0, 3)
    bw.bits(0, 1)  # no transforms
    body_bits_writer(bw)
    data = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_lz77_backward_references_both_distance_forms():
    """Hand-built stream: 4 literal pixels then an LZ77 copy of the
    whole row — once with the neighbor-map code (0,1) (distance = w),
    once with the plain-distance form (code 120 + w). Both must
    reproduce row 0 as row 1."""
    w, h = 4, 2
    lits = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]

    def build(dist_is_map: bool):
        def body(bw):
            bw.bits(0, 1)  # no color cache
            bw.bits(0, 1)  # no meta
            greens = sorted({g for _, g, _ in lits})
            # green code: the 4 literal greens + length-prefix symbol 259
            # (value 4, no extra bits); alphabet 280
            glens = [0] * 280
            for g in greens:
                glens[g] = 3
            glens[256 + 3] = 3
            pad = [s for s in range(280) if glens[s] == 0][:3]
            for s in pad:
                glens[s] = 3  # make the code complete (8 x 3-bit)
            gcodes = _write_prefix_code(bw, glens)
            rlens = [0] * 256
            for r, _, _ in lits:
                rlens[r] = 2
            rcodes = _write_prefix_code(bw, rlens)
            blens = [0] * 256
            for _, _, b in lits:
                blens[b] = 2
            bcodes = _write_prefix_code(bw, blens)
            acodes = _write_prefix_code(bw, [1 if i == 255 else 0 for i in range(256)])
            if dist_is_map:
                # distance code symbol 0 -> value 1 -> neighbor (0,1)
                dcodes = _write_prefix_code(bw, [1] + [0] * 39)
                dist_sym, dist_extra = 0, None
            else:
                # plain distance w+120=124 -> prefix 13, 5 extra bits
                dcodes = _write_prefix_code(
                    bw, [1 if i == 13 else 0 for i in range(40)]
                )
                dist_sym, dist_extra = 13, (124 - 97, 5)  # 97 + 27 = 124
            for r, g, b in lits:
                ln, c = gcodes[g]
                bw.code(c, ln)
                ln, c = rcodes[r]
                bw.code(c, ln)
                ln, c = bcodes[b]
                bw.code(c, ln)
                ln, c = acodes[255]
                bw.code(c, ln)
            ln, c = gcodes[256 + 3]  # length prefix 3 -> 4 pixels
            bw.code(c, ln)
            ln, c = dcodes[dist_sym]
            bw.code(c, ln)
            if dist_extra is not None:
                bw.bits(dist_extra[0], dist_extra[1])

        return _vp8l_stream(body, w, h)

    expect = np.array([lits, lits], np.uint8)
    for form in (True, False):
        got = decode_webp(build(form))[2]
        assert np.array_equal(got, expect), ("map" if form else "plain")


def test_webp_meta_prefix_groups():
    """Hand-built stream with a meta entropy image splitting the canvas
    into two prefix-code groups (left tile red-ish, right tile blue-ish
    via different single-symbol codes)."""
    w, h = 8, 4  # meta bits 2 -> tiles of 4: two tiles horizontally

    def body(bw):
        bw.bits(0, 1)  # no color cache
        bw.bits(1, 1)  # meta prefix codes present
        bw.bits(0, 3)  # meta_bits = 2
        # meta image 2x1: group ids 0 and 1 in (r<<8)|g
        bw.bits(0, 1)  # meta image: no cache
        mg = _write_prefix_code(bw, [1, 1] + [0] * 278)  # greens 0,1
        mr = _write_prefix_code(bw, [1] + [0] * 255)  # red 0
        mb = _write_prefix_code(bw, [1] + [0] * 255)
        ma = _write_prefix_code(bw, [1 if i == 255 else 0 for i in range(256)])
        _write_prefix_code(bw, [1] + [0] * 39)
        for gid in (0, 1):
            ln, c = mg[gid]
            bw.code(c, ln)
            for codes, v in ((mr, 0), (mb, 0), (ma, 255)):
                ln, c = codes[v]
                bw.code(c, ln)
        # two groups, single-symbol codes each
        for g_, r_, b_ in ((10, 200, 1), (30, 2, 201)):
            _write_prefix_code(bw, [1 if i == g_ else 0 for i in range(280)])
            _write_prefix_code(bw, [1 if i == r_ else 0 for i in range(256)])
            _write_prefix_code(bw, [1 if i == b_ else 0 for i in range(256)])
            _write_prefix_code(bw, [1 if i == 255 else 0 for i in range(256)])
            _write_prefix_code(bw, [1] + [0] * 39)
        # pixels: all symbols are 0-bit -> no payload bits at all

    got = decode_webp(_vp8l_stream(body, w, h))[2]
    left = np.array([200, 10, 1], np.uint8)
    right = np.array([2, 30, 201], np.uint8)
    assert (got[:, :4] == left).all() and (got[:, 4:] == right).all()


def test_webp_color_transform_inverse():
    """Hand-built stream with a color transform element (g2r=16,
    g2b=-8, r2b=4 as int8): the decoder must add the deltas back in
    red-then-blue order."""
    w = h = 4
    g2r, g2b, r2b = 16, 248, 4  # 248 == -8 as int8
    orig = [(120, 60, 200), (10, 130, 5), (250, 0, 77), (33, 99, 181)]

    def s8(v):
        return v - 256 if v >= 128 else v

    def fwd(r, g, b):
        rt = (r - ((s8(g2r) * s8(g)) >> 5)) & 0xFF
        bt = (b - ((s8(g2b) * s8(g)) >> 5) - ((s8(r2b) * s8(r)) >> 5)) & 0xFF
        return rt, g, bt

    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)
    bw.bits(0, 3)
    bw.bits(1, 1)  # transform present
    bw.bits(1, 2)  # color transform
    bw.bits(2, 3)  # size_bits = 4 -> one 16x16 block covers the image
    bw.bits(0, 1)  # transform sub-image: no cache
    # element layout: r2b in RED, g2b in GREEN, g2r in BLUE
    _tg = _write_prefix_code(bw, [1 if i == g2b else 0 for i in range(280)])
    _tr = _write_prefix_code(bw, [1 if i == r2b else 0 for i in range(256)])
    _tb = _write_prefix_code(bw, [1 if i == g2r else 0 for i in range(256)])
    _ta = _write_prefix_code(bw, [1 if i == 255 else 0 for i in range(256)])
    _write_prefix_code(bw, [1] + [0] * 39)
    bw.bits(0, 1)  # no more transforms
    bw.bits(0, 1)  # main: no cache
    bw.bits(0, 1)  # main: no meta
    txs = [fwd(r, g, b) for r, g, b in orig]
    glens = [0] * 280
    rlens = [0] * 256
    blens = [0] * 256
    for rt, g, bt in txs:
        glens[g] = 2
        rlens[rt] = 2
        blens[bt] = 2
    gcodes = _write_prefix_code(bw, glens)
    rcodes = _write_prefix_code(bw, rlens)
    bcodes = _write_prefix_code(bw, blens)
    acodes = _write_prefix_code(bw, [1 if i == 255 else 0 for i in range(256)])
    _write_prefix_code(bw, [1] + [0] * 39)
    for i in range(w * h):
        rt, g, bt = txs[i % 4]
        for codes, v in ((gcodes, g), (rcodes, rt), (bcodes, bt), (acodes, 255)):
            ln, c = codes[v]
            bw.code(c, ln)
    data = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    got = decode_webp(payload)[2]
    expect = np.array([orig[i % 4] for i in range(w * h)], np.uint8).reshape(
        h, w, 3
    )
    assert np.array_equal(got, expect)


def test_webp_corruption_fuzz_never_hangs_or_garbles_silently():
    rng = np.random.default_rng(1234)
    img = _pal_img(rng, 16, 16, 16)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    for payload in (encode_webp(img), encode_webp(noise, cache_bits=4)):
        for _ in range(150):
            data = bytearray(payload)
            i = int(rng.integers(0, len(data)))
            data[i] ^= int(rng.integers(1, 256))
            try:
                decode_webp(bytes(data))
            except Exception as e:  # noqa: BLE001 — the contract IS "raises cleanly"
                assert isinstance(
                    e, (ValueError, NotImplementedError, IndexError,
                        KeyError, OverflowError, ZeroDivisionError,
                        MemoryError)
                ) or type(e).__module__ in ("zlib", "struct", "builtins"), (
                    type(e), e)


def test_webp_flows_through_multimodal_features_and_resize(spark):
    """image/webp routes natively for VP8L (no PIL, no quarantine);
    identical pixels to a PNG give the identical feature vector; the
    baseline resizer round-trips WebP→WebP."""
    from binance_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PNG_MIME,
        WEBP_MIME,
        baseline_resizer,
        default_decoder,
        encode_png,
        extract_features,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [
        (1, "image", PNG_MIME, encode_png(img), 16, 16, None),
        (2, "image", WEBP_MIME, encode_webp(img), 16, 16, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, default_decoder(), on_error="quarantine")
    by_id = {r["media_id"]: r for r in out.collect()}
    assert by_id[1]["quarantine_reason"] is None
    assert by_id[2]["quarantine_reason"] is None
    assert by_id[1]["feature"] == by_id[2]["feature"]

    small = baseline_resizer(encode_webp(img), WEBP_MIME, 8, 8)
    w, h, px = decode_webp(small)
    assert (w, h) == (8, 8) and np.array_equal(px, img[::2, ::2])
