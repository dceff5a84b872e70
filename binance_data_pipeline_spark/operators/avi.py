"""Dependency-free MJPEG-AVI container codec — makes the multimodal
VIDEO path real end-to-end: an AVI of Motion-JPEG frames parses to
timestamped JPEG payloads that operators/jpeg.py decodes, so
frame-sampling + feature extraction run un-stubbed on actual video
bytes (multimodal.extract_video_frames). H.264/VP9-class codecs need
libav and stay behind the injected-decoder escape hatch.

Container layout written and read: RIFF 'AVI ' with LIST hdrl
(avih main header + LIST strl with a 'vids'/'MJPG' strh and a
BITMAPINFOHEADER strf), LIST movi carrying one '00dc' chunk per frame
(a complete JFIF stream), and an idx1 index. The reader walks chunks
defensively (truncation and bad sizes raise ValueError) and derives
timestamps from the stream's rate/scale with the main-header
micro-seconds-per-frame as fallback.

Reference scope note: the binance reference pipeline has no media
handling (698 LoC of pandas/Kafka/dbt); this module extends the
multimodal-column surface the build brief requires.
"""

from __future__ import annotations

import struct

__all__ = ["decode_avi_frames", "decode_avi", "encode_avi_mjpeg"]

AVI_RIFF = b"RIFF"
AVI_SIG = b"AVI "


def _chunks(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError("corrupt AVI: chunk overruns its parent")
        yield tag, body_start, size
        pos = body_start + size + (size & 1)


def decode_avi_frames(payload: bytes, max_frames: int | None = None):
    """Parse an AVI into (w, h, fps, [(ts_ms, frame_bytes), ...]).
    Frame bytes are the raw codec payloads ('00dc'/'00db' chunks) — for
    MJPEG these are complete JPEG streams; other FourCCs are returned
    as-is with the fourcc so callers can route them (decode_avi raises
    NotImplementedError for non-MJPEG)."""
    if payload[:4] != AVI_RIFF or payload[8:12] != AVI_SIG:
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(8 + riff_size, len(payload))

    w = h = 0
    fourcc = b""
    us_per_frame = 0
    rate = scale = 0
    frames: list[tuple[int, bytes]] = []

    def walk_list(start: int, stop: int) -> None:
        nonlocal w, h, fourcc, us_per_frame, rate, scale
        for tag, off, size in _chunks(payload, start, stop):
            if tag == b"LIST":
                kind = payload[off : off + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk_list(off + 4, off + size)
            elif tag == b"avih" and size >= 40:
                (us_per_frame,) = struct.unpack("<I", payload[off : off + 4])
                w, h = struct.unpack("<II", payload[off + 32 : off + 40])
            elif tag == b"strh" and size >= 32:
                if payload[off : off + 4] == b"vids":
                    fourcc = payload[off + 4 : off + 8]
                    scale, rate = struct.unpack(
                        "<II", payload[off + 20 : off + 28]
                    )
            elif tag[2:4] in (b"dc", b"db"):
                if max_frames is None or len(frames) < max_frames:
                    frames.append((0, payload[off : off + size]))

    walk_list(12, end)
    if not frames:
        raise ValueError("corrupt AVI: no frame chunks")
    if rate and scale:
        fps = rate / scale
    elif us_per_frame:
        fps = 1_000_000 / us_per_frame
    else:
        fps = 25.0
    if not (0 < fps <= 1000):
        raise ValueError(f"corrupt AVI: implausible frame rate {fps}")
    frames = [
        (round(i * 1000 / fps), data) for i, (_, data) in enumerate(frames)
    ]
    return w, h, fps, fourcc, frames


def decode_avi(payload: bytes):
    """First frame of an MJPEG AVI as (w, h, HxWx3 uint8) — the image
    decode contract. Non-MJPEG FourCCs raise NotImplementedError (the
    libav escape hatch)."""
    from .jpeg import JPEG_SIG, decode_jpeg

    w, h, _fps, fourcc, frames = decode_avi_frames(payload, max_frames=1)
    data = frames[0][1]
    if fourcc not in (b"MJPG", b"mjpg") and not data.startswith(JPEG_SIG):
        raise NotImplementedError(
            f"AVI codec {fourcc!r} — inject a libav-backed decoder"
        )
    return decode_jpeg(data)


def encode_avi_mjpeg(jpeg_frames: list[bytes], w: int, h: int, fps: float = 25.0) -> bytes:
    """Assemble complete JPEG streams into an MJPEG AVI (one '00dc'
    chunk per frame + idx1 index). decode_avi_frames returns the exact
    same bytes per frame — the container roundtrip oracle."""
    if not jpeg_frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    if not (0 < fps <= 1000):
        raise ValueError(f"implausible frame rate {fps}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(jpeg_frames)
    scale, rate = 1000, round(fps * 1000)
    max_size = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<10I", round(1_000_000 / fps), 0, 0, 0x10, n, 0, 1, max_size, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, scale,
                                        rate, 0, n, max_size, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = bytearray(b"movi")
    offsets = []
    for f in jpeg_frames:
        offsets.append(len(movi_body))  # offset of the chunk within movi
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", bytes(movi_body))

    idx = bytearray()
    for off, f in zip(offsets, jpeg_frames):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
    body = AVI_SIG + hdrl + movi + chunk(b"idx1", bytes(idx))
    return AVI_RIFF + struct.pack("<I", len(body)) + body
