"""ISO BMFF / MP4 container walker (ISO/IEC 14496-12, public spec) —
the video-container sibling of ``media_ogg.py`` behind the
``media.py`` plug-point.

Scope follows the FLAC/VP8/OGG posture: the CONTAINER parses natively
— the size+fourcc box grammar (including 64-bit ``largesize`` and
``size == 0`` to-end boxes), recursion through the standard container
boxes, ``ftyp`` brand, ``mvhd`` timescale/duration (both versions),
per-track ``hdlr`` handler and ``stsd`` sample-entry codec fourccs,
and ``mp4a`` channel/sample-rate fields — while DECODING any codec
payload inside raises the honest plug-point error (wired through
``media.numpy_codec``).  Corrupt structure (box overruns, truncated
headers) raises ``ValueError`` — the VP8/OGG bounds-check discipline.
"""

from __future__ import annotations

import struct

#: boxes whose payload is a sequence of child boxes
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta",
    b"mvex", b"moof", b"traf",
}


def walk_boxes(payload: bytes, start: int = 0, end: int | None = None):
    """Yield ``(fourcc, body_start, body_end, depth)`` for every box,
    depth-first.  Raises ``ValueError`` on truncated headers or boxes
    that overrun their parent."""
    stack = [(start, len(payload) if end is None else end, 0)]
    while stack:
        off, stop, depth = stack.pop()
        while off < stop:
            if off + 8 > stop:
                raise ValueError("truncated MP4 box header")
            (size,) = struct.unpack_from(">I", payload, off)
            typ = payload[off + 4: off + 8]
            body = off + 8
            if size == 1:
                if off + 16 > stop:
                    raise ValueError("truncated MP4 largesize header")
                (size,) = struct.unpack_from(">Q", payload, off + 8)
                body = off + 16
            elif size == 0:
                size = stop - off
            if size < body - off or off + size > stop:
                raise ValueError(
                    f"MP4 box {typ!r} overruns its parent at byte {off}"
                )
            yield typ, body, off + size, depth
            if typ in _CONTAINERS:
                # recurse: children first, then continue the siblings
                stack.append((off + size, stop, depth))
                off, stop, depth = body, off + size, depth + 1
                continue
            off += size


def mp4_stream_info(payload: bytes) -> dict:
    """Container-level description: ftyp brand, movie duration in
    seconds (mvhd), track handler/codec fourccs from each stsd, and
    channels/sample rate from the first ``mp4a`` audio sample entry.

    ``codec`` is the first video-ish track's sample-entry fourcc,
    falling back to the first track of any kind; ``codecs`` lists all
    of them in file order."""
    if payload[4:8] != b"ftyp":
        raise ValueError("not an MP4/ISO-BMFF stream (no ftyp box)")
    info = {
        "brand": None,
        "duration_s": None,
        "n_tracks": 0,
        "codec": None,
        "codecs": [],
        "channels": None,
        "sample_rate": None,
    }
    handlers: list[bytes] = []
    for typ, b0, b1, _depth in walk_boxes(payload):
        body = payload[b0:b1]
        if typ == b"ftyp" and len(body) >= 4:
            info["brand"] = body[:4].decode("latin1").strip()
        elif typ == b"mvhd" and len(body) >= 4:
            version = body[0]
            if version == 1 and len(body) >= 28:
                (scale,) = struct.unpack_from(">I", body, 20)
                (dur,) = struct.unpack_from(">Q", body, 24)
            elif len(body) >= 20:
                (scale,) = struct.unpack_from(">I", body, 12)
                (dur,) = struct.unpack_from(">I", body, 16)
            else:
                continue
            if scale:
                info["duration_s"] = round(dur / scale, 6)
        elif typ == b"trak":
            info["n_tracks"] += 1
        elif typ == b"hdlr" and len(body) >= 12:
            handlers.append(body[8:12])
        elif typ == b"stsd" and len(body) >= 16:
            # FullBox header (4) + entry_count (4), then sample entries
            # (each a box: size + fourcc)
            (n_entries,) = struct.unpack_from(">I", body, 4)
            off = 8
            for _ in range(n_entries):
                if off + 8 > len(body):
                    raise ValueError("truncated stsd sample entry")
                (esize,) = struct.unpack_from(">I", body, off)
                fourcc = body[off + 4: off + 8].decode("latin1").strip()
                info["codecs"].append(fourcc)
                if fourcc == "mp4a" and off + 36 <= len(body):
                    # AudioSampleEntry: 8 box hdr + 6 reserved + 2 dri
                    # + 8 reserved + 2 channelcount + 2 samplesize +
                    # 2 pre_defined + 2 reserved + 4 samplerate (16.16)
                    (ch,) = struct.unpack_from(">H", body, off + 24)
                    (rate,) = struct.unpack_from(">I", body, off + 32)
                    info["channels"] = ch
                    info["sample_rate"] = rate >> 16
                if esize < 8 or off + esize > len(body):
                    raise ValueError("stsd sample entry overrun")
                off += esize
    if info["codecs"]:
        video_like = [
            c for c, h in zip(info["codecs"], handlers + [b""] * 99)
            if h == b"vide"
        ]
        info["codec"] = (video_like or info["codecs"])[0]
    return info


def build_box(fourcc: bytes, body: bytes) -> bytes:
    """Assemble one spec-valid box (tests build fixture files)."""
    return struct.pack(">I", 8 + len(body)) + fourcc + body
