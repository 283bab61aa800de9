"""OGG container walker (RFC 3533) with Opus / Vorbis stream
identification (RFC 7845 "OpusHead"; Vorbis I spec ident header) —
the next crawl payload family after WebP behind the ``media.py``
codec plug-point.

Scope follows the FLAC/VP8 posture: the CONTAINER parses natively and
completely — page capture pattern, lacing/segment reassembly
(including packets continued across pages), the spec's CRC-32
(polynomial 0x04c11db7, no reflection, zero init/xorout) verified per
page — and the identification headers of the two codecs a web crawl
actually carries yield (codec, channels, sample_rate, pre_skip,
last_granule).  DSP decode of the compressed audio inside raises an
honest ``NotImplementedError`` naming the codec (wired through
``media.numpy_codec``), never silent garbage.

Reference parity: conte-to-fresco-etl has no media surface; this
module belongs to the training-data-pipeline extension (multimodal
ingest), sibling to media.py / media_webp.py / media_vp8.py.
"""

from __future__ import annotations

import struct

_CRC_TABLE: list[int] = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    """RFC 3533 page CRC: CRC-32 with polynomial 0x04c11db7, zero
    initial value, no bit reflection, no final xor (NOT the zlib
    crc32 — a real crawl file checks against this variant)."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


def build_ogg_page(
    serial: int,
    seq: int,
    granule: int,
    segments: list[bytes],
    header_type: int = 0,
) -> bytes:
    """Assemble one spec-valid OGG page (used by tests to build
    fixture streams the parser must round-trip): ``segments`` are the
    LACING segments (each <= 255 bytes; a packet is one or more
    segments, terminated by the first segment < 255 bytes)."""
    if len(segments) > 255:
        raise ValueError("an OGG page carries at most 255 segments")
    if any(len(s) > 255 for s in segments):
        raise ValueError("an OGG lacing segment is at most 255 bytes")
    header = (
        b"OggS"
        + b"\x00"
        + bytes([header_type])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(segments)])
        + bytes(len(s) for s in segments)
    )
    body = b"".join(segments)
    crc = ogg_crc(header + body)
    return header[:22] + struct.pack("<I", crc) + header[26:] + body


def parse_ogg(payload: bytes, verify_crc: bool = True) -> dict:
    """Walk every page of an OGG stream and reassemble packets.

    Returns ``{"pages": [...], "packets": [bytes, ...],
    "last_granule": int, "serials": set}``; each page dict carries
    (serial, seq, granule, header_type, n_segments, body_len).
    Raises ``ValueError`` on a bad capture pattern, truncated page,
    or CRC mismatch — corrupt crawl bytes fail loudly (the VP8
    bounds-check discipline)."""
    if payload[:4] != b"OggS":
        raise ValueError("not an OGG stream (no OggS capture pattern)")
    pages = []
    packets: list[bytes] = []
    pending = b""  # packet continued across pages
    last_granule = 0
    serials: set[int] = set()
    off = 0
    n = len(payload)
    while off < n:
        if payload[off: off + 4] != b"OggS":
            raise ValueError(f"bad page capture pattern at byte {off}")
        if off + 27 > n:
            raise ValueError("truncated OGG page header")
        version = payload[off + 4]
        if version != 0:
            raise ValueError(f"unsupported OGG version {version}")
        header_type = payload[off + 5]
        (granule,) = struct.unpack_from("<q", payload, off + 6)
        (serial,) = struct.unpack_from("<I", payload, off + 14)
        (seq,) = struct.unpack_from("<I", payload, off + 18)
        (crc,) = struct.unpack_from("<I", payload, off + 22)
        n_segs = payload[off + 26]
        seg_table = payload[off + 27: off + 27 + n_segs]
        if len(seg_table) < n_segs:
            raise ValueError("truncated OGG segment table")
        body_len = sum(seg_table)
        body_start = off + 27 + n_segs
        if body_start + body_len > n:
            raise ValueError("truncated OGG page body")
        page_bytes = payload[off: body_start + body_len]
        if verify_crc:
            zeroed = page_bytes[:22] + b"\x00\x00\x00\x00" + page_bytes[26:]
            if ogg_crc(zeroed) != crc:
                raise ValueError(f"OGG page CRC mismatch at byte {off}")
        if not (header_type & 0x01):
            # fresh page: any dangling continuation is a stream error,
            # but real muxers only set the flag on the continued page —
            # treat a pending tail without the flag as truncation
            if pending:
                raise ValueError("OGG packet continued without flag")
        body = payload[body_start: body_start + body_len]
        pos = 0
        for seg in seg_table:
            pending += body[pos: pos + seg]
            pos += seg
            if seg < 255:
                packets.append(pending)
                pending = b""
        pages.append(
            {
                "serial": serial,
                "seq": seq,
                "granule": granule,
                "header_type": header_type,
                "n_segments": n_segs,
                "body_len": body_len,
            }
        )
        serials.add(serial)
        if granule >= 0:
            last_granule = max(last_granule, granule)
        off = body_start + body_len
    return {
        "pages": pages,
        "packets": packets,
        "last_granule": last_granule,
        "serials": serials,
    }


#: RFC 6716 §3.1 Table 2 — TOC config number -> (mode, bandwidth,
#: samples per frame at 48 kHz).  Frame sizes are exact in samples
#: (2.5 ms = 120), so packet durations stay integer arithmetic.
_OPUS_CONFIGS: dict[int, tuple[str, str, int]] = {}
for _c in range(32):
    if _c < 12:  # SILK-only: NB/MB/WB x 10/20/40/60 ms
        _bw = ("nb", "mb", "wb")[_c // 4]
        _spf = (480, 960, 1920, 2880)[_c % 4]
        _OPUS_CONFIGS[_c] = ("silk", _bw, _spf)
    elif _c < 16:  # Hybrid: SWB/FB x 10/20 ms
        _bw = "swb" if _c < 14 else "fb"
        _spf = (480, 960)[_c % 2]
        _OPUS_CONFIGS[_c] = ("hybrid", _bw, _spf)
    else:  # CELT-only: NB/WB/SWB/FB x 2.5/5/10/20 ms
        _bw = ("nb", "wb", "swb", "fb")[(_c - 16) // 4]
        _spf = (120, 240, 480, 960)[_c % 4]
        _OPUS_CONFIGS[_c] = ("celt", _bw, _spf)


def opus_packet_info(packet: bytes) -> dict:
    """Decode an Opus packet's TOC (RFC 6716 §3.1-3.2) WITHOUT any
    DSP: ``(config, mode, bandwidth, stereo, n_frames,
    samples_per_frame, duration_samples, duration_ms)``.

    The TOC byte is ``config(5) | stereo(1) | code(2)``; the frame
    count comes from the code: 0 = one frame, 1/2 = two frames
    (CBR/VBR), 3 = the next byte's low 6 bits carry the count (its
    high bits flag VBR and padding).  A packet longer than the spec's
    120 ms ceiling, a zero frame count, or an empty packet raises
    ``ValueError`` — corrupt crawl bytes fail loudly."""
    if not packet:
        raise ValueError("empty Opus packet")
    toc = packet[0]
    config = toc >> 3
    stereo = bool((toc >> 2) & 0x01)
    code = toc & 0x03
    if code == 0:
        n_frames = 1
    elif code in (1, 2):
        n_frames = 2
    else:
        if len(packet) < 2:
            raise ValueError("Opus code-3 packet missing frame-count byte")
        n_frames = packet[1] & 0x3F
        if n_frames == 0:
            raise ValueError("Opus code-3 packet with zero frames")
    mode, bandwidth, spf = _OPUS_CONFIGS[config]
    duration = n_frames * spf
    if duration > 5760:  # 120 ms at 48 kHz (RFC 6716 §3.2.5)
        raise ValueError(
            f"Opus packet duration {duration} samples exceeds the "
            "120 ms ceiling"
        )
    return {
        "config": config,
        "mode": mode,
        "bandwidth": bandwidth,
        "stereo": stereo,
        "n_frames": n_frames,
        "samples_per_frame": spf,
        "duration_samples": duration,
        "duration_ms": duration / 48.0,
    }


def opus_stream_stats(packets: list[bytes]) -> dict:
    """Packet-level triage over a reassembled Opus packet stream
    (header and tags packets excluded by the caller): TOC-summed
    duration, mode/bandwidth histograms, stereo presence — the audio
    inventory a crawl pipeline needs WITHOUT running SILK/CELT DSP."""
    total = 0
    modes: dict[str, int] = {}
    bands: dict[str, int] = {}
    any_stereo = False
    for pkt in packets:
        info = opus_packet_info(pkt)
        total += info["duration_samples"]
        modes[info["mode"]] = modes.get(info["mode"], 0) + 1
        bands[info["bandwidth"]] = bands.get(info["bandwidth"], 0) + 1
        any_stereo = any_stereo or info["stereo"]
    return {
        "n_audio_packets": len(packets),
        "duration_samples": total,
        "duration_ms": total / 48.0,
        "modes": modes,
        "bandwidths": bands,
        "any_stereo": any_stereo,
    }


def ogg_stream_info(payload: bytes, verify_crc: bool = True) -> dict:
    """Container-level stream description: walk the pages, identify
    the codec from the first packet, and read its identification
    header.

    Opus (RFC 7845 ``OpusHead``): channels, pre_skip, input sample
    rate (Opus always DECODES at 48 kHz; granules tick at 48 kHz).
    Vorbis (ident header ``\\x01vorbis``): channels, sample rate.
    Unknown first packets report codec "unknown" with the container
    stats still populated."""
    parsed = parse_ogg(payload, verify_crc=verify_crc)
    info = {
        "codec": "unknown",
        "channels": None,
        "sample_rate": None,
        "pre_skip": None,
        "n_pages": len(parsed["pages"]),
        "n_packets": len(parsed["packets"]),
        "n_streams": len(parsed["serials"]),
        "last_granule": parsed["last_granule"],
    }
    if not parsed["packets"]:
        return info
    first = parsed["packets"][0]
    if first[:8] == b"OpusHead" and len(first) >= 19:
        info["codec"] = "opus"
        info["channels"] = first[9]
        (info["pre_skip"],) = struct.unpack_from("<H", first, 10)
        (info["sample_rate"],) = struct.unpack_from("<I", first, 12)
        # packet-level triage from the TOC bytes (RFC 6716): audio
        # packets follow OpusHead and the OpusTags comment header
        audio = parsed["packets"][1:]
        if audio and audio[0][:8] == b"OpusTags":
            audio = audio[1:]
        stats = opus_stream_stats(audio)
        info["duration_samples"] = stats["duration_samples"]
        info["duration_ms"] = stats["duration_ms"]
        info["modes"] = stats["modes"]
        info["bandwidths"] = stats["bandwidths"]
        # SILK LP-layer header triage (media_opus: §3.2 framing + §4.2
        # header bits): speech-activity and redundancy stats with no
        # DSP.  CELT-only packets carry no VAD bits; their activity is
        # unknown, and a stream of only CELT packets reports None.
        from conte_to_fresco_etl_spark.operators.media_opus import (
            opus_packet_activity,
        )

        vad = silk_frames = 0
        any_lbrr = False
        saw_silk = False
        try:
            for pkt in audio:
                act = opus_packet_activity(pkt)
                if act["vad_frames"] is not None:
                    saw_silk = True
                    vad += act["vad_frames"]
                    silk_frames += act["n_silk_frames"]
                    any_lbrr = any_lbrr or act["any_lbrr"]
        except ValueError:
            # §3.2 framing violation: the TOC-level stats above stand
            # on their own; activity is unknown, not zero
            saw_silk = False
        info["vad_frames"] = vad if saw_silk else None
        info["n_silk_frames"] = silk_frames if saw_silk else None
        info["any_lbrr"] = any_lbrr if saw_silk else None
        # the granule-delta duration (RFC 7845: granules tick PCM
        # samples at 48 kHz, offset by pre_skip) cross-checks the TOC
        # sum when the stream carries granules
        info["granule_duration_samples"] = max(
            0, parsed["last_granule"] - info["pre_skip"]
        )
    elif first[:7] == b"\x01vorbis" and len(first) >= 30:
        info["codec"] = "vorbis"
        info["channels"] = first[11]
        (info["sample_rate"],) = struct.unpack_from("<I", first, 12)
    return info
