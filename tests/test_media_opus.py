"""Opus payload slice (RFC 6716): §3.2 framing rules, the §4.1 range
coder (round-trip against the in-repo encoder twin — no system libopus
exists to interop with, the FLAC posture), and the §4.2 SILK LP-layer
header bits on authored bit-exact fixtures, composed end-to-end
through an OGG-Opus container fixture."""

from __future__ import annotations

import random

import pytest

from conte_to_fresco_etl_spark.operators.media_ogg import (
    build_ogg_page,
    ogg_stream_info,
    opus_packet_info,
)
from conte_to_fresco_etl_spark.operators.media_opus import (
    RangeDecoder,
    RangeEncoder,
    SILK_LBRR_FLAGS_2_ICDF,
    SILK_LBRR_FLAGS_3_ICDF,
    SILK_TYPE_NO_VAD_ICDF,
    SILK_TYPE_VAD_ICDF,
    opus_packet_activity,
    opus_split_frames,
    silk_header_info,
)

# ---------------------------------------------------------------------------
# §4.1 range coder
# ---------------------------------------------------------------------------


def test_range_coder_round_trip_property():
    """500 random interleavings of bit_logp / icdf / generic / raw-bit
    symbols must decode back exactly — the encoder is the decoder's
    inverse by construction, and this pins both against each other."""
    rnd = random.Random(0xC0DEC)
    tables = [
        SILK_TYPE_VAD_ICDF,
        SILK_TYPE_NO_VAD_ICDF,
        SILK_LBRR_FLAGS_2_ICDF,
        SILK_LBRR_FLAGS_3_ICDF,
    ]
    for _ in range(500):
        ops = []
        enc = RangeEncoder()
        for _ in range(rnd.randint(1, 60)):
            kind = rnd.choice(["bit", "icdf", "enc", "raw"])
            if kind == "bit":
                b, lp = rnd.randint(0, 1), rnd.randint(1, 7)
                enc.encode_bit_logp(b, lp)
                ops.append(("bit", lp, b))
            elif kind == "icdf":
                t = rnd.choice(tables)
                k = rnd.randrange(len(t))
                prev = 256 if k == 0 else t[k - 1]
                if prev == t[k]:  # zero-probability symbol: unencodable
                    continue
                enc.encode_icdf(k, t)
                ops.append(("icdf", t, k))
            elif kind == "enc":
                ft = rnd.randint(2, 300)
                fl = rnd.randrange(ft)
                fh = rnd.randint(fl + 1, ft)
                enc.encode(fl, fh, ft)
                ops.append(("enc", (fl, fh, ft)))
            else:
                n = rnd.randint(1, 12)
                v = rnd.randrange(1 << n)
                enc.encode_raw_bits(v, n)
                ops.append(("raw", n, v))
        dec = RangeDecoder(enc.finish())
        for op in ops:
            if op[0] == "bit":
                assert dec.decode_bit_logp(op[1]) == op[2]
            elif op[0] == "icdf":
                assert dec.decode_icdf(op[1]) == op[2]
            elif op[0] == "enc":
                fl, fh, ft = op[1]
                fs = dec.decode(ft)
                assert fl <= fs < fh
                dec.update(fl, fh, ft)
            else:
                assert dec.decode_raw_bits(op[1]) == op[2]


def test_range_coder_carry_propagation():
    """Force the carry path: a long run of maximum-probability-mass
    symbols drives ``low`` toward all-ones so a final increment must
    ripple through buffered 0xFF bytes."""
    enc = RangeEncoder()
    for _ in range(64):
        enc.encode(254, 256, 256)  # top slice: low accrues 0xFE... runs
    enc.encode_bit_logp(1, 1)
    data = enc.finish()
    dec = RangeDecoder(data)
    for _ in range(64):
        fs = dec.decode(256)
        assert 254 <= fs < 256
        dec.update(254, 256, 256)
    assert dec.decode_bit_logp(1) == 1


def test_icdf_tables_are_valid():
    """Each iCDF table must be non-increasing and 0-terminated (the
    decoder's loop relies on termination for any coded value)."""
    for t in (
        SILK_TYPE_VAD_ICDF,
        SILK_TYPE_NO_VAD_ICDF,
        SILK_LBRR_FLAGS_2_ICDF,
        SILK_LBRR_FLAGS_3_ICDF,
    ):
        assert all(a >= b for a, b in zip(t, t[1:]))
        assert t[-1] == 0
        assert t[0] <= 255


# ---------------------------------------------------------------------------
# §3.2 framing
# ---------------------------------------------------------------------------


def _toc(config: int, stereo: bool, code: int) -> int:
    return (config << 3) | (int(stereo) << 2) | code


def test_framing_code0_single_frame():
    pkt = bytes([_toc(0, False, 0)]) + b"\x01\x02\x03"
    out = opus_split_frames(pkt)
    assert out["frames"] == [b"\x01\x02\x03"]
    assert out["padding_bytes"] == 0 and not out["vbr"]


def test_framing_code1_equal_split_and_r3():
    pkt = bytes([_toc(0, False, 1)]) + b"\xaa\xbb\xcc\xdd"
    out = opus_split_frames(pkt)
    assert out["frames"] == [b"\xaa\xbb", b"\xcc\xdd"]
    with pytest.raises(ValueError):  # odd payload violates R3
        opus_split_frames(bytes([_toc(0, False, 1)]) + b"\x01\x02\x03")


def test_framing_code2_explicit_first_length():
    pkt = bytes([_toc(0, False, 2), 2]) + b"\x01\x02\x03\x04\x05"
    out = opus_split_frames(pkt)
    assert out["frames"] == [b"\x01\x02", b"\x03\x04\x05"]
    # two-byte length: 252 + 1*4 = 256 exceeds remaining -> R4
    with pytest.raises(ValueError):
        opus_split_frames(bytes([_toc(0, False, 2), 252, 1]) + b"\x00" * 10)


def test_framing_code3_cbr_vbr_padding():
    # CBR: 3 frames, 6 payload bytes
    pkt = bytes([_toc(0, False, 3), 3]) + b"abcdef"
    out = opus_split_frames(pkt)
    assert out["frames"] == [b"ab", b"cd", b"ef"]
    # VBR with explicit lengths 1 and 2, last takes the rest
    pkt = bytes([_toc(0, False, 3), 0x80 | 3, 1, 2]) + b"abcdef"
    out = opus_split_frames(pkt)
    assert out["frames"] == [b"a", b"bc", b"def"] and out["vbr"]
    # padding: flag + length byte 2 -> two trailing pad bytes dropped
    pkt = bytes([_toc(0, False, 3), 0x40 | 2, 2]) + b"abcd" + b"\x00\x00"
    out = opus_split_frames(pkt)
    assert out["frames"] == [b"ab", b"cd"]
    assert out["padding_bytes"] == 2
    # long padding: a 255 byte contributes 254 and continues
    pad = b"\x00" * 256
    pkt = bytes([_toc(0, False, 3), 0x40 | 1, 255, 2]) + b"xy" + pad
    out = opus_split_frames(pkt)
    assert out["frames"] == [b"xy"] and out["padding_bytes"] == 256
    # R5: zero frames
    with pytest.raises(ValueError):
        opus_split_frames(bytes([_toc(0, False, 3), 0]))
    # R6: CBR payload not divisible by count
    with pytest.raises(ValueError):
        opus_split_frames(bytes([_toc(0, False, 3), 3]) + b"abcd")
    # R7: VBR lengths overrun
    with pytest.raises(ValueError):
        opus_split_frames(bytes([_toc(0, False, 3), 0x80 | 2, 50]) + b"ab")
    # R1: empty packet
    with pytest.raises(ValueError):
        opus_split_frames(b"")


def test_framing_agrees_with_toc_frame_count():
    """opus_packet_info's TOC frame count and the §3.2 split must
    agree for codes 0-3."""
    for code, n in ((0, 1), (1, 2), (2, 2)):
        body = b"\x00" * 8 if code != 2 else bytes([4]) + b"\x00" * 8
        pkt = bytes([_toc(0, False, code)]) + body
        assert len(opus_split_frames(pkt)["frames"]) == n
        assert opus_packet_info(pkt)["n_frames"] == n
    pkt = bytes([_toc(0, False, 3), 2]) + b"\x00" * 6
    assert len(opus_split_frames(pkt)["frames"]) == 2
    assert opus_packet_info(pkt)["n_frames"] == 2


# ---------------------------------------------------------------------------
# §4.2 SILK header bits (authored fixtures via the encoder twin)
# ---------------------------------------------------------------------------


def _silk_frame(
    vad: list[int],
    lbrr: int,
    lbrr_flags: list[int] | None = None,
    frame_type: tuple[int, int] | None = None,
    side: tuple[list[int], int] | None = None,
) -> bytes:
    """Author the LP-layer header bits exactly as §4.2.3-4.2.4 lays
    them out; ``frame_type`` is (signal_type_index, quant_offset) for
    the first regular frame in the mono/no-LBRR case."""
    enc = RangeEncoder()
    for v in vad:
        enc.encode_bit_logp(v, 1)
    enc.encode_bit_logp(lbrr, 1)
    if side is not None:
        svad, slbrr = side
        for v in svad:
            enc.encode_bit_logp(v, 1)
        enc.encode_bit_logp(slbrr, 1)
    if lbrr and len(vad) > 1:
        icdf = SILK_LBRR_FLAGS_2_ICDF if len(vad) == 2 else (
            SILK_LBRR_FLAGS_3_ICDF
        )
        sym = 0
        for i, f in enumerate(lbrr_flags):
            sym |= f << i
        enc.encode_icdf(sym - 1, icdf)
    if frame_type is not None:
        st, qo = frame_type
        if vad[0]:
            enc.encode_icdf((st - 1) * 2 + qo, SILK_TYPE_VAD_ICDF)
        else:
            enc.encode_icdf(qo, SILK_TYPE_NO_VAD_ICDF)
    return enc.finish()


def test_silk_header_mono_20ms_voiced():
    frame = _silk_frame([1], 0, frame_type=(2, 1))
    hdr = silk_header_info(frame, 20)
    assert hdr["n_silk_frames"] == 1
    assert hdr["vad_flags"] == [1] and not hdr["lbrr"]
    assert hdr["first_frame"] == {"signal_type": "voiced", "quant_offset": 1}


def test_silk_header_mono_20ms_inactive():
    frame = _silk_frame([0], 0, frame_type=(0, 0))
    hdr = silk_header_info(frame, 20)
    assert hdr["vad_flags"] == [0]
    assert hdr["first_frame"] == {
        "signal_type": "inactive",
        "quant_offset": 0,
    }


def test_silk_header_60ms_lbrr_flags():
    frame = _silk_frame([1, 0, 1], 1, lbrr_flags=[1, 0, 1])
    hdr = silk_header_info(frame, 60)
    assert hdr["n_silk_frames"] == 3
    assert hdr["vad_flags"] == [1, 0, 1]
    assert hdr["lbrr"] and hdr["lbrr_flags"] == [1, 0, 1]
    assert hdr["first_frame"] is None  # LBRR frames precede the type


def test_silk_header_40ms_all_type_symbols():
    """Every (VAD, signal_type, offset) combination round-trips
    through the authored header — pins the Table 11 iCDF mapping."""
    for st, qo in ((1, 0), (1, 1), (2, 0), (2, 1)):
        frame = _silk_frame([1, 1], 0, frame_type=(st, qo))
        hdr = silk_header_info(frame, 40)
        assert hdr["first_frame"]["signal_type"] == (
            "unvoiced" if st == 1 else "voiced"
        )
        assert hdr["first_frame"]["quant_offset"] == qo
    for qo in (0, 1):
        frame = _silk_frame([0, 0], 0, frame_type=(0, qo))
        hdr = silk_header_info(frame, 40)
        assert hdr["first_frame"] == {
            "signal_type": "inactive",
            "quant_offset": qo,
        }


def test_silk_header_stereo_two_channels():
    frame = _silk_frame([1, 1], 0, side=([0, 1], 0))
    hdr = silk_header_info(frame, 40, stereo=True)
    assert hdr["vad_flags"] == [1, 1]
    assert hdr["side_vad_flags"] == [0, 1]
    assert not hdr["lbrr"] and not hdr["side_lbrr"]
    assert hdr["first_frame"] is None  # stereo weights precede the type


def test_silk_header_rejects_celt_durations():
    with pytest.raises(ValueError):
        silk_header_info(b"\x00", 5)


# ---------------------------------------------------------------------------
# end-to-end: packet activity + OGG container composition
# ---------------------------------------------------------------------------


def _silk_packet(vad: list[int], frame_type=(2, 0)) -> bytes:
    """Code-0 SILK-WB packet with authored header bits; config 9 is
    SILK WB 20 ms when len(vad)==1, config 11 is WB 60 ms."""
    config = {1: 9, 2: 10, 3: 11}[len(vad)]
    return bytes([_toc(config, False, 0)]) + _silk_frame(
        vad, 0, frame_type=frame_type
    )


def test_opus_packet_activity_silk():
    act = opus_packet_activity(_silk_packet([1]))
    assert act["mode"] == "silk" and act["bandwidth"] == "wb"
    assert act["n_silk_frames"] == 1 and act["vad_frames"] == 1
    assert act["any_lbrr"] is False
    act = opus_packet_activity(_silk_packet([1, 0, 1]))
    assert act["duration_ms"] == 60.0
    assert act["n_silk_frames"] == 3 and act["vad_frames"] == 2


def test_opus_packet_activity_celt_is_unknown():
    pkt = bytes([_toc(28, False, 0)]) + b"\x00\x01\x02"  # CELT FB 20ms
    act = opus_packet_activity(pkt)
    assert act["mode"] == "celt"
    assert act["vad_frames"] is None and act["any_lbrr"] is None


def test_ogg_opus_stream_activity_end_to_end():
    """Author a full OGG-Opus stream (OpusHead/OpusTags + 4 authored
    SILK packets), walk the container, and aggregate activity from the
    packet payloads — opusinfo-style expectations pinned exactly."""
    import struct

    head = (
        b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0])
    )
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    pkts = [
        _silk_packet([1]),
        _silk_packet([0], frame_type=(0, 0)),
        _silk_packet([1, 1], frame_type=(1, 0)),
        _silk_packet([1, 0, 1]),
    ]
    pages = [
        build_ogg_page(7, 0, 0, [head], header_type=0x02),
        build_ogg_page(7, 1, 0, [tags]),
    ]
    granule = 312
    for i, p in enumerate(pkts):
        granule += opus_packet_info(p)["duration_samples"]
        pages.append(build_ogg_page(7, 2 + i, granule, [p]))
    pages[-1] = build_ogg_page(7, 5, granule, [pkts[-1]], header_type=0x04)
    stream = b"".join(pages)

    info = ogg_stream_info(stream)
    assert info["codec"] == "opus" and info["channels"] == 1
    # TOC-summed duration: 20 + 20 + 40 + 60 ms = 140 ms
    assert info["duration_ms"] == 140.0
    assert info["granule_duration_samples"] == 140 * 48
    assert info["modes"] == {"silk": 4}

    acts = [opus_packet_activity(p) for p in pkts]
    vad = sum(a["vad_frames"] for a in acts)
    silk_frames = sum(a["n_silk_frames"] for a in acts)
    assert (silk_frames, vad) == (7, 5)
    types = [
        silk_header_info(
            opus_split_frames(p)["frames"][0],
            int(opus_packet_info(p)["samples_per_frame"]) // 48,
        )["first_frame"]["signal_type"]
        for p in pkts
    ]
    assert types == ["voiced", "inactive", "unvoiced", "voiced"]
