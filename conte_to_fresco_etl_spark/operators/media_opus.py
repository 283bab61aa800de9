"""Opus payload parsing below the TOC byte (RFC 6716) — the first
DSP-free slice of the Opus decode path, on the staged trajectory the
FLAC and VP8 decoders took (container walker -> packet triage ->
entropy-layer headers -> full reconstruction).

Three layers, each honest about where it stops:

1. ``opus_split_frames`` — RFC 6716 §3.2 packet framing: codes 0-3,
   CBR/VBR per-frame length coding, padding, and the R1-R7 mandatory
   framing rules.  Pure byte arithmetic; a malformed packet raises
   ``ValueError`` (the crawl-bytes-fail-loudly discipline).
2. ``RangeDecoder`` / ``RangeEncoder`` — the §4.1 entropy coder
   shared by SILK and CELT.  The decoder follows the normative spec
   (init, renormalization, icdf and log-probability bit decoding);
   the encoder is its exact inverse, used by tests to author
   bit-exact fixtures (no system libopus exists to interop against,
   so round-trip is the gate, as it was for FLAC).
3. ``silk_header_info`` — §4.2.3/§4.2.4/§4.2.7.3-4: the LP-layer
   header bits (per-SILK-frame VAD flags, the LBRR flag, per-frame
   LBRR flags when present) and, for the mono/no-LBRR common case,
   the first frame's type symbol (inactive/unvoiced/voiced + the
   quantization-offset bit).  Everything deeper (gains, LSF, LTP,
   excitation) remains behind the documented ``NotImplementedError``
   in ``media.py`` — header bits give a crawl pipeline speech-activity
   and redundancy stats WITHOUT any DSP.

Reference parity: conte-to-fresco-etl has no media surface; this
module belongs to the training-data-pipeline extension, sibling to
media_ogg.py (container) and media.py (codec registry).
"""

from __future__ import annotations

_CODE_TOP = 1 << 31
_CODE_BOT = 1 << 23


class RangeDecoder:
    """RFC 6716 §4.1 range decoder over one Opus frame's bytes.

    State follows §4.1.1-4.1.2: ``rng`` in (2^23, 2^31], ``val`` the
    difference between the high end of the current range and the
    actual coded value.  Raw bits read from the END of the frame
    (§4.1.5) are exposed via :meth:`decode_raw_bits`; the front and
    back cursors share the buffer exactly as the spec describes.
    """

    def __init__(self, data: bytes):
        self._d = data
        self._front = 0  # next byte for the range coder
        self._back = len(data)  # next byte (exclusive) for raw bits
        self._raw_val = 0
        self._raw_bits = 0
        b0 = self._read_front()
        self._rem = b0
        self.rng = 128
        self.val = 127 - (b0 >> 1)
        self._normalize()

    def _read_front(self) -> int:
        if self._front < len(self._d):
            b = self._d[self._front]
            self._front += 1
            return b
        return 0  # §4.1.1: reading past the end returns zero bits

    def _normalize(self) -> None:
        while self.rng <= _CODE_BOT:
            self.rng <<= 1 * 8
            sym = self._rem
            self._rem = self._read_front()
            sym = ((sym << 8) | self._rem) >> 1
            self.val = ((self.val << 8) + (255 & ~sym)) & (_CODE_TOP - 1)

    def decode(self, ft: int) -> int:
        """§4.1.2: return fs in [0, ft) locating the current symbol."""
        self._ext = self.rng // ft
        s = self.val // self._ext
        return ft - min(s + 1, ft)

    def update(self, fl: int, fh: int, ft: int) -> None:
        """§4.1.2: narrow the range to the decoded symbol [fl, fh)."""
        s = self._ext * (ft - fh)
        self.val -= s
        self.rng = self._ext * (fh - fl) if fl > 0 else self.rng - s
        self._normalize()

    def decode_icdf(self, icdf: tuple[int, ...], ftb: int = 8) -> int:
        """§4.1.3.3: decode one symbol from an inverse-CDF table
        (``icdf[k]`` = ft - cdf(k+1), terminated by 0), ft = 2^ftb."""
        r = self.rng >> ftb
        t = self.rng
        s = self.rng
        k = -1
        while True:
            k += 1
            t = s
            s = r * icdf[k]
            if self.val >= s:
                break
        self.val -= s
        self.rng = t - s
        self._normalize()
        return k

    def decode_bit_logp(self, logp: int) -> int:
        """§4.1.3.2: decode one bit whose '1' probability is 2^-logp."""
        s = self.rng >> logp
        bit = 1 if self.val < s else 0
        if bit:
            self.rng = s
        else:
            self.val -= s
            self.rng -= s
        self._normalize()
        return bit

    def decode_raw_bits(self, n: int) -> int:
        """§4.1.5: n raw bits from the back of the frame, LSB-first
        per byte exactly as the spec's bit ordering prescribes."""
        while self._raw_bits < n:
            self._back -= 1
            b = self._d[self._back] if self._back >= 0 else 0
            self._raw_val |= b << self._raw_bits
            self._raw_bits += 8
        out = self._raw_val & ((1 << n) - 1)
        self._raw_val >>= n
        self._raw_bits -= n
        return out


class RangeEncoder:
    """Exact inverse of :class:`RangeDecoder` — the fixture author.

    Carry propagation follows the reference formulation: finished
    bytes are buffered with a pending-carry count so a late carry
    ripples through runs of 0xFF.  ``finish()`` flushes enough bytes
    for the decoder's initialization reads to land on real data."""

    def __init__(self):
        self.low = 0
        self.rng = _CODE_TOP
        self._out = bytearray()
        self._pending: int | None = None  # last byte awaiting carry
        self._ext = 0  # run of 0xFF bytes awaiting carry resolution
        self._raw_tail = bytearray()  # raw bits appended at the end
        self._raw_fill = 0  # unused bit positions in _raw_tail[-1]

    def _carry_out(self, c: int) -> None:
        """Emit one finished symbol; ``c`` may carry a 9th bit that
        ripples into the buffered byte and any pending 0xFF run."""
        if c != 0xFF:
            carry = c >> 8
            if self._pending is not None:
                self._out.append((self._pending + carry) & 0xFF)
            if self._ext > 0:
                self._out.extend([(0xFF + carry) & 0xFF] * self._ext)
                self._ext = 0
            self._pending = c & 0xFF
        else:
            self._ext += 1

    def _normalize(self) -> None:
        while self.rng <= _CODE_BOT:
            self._carry_out(self.low >> 23)
            self.low = (self.low << 8) & (_CODE_TOP - 1)
            self.rng <<= 8

    def encode(self, fl: int, fh: int, ft: int) -> None:
        r = self.rng // ft
        if fl > 0:
            self.low += self.rng - r * (ft - fl)
            self.rng = r * (fh - fl)
        else:
            self.rng -= r * (ft - fh)
        self._normalize()

    def encode_icdf(self, k: int, icdf: tuple[int, ...], ftb: int = 8) -> None:
        ft = 1 << ftb
        fl = ft - icdf[k - 1] if k > 0 else 0
        fh = ft - icdf[k]
        r = self.rng >> ftb
        if fl > 0:
            self.low += self.rng - r * (ft - fl)
            self.rng = r * (fh - fl)
        else:
            self.rng -= r * (ft - fh)
        self._normalize()

    def encode_bit_logp(self, bit: int, logp: int) -> None:
        # the decoder's ``val`` is anchored at the TOP of the range
        # (bit=1 <=> val < rng>>logp), so the encoder places the '1'
        # interval at the top of ``low``'s coordinate system
        r = self.rng
        s = r >> logp
        r -= s
        if bit:
            self.low += r
        self.rng = s if bit else r
        self._normalize()

    def encode_raw_bits(self, value: int, n: int) -> None:
        """Queue raw bits for the back of the frame (flushed last)."""
        for _ in range(n):
            self._append_raw_bit(value & 1)
            value >>= 1

    def _append_raw_bit(self, bit: int) -> None:
        if self._raw_fill == 0:
            self._raw_tail.append(0)
            self._raw_fill = 8
        # raw bits fill bytes from the END toward the front, LSB-first
        # within each byte (mirror of decode_raw_bits)
        pos = 8 - self._raw_fill
        if bit:
            self._raw_tail[-1] |= 1 << pos
        self._raw_fill -= 1

    def finish(self) -> bytes:
        """Flush the range-coder state (§4.1 termination: emit enough
        of ``low`` that any decoder sequence reading the encoded
        symbols resolves them) and append the raw-bit tail reversed
        into spec order."""
        # emit 32 bits of low — more than the minimal end trimming the
        # reference does, but always sufficient and still spec-valid
        for _ in range(5):
            self._carry_out(self.low >> 23)
            self.low = (self.low << 8) & (_CODE_TOP - 1)
        if self._pending is not None:
            self._out.append(self._pending)
            self._out.extend(b"\xff" * self._ext)
        body = bytes(self._out)
        return body + bytes(reversed(self._raw_tail))


# ---------------------------------------------------------------------------
# RFC 6716 §3.2 — packet framing (frame boundaries inside a packet)
# ---------------------------------------------------------------------------


def _read_frame_len(data: bytes, off: int) -> tuple[int, int]:
    """§3.2.1 one- or two-byte frame length: 0..251 literal; 252..255
    is the low part of ``second*4 + first`` (252..1275)."""
    if off >= len(data):
        raise ValueError("Opus framing: missing frame length byte")
    b1 = data[off]
    if b1 < 252:
        return b1, off + 1
    if off + 1 >= len(data):
        raise ValueError("Opus framing: missing second length byte")
    return data[off + 1] * 4 + b1, off + 2


def opus_split_frames(packet: bytes) -> dict:
    """Split an Opus packet into its compressed frames per RFC 6716
    §3.2, enforcing the mandatory framing rules R1-R7 (a violating
    packet MUST be treated as corrupt — we raise ``ValueError``).

    Returns ``{"frames": [bytes, ...], "padding_bytes": int,
    "vbr": bool}``.  Code 0 = 1 frame; code 1 = 2 equal frames;
    code 2 = 2 frames, first length explicit; code 3 = count byte
    (frame count, VBR flag, padding flag) then optional padding
    length, then VBR lengths or CBR split."""
    if not packet:
        raise ValueError("empty Opus packet")  # R1
    toc = packet[0]
    code = toc & 0x03
    body = packet[1:]
    if code == 0:
        return {"frames": [body], "padding_bytes": 0, "vbr": False}
    if code == 1:
        if len(body) % 2 != 0:
            raise ValueError("Opus code-1 packet with odd payload (R3)")
        h = len(body) // 2
        return {
            "frames": [body[:h], body[h:]],
            "padding_bytes": 0,
            "vbr": False,
        }
    if code == 2:
        n1, off = _read_frame_len(packet, 1)
        rest = packet[off:]
        if n1 > len(rest):
            raise ValueError("Opus code-2 first frame overruns packet (R4)")
        return {
            "frames": [rest[:n1], rest[n1:]],
            "padding_bytes": 0,
            "vbr": True,
        }
    # code 3
    if len(packet) < 2:
        raise ValueError("Opus code-3 packet missing frame-count byte (R6)")
    fc = packet[1]
    n_frames = fc & 0x3F
    vbr = bool(fc & 0x80)
    has_pad = bool(fc & 0x40)
    if n_frames == 0:
        raise ValueError("Opus code-3 packet with zero frames (R5)")
    off = 2
    pad_total = 0
    if has_pad:
        # padding length: bytes of 255 add 254 each, terminated by a
        # byte < 255 adding its own value (§3.2.5)
        while True:
            if off >= len(packet):
                raise ValueError("Opus code-3 padding length overruns (R6)")
            p = packet[off]
            off += 1
            if p == 255:
                pad_total += 254
            else:
                pad_total += p
                break
    avail = len(packet) - off - pad_total
    if avail < 0:
        raise ValueError("Opus code-3 padding exceeds packet (R6)")
    frames: list[bytes] = []
    if vbr:
        lens: list[int] = []
        for _ in range(n_frames - 1):
            ln, off = _read_frame_len(packet, off)
            lens.append(ln)
        avail = len(packet) - off - pad_total
        if sum(lens) > avail:
            raise ValueError("Opus code-3 VBR lengths overrun packet (R7)")
        for ln in lens:
            frames.append(packet[off: off + ln])
            off += ln
        frames.append(packet[off: len(packet) - pad_total])
    else:
        if avail % n_frames != 0:
            raise ValueError("Opus code-3 CBR payload not divisible (R6)")
        each = avail // n_frames
        for i in range(n_frames):
            frames.append(packet[off + i * each: off + (i + 1) * each])
    if any(len(f) > 1275 for f in frames):
        raise ValueError("Opus frame exceeds 1275-byte maximum (R2)")
    return {"frames": frames, "padding_bytes": pad_total, "vbr": vbr}


# ---------------------------------------------------------------------------
# RFC 6716 §4.2 — SILK LP-layer header bits (no DSP)
# ---------------------------------------------------------------------------

#: §4.2.7.3 Table 11 frame-type PDFs as iCDF tables (ft=256).
#: VAD-active frames code {unvoiced, voiced} x {low, high} offset;
#: inactive frames code only the offset.
SILK_TYPE_VAD_ICDF: tuple[int, ...] = (232, 158, 10, 0)
SILK_TYPE_NO_VAD_ICDF: tuple[int, ...] = (230, 0)

#: §4.2.4 Table 4/5 — joint LBRR flag PDFs for 40/60 ms packets
#: (per-frame LBRR flags decoded as one symbol; value k's bit i is
#: frame i's flag).  iCDF over ft=256; index 0 (no flags set) never
#: occurs because the joint symbol is only read when the packet-level
#: LBRR flag is 1.
SILK_LBRR_FLAGS_2_ICDF: tuple[int, ...] = (203, 150, 0)
SILK_LBRR_FLAGS_3_ICDF: tuple[int, ...] = (215, 195, 166, 125, 110, 82, 0)

_SIGNAL_TYPES = ("inactive", "unvoiced", "voiced")


def silk_header_info(
    frame: bytes, frame_ms: int, stereo: bool = False
) -> dict:
    """Decode the SILK LP-layer header bits of one Opus frame
    (§4.2.3-4.2.4): per-20ms-SILK-frame VAD flags and the LBRR flag
    (both p=1/2 header bits), the joint per-frame LBRR flags when the
    packet carries redundancy, and — in the mono, no-LBRR case, where
    the next symbol in the stream is unambiguous — the first regular
    frame's type (§4.2.7.3): signal class + quantization-offset bit.

    ``frame_ms`` is the Opus frame duration from the TOC (10/20/40/60
    for SILK modes); a SILK frame spans 20 ms (10 ms packets carry one
    shortened frame), so 40/60 ms frames carry 2/3 SILK frames.

    Returns ``{"n_silk_frames", "vad_flags", "lbrr", "lbrr_flags",
    "mid_only_possible", "first_frame": {"signal_type",
    "quant_offset"} | None}``.  Stereo streams decode BOTH channels'
    VAD/LBRR headers (§4.2.3's interleaving puts mid then side);
    deeper fields stay None — stereo prediction weights precede the
    type symbol and are out of this slice's scope."""
    if frame_ms not in (10, 20, 40, 60):
        raise ValueError(f"not a SILK frame duration: {frame_ms} ms")
    n_silk = max(1, frame_ms // 20)
    dec = RangeDecoder(frame)

    def _channel_header() -> tuple[list[int], int]:
        vad = [dec.decode_bit_logp(1) for _ in range(n_silk)]
        lbrr = dec.decode_bit_logp(1)
        return vad, lbrr

    vad_mid, lbrr_mid = _channel_header()
    out: dict = {
        "n_silk_frames": n_silk,
        "vad_flags": vad_mid,
        "lbrr": bool(lbrr_mid),
    }
    if stereo:
        vad_side, lbrr_side = _channel_header()
        out["side_vad_flags"] = vad_side
        out["side_lbrr"] = bool(lbrr_side)
    # per-frame LBRR flags (§4.2.4): 20 ms -> the packet flag IS the
    # frame flag; 40/60 ms -> one joint symbol per flagged channel
    def _lbrr_frame_flags(flag: int) -> list[int]:
        if not flag:
            return [0] * n_silk
        if n_silk == 1:
            return [1]
        icdf = (
            SILK_LBRR_FLAGS_2_ICDF if n_silk == 2 else SILK_LBRR_FLAGS_3_ICDF
        )
        sym = dec.decode_icdf(icdf) + 1  # value 0 (no flags) is excluded
        return [(sym >> i) & 1 for i in range(n_silk)]

    out["lbrr_flags"] = _lbrr_frame_flags(lbrr_mid)
    if stereo:
        out["side_lbrr_flags"] = _lbrr_frame_flags(
            1 if out["side_lbrr"] else 0
        )
    out["first_frame"] = None
    if not stereo and not out["lbrr"]:
        # the next symbol is the first regular frame's type —
        # conditioned on that frame's VAD flag (§4.2.7.3)
        if vad_mid[0]:
            ix = dec.decode_icdf(SILK_TYPE_VAD_ICDF)
            out["first_frame"] = {
                "signal_type": _SIGNAL_TYPES[1 + (ix >> 1)],
                "quant_offset": ix & 1,
            }
        else:
            ix = dec.decode_icdf(SILK_TYPE_NO_VAD_ICDF)
            out["first_frame"] = {
                "signal_type": "inactive",
                "quant_offset": ix,
            }
    return out


def opus_packet_activity(packet: bytes) -> dict:
    """Packet-level speech-activity triage composing the TOC
    (media_ogg.opus_packet_info), §3.2 framing, and the SILK header
    bits: for SILK/hybrid packets, the fraction of 20 ms SILK frames
    with the VAD flag set and whether any LBRR redundancy rides
    along.  CELT-only packets carry no VAD bits — reported with
    ``vad_frames=None`` (unknown activity, not silence)."""
    from conte_to_fresco_etl_spark.operators.media_ogg import (
        opus_packet_info,
    )

    info = opus_packet_info(packet)
    split = opus_split_frames(packet)
    out = {
        "mode": info["mode"],
        "bandwidth": info["bandwidth"],
        "duration_ms": info["duration_ms"],
        "n_frames": len(split["frames"]),
        "padding_bytes": split["padding_bytes"],
        "vad_frames": None,
        "n_silk_frames": None,
        "any_lbrr": None,
    }
    if info["mode"] in ("silk", "hybrid"):
        frame_ms = info["samples_per_frame"] // 48
        vad_total = 0
        silk_total = 0
        any_lbrr = False
        for f in split["frames"]:
            hdr = silk_header_info(f, frame_ms, stereo=info["stereo"])
            vad_total += sum(hdr["vad_flags"])
            silk_total += hdr["n_silk_frames"]
            any_lbrr = any_lbrr or hdr["lbrr"]
            if info["stereo"]:
                any_lbrr = any_lbrr or hdr["side_lbrr"]
        out["vad_frames"] = vad_total
        out["n_silk_frames"] = silk_total
        out["any_lbrr"] = any_lbrr
    return out
