"""VP8 inter-frame (P-frame) decode + encode (RFC 6386 sections
16-18): reference buffers, motion-vector entropy coding, sixtap /
bilinear sub-pixel motion compensation, NEAREST/NEAR/ZERO/NEW/SPLIT
macroblock modes, and the golden / altref buffer management — the
piece that turns the keyframe codec in ``media_vp8.py`` into a video
decoder.

Verification posture: the encoder half is the decoder's exact inverse
(decoder-in-the-loop reconstruction), so every mode path is pinned by
multi-frame round trips that compare planes BIT-EXACTLY, the same gate
the FLAC and keyframe-VP8 paths use.  Unlike keyframes (where system
libwebp provides third-party interop), no library in this environment
can produce or consume VP8 inter frames (libwebp stills are all
keyframes; libvpx is absent), so cross-implementation interop for the
inter path is pending such an environment.  Two spots are
reconstructed from the reference decoder's published behavior rather
than normative prose and are flagged inline: the near-MV count
bookkeeping feeding the mv_ref probabilities (``find_near_mvs``) and
the mode-context table (``MODE_CONTEXTS``).

Scale posture: identical to media_vp8.py — pure-Python per-payload
work that runs inside Arrow-batched ``mapInPandas`` kernels; nothing
here touches the Spark plan shape.
"""

from __future__ import annotations

import struct

import numpy as np

from conte_to_fresco_etl_spark.operators.media_vp8 import (
    BoolDecoder,
    BoolEncoder,
    COEF_PROBS,
    COEF_UPDATE_PROBS,
    B_PRED,
    BMODE_TREE,
    UV_MODE_TREE,
    _clamp_q,
    _quant_block,
    decode_coeffs,
    decode_vp8_planes,
    dequant_factors,
    encode_coeffs,
    fdct4x4,
    fwht4x4,
    idct4x4,
    iwht4x4,
    loop_filter_frame,
    loop_filter_frame_simple,
    predict_block,
)

# ---------------------------------------------------------------------------
# Mode / MV constant tables (RFC 6386 sections 8.2, 16.1-17.2)
# ---------------------------------------------------------------------------

#: Macroblock prediction modes.  Intra modes 0-4 match media_vp8;
#: inter modes continue the spec enum.
DC_PRED, V_PRED, H_PRED, TM_PRED = 0, 1, 2, 3
NEARESTMV, NEARMV, ZEROMV, NEWMV, SPLITMV = 5, 6, 7, 8, 9

#: Reference frames.
INTRA_FRAME, LAST_FRAME, GOLDEN_FRAME, ALTREF_FRAME = 0, 1, 2, 3

#: Intra luma mode tree on INTER frames (differs from the key-frame
#: tree in leaf order) + default probabilities.
YMODE_TREE = [-DC_PRED, 2, 4, 6, -V_PRED, -H_PRED, -TM_PRED, -B_PRED]
YMODE_PROBS = [112, 86, 140, 37]

#: B_PRED sub-mode probabilities on inter frames: one fixed
#: (context-free) distribution, unlike the key frame's [above][left]
#: contextual table.
BMODE_PROBS_INTER = [120, 90, 79, 133, 87, 85, 80, 111, 151]

#: Chroma mode defaults on inter frames.
UV_PROBS_INTER = [162, 101, 204]

#: mv_ref tree over the five inter modes; node k's probability is
#: MODE_CONTEXTS[cnt[k]][k] from the near-MV census.
MV_REF_TREE = [-ZEROMV, 2, -NEARESTMV, 4, -NEARMV, 6, -NEWMV, -SPLITMV]

#: Probabilities for the mv_ref tree indexed by the near-MV census
#: counts (reference decoder ``vp8_mode_contexts``).  RECONSTRUCTED
#: from the reference implementation's published tables: rows are the
#: count value 0-5, columns the tree position.  The reference stores
#: the last row as ints 257/336 but passes them through an 8-bit
#: probability type, so the EFFECTIVE (normative) values are the
#: mod-256 reductions 1/80 — stored here already reduced, since this
#: boolean coder takes probabilities in [1, 255].
MODE_CONTEXTS = [
    [7, 1, 1, 143],
    [14, 18, 14, 107],
    [135, 64, 57, 68],
    [60, 56, 128, 65],
    [234, 160, 1, 1],
    [1, 80, 1, 2],
]

#: SPLITMV partition styles: per-4x4-block partition ids.
MBSPLITS = [
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1],  # 2 horiz 16x8
    [0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1],  # 2 vert 8x16
    [0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3],  # 4 quarters
    list(range(16)),                                     # 16 singles
]
MBSPLIT_COUNT = [2, 2, 4, 16]
MBSPLIT_TREE = [-3, 2, -2, 4, -0, -1]
MBSPLIT_PROBS = [110, 111, 150]

#: Sub-block MV modes (SPLITMV partitions) + their tree and the
#: context-conditioned probabilities (context from the left/above
#: 4x4 MVs: same/zero relationships).
LEFT4X4, ABOVE4X4, ZERO4X4, NEW4X4 = 0, 1, 2, 3
SUB_MV_REF_TREE = [-LEFT4X4, 2, -ABOVE4X4, 4, -ZERO4X4, -NEW4X4]
SUB_MV_REF_PROBS = [
    [147, 136, 18],   # NORMAL
    [106, 145, 1],    # LEFT_ZED
    [179, 121, 1],    # ABOVE_ZED
    [223, 1, 34],     # LEFT_ABOVE_SAME
    [208, 1, 1],      # LEFT_ABOVE_ZED
]

#: MV component entropy layout (19 probabilities per component):
#: [0] short-vs-long, [1] sign, [2:9] the 7 short-tree probs,
#: [9:19] the 10 long-magnitude bit probs.
MV_IS_SHORT, MV_SIGN, MV_SHORT, MV_BITS = 0, 1, 2, 9
MV_LONG_WIDTH = 10
SMALL_MV_TREE = [2, 8, 4, 6, -0, -1, -2, -3, 10, 12, -4, -5, -6, -7]

DEFAULT_MV_PROBS = [
    [162, 128, 225, 146, 172, 147, 214, 39, 156,
     128, 129, 132, 75, 145, 178, 206, 239, 254, 254],
    [164, 128, 204, 170, 119, 235, 140, 230, 228,
     128, 130, 130, 74, 148, 180, 203, 236, 254, 254],
]

MV_UPDATE_PROBS = [
    [237, 246, 253, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 250, 250, 252, 254, 254],
    [231, 243, 245, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 251, 251, 254, 254, 254],
]

#: 6-tap sub-pixel filters (8 eighth-pel phases) and the bilinear
#: pair used by bitstream versions 1-3.
SUBPEL_FILTERS = [
    [0, 0, 128, 0, 0, 0],
    [0, -6, 123, 12, -1, 0],
    [2, -11, 108, 36, -8, 1],
    [0, -9, 93, 50, -6, 0],
    [3, -16, 77, 77, -16, 3],
    [0, -6, 50, 93, -9, 0],
    [1, -8, 36, 108, -11, 2],
    [0, -1, 12, 123, -6, 0],
]
BILINEAR_FILTERS = [
    [128, 0], [112, 16], [96, 32], [80, 48],
    [64, 64], [48, 80], [32, 96], [16, 112],
]

#: MV clamp margin: a motion vector may point at most 16 pixels (in
#: eighth-pel units) outside the frame; reference planes are border-
#: extended far enough for the 6-tap taps beyond that.
MV_MARGIN = 16 << 3
BORDER = 32


# ---------------------------------------------------------------------------
# MV entropy coding (section 17.2)
# ---------------------------------------------------------------------------


def read_mv_component(bd: BoolDecoder, p: list[int]) -> int:
    """One MV component in quarter-then-doubled units: short values
    0-7 via the small tree, long values 8-1023 via per-bit coding
    with bit 3 implicit when no higher bit is set."""
    if bd.read_bool(p[MV_IS_SHORT]):
        x = 0
        for i in range(3):
            x += bd.read_bool(p[MV_BITS + i]) << i
        for i in range(MV_LONG_WIDTH - 1, 3, -1):
            x += bd.read_bool(p[MV_BITS + i]) << i
        if not (x & 0xFFF0) or bd.read_bool(p[MV_BITS + 3]):
            x += 8
    else:
        x = bd.read_tree(SMALL_MV_TREE, p[MV_SHORT: MV_SHORT + 7])
    if x and bd.read_bool(p[MV_SIGN]):
        x = -x
    return x


def write_mv_component(be: BoolEncoder, v: int, p: list[int]) -> None:
    x = abs(v)
    if x < 8:
        be.write_bool(p[MV_IS_SHORT], 0)
        be.write_tree(SMALL_MV_TREE, p[MV_SHORT: MV_SHORT + 7], x)
    else:
        be.write_bool(p[MV_IS_SHORT], 1)
        for i in range(3):
            be.write_bool(p[MV_BITS + i], (x >> i) & 1)
        for i in range(MV_LONG_WIDTH - 1, 3, -1):
            be.write_bool(p[MV_BITS + i], (x >> i) & 1)
        if x & 0xFFF0:
            be.write_bool(p[MV_BITS + 3], (x >> 3) & 1)
        # else bit 3 is implicit (a long vector is >= 8)
    if x:
        be.write_bool(p[MV_SIGN], 1 if v < 0 else 0)


def read_mv(bd: BoolDecoder, mvc: list[list[int]]) -> tuple[int, int]:
    """(row, col) in eighth-pel units (components code half units)."""
    return (
        read_mv_component(bd, mvc[0]) * 2,
        read_mv_component(bd, mvc[1]) * 2,
    )


def write_mv(be: BoolEncoder, mv: tuple[int, int], mvc) -> None:
    if mv[0] % 2 or mv[1] % 2:
        raise ValueError("VP8 MVs are coded in 2/8-pel units")
    write_mv_component(be, mv[0] // 2, mvc[0])
    write_mv_component(be, mv[1] // 2, mvc[1])


# ---------------------------------------------------------------------------
# Near-MV census (section 16.3)
# ---------------------------------------------------------------------------


def _clamp_mv(mv, mb_r, mb_c, mb_rows, mb_cols):
    r = min(max(mv[0], -(mb_r * 16 << 3) - MV_MARGIN),
            ((mb_rows - 1 - mb_r) * 16 << 3) + MV_MARGIN)
    c = min(max(mv[1], -(mb_c * 16 << 3) - MV_MARGIN),
            ((mb_cols - 1 - mb_c) * 16 << 3) + MV_MARGIN)
    return (r, c)


def find_near_mvs(
    mb_r: int,
    mb_c: int,
    mb_rows: int,
    mb_cols: int,
    mbinfo: list[list[dict | None]],
    ref_frame: int,
    sign_bias: dict,
):
    """Survey the above / left / above-left macroblocks for motion
    vectors and produce (best_mv, nearest, nearby, cnt[4]) — the
    census that conditions the mv_ref tree probabilities and supplies
    the NEW-MV predictor.  RECONSTRUCTED from the reference decoder's
    bookkeeping: each surveyed neighbor adds weight 2/2/1
    (above/left/above-left) to its vector's bucket, zero vectors and
    intra neighbors accumulate in bucket 0, distinct vectors open new
    buckets, the above-left weight tie-breaks an exact three-way
    agreement, and bucket 3 becomes the SPLITMV weight afterward.
    Sign bias flips a candidate taken from a reference list whose
    bias differs from the target reference's."""

    def neighbor(r, c):
        if r < 0 or c < 0:
            return None
        return mbinfo[r][c]

    def biased(info):
        mv = info["mv"]
        if sign_bias[info["ref"]] != sign_bias[ref_frame]:
            return (-mv[0], -mv[1])
        return mv

    cand = [(0, 0), (0, 0), (0, 0), (0, 0)]
    cnt = [0, 0, 0, 0]
    idx = 0  # bucket the last surveyed weight landed in ("cntx")

    above = neighbor(mb_r - 1, mb_c)
    left = neighbor(mb_r, mb_c - 1)
    aboveleft = neighbor(mb_r - 1, mb_c - 1)

    # Above (weight 2): a nonzero vector opens bucket 1; a zero vector
    # weights bucket 0 through the still-pointing-there cursor.  Intra
    # (and out-of-frame) neighbors contribute nothing.
    if above is not None and above["ref"] != INTRA_FRAME:
        if above["mv"] != (0, 0):
            idx += 1
            cand[idx] = biased(above)
        cnt[idx] += 2

    # Left (weight 2): a nonzero vector matching the CURRENT top
    # candidate weights that bucket; a distinct one opens the next.
    if left is not None and left["ref"] != INTRA_FRAME:
        if left["mv"] != (0, 0):
            mv = biased(left)
            if mv != cand[idx]:
                idx += 1
                cand[idx] = mv
            cnt[idx] += 2
        else:
            cnt[0] += 2

    # Above-left (weight 1), same rule.
    if aboveleft is not None and aboveleft["ref"] != INTRA_FRAME:
        if aboveleft["mv"] != (0, 0):
            mv = biased(aboveleft)
            if mv != cand[idx]:
                idx += 1
                cand[idx] = mv
            cnt[idx] += 1
        else:
            cnt[0] += 1

    # Three distinct vectors with the third equal to the first:
    # credit the nearest bucket with the above-left weight.
    if cnt[3] and cand[3] == cand[1]:
        cnt[1] += 1

    # Bucket 3 is then re-purposed as the SPLITMV weight.
    cnt[3] = (
        2 * int(above is not None and above["mode"] == SPLITMV)
        + 2 * int(left is not None and left["mode"] == SPLITMV)
        + int(aboveleft is not None and aboveleft["mode"] == SPLITMV)
    )

    if cnt[2] > cnt[1]:
        cnt[1], cnt[2] = cnt[2], cnt[1]
        cand[1], cand[2] = cand[2], cand[1]

    best = cand[1] if cnt[1] >= cnt[0] else cand[0]
    nearest = _clamp_mv(cand[1], mb_r, mb_c, mb_rows, mb_cols)
    nearby = _clamp_mv(cand[2], mb_r, mb_c, mb_rows, mb_cols)
    best = _clamp_mv(best, mb_r, mb_c, mb_rows, mb_cols)
    return best, nearest, nearby, cnt


def mv_ref_probs(cnt: list[int]) -> list[int]:
    return [MODE_CONTEXTS[cnt[i]][i] for i in range(4)]


# ---------------------------------------------------------------------------
# Motion-compensated prediction (section 18)
# ---------------------------------------------------------------------------


def extend_borders(plane: np.ndarray, border: int = BORDER) -> np.ndarray:
    """Replicate-pad a reconstructed plane on all sides — the
    reference-buffer preparation every decoded frame gets before it
    can serve motion compensation."""
    return np.pad(plane, border, mode="edge")


def _filter_pass(src: np.ndarray, taps: list[int], axis: int) -> np.ndarray:
    """Apply one 1-D filter pass with VP8 rounding ((x + 64) >> 7,
    clamp to [0, 255]).  ``src`` must already include the tap margins
    along ``axis``; the output shrinks by len(taps)-1."""
    n = len(taps)
    acc = None
    for k, t in enumerate(taps):
        if axis == 0:
            sl = src[k: src.shape[0] - (n - 1 - k), :]
        else:
            sl = src[:, k: src.shape[1] - (n - 1 - k)]
        acc = sl * t if acc is None else acc + sl * t
    return np.clip((acc + 64) >> 7, 0, 255)


def predict_inter_block(
    ref_ext: np.ndarray,
    r: int,
    c: int,
    bh: int,
    bw: int,
    mv: tuple[int, int],
    bilinear: bool = False,
    border: int = BORDER,
) -> np.ndarray:
    """Motion-compensated (bh, bw) prediction at plane position
    (r, c) from a border-extended reference, eighth-pel ``mv``:
    horizontal 6-tap (or bilinear) pass first over bh+5 rows, then
    the vertical pass — the spec's two-pass order and rounding."""
    mvr, mvc = mv
    rr = r + (mvr >> 3) + border
    cc = c + (mvc >> 3) + border
    fr, fc = mvr & 7, mvc & 7
    filt = BILINEAR_FILTERS if bilinear else SUBPEL_FILTERS
    m_lo, m_hi = (0, 1) if bilinear else (2, 3)
    if fr == 0 and fc == 0:
        return ref_ext[rr: rr + bh, cc: cc + bw].astype(np.int64)
    if fc and fr:
        tmp = _filter_pass(
            ref_ext[
                rr - m_lo: rr + bh + m_hi, cc - m_lo: cc + bw + m_hi
            ].astype(np.int64),
            filt[fc],
            axis=1,
        )
        return _filter_pass(tmp, filt[fr], axis=0)
    if fc:
        return _filter_pass(
            ref_ext[rr: rr + bh, cc - m_lo: cc + bw + m_hi].astype(
                np.int64
            ),
            filt[fc],
            axis=1,
        )
    return _filter_pass(
        ref_ext[rr - m_lo: rr + bh + m_hi, cc: cc + bw].astype(np.int64),
        filt[fr],
        axis=0,
    )


def chroma_mv(mv: tuple[int, int]) -> tuple[int, int]:
    """Whole-MB chroma MV: divide by two rounding away from zero
    (C truncating division of mv±1)."""

    def half(v: int) -> int:
        return int((v - 1) / 2) if v < 0 else (v + 1) // 2

    return (half(mv[0]), half(mv[1]))


def split_chroma_mv(sub_mvs: list[tuple[int, int]], ci: int):
    """SPLITMV chroma MV for chroma 4x4 block ``ci``: floor-average of
    its four luma sub-block MVs ((sum + 4) >> 3)."""
    yo = (ci >> 1) * 8 + (ci & 1) * 2
    blocks = [yo, yo + 1, yo + 4, yo + 5]
    sr = sum(sub_mvs[b][0] for b in blocks)
    sc = sum(sub_mvs[b][1] for b in blocks)
    return ((sr + 4) >> 3 if sr >= 0 else -((-sr + 4) >> 3),
            (sc + 4) >> 3 if sc >= 0 else -((-sc + 4) >> 3))


# ---------------------------------------------------------------------------
# Entropy-state container (section 9.7-9.11 persistence semantics)
# ---------------------------------------------------------------------------


def default_entropy() -> dict:
    """Frame-persistent entropy state at its spec defaults: coefficient
    probabilities, inter-frame intra-mode probabilities, and the MV
    context — the state ``refresh_entropy_probs=0`` reverts after a
    frame and a key frame resets."""
    return {
        "coef": [
            [[list(COEF_PROBS[t][b][c]) for c in range(3)]
             for b in range(8)]
            for t in range(4)
        ],
        "ymode": list(YMODE_PROBS),
        "uv": list(UV_PROBS_INTER),
        "mv": [list(DEFAULT_MV_PROBS[0]), list(DEFAULT_MV_PROBS[1])],
    }


def _copy_entropy(ent: dict) -> dict:
    return {
        "coef": [
            [[list(ent["coef"][t][b][c]) for c in range(3)]
             for b in range(8)]
            for t in range(4)
        ],
        "ymode": list(ent["ymode"]),
        "uv": list(ent["uv"]),
        "mv": [list(ent["mv"][0]), list(ent["mv"][1])],
    }


def _sub_mv_ctx(l: tuple[int, int], a: tuple[int, int]) -> int:
    lez, aez, lea = l == (0, 0), a == (0, 0), l == a
    if lea and lez:
        return 4
    if lea:
        return 3
    if aez:
        return 2
    if lez:
        return 1
    return 0


def _mode_lf_index(mode: int, ref: int) -> int | None:
    """Loop-filter mode-delta row for a macroblock (reference
    ``mode_lf_lut``): B_PRED -> 0; inter ZEROMV -> 1, NEAREST/NEAR/
    NEW -> 2, SPLITMV -> 3; other intra modes take no mode delta."""
    if mode == B_PRED:
        return 0
    if ref == INTRA_FRAME:
        return None
    if mode == ZEROMV:
        return 1
    if mode == SPLITMV:
        return 3
    return 2


def _mb_filter_level(
    seg_level, lf_delta_enabled, ref_lf_deltas, mode_lf_deltas, mode, ref
):
    lvl = seg_level
    if lf_delta_enabled:
        lvl += ref_lf_deltas[ref]
        mi = _mode_lf_index(mode, ref)
        if mi is not None:
            lvl += mode_lf_deltas[mi]
        lvl = min(max(lvl, 0), 63)
    return lvl


# ---------------------------------------------------------------------------
# Inter-frame decoder
# ---------------------------------------------------------------------------


def decode_vp8_inter_frame(
    payload: bytes,
    refs: dict,
    entropy: dict,
    sign_bias: dict,
    dims: tuple[int, int],
) -> tuple[dict, dict]:
    """Decode one VP8 inter frame against the reference buffers.

    ``refs``: {"last"/"golden"/"altref": {"y","u","v"} plane dicts}
    (pre-extension; this function extends borders as needed).
    ``entropy``: persistent entropy state (mutated ONLY when the frame
    sets refresh_entropy_probs).  ``sign_bias``: {ref_frame: 0/1}
    state (golden/altref biases are re-read from the header).
    ``dims``: (width, height) carried over from the key frame — inter
    frames do not re-code dimensions.

    Returns (planes, info) where info carries the buffer-management
    flags (refresh_last / refresh_golden / refresh_altref /
    copy_golden / copy_altref / show_frame) the stream driver applies.
    """
    if len(payload) < 3:
        raise ValueError("truncated VP8 frame")
    tag = payload[0] | payload[1] << 8 | payload[2] << 16
    if not (tag & 1):
        raise ValueError("not an inter frame (keyframe bit unset)")
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    part1_size = tag >> 5
    if version > 3:
        raise ValueError(f"bad VP8 version {version}")
    bilinear = version in (1, 2)
    fullpel = version == 3
    w, h = dims
    if 3 + part1_size > len(payload):
        raise ValueError("truncated VP8 frame")
    bd = BoolDecoder(payload[3: 3 + part1_size])

    # --- segmentation (identical layout to the key frame) ---
    seg_enabled = bd.read_bool(128)
    seg_update_map = False
    seg_abs = False
    seg_tree_probs = [255, 255, 255]
    seg_quant = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    if seg_enabled:
        seg_update_map = bd.read_bool(128)
        if bd.read_bool(128):
            seg_abs = bool(bd.read_bool(128))
            for i in range(4):
                if bd.read_bool(128):
                    seg_quant[i] = bd.read_signed(7)
            for i in range(4):
                if bd.read_bool(128):
                    seg_lf[i] = bd.read_signed(6)
        if seg_update_map:
            for i in range(3):
                if bd.read_bool(128):
                    seg_tree_probs[i] = bd.read_literal(8)

    filter_type = bd.read_bool(128)
    filter_level = bd.read_literal(6)
    sharpness = bd.read_literal(3)
    lf_delta_enabled = bd.read_bool(128)
    ref_lf_deltas = [0, 0, 0, 0]
    mode_lf_deltas = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.read_bool(128):
            for i in range(4):
                if bd.read_bool(128):
                    ref_lf_deltas[i] = bd.read_signed(6)
            for i in range(4):
                if bd.read_bool(128):
                    mode_lf_deltas[i] = bd.read_signed(6)
    n_parts = 1 << bd.read_literal(2)
    qi = bd.read_literal(7)
    deltas = []
    for _ in range(5):
        deltas.append(bd.read_signed(4) if bd.read_bool(128) else 0)

    # --- reference-buffer management flags (section 9.7) ---
    refresh_golden = bd.read_bool(128)
    refresh_altref = bd.read_bool(128)
    copy_golden = 0 if refresh_golden else bd.read_literal(2)
    copy_altref = 0 if refresh_altref else bd.read_literal(2)
    sign_bias[GOLDEN_FRAME] = bd.read_bool(128)
    sign_bias[ALTREF_FRAME] = bd.read_bool(128)
    refresh_entropy = bd.read_bool(128)
    refresh_last = bd.read_bool(128)

    ent = _copy_entropy(entropy)
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for pi in range(11):
                    if bd.read_bool(COEF_UPDATE_PROBS[t][b][c][pi]):
                        ent["coef"][t][b][c][pi] = bd.read_literal(8)

    mb_no_skip = bd.read_bool(128)
    prob_skip_false = bd.read_literal(8) if mb_no_skip else 0
    prob_intra = bd.read_literal(8)
    prob_last = bd.read_literal(8)
    prob_gf = bd.read_literal(8)
    if bd.read_bool(128):  # intra 16x16 prob update
        ent["ymode"] = [bd.read_literal(8) for _ in range(4)]
    if bd.read_bool(128):  # intra chroma prob update
        ent["uv"] = [bd.read_literal(8) for _ in range(3)]
    for comp in range(2):
        for i in range(19):
            if bd.read_bool(MV_UPDATE_PROBS[comp][i]):
                x = bd.read_literal(7)
                ent["mv"][comp][i] = (x << 1) if x else 1

    if seg_enabled:
        seg_dqf = [
            dequant_factors(
                _clamp_q(seg_quant[s] if seg_abs else qi + seg_quant[s]),
                *deltas,
            )
            for s in range(4)
        ]
        seg_level = [
            min(max(seg_lf[s] if seg_abs else filter_level + seg_lf[s], 0), 63)
            for s in range(4)
        ]
    else:
        seg_dqf = [dequant_factors(qi, *deltas)] * 4
        seg_level = [filter_level] * 4

    mb_cols, mb_rows = (w + 15) // 16, (h + 15) // 16
    planes = {
        "y": np.zeros((mb_rows * 16, mb_cols * 16), dtype=np.int64),
        "u": np.zeros((mb_rows * 8, mb_cols * 8), dtype=np.int64),
        "v": np.zeros((mb_rows * 8, mb_cols * 8), dtype=np.int64),
    }
    ref_ext = {
        name: {k: extend_borders(p) for k, p in bufs.items()}
        for name, bufs in refs.items()
    }
    ref_name = {LAST_FRAME: "last", GOLDEN_FRAME: "golden",
                ALTREF_FRAME: "altref"}

    rest = payload[3 + part1_size:]
    tds = []
    off = 3 * (n_parts - 1)
    if off > len(rest):
        raise ValueError("truncated VP8 frame")
    for p in range(n_parts):
        if p < n_parts - 1:
            sz = rest[3 * p] | rest[3 * p + 1] << 8 | rest[3 * p + 2] << 16
        else:
            sz = len(rest) - off
        if sz < 0 or off + sz > len(rest):
            raise ValueError("truncated VP8 frame")
        tds.append(BoolDecoder(rest[off: off + sz]))
        off += sz

    above = {
        "y": np.zeros(mb_cols * 4, dtype=np.int8),
        "u": np.zeros(mb_cols * 2, dtype=np.int8),
        "v": np.zeros(mb_cols * 2, dtype=np.int8),
        "y2": np.zeros(mb_cols, dtype=np.int8),
    }
    mbinfo: list[list[dict | None]] = [
        [None] * mb_cols for _ in range(mb_rows)
    ]
    interior = [[False] * mb_cols for _ in range(mb_rows)]
    lf_levels = [[0] * mb_cols for _ in range(mb_rows)]

    for mb_r in range(mb_rows):
        td = tds[mb_r % n_parts]
        left = {
            "y": np.zeros(4, dtype=np.int8),
            "u": np.zeros(2, dtype=np.int8),
            "v": np.zeros(2, dtype=np.int8),
            "y2": np.zeros(1, dtype=np.int8),
        }
        for mb_c in range(mb_cols):
            seg_id = 0
            if seg_enabled and seg_update_map:
                if bd.read_bool(seg_tree_probs[0]):
                    seg_id = 2 + bd.read_bool(seg_tree_probs[2])
                else:
                    seg_id = bd.read_bool(seg_tree_probs[1])
            dqf = seg_dqf[seg_id]
            skip = bd.read_bool(prob_skip_false) if mb_no_skip else 0

            is_inter = bd.read_bool(prob_intra)
            bmodes = None
            sub_mvs = None
            uvmode = 0
            if not is_inter:
                ref = INTRA_FRAME
                mode = bd.read_tree(YMODE_TREE, ent["ymode"])
                if mode == B_PRED:
                    bmodes = [
                        bd.read_tree(BMODE_TREE, BMODE_PROBS_INTER)
                        for _ in range(16)
                    ]
                uvmode = bd.read_tree(UV_MODE_TREE, ent["uv"])
                mv = (0, 0)
            else:
                ref = (
                    (ALTREF_FRAME if bd.read_bool(prob_gf) else GOLDEN_FRAME)
                    if bd.read_bool(prob_last)
                    else LAST_FRAME
                )
                best, nearest, nearby, cnt = find_near_mvs(
                    mb_r, mb_c, mb_rows, mb_cols, mbinfo, ref, sign_bias
                )
                mode = bd.read_tree(MV_REF_TREE, mv_ref_probs(cnt))
                if mode == NEARESTMV:
                    mv = nearest
                elif mode == NEARMV:
                    mv = nearby
                elif mode == ZEROMV:
                    mv = (0, 0)
                elif mode == NEWMV:
                    d = read_mv(bd, ent["mv"])
                    mv = (best[0] + d[0], best[1] + d[1])
                else:  # SPLITMV
                    style = bd.read_tree(MBSPLIT_TREE, MBSPLIT_PROBS)
                    part_of = MBSPLITS[style]
                    sub_mvs = [None] * 16
                    above_i = mbinfo[mb_r - 1][mb_c] if mb_r else None
                    left_i = mbinfo[mb_r][mb_c - 1] if mb_c else None

                    def _nbr_mv(info, b):
                        if info is None:
                            return (0, 0)
                        if info["mode"] == SPLITMV:
                            return info["sub_mvs"][b]
                        return info["mv"]

                    for part in range(MBSPLIT_COUNT[style]):
                        b0 = part_of.index(part)
                        lmv = (
                            sub_mvs[b0 - 1]
                            if b0 % 4
                            else _nbr_mv(left_i, b0 + 3)
                        )
                        amv = (
                            sub_mvs[b0 - 4]
                            if b0 >= 4
                            else _nbr_mv(above_i, b0 + 12)
                        )
                        smode = bd.read_tree(
                            SUB_MV_REF_TREE,
                            SUB_MV_REF_PROBS[_sub_mv_ctx(lmv, amv)],
                        )
                        if smode == NEW4X4:
                            d = read_mv(bd, ent["mv"])
                            smv = (best[0] + d[0], best[1] + d[1])
                        elif smode == LEFT4X4:
                            smv = lmv
                        elif smode == ABOVE4X4:
                            smv = amv
                        else:
                            smv = (0, 0)
                        for b in range(16):
                            if part_of[b] == part:
                                sub_mvs[b] = smv
                    mv = sub_mvs[15]

            mbinfo[mb_r][mb_c] = {
                "ref": ref, "mode": mode, "mv": mv, "sub_mvs": sub_mvs,
            }
            lf_levels[mb_r][mb_c] = _mb_filter_level(
                seg_level[seg_id], lf_delta_enabled, ref_lf_deltas,
                mode_lf_deltas, mode, ref,
            )
            has_y2 = mode not in (B_PRED, SPLITMV)

            qcoef = {
                "y2": [0] * 16 if has_y2 else None,
                "y": [[0] * 16 for _ in range(16)],
                "u": [[0] * 16 for _ in range(4)],
                "v": [[0] * 16 for _ in range(4)],
            }
            mb_nz = 0
            if skip:
                left["y"][:] = 0
                left["u"][:] = 0
                left["v"][:] = 0
                above["y"][mb_c * 4: mb_c * 4 + 4] = 0
                above["u"][mb_c * 2: mb_c * 2 + 2] = 0
                above["v"][mb_c * 2: mb_c * 2 + 2] = 0
                if has_y2:
                    left["y2"][0] = 0
                    above["y2"][mb_c] = 0
            else:
                if has_y2:
                    ctx = int(left["y2"][0]) + int(above["y2"][mb_c])
                    co, nz = decode_coeffs(td, 1, 0, ctx, ent["coef"])
                    qcoef["y2"] = co
                    left["y2"][0] = nz
                    above["y2"][mb_c] = nz
                    mb_nz |= nz
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for b in range(16):
                    br, bc = b // 4, b % 4
                    ctx = int(left["y"][br]) + int(above["y"][mb_c * 4 + bc])
                    co, nz = decode_coeffs(td, ytype, first, ctx, ent["coef"])
                    qcoef["y"][b] = co
                    left["y"][br] = nz
                    above["y"][mb_c * 4 + bc] = nz
                    mb_nz |= nz
                for key in ("u", "v"):
                    for b in range(4):
                        br, bc = b // 2, b % 2
                        ctx = int(left[key][br]) + int(
                            above[key][mb_c * 2 + bc]
                        )
                        co, nz = decode_coeffs(td, 2, 0, ctx, ent["coef"])
                        qcoef[key][b] = co
                        left[key][br] = nz
                        above[key][mb_c * 2 + bc] = nz
                        mb_nz |= nz
            interior[mb_r][mb_c] = bool(mb_nz) or mode in (B_PRED, SPLITMV)

            if not is_inter:
                from conte_to_fresco_etl_spark.operators.media_vp8 import (
                    reconstruct_mb,
                )

                reconstruct_mb(
                    planes, mb_r, mb_c, mode, uvmode, bmodes, qcoef, dqf
                )
            else:
                reconstruct_inter_mb(
                    planes, mb_r, mb_c, mb_rows, mb_cols,
                    ref_ext[ref_name[ref]], mode, mv, sub_mvs, qcoef,
                    dqf, bilinear, fullpel,
                )

    # versions 2 and 3 run with NO loop filter (reference
    # vp8_setup_version: no_lpf = 1); the header's filter fields are
    # still present and parsed
    if version < 2 and filter_level > 0 and any(
        any(lv > 0 for lv in row) for row in lf_levels
    ):
        lf = loop_filter_frame if filter_type == 0 else (
            loop_filter_frame_simple
        )
        lf(planes, mb_rows, mb_cols, lf_levels, sharpness, interior)

    if refresh_entropy:
        entropy.clear()
        entropy.update(ent)
    info = {
        "refresh_last": bool(refresh_last),
        "refresh_golden": bool(refresh_golden),
        "refresh_altref": bool(refresh_altref),
        "copy_golden": copy_golden,
        "copy_altref": copy_altref,
        "show_frame": bool(show_frame),
        "version": version,
    }
    return planes, info


def reconstruct_inter_mb(
    planes, mb_r, mb_c, mb_rows, mb_cols, ref_ext, mode, mv, sub_mvs,
    qcoef, dqf, bilinear=False, fullpel=False,
):
    """Motion-compensated prediction + residual reconstruction for one
    inter macroblock (prediction MVs clamped to the 16-pixel margin,
    full-pel streams mask the fractional bits)."""
    y, u, v = planes["y"], planes["u"], planes["v"]
    ry, cy = mb_r * 16, mb_c * 16
    rc, cc = mb_r * 8, mb_c * 8
    y1dc, y1ac = dqf["y1"]
    uvdc, uvac = dqf["uv"]

    def fp(m):
        return (m[0] & ~7, m[1] & ~7) if fullpel else m

    if mode != SPLITMV:
        cmv = _clamp_mv(mv, mb_r, mb_c, mb_rows, mb_cols)
        pred_y = predict_inter_block(
            ref_ext["y"], ry, cy, 16, 16, fp(cmv), bilinear
        )
        cmv2 = chroma_mv(cmv)
        pred_u = predict_inter_block(
            ref_ext["u"], rc, cc, 8, 8, fp(cmv2), bilinear
        )
        pred_v = predict_inter_block(
            ref_ext["v"], rc, cc, 8, 8, fp(cmv2), bilinear
        )
        y2dc, y2ac = dqf["y2"]
        y2 = [qcoef["y2"][i] * (y2dc if i == 0 else y2ac) for i in range(16)]
        dcs = iwht4x4(y2)
        recon = np.zeros((16, 16), dtype=np.int64)
        for b in range(16):
            co = [
                qcoef["y"][b][i] * (y1dc if i == 0 else y1ac)
                for i in range(16)
            ]
            co[0] = dcs[b]
            br, bc = (b // 4) * 4, (b % 4) * 4
            recon[br: br + 4, bc: bc + 4] = (
                pred_y[br: br + 4, bc: bc + 4] + idct4x4(co)
            )
        y[ry: ry + 16, cy: cy + 16] = np.clip(recon, 0, 255)
    else:
        for b in range(16):
            br, bc = (b // 4) * 4, (b % 4) * 4
            smv = _clamp_mv(sub_mvs[b], mb_r, mb_c, mb_rows, mb_cols)
            pred4 = predict_inter_block(
                ref_ext["y"], ry + br, cy + bc, 4, 4, fp(smv), bilinear
            )
            co = [
                qcoef["y"][b][i] * (y1dc if i == 0 else y1ac)
                for i in range(16)
            ]
            y[ry + br: ry + br + 4, cy + bc: cy + bc + 4] = np.clip(
                pred4 + idct4x4(co), 0, 255
            )
        pred_u = np.zeros((8, 8), dtype=np.int64)
        pred_v = np.zeros((8, 8), dtype=np.int64)
        csub = [
            _clamp_mv(m, mb_r, mb_c, mb_rows, mb_cols) for m in sub_mvs
        ]
        for ci in range(4):
            cr, ccol = (ci // 2) * 4, (ci % 2) * 4
            cmv = split_chroma_mv(csub, ci)
            pred_u[cr: cr + 4, ccol: ccol + 4] = predict_inter_block(
                ref_ext["u"], rc + cr, cc + ccol, 4, 4, fp(cmv), bilinear
            )
            pred_v[cr: cr + 4, ccol: ccol + 4] = predict_inter_block(
                ref_ext["v"], rc + cr, cc + ccol, 4, 4, fp(cmv), bilinear
            )

    for plane, key, pred in ((u, "u", pred_u), (v, "v", pred_v)):
        recon = np.zeros((8, 8), dtype=np.int64)
        for b in range(4):
            co = [
                qcoef[key][b][i] * (uvdc if i == 0 else uvac)
                for i in range(16)
            ]
            br, bc = (b // 2) * 4, (b % 2) * 4
            recon[br: br + 4, bc: bc + 4] = (
                pred[br: br + 4, bc: bc + 4] + idct4x4(co)
            )
        plane[rc: rc + 8, cc: cc + 8] = np.clip(recon, 0, 255)


# ---------------------------------------------------------------------------
# Inter-frame encoder (the decoder's inverse; authored-fixture source)
# ---------------------------------------------------------------------------


def _rgb_to_planes(img: np.ndarray, mb_rows: int, mb_cols: int):
    """RGB -> padded YUV420 source planes (the keyframe encoder's
    exact conversion, shared so P-frame residuals line up)."""
    arr = np.asarray(img)
    h, w = arr.shape[:2]
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    yf = 0.299 * r + 0.587 * g + 0.114 * b
    cbf = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    crf = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    H, W = mb_rows * 16, mb_cols * 16

    def pad(p, ph, pw):
        return np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )

    ysrc = np.rint(pad(yf, H, W)).astype(np.int64)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    cbp = pad(cbf, ch * 2, cw * 2)
    crp = pad(crf, ch * 2, cw * 2)
    usrc = np.rint(cbp.reshape(ch, 2, cw, 2).mean(axis=(1, 3))).astype(
        np.int64
    )
    vsrc = np.rint(crp.reshape(ch, 2, cw, 2).mean(axis=(1, 3))).astype(
        np.int64
    )
    return (
        ysrc,
        pad(usrc, mb_rows * 8, mb_cols * 8),
        pad(vsrc, mb_rows * 8, mb_cols * 8),
    )


def _search_mv(ref_ext, src, r, c, bh, bw, center, rng, mb_r, mb_c,
               mb_rows, mb_cols):
    """Full-pel SAD search around ``center`` (eighth-pel), then a
    half/quarter-pel refinement pass; returns the best eighth-pel MV
    with EVEN components (VP8 MVs code half units)."""
    best = None
    base_r, base_c = center[0] >> 3 << 3, center[1] >> 3 << 3
    for dr in range(-rng, rng + 1):
        for dc in range(-rng, rng + 1):
            mv = (base_r + dr * 8, base_c + dc * 8)
            cmv = _clamp_mv(mv, mb_r, mb_c, mb_rows, mb_cols)
            if cmv != mv:
                continue
            pred = predict_inter_block(ref_ext, r, c, bh, bw, mv)
            sad = int(np.abs(pred - src).sum())
            if best is None or sad < best[0]:
                best = (sad, mv)
    sad0, mv0 = best
    for step in (4, 2):
        improved = True
        while improved:
            improved = False
            for dr, dc in ((-step, 0), (step, 0), (0, -step), (0, step)):
                mv = (mv0[0] + dr, mv0[1] + dc)
                if _clamp_mv(mv, mb_r, mb_c, mb_rows, mb_cols) != mv:
                    continue
                pred = predict_inter_block(ref_ext, r, c, bh, bw, mv)
                sad = int(np.abs(pred - src).sum())
                if sad < sad0:
                    sad0, mv0 = sad, mv
                    improved = True
    return sad0, mv0


def encode_vp8_inter(
    img: np.ndarray,
    refs: dict,
    dims: tuple[int, int],
    qi: int = 12,
    filter_level: int = 0,
    sharpness: int = 0,
    refresh_last: bool = True,
    refresh_golden: bool = False,
    refresh_altref: bool = False,
    copy_golden: int = 0,
    copy_altref: int = 0,
    force_splitmv: bool = False,
    allow_golden_ref: bool = False,
    search_range: int = 4,
    recon_out: dict | None = None,
    sign_bias: dict | None = None,
    version: int = 0,
) -> bytes:
    """Encode an RGB frame as a VP8 inter frame against ``refs``.

    Per macroblock the encoder evaluates ZEROMV / NEARESTMV / NEARMV /
    NEWMV (full-pel search + half/quarter refinement) against the LAST
    reference (plus GOLDEN when ``allow_golden_ref``), an intra
    DC/V/H/TM fallback, and — under ``force_splitmv`` — the 4-quarter
    SPLITMV shape with per-quarter vectors, choosing sub-modes
    LEFT/ABOVE/ZERO/NEW exactly as the decoder's neighbor rules
    resolve them.  Reconstruction runs the decoder's own inverse path
    (prediction clamp, dequant, IDCT, loop filter), so ``recon_out``
    is bit-identical to what ``decode_vp8_inter_frame`` produces.
    Entropy probabilities stay at their defaults (no updates written,
    refresh_entropy_probs=1).  ``version`` selects the reconstruction
    profile (reference vp8_setup_version): 0 = sixtap + normal loop
    filter, 1 = bilinear + simple filter, 2 = bilinear + no filter,
    3 = full-pel bilinear + no filter (filter_level is forced to 0
    for 2/3)."""
    if version not in (0, 1, 2, 3):
        raise ValueError(f"bad VP8 version {version}")
    bilinear = version in (1, 2, 3)
    fullpel = version == 3
    if version >= 2:
        filter_level = 0
    w, h = dims
    mb_cols, mb_rows = (w + 15) // 16, (h + 15) // 16
    ysrc, usrc, vsrc = _rgb_to_planes(img, mb_rows, mb_cols)
    dqf = dequant_factors(qi)
    ent = default_entropy()
    if sign_bias is None:
        sign_bias = {INTRA_FRAME: 0, LAST_FRAME: 0,
                     GOLDEN_FRAME: 0, ALTREF_FRAME: 0}
    prob_skip_false = 128
    prob_intra, prob_last, prob_gf = 63, 128, 128

    planes = {
        "y": np.zeros((mb_rows * 16, mb_cols * 16), dtype=np.int64),
        "u": np.zeros((mb_rows * 8, mb_cols * 8), dtype=np.int64),
        "v": np.zeros((mb_rows * 8, mb_cols * 8), dtype=np.int64),
    }
    ref_ext = {
        name: {k: extend_borders(p) for k, p in bufs.items()}
        for name, bufs in refs.items()
    }
    ref_name = {LAST_FRAME: "last", GOLDEN_FRAME: "golden",
                ALTREF_FRAME: "altref"}

    mbe = BoolEncoder()
    tbe = BoolEncoder()

    # --- frame header (decoder field order) ---
    mbe.write_bool(128, 0)          # segmentation disabled
    mbe.write_bool(128, 0 if version == 0 else 1)  # filter type
    mbe.write_literal(filter_level, 6)
    mbe.write_literal(sharpness, 3)
    mbe.write_bool(128, 0)          # lf deltas disabled
    mbe.write_literal(0, 2)         # 1 token partition
    mbe.write_literal(qi, 7)
    for _ in range(5):
        mbe.write_bool(128, 0)      # no quantizer deltas
    mbe.write_bool(128, 1 if refresh_golden else 0)
    mbe.write_bool(128, 1 if refresh_altref else 0)
    if not refresh_golden:
        mbe.write_literal(copy_golden, 2)
    if not refresh_altref:
        mbe.write_literal(copy_altref, 2)
    mbe.write_bool(128, sign_bias[GOLDEN_FRAME])
    mbe.write_bool(128, sign_bias[ALTREF_FRAME])
    mbe.write_bool(128, 1)          # refresh entropy probs
    mbe.write_bool(128, 1 if refresh_last else 0)
    for t in range(4):
        for bb in range(8):
            for c in range(3):
                for pi in range(11):
                    mbe.write_bool(COEF_UPDATE_PROBS[t][bb][c][pi], 0)
    mbe.write_bool(128, 1)          # mb_no_skip_coeff
    mbe.write_literal(prob_skip_false, 8)
    mbe.write_literal(prob_intra, 8)
    mbe.write_literal(prob_last, 8)
    mbe.write_literal(prob_gf, 8)
    mbe.write_bool(128, 0)          # no ymode prob update
    mbe.write_bool(128, 0)          # no uv prob update
    for comp in range(2):
        for i in range(19):
            mbe.write_bool(MV_UPDATE_PROBS[comp][i], 0)

    above = {
        "y": np.zeros(mb_cols * 4, dtype=np.int8),
        "u": np.zeros(mb_cols * 2, dtype=np.int8),
        "v": np.zeros(mb_cols * 2, dtype=np.int8),
        "y2": np.zeros(mb_cols, dtype=np.int8),
    }
    mbinfo: list[list[dict | None]] = [
        [None] * mb_cols for _ in range(mb_rows)
    ]
    interior = [[False] * mb_cols for _ in range(mb_rows)]
    lf_levels = [[0] * mb_cols for _ in range(mb_rows)]

    for mb_r in range(mb_rows):
        left = {
            "y": np.zeros(4, dtype=np.int8),
            "u": np.zeros(2, dtype=np.int8),
            "v": np.zeros(2, dtype=np.int8),
            "y2": np.zeros(1, dtype=np.int8),
        }
        for mb_c in range(mb_cols):
            ry, cy = mb_r * 16, mb_c * 16
            rc, cc = mb_r * 8, mb_c * 8
            ysb = ysrc[ry: ry + 16, cy: cy + 16]

            def fp(m):
                return (m[0] & ~7, m[1] & ~7) if fullpel else m

            # --- choose (ref, mode, mv) by luma SAD ---
            cand_refs = [LAST_FRAME] + (
                [GOLDEN_FRAME] if allow_golden_ref else []
            )
            choice = None  # (sad, pref, ref, mode, mv, census)

            intra_sad = int(np.abs(
                predict_block(planes["y"], ry, cy, 16, DC_PRED) - ysb
            ).sum())
            for ref in cand_refs:
                rext = ref_ext[ref_name[ref]]
                census = find_near_mvs(
                    mb_r, mb_c, mb_rows, mb_cols, mbinfo, ref, sign_bias
                )
                best, nearest, nearby, cnt = census
                opts = [(ZEROMV, (0, 0), 0)]
                if nearest != (0, 0):
                    opts.append((NEARESTMV, nearest, 1))
                if nearby != (0, 0) and nearby != nearest:
                    opts.append((NEARMV, nearby, 2))
                for mode, mv, pref in opts:
                    cmv = _clamp_mv(mv, mb_r, mb_c, mb_rows, mb_cols)
                    pred = predict_inter_block(
                        rext["y"], ry, cy, 16, 16, fp(cmv), bilinear
                    )
                    sad = int(np.abs(pred - ysb).sum())
                    key = (sad, pref, ref)
                    if choice is None or key < (
                        choice[0], choice[1], choice[2]
                    ):
                        choice = (sad, pref, ref, mode, mv, census)
                sad, mv = _search_mv(
                    rext["y"], ysb, ry, cy, 16, 16, best, search_range,
                    mb_r, mb_c, mb_rows, mb_cols,
                )
                # NEW only wins when strictly better (its delta costs
                # bits), and it must differ from every cheaper spelling
                if mv not in ((0, 0), nearest, nearby):
                    key = (sad, 3, ref)
                    if key < (choice[0], choice[1], choice[2]):
                        choice = (sad, 3, ref, NEWMV, mv, census)

            use_intra = intra_sad < choice[0]
            ref = INTRA_FRAME if use_intra else choice[2]
            mode = DC_PRED if use_intra else choice[3]
            mv = (0, 0) if use_intra else choice[4]
            census = None if use_intra else choice[5]
            sub_mvs = None

            if force_splitmv and not use_intra:
                ref = LAST_FRAME
                census = find_near_mvs(
                    mb_r, mb_c, mb_rows, mb_cols, mbinfo, ref, sign_bias
                )
                mode = SPLITMV
                rext = ref_ext[ref_name[ref]]
                # 4-quarter split: one searched vector per 8x8 quarter
                qmvs = []
                for q in range(4):
                    qr, qc = (q // 2) * 8, (q % 2) * 8
                    src8 = ysrc[ry + qr: ry + qr + 8,
                                cy + qc: cy + qc + 8]
                    _, qmv = _search_mv(
                        rext["y"], src8, ry + qr, cy + qc, 8, 8,
                        census[0], search_range,
                        mb_r, mb_c, mb_rows, mb_cols,
                    )
                    qmvs.append(qmv)
                part_of = MBSPLITS[2]
                sub_mvs = [qmvs[part_of[b]] for b in range(16)]
                mv = sub_mvs[15]

            mbinfo[mb_r][mb_c] = {
                "ref": ref, "mode": mode, "mv": mv, "sub_mvs": sub_mvs,
            }
            lf_levels[mb_r][mb_c] = filter_level
            has_y2 = mode not in (B_PRED, SPLITMV)

            # --- predictions for residual coding ---
            if use_intra:
                uvmode_scores = {}
                for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                    uvmode_scores[m] = int(np.abs(
                        predict_block(planes["u"], rc, cc, 8, m)
                        - usrc[rc: rc + 8, cc: cc + 8]
                    ).sum())
                uvmode = min(
                    uvmode_scores, key=lambda m: (uvmode_scores[m], m)
                )
                pred_y = predict_block(planes["y"], ry, cy, 16, mode)
                pred_u = predict_block(planes["u"], rc, cc, 8, uvmode)
                pred_v = predict_block(planes["v"], rc, cc, 8, uvmode)
            else:
                uvmode = 0
                rext = ref_ext[ref_name[ref]]
                if mode == SPLITMV:
                    pred_y = np.zeros((16, 16), dtype=np.int64)
                    csub = [
                        _clamp_mv(m2, mb_r, mb_c, mb_rows, mb_cols)
                        for m2 in sub_mvs
                    ]
                    for b in range(16):
                        br, bc = (b // 4) * 4, (b % 4) * 4
                        pred_y[br: br + 4, bc: bc + 4] = (
                            predict_inter_block(
                                rext["y"], ry + br, cy + bc, 4, 4,
                                fp(csub[b]), bilinear,
                            )
                        )
                    pred_u = np.zeros((8, 8), dtype=np.int64)
                    pred_v = np.zeros((8, 8), dtype=np.int64)
                    for ci in range(4):
                        cr, ccol = (ci // 2) * 4, (ci % 2) * 4
                        cmv = split_chroma_mv(csub, ci)
                        pred_u[cr: cr + 4, ccol: ccol + 4] = (
                            predict_inter_block(
                                rext["u"], rc + cr, cc + ccol, 4, 4,
                                fp(cmv), bilinear,
                            )
                        )
                        pred_v[cr: cr + 4, ccol: ccol + 4] = (
                            predict_inter_block(
                                rext["v"], rc + cr, cc + ccol, 4, 4,
                                fp(cmv), bilinear,
                            )
                        )
                else:
                    cmv = _clamp_mv(mv, mb_r, mb_c, mb_rows, mb_cols)
                    pred_y = predict_inter_block(
                        rext["y"], ry, cy, 16, 16, fp(cmv), bilinear
                    )
                    cmv2 = chroma_mv(cmv)
                    pred_u = predict_inter_block(
                        rext["u"], rc, cc, 8, 8, fp(cmv2), bilinear
                    )
                    pred_v = predict_inter_block(
                        rext["v"], rc, cc, 8, 8, fp(cmv2), bilinear
                    )

            # --- residual transform + quantization ---
            ycoef, dcs = [], []
            for bi in range(16):
                br, bc = (bi // 4) * 4, (bi % 4) * 4
                res = (
                    ysb[br: br + 4, bc: bc + 4]
                    - pred_y[br: br + 4, bc: bc + 4]
                )
                co = fdct4x4(res)
                if has_y2:
                    dcs.append(co[0])
                    co[0] = 0
                ycoef.append(_quant_block(co, dqf["y1"][0], dqf["y1"][1]))
            y2 = (
                _quant_block(fwht4x4(dcs), dqf["y2"][0], dqf["y2"][1])
                if has_y2
                else None
            )
            uvcoef = {"u": [], "v": []}
            for key2, src, pred in (
                ("u", usrc, pred_u), ("v", vsrc, pred_v)
            ):
                sb = src[rc: rc + 8, cc: cc + 8]
                for bi in range(4):
                    br, bc = (bi // 2) * 4, (bi % 2) * 4
                    res = (
                        sb[br: br + 4, bc: bc + 4]
                        - pred[br: br + 4, bc: bc + 4]
                    )
                    uvcoef[key2].append(
                        _quant_block(fdct4x4(res), dqf["uv"][0],
                                     dqf["uv"][1])
                    )

            skip = (
                (not has_y2 or all(c == 0 for c in y2))
                and all(all(c == 0 for c in bcf) for bcf in ycoef)
                and all(
                    all(c == 0 for c in bcf)
                    for k2 in ("u", "v")
                    for bcf in uvcoef[k2]
                )
            )
            interior[mb_r][mb_c] = (not skip) or mode in (
                B_PRED, SPLITMV
            )

            # --- per-MB syntax (part 1) ---
            mbe.write_bool(prob_skip_false, 1 if skip else 0)
            mbe.write_bool(prob_intra, 0 if use_intra else 1)
            if use_intra:
                mbe.write_tree(YMODE_TREE, ent["ymode"], mode)
                mbe.write_tree(UV_MODE_TREE, ent["uv"], uvmode)
            else:
                mbe.write_bool(prob_last, 0 if ref == LAST_FRAME else 1)
                if ref != LAST_FRAME:
                    mbe.write_bool(
                        prob_gf, 1 if ref == ALTREF_FRAME else 0
                    )
                best, nearest, nearby, cnt = census
                mbe.write_tree(MV_REF_TREE, mv_ref_probs(cnt), mode)
                if mode == NEWMV:
                    d = (mv[0] - best[0], mv[1] - best[1])
                    write_mv(mbe, d, ent["mv"])
                elif mode == SPLITMV:
                    mbe.write_tree(MBSPLIT_TREE, MBSPLIT_PROBS, 2)
                    part_of = MBSPLITS[2]
                    above_i = mbinfo[mb_r - 1][mb_c] if mb_r else None
                    left_i = mbinfo[mb_r][mb_c - 1] if mb_c else None

                    def _nbr_mv(info, b):
                        if info is None:
                            return (0, 0)
                        if info["mode"] == SPLITMV:
                            return info["sub_mvs"][b]
                        return info["mv"]

                    for part in range(4):
                        b0 = part_of.index(part)
                        lmv = (
                            sub_mvs[b0 - 1]
                            if b0 % 4
                            else _nbr_mv(left_i, b0 + 3)
                        )
                        amv = (
                            sub_mvs[b0 - 4]
                            if b0 >= 4
                            else _nbr_mv(above_i, b0 + 12)
                        )
                        smv = sub_mvs[b0]
                        probs4 = SUB_MV_REF_PROBS[_sub_mv_ctx(lmv, amv)]
                        if smv == lmv:
                            smode = LEFT4X4
                        elif smv == amv:
                            smode = ABOVE4X4
                        elif smv == (0, 0):
                            smode = ZERO4X4
                        else:
                            smode = NEW4X4
                        mbe.write_tree(SUB_MV_REF_TREE, probs4, smode)
                        if smode == NEW4X4:
                            d = (smv[0] - best[0], smv[1] - best[1])
                            write_mv(mbe, d, ent["mv"])

            # --- tokens (partition 2) ---
            if skip:
                left["y"][:] = 0
                left["u"][:] = 0
                left["v"][:] = 0
                above["y"][mb_c * 4: mb_c * 4 + 4] = 0
                above["u"][mb_c * 2: mb_c * 2 + 2] = 0
                above["v"][mb_c * 2: mb_c * 2 + 2] = 0
                if has_y2:
                    left["y2"][0] = 0
                    above["y2"][mb_c] = 0
            else:
                if has_y2:
                    ctx = int(left["y2"][0]) + int(above["y2"][mb_c])
                    nz = encode_coeffs(tbe, y2, 1, 0, ctx, ent["coef"])
                    left["y2"][0] = nz
                    above["y2"][mb_c] = nz
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for bi in range(16):
                    br, bc = bi // 4, bi % 4
                    ctx = int(left["y"][br]) + int(
                        above["y"][mb_c * 4 + bc]
                    )
                    nz = encode_coeffs(
                        tbe, ycoef[bi], ytype, first, ctx, ent["coef"]
                    )
                    left["y"][br] = nz
                    above["y"][mb_c * 4 + bc] = nz
                for k2 in ("u", "v"):
                    for bi in range(4):
                        br, bc = bi // 2, bi % 2
                        ctx = int(left[k2][br]) + int(
                            above[k2][mb_c * 2 + bc]
                        )
                        nz = encode_coeffs(
                            tbe, uvcoef[k2][bi], 2, 0, ctx, ent["coef"]
                        )
                        left[k2][br] = nz
                        above[k2][mb_c * 2 + bc] = nz

            # --- decoder-loop reconstruction ---
            qcoef = {"y2": y2, "y": ycoef, "u": uvcoef["u"],
                     "v": uvcoef["v"]}
            if use_intra:
                from conte_to_fresco_etl_spark.operators.media_vp8 import (
                    reconstruct_mb,
                )

                reconstruct_mb(
                    planes, mb_r, mb_c, mode, uvmode, None, qcoef, dqf
                )
            else:
                reconstruct_inter_mb(
                    planes, mb_r, mb_c, mb_rows, mb_cols,
                    ref_ext[ref_name[ref]], mode, mv, sub_mvs, qcoef,
                    dqf, bilinear, fullpel,
                )

    if version < 2 and filter_level > 0 and any(
        any(lv > 0 for lv in row) for row in lf_levels
    ):
        lf = loop_filter_frame if version == 0 else (
            loop_filter_frame_simple
        )
        lf(planes, mb_rows, mb_cols, lf_levels, sharpness, interior)
    if recon_out is not None:
        recon_out.update(planes)

    part1 = mbe.finish()
    part2 = tbe.finish()
    # inter frame: keyframe bit SET (tag & 1 == 1), show_frame on
    tag = (len(part1) << 5) | (1 << 4) | (version << 1) | 1
    return bytes(
        [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF]
    ) + part1 + part2


# ---------------------------------------------------------------------------
# Stream drivers
# ---------------------------------------------------------------------------


def decode_vp8_stream(payloads: list[bytes]) -> list[dict]:
    """Decode a sequence of VP8 frames (first must be a key frame),
    maintaining the last/golden/altref reference buffers, entropy
    persistence, and sign-bias state.  Returns one
    {"planes", "keyframe", ...info} dict per frame."""
    refs: dict | None = None
    dims: tuple[int, int] | None = None
    entropy = default_entropy()
    sign_bias = {INTRA_FRAME: 0, LAST_FRAME: 0,
                 GOLDEN_FRAME: 0, ALTREF_FRAME: 0}
    out = []
    for payload in payloads:
        if len(payload) < 3:
            raise ValueError("truncated VP8 frame")
        keyframe = not (payload[0] & 1)
        if keyframe:
            state: dict = {}
            planes, w, h = decode_vp8_planes(payload, state_out=state)
            dims = (w, h)
            # a key frame resets every persistent probability, then its
            # own coefficient updates persist only under refresh
            entropy = default_entropy()
            if state.get("refresh_entropy"):
                entropy["coef"] = state["coef_probs"]
            sign_bias = {INTRA_FRAME: 0, LAST_FRAME: 0,
                         GOLDEN_FRAME: 0, ALTREF_FRAME: 0}
            refs = {"last": planes, "golden": planes, "altref": planes}
            out.append({"planes": planes, "keyframe": True})
        else:
            if refs is None:
                raise ValueError("VP8 stream must start with a key frame")
            planes, info = decode_vp8_inter_frame(
                payload, refs, entropy, sign_bias, dims
            )
            old = dict(refs)
            if info["refresh_golden"]:
                refs["golden"] = planes
            elif info["copy_golden"] == 1:
                refs["golden"] = old["last"]
            elif info["copy_golden"] == 2:
                refs["golden"] = old["altref"]
            if info["refresh_altref"]:
                refs["altref"] = planes
            elif info["copy_altref"] == 1:
                refs["altref"] = old["last"]
            elif info["copy_altref"] == 2:
                refs["altref"] = old["golden"]
            if info["refresh_last"]:
                refs["last"] = planes
            out.append({"planes": planes, "keyframe": False, **info})
    return out


# ---------------------------------------------------------------------------
# IVF container (the standard raw-VP8 file format)
# ---------------------------------------------------------------------------


def parse_ivf(payload: bytes) -> dict:
    """Parse an IVF file (32-byte "DKIF" header + per-frame 12-byte
    headers): returns {"fourcc", "width", "height", "timebase_den",
    "timebase_num", "n_frames", "frames": [(timestamp, bytes), ...]}.
    Truncated headers or frame overruns raise ``ValueError``."""
    if len(payload) < 32 or payload[:4] != b"DKIF":
        raise ValueError("not an IVF file")
    (version, hdr_len) = struct.unpack_from("<HH", payload, 4)
    if version != 0 or hdr_len < 32:
        raise ValueError(f"bad IVF header (version={version})")
    fourcc = payload[8:12].decode("ascii", "replace")
    w, h = struct.unpack_from("<HH", payload, 12)
    den, num = struct.unpack_from("<II", payload, 16)
    (n_frames,) = struct.unpack_from("<I", payload, 24)
    frames = []
    off = hdr_len
    while off + 12 <= len(payload):
        (sz,) = struct.unpack_from("<I", payload, off)
        (ts,) = struct.unpack_from("<Q", payload, off + 4)
        off += 12
        if off + sz > len(payload):
            raise ValueError("truncated IVF frame")
        frames.append((ts, payload[off: off + sz]))
        off += sz
    return {
        "fourcc": fourcc, "width": w, "height": h,
        "timebase_den": den, "timebase_num": num,
        "n_frames": n_frames, "frames": frames,
    }


def build_ivf(
    frames: list[bytes], width: int, height: int,
    fourcc: bytes = b"VP80", den: int = 30, num: int = 1,
) -> bytes:
    """Assemble an IVF file from raw VP8 frame payloads."""
    out = bytearray()
    out += b"DKIF" + struct.pack("<HH", 0, 32) + fourcc
    out += struct.pack("<HH", width, height)
    out += struct.pack("<II", den, num)
    out += struct.pack("<I", len(frames)) + b"\x00" * 4
    for i, f in enumerate(frames):
        out += struct.pack("<I", len(f)) + struct.pack("<Q", i) + f
    return bytes(out)


def decode_ivf(payload: bytes) -> list[dict]:
    """Decode every frame of a VP8 IVF file (parse_ivf +
    decode_vp8_stream)."""
    ivf = parse_ivf(payload)
    if ivf["fourcc"] != "VP80":
        raise ValueError(f"not a VP8 IVF stream ({ivf['fourcc']})")
    return decode_vp8_stream([f for _, f in ivf["frames"]])


def ivf_frame_stats(payload: bytes) -> dict:
    """Tag-level triage of a VP8 IVF file WITHOUT decoding: per-frame
    uncompressed-header fields (keyframe bit, version, show_frame) and
    keyframe start-code / dimension validation — the video inventory a
    crawl pipeline wants before committing to a full decode.  Raises
    ``ValueError`` on container corruption, a bad keyframe start code,
    a frame too short for its own header, or a keyframe whose coded
    dimensions contradict the IVF header."""
    ivf = parse_ivf(payload)
    if ivf["fourcc"] != "VP80":
        raise ValueError(f"not a VP8 IVF stream ({ivf['fourcc']})")
    n_key = n_shown = 0
    total = max_bytes = 0
    width = height = None
    for _ts, frame in ivf["frames"]:
        if len(frame) < 3:
            raise ValueError("truncated VP8 frame in IVF")
        tag = frame[0] | frame[1] << 8 | frame[2] << 16
        keyframe = not (tag & 1)
        version = (tag >> 1) & 7
        if version > 3:
            raise ValueError(f"bad VP8 version {version}")
        show = (tag >> 4) & 1
        part1 = tag >> 5
        hdr = 10 if keyframe else 3
        if hdr + part1 > len(frame):
            raise ValueError("VP8 first-partition size overruns frame")
        if keyframe:
            if frame[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 start code in IVF keyframe")
            w = (frame[6] | frame[7] << 8) & 0x3FFF
            h = (frame[8] | frame[9] << 8) & 0x3FFF
            if width is None:
                width, height = w, h
                if (w, h) != (ivf["width"], ivf["height"]):
                    raise ValueError(
                        "IVF header dimensions contradict keyframe"
                    )
            n_key += 1
        n_shown += show
        total += len(frame)
        max_bytes = max(max_bytes, len(frame))
    return {
        "n_frames": len(ivf["frames"]),
        "n_keyframes": n_key,
        "n_shown": n_shown,
        "width": width,
        "height": height,
        "total_frame_bytes": total,
        "max_frame_bytes": max_bytes,
    }
