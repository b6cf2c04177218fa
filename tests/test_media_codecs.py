"""Spec-side verification of the round-3 media codecs: baseline
JPEG (operators/jpeg.py), RIFF/WAV PCM audio (operators/audio.py),
and YUV4MPEG2 video (operators/video.py).

The JPEG tests follow the PNG-test doctrine: the expected output is
computed by an INDEPENDENT scalar reimplementation of the spec
(direct O(N⁴) cosine-sum FDCT/IDCT, its own colorspace math, its own
canonical-code builder) — an encoder/decoder bug pair cannot cancel,
because the reference path never touches the module's matrices,
Huffman tables, or bit I/O. Constant-block images additionally have
a pure-arithmetic closed form (the declared query's oracle), checked
here without any DCT at all.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ods_v3_dbt_spark.operators import audio as AU
from ods_v3_dbt_spark.operators import multimodal as MM
from ods_v3_dbt_spark.operators import video as VID
from ods_v3_dbt_spark.operators.jpeg import (
    QUANT_LUMA,
    _scale_quant,
    decode_jpeg,
    encode_jpeg,
)

# ---------------------------------------------------------------------------
# Spec-side JPEG reference (independent of the module's implementation)
# ---------------------------------------------------------------------------


def _ref_fdct(block: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 forward DCT, direct cosine sum — scalar per spec."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] * np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
                        (2 * y + 1) * v * np.pi / 16
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def _ref_idct(coef: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 inverse DCT, direct cosine sum — scalar per spec."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += cu * cv * coef[u, v] * np.cos(
                        (2 * x + 1) * u * np.pi / 16
                    ) * np.cos((2 * y + 1) * v * np.pi / 16)
            out[x, y] = 0.25 * s
    return out


def _ref_gray_pipeline(img: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Spec-side gray encode→decode reference: per 8×8 block, direct
    FDCT, floor(x/q+0.5) quantize, dequant, direct IDCT, +128,
    floor(x+0.5), clip. Image dims must be multiples of 8."""
    h, w = img.shape
    out = np.zeros((h, w), dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64) - 128.0
            coef = np.floor(_ref_fdct(blk) / q + 0.5)
            rec = _ref_idct(coef * q) + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.floor(rec + 0.5), 0, 255
            )
    return out


def test_jpeg_constant_block_closed_form():
    """Pure arithmetic, no DCT anywhere: constant 8×8 blocks through
    a flat-24 table decode to exactly 3·floor((k−128)/3 + 0.5) + 128
    — the declared query's oracle rule."""
    flat24 = np.full((8, 8), 24, dtype=np.int32)
    ks = [ord(c) for c in "0123456789abcdef"]
    arr = np.zeros((16, 64, 1), dtype=np.uint8)
    exp = np.zeros((16, 64), dtype=np.int64)
    for j, k in enumerate(ks):
        by, bx = divmod(j, 8)
        arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0] = k
        exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 3 * int(
            np.floor((k - 128) / 3.0 + 0.5)
        ) + 128
    fmt, w, h, c, out = decode_jpeg(encode_jpeg(arr, quant_luma=flat24))
    assert (fmt, w, h, c) == ("jpeg", 64, 16, 1)
    assert (out[:, :, 0].astype(np.int64) == exp).all()


def test_jpeg_gray_matches_spec_reference():
    """General content: the full codec (Huffman, bit I/O, matrix
    DCT) must reproduce the scalar spec pipeline EXACTLY — the
    entropy layer has to deliver every quantized coefficient
    bit-for-bit for this to hold."""
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    q = _scale_quant(QUANT_LUMA, 90)
    _, w, h, c, out = decode_jpeg(encode_jpeg(img[:, :, None], quality=90))
    ref = _ref_gray_pipeline(img, q.astype(np.float64))
    assert (out[:, :, 0].astype(np.int64) == ref).all()


def _ref_color_pipeline(img: np.ndarray, ql, qc, subsampling: str) -> np.ndarray:
    """Spec-side color reference: own colorspace math + 2×2 box
    subsample + replicate upsample around the scalar DCT core."""
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = np.clip(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5), 0, 255)
    cb = np.clip(np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5), 0, 255)
    cr = np.clip(np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5), 0, 255)
    h, w = y.shape

    def through(plane, q):
        # pad to 8-multiples by edge replication (what the encoder
        # does), run the scalar pipeline, crop back
        ph, pw = plane.shape
        fh, fw = -(-ph // 8) * 8, -(-pw // 8) * 8
        padded = np.empty((fh, fw), dtype=np.float64)
        padded[:ph, :pw] = plane
        if fw > pw:
            padded[:ph, pw:] = padded[:ph, pw - 1 : pw]
        if fh > ph:
            padded[ph:, :] = padded[ph - 1 : ph, :]
        rec = _ref_gray_pipeline(padded.astype(np.uint8), q.astype(np.float64))
        return rec[:ph, :pw].astype(np.float64)

    yd = through(y, ql)
    if subsampling == "420":
        cbs = (cb.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3)) + 2) // 4
        crs = (cr.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3)) + 2) // 4
        cbd = np.repeat(np.repeat(through(cbs, qc), 2, axis=0), 2, axis=1)
        crd = np.repeat(np.repeat(through(crs, qc), 2, axis=0), 2, axis=1)
    else:
        cbd = through(cb, qc)
        crd = through(cr, qc)
    rr = yd + 1.402 * (crd - 128.0)
    gg = yd - 0.344136 * (cbd - 128.0) - 0.714136 * (crd - 128.0)
    bb = yd + 1.772 * (cbd - 128.0)
    return np.stack(
        [np.clip(np.floor(x + 0.5), 0, 255) for x in (rr, gg, bb)], axis=2
    ).astype(np.int64)


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_jpeg_color_matches_spec_reference(subsampling):
    rng = np.random.RandomState(7)
    # smooth-ish content: random low-frequency base + small noise
    base = rng.randint(0, 256, size=(2, 3, 3))
    img = np.clip(
        np.kron(base, np.ones((8, 8, 1))) + rng.randint(-9, 10, size=(16, 24, 3)),
        0,
        255,
    ).astype(np.uint8)
    ql = _scale_quant(QUANT_LUMA, 85)
    from ods_v3_dbt_spark.operators.jpeg import QUANT_CHROMA

    qc = _scale_quant(QUANT_CHROMA, 85)
    _, w, h, c, out = decode_jpeg(
        encode_jpeg(img, quality=85, subsampling=subsampling)
    )
    assert (w, h, c) == (24, 16, 3)
    ref = _ref_color_pipeline(img, ql, qc, subsampling)
    assert (out.astype(np.int64) == ref).all()


def test_jpeg_restart_markers_do_not_change_pixels():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(24, 32, 1)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=75))[4]
    for dri in (1, 2, 5):
        restarted = decode_jpeg(encode_jpeg(img, quality=75, restart_interval=dri))[4]
        assert (plain == restarted).all(), f"restart_interval={dri} changed pixels"


def test_jpeg_handcrafted_bitstream():
    """Decode a JPEG whose entropy data is assembled by an
    INDEPENDENT bit-writer in this test from an independently-built
    canonical code table: one 8×8 gray block, q=1 everywhere,
    DC=−5 (category 3), one AC coefficient +3 at zigzag 1, EOB.
    Expected pixels come from the scalar spec IDCT."""
    # independent canonical builder (Annex C, reimplemented here)
    bits, vals = (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    ac_bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
    ac_vals = [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    ]  # only the first codes are needed
    def canon(bits, vals):
        # keep-first: the padded zero values beyond the real prefix
        # must not steal value 0's (EOB's) canonical code
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                if k < len(vals) and vals[k] not in codes:
                    codes[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return codes

    dc_codes = canon(bits, vals)
    ac_codes = canon(ac_bits, ac_vals + [0] * 200)

    bitstr = ""
    # DC: diff = -5 → category 3, raw bits = -5 + 2^3 - 1 = 2 → '010'
    code, ln = dc_codes[3]
    bitstr += format(code, f"0{ln}b") + "010"
    # AC k=1: run 0, size 2, value 3 → rs=0x02, raw bits '11'
    code, ln = ac_codes[0x02]
    bitstr += format(code, f"0{ln}b") + "11"
    # EOB
    code, ln = ac_codes[0x00]
    bitstr += format(code, f"0{ln}b")
    bitstr += "1" * ((8 - len(bitstr) % 8) % 8)
    entropy = bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))
    entropy = entropy.replace(b"\xff", b"\xff\x00")

    zzq = bytes([1] * 64)
    hdr = b"\xff\xd8"
    hdr += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq
    hdr += b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dht = bytes([0x00]) + bytes(bits) + bytes(vals)
    hdr += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    nv = sum(ac_bits)
    full_ac_vals = (ac_vals + [0] * nv)[:nv]
    dht2 = bytes([0x10]) + bytes(ac_bits) + bytes(full_ac_vals)
    hdr += b"\xff\xc4" + struct.pack(">H", 2 + len(dht2)) + dht2
    hdr += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    payload = hdr + entropy + b"\xff\xd9"

    coef = np.zeros((8, 8))
    coef[0, 0] = -5.0
    coef[0, 1] = 3.0  # zigzag index 1 = (0, 1)
    exp = np.clip(np.floor(_ref_idct(coef) + 128.0 + 0.5), 0, 255).astype(np.int64)
    fmt, w, h, c, out = decode_jpeg(payload)
    assert (fmt, w, h, c) == ("jpeg", 8, 8, 1)
    assert (out[:, :, 0].astype(np.int64) == exp).all()


def test_jpeg_rejects_unsupported_modes():
    img = np.zeros((8, 8, 1), dtype=np.uint8)
    good = encode_jpeg(img)
    # progressive: swap SOF0 (FFC0) for SOF2 (FFC2)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive|SOF"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"NOPE" + good)
    with pytest.raises(ValueError):
        decode_jpeg(good[:20])  # truncated before any scan


def test_jpeg_dispatch_and_feature_rows(spark):
    """decode_raster routes FFD8 payloads to the real decoder; the
    Arrow feature kernel reports real pixel stats for baseline JPEG
    and a per-row ok=false (not a crash) for progressive."""
    img = np.full((8, 8, 1), 200, dtype=np.uint8)
    flat24 = np.full((8, 8), 24, dtype=np.int32)
    good = encode_jpeg(img, quant_luma=flat24)
    fmt, w, h, c, arr = MM.decode_raster(good)
    assert fmt == "jpeg" and (w, h, c) == (8, 8, 1)
    expected = 3 * int(np.floor((200 - 128) / 3.0 + 0.5)) + 128
    assert (arr == expected).all()
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    df = spark.createDataFrame(
        [(1, "image", bytearray(good)), (2, "image", bytearray(prog))],
        "media_id long, media_type string, content binary",
    )
    rows = {r["media_id"]: r for r in MM.decode_features(df).collect()}
    assert rows[1]["ok"] and rows[1]["px_sum"] == expected * 64
    assert not rows[2]["ok"] and "progressive" in rows[2]["error"]


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_roundtrip_and_stats():
    rng = np.random.RandomState(3)
    s = rng.randint(-3000, 3000, size=(500, 2)).astype(np.int16)
    payload = AU.encode_wav(s, 16000)
    rate, ch, bits, arr = AU.decode_wav(payload)
    assert (rate, ch, bits) == (16000, 2, 16)
    assert (arr == s).all()
    rate, ch, bits, n, dur, sumsq, peak, zc = AU.wav_stats(payload)
    mono = s[:, 0].astype(np.int64)
    assert n == 500 and dur == 500 * 1000 // 16000
    assert sumsq == int((mono * mono).sum())
    assert peak == int(np.abs(mono).max())
    assert zc == int(((mono[:-1] * mono[1:]) < 0).sum())


def test_wav_8bit_and_odd_chunk_alignment():
    """8-bit unsigned PCM decodes centered; an odd-length LIST chunk
    before data must be word-aligned past, not desync the walk."""
    samples8 = np.array([0, 128, 255, 64], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + odd[: 8 + 3]
    body += b"\x00"  # RIFF word alignment for the odd chunk
    body += b"data" + struct.pack("<I", 4) + samples8.tobytes()
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, bits, arr = AU.decode_wav(payload)
    assert (rate, ch, bits) == (8000, 1, 8)
    assert (arr[:, 0] == (samples8.astype(np.int16) - 128) * 256).all()


def test_wav_rejects_compressed():
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # 85 = MP3
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="PCM"):
        AU.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError, match="RIFF"):
        AU.decode_wav(b"OggS" + b"\x00" * 40)


def test_wav_resample_and_frames():
    s = np.arange(100, dtype=np.int16)
    r = AU.resample_nearest(s, 16000, 8000)
    assert r.shape[0] == 50 and (r[:, 0] == np.arange(0, 100, 2)).all()
    up = AU.resample_nearest(s, 8000, 16000)
    assert up.shape[0] == 200 and (up[:4, 0] == [0, 0, 1, 1]).all()
    fe = AU.frame_energies(np.array([1, 2, 3, 4, 5], dtype=np.int16), 2)
    assert list(fe) == [5, 25]  # ragged tail dropped


# ---------------------------------------------------------------------------
# Y4M
# ---------------------------------------------------------------------------


def _mk_frames(w, h, nf, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(nf):
        y = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        cb = rng.randint(0, 256, size=(h // 2) * (w // 2)).astype(np.uint8)
        cr = rng.randint(0, 256, size=(h // 2) * (w // 2)).astype(np.uint8)
        out.append((y, cb, cr))
    return out


def test_y4m_roundtrip_planes_exact():
    frames = _mk_frames(12, 8, 4)
    payload = VID.encode_y4m(frames, fps=(30, 1))
    w, h, num, den, chroma, it = VID.decode_y4m(payload)
    assert (w, h, num, den, chroma) == (12, 8, 30, 1, "420jpeg")
    decoded = list(it)
    assert len(decoded) == 4
    for (y, cb, cr), (dy, dcb, dcr) in zip(frames, decoded):
        assert (dy == y).all() and (dcb == cb).all() and (dcr == cr).all()


def test_y4m_stats_and_sampling():
    frames = _mk_frames(10, 6, 7, seed=5)
    payload = VID.encode_y4m(frames, fps=(24, 1))
    stats = VID.y4m_stats(payload, sample_every=3)
    ysums = [int(f[0].sum()) for f in frames]
    assert stats[0:3] == (10, 6, 7)
    assert stats[5] == 7 * 1000 // 24
    assert stats[6] == sum(ysums)
    assert stats[9] == 3  # frames 0, 3, 6
    assert stats[10] == ysums[0] + ysums[3] + ysums[6]


def test_y4m_mono_and_444():
    y = np.arange(48, dtype=np.uint8).reshape(6, 8)
    mono = VID.encode_y4m([(y, None, None)], chroma="mono")
    w, h, *_rest, it = VID.decode_y4m(mono)
    (dy, dcb, dcr), = list(it)
    assert (dy == y).all() and dcb is None
    c = np.arange(48, dtype=np.uint8)
    full = VID.encode_y4m([(y, c, c)], chroma="444")
    *_hdr, it = VID.decode_y4m(full)
    (dy, dcb, dcr), = list(it)
    assert (dcb == c).all()


def test_y4m_rejects_malformed():
    frames = _mk_frames(8, 6, 2)
    payload = VID.encode_y4m(frames)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        VID.decode_y4m(b"RIFF" + payload)
    with pytest.raises(ValueError, match="truncated"):
        VID.y4m_stats(payload[:-5])
    bad = payload.replace(b"FRAME\n", b"FRAMX\n", 1)
    with pytest.raises(ValueError, match="FRAME"):
        VID.y4m_stats(bad)


def test_audio_video_feature_kernels(spark):
    """The mapInPandas plumbing: good payloads → integer features,
    garbage → per-row ok=false, mixed in one batch."""
    s = np.array([100, -200, 300, -400], dtype=np.int16)
    wav = AU.encode_wav(s, 8000)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not audio"))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in AU.audio_features(df).collect()}
    assert rows[1]["ok"] and rows[1]["sumsq"] == int(
        (s.astype(np.int64) ** 2).sum()
    ) and rows[1]["zero_crossings"] == 3
    assert not rows[2]["ok"]

    frames = _mk_frames(8, 6, 3, seed=9)
    y4m = VID.encode_y4m(frames)
    vdf = spark.createDataFrame(
        [(1, bytearray(y4m)), (2, bytearray(b"junk"))],
        "media_id long, content binary",
    )
    vrows = {r["media_id"]: r for r in VID.video_features(vdf, sample_every=2).collect()}
    assert vrows[1]["ok"] and vrows[1]["frame_count"] == 3
    assert vrows[1]["sampled_frames"] == 2
    assert not vrows[2]["ok"]


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

from ods_v3_dbt_spark.operators import gif as G


def test_gif_lzw_roundtrip_edges():
    """KwKwK (immediate repeat runs), dictionary growth through every
    width bump, and the 4096-entry CLEAR reset."""
    # all-same-value input hits the code==len(table) KwKwK case at once
    run = np.zeros(1000, dtype=np.uint8)
    assert (G.lzw_decode(G.lzw_encode(run, 2), 2, 1000) == run).all()
    rng = np.random.RandomState(11)
    big = rng.randint(0, 256, size=70000).astype(np.uint8)  # crosses 4096 reset
    assert (G.lzw_decode(G.lzw_encode(big, 8), 8, 70000) == big).all()


def test_gif_interlace_row_order():
    """An interlaced GIF must decode to the SAME raster as its
    non-interlaced twin — and the stored row order must actually
    differ (i.e. the encoder really interlaced)."""
    rng = np.random.RandomState(5)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    idx = rng.randint(0, 256, size=(13, 7)).astype(np.uint8)
    plain = G.encode_gif([idx], pal, interlace=False)
    inter = G.encode_gif([idx], pal, interlace=True)
    assert plain != inter
    assert (G.decode_gif(plain)[4] == G.decode_gif(inter)[4]).all()
    assert (G.decode_gif(inter)[4][:, :, 0] == idx).all()


def test_gif_animation_frames_delays():
    rng = np.random.RandomState(6)
    pal = np.stack([np.arange(64), np.arange(64) * 2, np.arange(64) * 3], axis=1).astype(np.uint8)
    frames = [rng.randint(0, 64, size=(6, 9)).astype(np.uint8) for _ in range(3)]
    g = G.encode_gif(frames, pal, delays_cs=[10, 20, 30])
    w, h, fs = G.decode_gif_frames(g)
    assert (w, h, len(fs)) == (9, 6, 3)
    for f, want in zip(fs, frames):
        assert (f["indices"] == want).all()
    assert [f["delay_cs"] for f in fs] == [10, 20, 30]
    stats = G.gif_frame_stats(g)
    assert stats[2] == 3 and stats[3] == 60


def test_gif_local_palette_overrides_global():
    """Hand-assembled two-frame GIF: frame 2 carries a LOCAL color
    table that must override the global one."""
    import struct as st

    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    gct = np.array([[10, 10, 10], [20, 20, 20]], dtype=np.uint8)
    lct = np.array([[200, 0, 0], [0, 200, 0]], dtype=np.uint8)
    payload = bytearray(b"GIF89a") + st.pack("<HH", 2, 2)
    payload += bytes([0x80 | 0, 0, 0])  # GCT, 2 entries
    payload += np.vstack([gct]).tobytes()
    lzw = G.lzw_encode(idx.reshape(-1), 2)
    # frame 1: global palette
    payload += b"\x2c" + st.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
    payload += bytes([2, len(lzw)]) + lzw + b"\x00"
    # frame 2: local palette (packed bit 0x80, size field 0 → 2 entries)
    payload += b"\x2c" + st.pack("<HHHH", 0, 0, 2, 2) + bytes([0x80])
    payload += lct.tobytes()
    payload += bytes([2, len(lzw)]) + lzw + b"\x00"
    payload += b"\x3b"
    w, h, fs = G.decode_gif_frames(bytes(payload))
    assert (fs[0]["palette"] == gct).all()
    assert (fs[1]["palette"] == lct).all()
    rgb1 = fs[1]["palette"][fs[1]["indices"]]
    assert rgb1[0, 1].tolist() == [0, 200, 0]


def test_gif_dispatch_and_rejects():
    pal = np.stack([np.arange(4)] * 3, axis=1).astype(np.uint8)
    idx = np.ones((3, 3), dtype=np.uint8)
    g = G.encode_gif([idx], pal)
    fmt, w, h, c, arr = MM.decode_raster(g)
    assert fmt == "gif" and (w, h, c) == (3, 3, 3)
    assert (arr == 1).all()
    with pytest.raises(ValueError, match="signature"):
        G.decode_gif(b"GIF00a" + g[6:])
    with pytest.raises(ValueError):
        G.decode_gif(g[:-10])  # truncated: trailer + data gone
