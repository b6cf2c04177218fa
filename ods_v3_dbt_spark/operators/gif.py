"""Pure-Python GIF codec (GIF87a/89a): LZW decompression, global and
local color tables, interlacing, multi-frame animation walk — no
media libraries.

Completes the mainstream web-raster set (PNG and baseline JPEG
landed earlier this round): the decoder handles what web-corpus GIFs
are — palette-indexed LZW image data, optional interlace (the
4-pass row order), graphic-control extensions (frame delay,
transparency index recorded, not composited), and animations (the
single-image decode contract returns the FIRST frame as RGB;
:func:`gif_frame_stats` walks every frame for animation features).
Malformed streams raise ``ValueError`` → the per-row ok=false path.

The encoder synthesizes REAL compressed payloads for tests and the
hash-verified query: genuine LZW with dictionary growth and code-size
bumps (not the clear-code-spam shortcut), optional interlace. The
declared query's oracle leans on palette closed forms: with palette
index i → (i, 2i mod 256, 3i mod 256), every decoded pixel's channel
sum is integer-computable in SQL, and a row-weighted checksum makes
de-interlacing order-sensitive (a plain sum wouldn't notice row
shuffling).

Scale notes: identical to the other codecs — ``mapInPandas`` Arrow
batches, payloads never on the driver, flat integer features out.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step)


def _interlace_order(h: int) -> list[int]:
    """Row storage order of an interlaced GIF: pass 1 rows 0,8,16…,
    pass 2 rows 4,12…, pass 3 rows 2,6…, pass 4 rows 1,3,5…"""
    out = []
    for start, step in _INTERLACE_PASSES:
        out.extend(range(start, h, step))
    return out


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first variable-width codes, CLEAR resets
    the dictionary, EOI ends the stream; code width bumps AFTER the
    dictionary reaches 2^width (capped at 12 bits). Returns exactly
    ``expected`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    dict_base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(dict_base)
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(dict_base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError(f"GIF pixel data short: {len(out)} < {expected}")
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real GIF LZW with dictionary growth and width bumps (resets
    at 4096 entries via CLEAR)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits = bytearray()
    acc = 0
    nbits = 0

    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prev = b""
    for b in indices.astype(np.uint8).tobytes():
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out_bits.append(acc & 0xFF)
    return bytes(out_bits)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def decode_gif_frames(payload: bytes):
    """Walk a GIF87a/89a stream → (w, h, frames) where frames is a
    list of dicts: {indices (h_f, w_f) uint8, left, top, palette
    (N, 3) uint8, transparent (index | None), delay_cs}. Frames are
    de-interlaced. Raises ValueError on malformed streams (truncation
    mid-structure included — struct/index errors are normalized so
    the per-row ok=false path always gets the contract exception)."""
    try:
        return _decode_gif_frames(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated/malformed GIF: {e}") from e


def _decode_gif_frames(payload: bytes):
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    w, h = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    gct = None
    i = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[13 : 13 + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n
    frames = []
    transparent = None
    delay_cs = 0
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[i + 1]
            i += 2
            if label == 0xF9:  # graphic control
                size = payload[i]
                flags = payload[i + 1]
                delay_cs = struct.unpack("<H", payload[i + 2 : i + 4])[0]
                transparent = payload[i + 4] if flags & 1 else None
                i += 1 + size
            # skip remaining sub-blocks (incl. comment/app data)
            while True:
                size = payload[i]
                i += 1
                if size == 0:
                    break
                i += size
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh = struct.unpack("<HHHH", payload[i + 1 : i + 9])
            fpacked = payload[i + 9]
            i += 10
            palette = gct
            if fpacked & 0x80:  # local color table
                n = 2 << (fpacked & 0x07)
                palette = np.frombuffer(
                    payload[i : i + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                i += 3 * n
            if palette is None:
                raise ValueError("GIF frame has no color table")
            min_code = payload[i]
            i += 1
            data = bytearray()
            while True:
                size = payload[i]
                i += 1
                if size == 0:
                    break
                data += payload[i : i + size]
                i += size
            idx = lzw_decode(bytes(data), min_code, fw * fh).reshape(fh, fw)
            if fpacked & 0x40:  # interlaced: undo the 4-pass order
                out = np.empty_like(idx)
                out[_interlace_order(fh)] = idx
                idx = out
            frames.append(
                {
                    "indices": idx,
                    "left": left,
                    "top": top,
                    "palette": palette,
                    "transparent": transparent,
                    "delay_cs": delay_cs,
                }
            )
            transparent = None
            delay_cs = 0
        else:
            raise ValueError(f"bad GIF block 0x{b:02X} at byte {i}")
    if not frames:
        raise ValueError("GIF has no image frames")
    return w, h, frames


def decode_gif(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """``decode_raster`` contract: first frame as RGB uint8 (h, w, 3)
    via its palette (transparency index decoded like any other —
    single-image stats don't composite). Animated GIFs decode their
    first frame here; per-frame features via :func:`gif_frame_stats`."""
    w, h, frames = decode_gif_frames(payload)
    f = frames[0]
    fh, fw = f["indices"].shape
    if (f["left"], f["top"], fw, fh) != (0, 0, w, h):
        # compose onto a canvas (background = palette entry 0)
        canvas = np.zeros((h, w), dtype=np.uint8)
        canvas[f["top"] : f["top"] + fh, f["left"] : f["left"] + fw] = f["indices"]
        idx = canvas
    else:
        idx = f["indices"]
    rgb = f["palette"][idx]
    return ("gif", w, h, 3, rgb)


def gif_frame_stats(payload: bytes) -> tuple[int, int, int, int, int]:
    """Animation features: (w, h, n_frames, total_delay_cs,
    rgbsum_first_frame) — the frame walk without materializing
    composited frames."""
    w, h, frames = decode_gif_frames(payload)
    f0 = frames[0]
    rgb = f0["palette"][f0["indices"]]
    return (
        w,
        h,
        len(frames),
        sum(f["delay_cs"] for f in frames),
        int(rgb.sum(dtype=np.int64)),
    )


def encode_gif(
    frames_idx: list[np.ndarray],
    palette: np.ndarray,
    interlace: bool = False,
    delays_cs: list[int] | None = None,
) -> bytes:
    """Palette-index frames (h, w) + palette (N, 3) → GIF89a bytes:
    real LZW, optional interlace, per-frame graphic-control delay."""
    h, w = frames_idx[0].shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size_field = bits - 1
    full = 2 << size_field
    pal = np.zeros((full, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_field, 0, 0])
    out += pal.tobytes()
    min_code = max(2, bits)
    for k, idx in enumerate(frames_idx):
        if delays_cs is not None:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delays_cs[k]) + b"\x00\x00"
        fh, fw = idx.shape
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh)
        out += bytes([0x40 if interlace else 0x00])
        stored = idx[_interlace_order(fh)] if interlace else idx
        out += bytes([min_code])
        data = lzw_encode(stored.reshape(-1), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
