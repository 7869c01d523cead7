"""Minimal pure-Python media codecs for the multimodal operators.

The container has no image/audio libraries, so the engine carries real
decoders for three self-contained formats — uncompressed 24-bit BMP
(BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up or top-down, 4-byte row
padding), PNG (8-bit truecolor ± alpha: chunk walk, zlib inflate, all
five row unfilters incl. Paeth) and PCM WAV (stdlib ``wave``) — plus
encoders to build fixtures. If PIL is importable it is preferred for images (any format);
these fallbacks keep ``extract_features`` a REAL decode on at least one
image and one audio format either way.

Everything is deterministic: same payload -> same array -> same
features.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_BMP_HEADER = struct.Struct("<2sIHHI")          # BITMAPFILEHEADER
_BMP_INFO = struct.Struct("<IiiHHIIiiII")       # BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) -> uncompressed 24-bit BMP bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {arr.shape}")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = _BMP_HEADER.pack(b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(arr[y, :, ::-1].tobytes() + pad)  # RGB -> BGR
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> RGB uint8 array (h, w, 3)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _BMP_HEADER.unpack_from(data, 0)
    (info_size, w, h, planes, bpp, compression, *_rest) = _BMP_INFO.unpack_from(
        data, 14
    )
    if info_size < 40:
        raise ValueError(f"unsupported BMP header size {info_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(data) < offset + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """RGB uint8 array (h, w, 3) -> PNG bytes (8-bit truecolor, no
    interlace). ``filter_type`` selects the per-row PNG filter (0-4) —
    0 for normal use; the others exist so tests can exercise every
    unfilter path in decode_png against a known original."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {arr.shape}")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        row = arr[y].reshape(-1)
        raw.append(filter_type)
        raw.extend(_png_filter(filter_type, row, prev).tobytes())
        prev = row
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_filter(ft: int, row: np.ndarray, prev: np.ndarray, bpp: int = 3) -> np.ndarray:
    x = row.astype(np.int32)
    a = np.concatenate([np.zeros(bpp, np.int32), x[:-bpp]])
    b = prev.astype(np.int32)
    if ft == 0:
        out = x
    elif ft == 1:
        out = x - a
    elif ft == 2:
        out = x - b
    elif ft == 3:
        out = x - (a + b) // 2
    elif ft == 4:
        out = x - _paeth(a, b, np.concatenate([np.zeros(bpp, np.int32), b[:-bpp]]))
    else:
        raise ValueError(f"bad PNG filter {ft}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> RGB uint8 array (h, w, 3). Real decode: chunk walk,
    zlib inflate, and all five per-row unfilters (None/Sub/Up/Average/
    Paeth). Supports 8-bit truecolor (type 2) and truecolor+alpha
    (type 6, alpha dropped), no interlace — the shapes this engine's
    fixtures and typical ML thumbnails use; anything else raises."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_MAGIC), None, bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, interlace={interlace})"
        )
    bpp = 3 if color == 2 else 4
    if not idat:
        raise ValueError("PNG missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT: {e}") from e
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            cur = row
        elif ft == 2:
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):
            # left-neighbor dependency -> sequential per pixel group
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(0, stride, bpp):
                a = cur[i - bpp : i] if i else np.zeros(bpp, np.int32)
                b = prev[i : i + bpp]
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[i - bpp : i] if i else np.zeros(bpp, np.int32)
                    pred = _paeth(a, b, c)
                cur[i : i + bpp] = (row[i : i + bpp] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    pixels = out.reshape(h, w, bpp)
    return pixels[:, :, :3].copy()


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 array (n,) or (n, channels) -> PCM WAV bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(arr.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV bytes -> (sample_rate, int16 array (n, channels))."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"unsupported WAV sample width {f.getsampwidth()}")
        frames = f.readframes(f.getnframes())
        arr = np.frombuffer(frames, dtype=np.int16).reshape(
            -1, f.getnchannels()
        )
        return f.getframerate(), arr


def _try_pil_decode(data: bytes) -> np.ndarray | None:
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        return None
    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def decode_image(data: bytes) -> np.ndarray:
    """RGB array from any PIL-supported format when PIL is installed,
    else from the built-in PNG/BMP decoders (sniffed by magic)."""
    pil = _try_pil_decode(data)
    if pil is not None:
        return pil
    if data.startswith(_PNG_MAGIC):
        return decode_png(data)
    return decode_bmp(data)


FEATURE_DIM = 16


def image_features(pixels: np.ndarray) -> np.ndarray:
    """16 deterministic image statistics: dims, per-channel mean/std,
    grayscale mean/std, 6-bin grayscale histogram (density)."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3).astype(np.float64)
    gray = flat.mean(axis=1)
    hist, _ = np.histogram(gray, bins=6, range=(0.0, 255.0001))
    return np.concatenate(
        [
            [float(w), float(h)],
            flat.mean(axis=0) / 255.0,
            flat.std(axis=0) / 255.0,
            [gray.mean() / 255.0, gray.std() / 255.0],
            hist / gray.size,
        ]
    )


def audio_features(sample_rate: int, samples: np.ndarray) -> np.ndarray:
    """16 deterministic audio statistics: shape/rate, amplitude moments,
    RMS, zero-crossing rate, 8-bin |amplitude| histogram (density)."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    zcr = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(n - 1, 1)
    hist, _ = np.histogram(np.abs(mono), bins=8, range=(0.0, 1.0000001))
    return np.concatenate(
        [
            [
                float(samples.shape[1]),
                float(sample_rate),
                float(n),
                mono.mean(),
                mono.std(),
                float(np.sqrt(np.mean(mono**2))),
                zcr,
                float(np.abs(mono).max(initial=0.0)),
            ],
            hist / max(n, 1),
        ]
    )


# --- toy video container ------------------------------------------------------

_VID_MAGIC = b"GSV1"


def encode_video(frames: list, fps: int = 10) -> bytes:
    """Deterministic toy video container "GSV1": magic + u16 fps + u16
    frame count + u32 per-frame length index + concatenated BMP
    payloads. Stands in for MP4/AVI the way encode_bmp stands in for
    JPEG: the container STRUCTURE (index, seekability) is real even
    though the frame codec is trivial — which is exactly what the
    random-access frame extraction path needs to be testable without
    binary media libs in the sandbox."""
    payloads = [encode_bmp(f) for f in frames]
    head = _VID_MAGIC + struct.pack("<HH", fps, len(payloads))
    index = b"".join(struct.pack("<I", len(p)) for p in payloads)
    return head + index + b"".join(payloads)


def video_info(data: bytes) -> tuple[int, int]:
    """(fps, n_frames) from the header only — no frame decode."""
    if len(data) < 8 or data[:4] != _VID_MAGIC:
        raise ValueError("not a GSV1 video payload")
    fps, n = struct.unpack_from("<HH", data, 4)
    return fps, n


def decode_video_frame(data: bytes, i: int) -> np.ndarray:
    """Decode ONLY frame ``i``: seek via the length index, slice that
    frame's bytes, BMP-decode them. The random-access property real
    containers provide — frame extraction cost is per-frame, not
    per-video."""
    fps, n = video_info(data)
    if not 0 <= i < n:
        raise ValueError(f"frame {i} out of range (n={n})")
    lengths = struct.unpack_from(f"<{n}I", data, 8)
    start = 8 + 4 * n + sum(lengths[:i])
    return decode_bmp(data[start : start + lengths[i]])
