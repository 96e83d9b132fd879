"""Pure-Python/numpy media codecs for the multimodal pipeline.

Real byte-level decoders (and matching encoders, used by tests and the
synthesis stage) for formats that need nothing beyond the standard library
plus numpy — the point is that ``extract_features(decode_stub=False)`` in
``operators/multimodal.py`` genuinely parses media bytes instead of faking
dimensions, while staying runnable in a container with no PIL/ffmpeg:

- **PNG** (``\\x89PNG``): 8-bit greyscale (color type 0) and truecolor
  (color type 2), all five scanline filters (None/Sub/Up/Average/Paeth),
  zlib-compressed IDAT, CRC-validated chunks.
- **BMP** (``BM``): uncompressed 24-bit BGR, bottom-up rows, 4-byte row
  padding (the BITMAPINFOHEADER layout).
- **WAV** (``RIFF..WAVE``): PCM 16-bit via direct RIFF chunk parsing.

Scale note: these run inside Arrow-batched ``mapInPandas`` stages, so the
per-executor working set is one Arrow batch of payloads, never a partition;
numpy does the per-pixel work in C. Decoders validate magic bytes, sizes,
and CRCs and raise ``MediaFormatError`` on malformed input so a corrupt
payload fails the row batch loudly instead of yielding garbage features.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "MediaFormatError",
    "probe_dims",
    "decode_image",
    "decode_png",
    "decode_bmp",
    "decode_wav",
    "encode_png",
    "encode_bmp",
    "encode_wav",
    "resize_nearest",
    "sniff_format",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class MediaFormatError(ValueError):
    """Raised when payload bytes are not a decodable media format."""


def sniff_format(data: bytes) -> str:
    """Identify a payload by magic bytes: 'png' | 'bmp' | 'wav' | 'unknown'."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def probe_dims(data: bytes) -> tuple[str, int, int, int]:
    """Header-only (kind, width, height, n_frames) — no pixel/sample
    decode. PNG: IHDR fields (signature + first-chunk CRC validated);
    BMP: BITMAPINFOHEADER; WAV: fmt + data chunk walk (frame count from
    sizes). Unknown formats return ("unknown", 0, 0, 0)."""
    kind = sniff_format(data)
    if kind == "png":
        for ctype, body in _png_chunks(data):
            if ctype == b"IHDR":
                w, h = struct.unpack(">II", body[:8])
                return "png", w, h, 1
            break
        raise MediaFormatError("PNG missing IHDR")
    if kind == "bmp":
        if len(data) < 26:
            raise MediaFormatError("truncated BMP header")
        _hdr, w, h = struct.unpack("<Iii", data[14:26])
        if w <= 0 or h <= 0:
            raise MediaFormatError("top-down/degenerate BMP unsupported")
        return "bmp", w, h, 1
    if kind == "wav":
        pos, n_ch, frames_len = 12, 1, None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if cid == b"fmt " and size >= 4:
                n_ch = struct.unpack("<H", data[pos + 10 : pos + 12])[0]
            elif cid == b"data":
                frames_len = size
            pos += 8 + size + (size & 1)
        if frames_len is None:
            raise MediaFormatError("WAV missing data chunk")
        return "wav", 0, 0, frames_len // (2 * max(1, n_ch))
    return "unknown", 0, 0, 0


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _png_chunks(data: bytes):
    pos = 8
    while pos < len(data):
        if pos + 8 > len(data):
            raise MediaFormatError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise MediaFormatError("truncated PNG chunk body")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise MediaFormatError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise MediaFormatError("PNG missing IEND")


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering. ``raw`` is the decompressed byte stream,
    one filter-type byte then ``stride`` bytes per row. Up/None/Average-up
    parts vectorize across the row; Sub/Paeth carry a left-neighbor
    dependency, so those rows walk pixel groups with the numpy kernel doing
    the byte math."""
    raw = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint16)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        ftype = int(raw[y, 0])
        cur = raw[y, 1:].astype(np.uint16)
        if ftype == 0:  # None
            row = cur
        elif ftype == 1:  # Sub
            row = cur.copy()
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            row = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            row = cur.copy()
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            row = cur.copy()
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise MediaFormatError(f"PNG filter type {ftype} unsupported")
        out[y] = row
        prev = row
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit greyscale or RGB PNG to (H, W) or (H, W, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise MediaFormatError("not a PNG (bad signature)")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise MediaFormatError(f"PNG bit depth {depth} unsupported")
            if color == 0:
                channels = 1
            elif color == 2:
                channels = 3
            else:
                raise MediaFormatError(f"PNG color type {color} unsupported")
            if comp != 0 or filt != 0 or interlace != 0:
                raise MediaFormatError("PNG compression/interlace unsupported")
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise MediaFormatError("PNG missing IHDR")
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as exc:
        raise MediaFormatError(f"PNG IDAT inflate failed: {exc}") from exc
    stride = width * channels
    if raw.size != height * (stride + 1):
        raise MediaFormatError(
            f"PNG pixel data size {raw.size} != expected {height * (stride + 1)}"
        )
    px = _unfilter(raw, height, stride, bpp=channels)
    return px.reshape(height, width) if channels == 1 else px.reshape(
        height, width, 3
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode (H, W) or (H, W, 3) uint8 to PNG. ``filter_type`` selects the
    per-row scanline filter (0..4) so tests can exercise every decode path;
    0 (None) is the fast default for the synthesis stage."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        channels, color = 1, 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        channels, color = 3, 2
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    flat = arr.reshape(h, w * channels).astype(np.int16)
    bpp = channels
    rows = []
    prev = np.zeros(w * channels, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:  # Sub
            left = np.zeros_like(cur)
            left[bpp:] = cur[:-bpp]
            enc = (cur - left) & 0xFF
        elif filter_type == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:  # Average
            left = np.zeros_like(cur)
            left[bpp:] = cur[:-bpp]
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:  # Paeth
            left = np.zeros_like(cur)
            left[bpp:] = cur[:-bpp]
            upleft = np.zeros_like(prev)
            upleft[bpp:] = prev[:-bpp]
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError(f"filter_type {filter_type} out of range")
        rows.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(rows), 6)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(
        b"IEND", b""
    )


def decode_image(data: bytes) -> np.ndarray:
    """Decode any supported image payload (PNG or BMP) by magic bytes."""
    kind = sniff_format(data)
    if kind == "png":
        return decode_png(data)
    if kind == "bmp":
        return decode_bmp(data)
    raise MediaFormatError(
        f"not a supported image format (magic={data[:4]!r})"
    )


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise MediaFormatError("not a BMP (bad signature)")
    if len(data) < 54:
        raise MediaFormatError("truncated BMP header")
    (pix_off,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if bpp != 24 or comp != 0:
        raise MediaFormatError(f"BMP bpp={bpp} compression={comp} unsupported")
    if h <= 0 or w <= 0:
        raise MediaFormatError("top-down/degenerate BMP unsupported")
    stride = (w * 3 + 3) & ~3
    need = pix_off + stride * h
    if len(data) < need:
        raise MediaFormatError(f"truncated BMP pixels ({len(data)} < {need})")
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    # bottom-up rows, BGR order → flip both
    return rows[::-1, :, ::-1].copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as an uncompressed 24-bit BMP."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"BMP encoder needs (H, W, 3), got {arr.shape}")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    pixels = body.tobytes()
    pix_off = 54
    file_size = pix_off + len(pixels)
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835,
                      2835, 0, 0)
    )
    return header + pixels


# ---------------------------------------------------------------------------
# WAV (PCM 16-bit)
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM-16 WAV bytes → (samples int16 array of shape (n, ch), rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaFormatError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise MediaFormatError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise MediaFormatError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise MediaFormatError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise MediaFormatError(
            f"WAV format {audio_fmt}/{bits}-bit unsupported (PCM16 only)"
        )
    samples = np.frombuffer(frames, dtype="<i2")
    if n_ch > 1:
        samples = samples[: (len(samples) // n_ch) * n_ch].reshape(-1, n_ch)
    else:
        samples = samples.reshape(-1, 1)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode int16 samples (n,) or (n, ch) as PCM-16 WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples.reshape(-1, 1)
    n_ch = samples.shape[1]
    frames = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W[, C]) via integer index mapping
    ``src = (dst * src_len) // dst_len`` (pure gathers — no interpolation
    float math, so results are exactly reproducible in the SQL oracle)."""
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]
