"""Dependency-free decoders for simple media containers.

The multimodal operators treat payloads as opaque bytes; the decode stage
was stubbed behind Pillow/torchaudio. But the SIMPLE containers — WAV
(RIFF chunks), BMP (BITMAPINFOHEADER), PPM (P6), and 8-bit RGB PNG
(zlib + per-scanline filters) — are public fixed layouts parseable with
``struct``/``zlib``/numpy, no codec library required. These decoders make
the decode stage real for those formats; genuinely codec-bound formats
(JPEG, MP3, H.264) remain stubbed with a clear error marker.

Each ``parse_*`` takes raw bytes and returns a dict of typed fields;
errors raise ValueError (callers map them to per-row error markers, not
task failures)."""

from __future__ import annotations

import struct
import zlib
from typing import Any


def sniff_format(data: bytes) -> str:
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:2] == b"P6":
        return "ppm"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


def parse_wav(data: bytes) -> dict[str, Any]:
    """RIFF/WAVE: walk chunks, read fmt (PCM only) + data; returns
    channel/rate/width and PCM sample stats (16-bit little-endian)."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if audio_fmt != 1:
                raise ValueError(f"compressed WAV (fmt={audio_fmt}) needs a codec")
            fmt = (n_ch, rate, bits)
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    n_ch, rate, bits = fmt
    if bits != 16:
        raise ValueError(f"{bits}-bit PCM unsupported (16 only)")
    samples = np.frombuffer(pcm[: len(pcm) - (len(pcm) % 2)], dtype="<i2")
    n_frames = len(samples) // n_ch if n_ch else 0
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if len(samples) else 0.0
    return {
        "n_channels": n_ch,
        "sample_rate": rate,
        "bits": bits,
        "n_frames": n_frames,
        "duration_s": round(n_frames / rate + 1e-9, 6) if rate else 0.0,
        "rms": round(rms + 1e-9, 6),
    }


def parse_bmp(data: bytes) -> dict[str, Any]:
    """Uncompressed 24-bpp BITMAPINFOHEADER BMP → dims + mean pixel."""
    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    bpp, comp = struct.unpack_from("<HI", data, 28)[0], struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"bpp={bpp} comp={comp} needs a codec")
    row = (w * 3 + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=row * abs(h), offset=pix_off)
    px = px.reshape(abs(h), row)[:, : w * 3]
    return {
        "width": w,
        "height": abs(h),
        "channels": 3,
        "mean_pixel": round(float(px.mean()) + 1e-9, 6) if px.size else 0.0,
    }


def parse_ppm(data: bytes) -> dict[str, Any]:
    """Binary P6 PPM → dims + mean pixel (8-bit maxval only)."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, pos = [], 2
    while len(fields) < 3 and pos < len(data):
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("16-bit PPM unsupported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "mean_pixel": round(float(px.mean()) + 1e-9, 6) if px.size else 0.0,
    }


def _unfilter(kind: int, cur, prev, bpp: int):
    """PNG per-scanline unfilter (types 0-4), in place on ``cur`` (a
    uint8 numpy array — type-2 'Up' uses its native mod-256 add)."""
    if kind == 0:
        return
    if kind == 2:
        cur += prev
        return
    n = len(cur)
    if kind == 1:
        for i in range(bpp, n):
            cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
    elif kind == 3:
        for i in range(n):
            left = int(cur[i - bpp]) if i >= bpp else 0
            cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
    elif kind == 4:
        for i in range(n):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            cur[i] = (int(cur[i]) + pr) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter {kind}")


def parse_png(data: bytes) -> dict[str, Any]:
    """8-bit RGB/RGBA/grey PNG (non-interlaced) → dims + mean pixel.
    Full filter support (0-4); palette/16-bit/interlace raise."""
    import numpy as np

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", body)
            meta = (w, h, depth, color, interlace)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, interlace = meta
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise ValueError(f"depth={depth} color={color} interlace={interlace} unsupported")
    channels = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        kind, cur = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        _unfilter(kind, cur, prev, channels)
        img[y] = cur
        prev = cur
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "mean_pixel": round(float(img.mean()) + 1e-9, 6) if img.size else 0.0,
    }
