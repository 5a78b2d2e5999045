"""Pure-python PNG codec (stdlib zlib/struct only).

Closes the multimodal codec gate without PIL: a real decoder for the
PNG subset a data pipeline meets in practice — 8-bit depth, color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), all five
scanline filters, non-interlaced — plus a matching encoder (filter
choice per row for roundtrip coverage) and a nearest-neighbor resize.

This is NOT a general imaging library: it exists so decode_images /
resize_images run REAL bytes end-to-end in any environment.  When PIL
is importable those functions still prefer it (full format coverage);
this module is the dependency-free floor, not a replacement.

Reference parity note: the reference engine has no image codec either —
its media handling stops at opaque blobs; this closes OUR stated gap
(OPERATORS.md 🧩) rather than porting reference behavior.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MODE = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes):
    """Decode a PNG → (width, height, mode, pixels) where ``pixels`` is a
    bytes object of de-filtered samples, row-major, ``len == w*h*channels``
    (palette images are expanded to RGB; mode reported as 'RGB')."""
    if data[: len(_SIG)] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos = len(_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngError("missing IHDR")
    if bit_depth != 8:
        raise PngError(f"unsupported bit depth {bit_depth} (8 only)")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    if interlace:
        raise PngError("interlaced PNG not supported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    expected = (stride + 1) * height
    if len(raw) != expected:
        raise PngError(f"bad IDAT length {len(raw)} != {expected}")
    out = bytearray(stride * height)
    prev_start = None
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            if prev_start is not None:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                up = out[prev_start + i] if prev_start is not None else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                up = out[prev_start + i] if prev_start is not None else 0
                ul = (
                    out[prev_start + i - ch]
                    if (prev_start is not None and i >= ch)
                    else 0
                )
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"unknown filter {f}")
        out[y * stride : (y + 1) * stride] = line
        prev_start = y * stride
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
        return width, height, "RGB", bytes(rgb)
    return width, height, _MODE[color_type], bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, mode: str, pixels: bytes) -> bytes:
    """Encode samples → PNG bytes.  ``mode`` in {'L','LA','RGB','RGBA'}.
    The scanline filter CYCLES 0→4 by row so a roundtrip exercises every
    de-filter branch (a constant filter-0 stream would leave Sub/Up/
    Average/Paeth untested)."""
    ct = {"L": 0, "LA": 4, "RGB": 2, "RGBA": 6}.get(mode)
    if ct is None:
        raise PngError(f"unsupported encode mode {mode}")
    ch = _CHANNELS[ct]
    stride = width * ch
    if len(pixels) != stride * height:
        raise PngError(f"pixel buffer {len(pixels)} != {stride * height}")
    raw = bytearray()
    prev = None
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        f = y % 5 if prev is not None else (y % 2)  # rows 0: filter 0/1 only
        raw.append(f)
        if f == 0:
            raw += line
        elif f == 1:
            raw += bytes(
                (line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:
            raw += bytes(
                (line[i] - (((line[i - ch] if i >= ch else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        else:
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ct, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample (the standard cheap pre-filter for
    thumbnailing / model-input normalization)."""
    out = bytearray(tw * th * channels)
    for ty in range(th):
        sy = min(height - 1, ty * height // th)
        src_row = sy * width * channels
        dst_row = ty * tw * channels
        for tx in range(tw):
            sx = min(width - 1, tx * width // tw)
            s = src_row + sx * channels
            d = dst_row + tx * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)
