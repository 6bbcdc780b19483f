"""Pure-Python image codec: BMP (24-bit BI_RGB) and PPM/PGM (binary
P6/P5) — a REAL decoder/encoder pair for the multimodal operators, with
no external media libraries.

Both formats are fully specified public standards (Windows BMP file
structure; Netpbm P5/P6), simple enough to implement exactly in a few
dozen lines, and byte-deterministic — which is what the engine needs:
``operators/multimodal.py``'s decode/resize/feature hooks stop being
stubs the moment this module is installed
(``set_image_decoder(decode_image)``), and the plumbing can be verified
against fixtures of real encoded bytes rather than the deterministic
fake. Formats outside these magics still raise, keeping the error-column
path honest.

Layout notes (the parts that bite):

- BMP pixel rows are stored bottom-up, BGR byte order, each row padded
  to a 4-byte boundary; dimensions live in the BITMAPINFOHEADER at
  fixed little-endian offsets (width @18, height @22, bpp @28).
- PPM/PGM ``P6``/``P5`` headers are ASCII tokens (magic, width, height,
  maxval) separated by whitespace/comments, then a single raw sample
  block, top-down, RGB (P6) or gray (P5).
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER = 14  # BITMAPFILEHEADER
_DIB_HEADER = 40  # BITMAPINFOHEADER


def _bmp_row_size(width: int) -> int:
    return (3 * width + 3) // 4 * 4


def bmp_file_size(width: int, height: int) -> int:
    """Exact file size of a 24-bit BI_RGB BMP — header + padded rows.
    Pure arithmetic, usable from SQL oracles."""
    return _BMP_HEADER + _DIB_HEADER + _bmp_row_size(width) * height


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_bmp expects an (h, w, 3) array")
    h, w, _ = pixels.shape
    row = _bmp_row_size(w)
    size = bmp_file_size(w, h)
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER + _DIB_HEADER)
    out += struct.pack(
        "<IiiHHIIiiII", _DIB_HEADER, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row - 3 * w)
    bgr = pixels[:, :, ::-1]  # RGB -> BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        out += bgr[y].tobytes() + pad
    return bytes(out)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as binary PPM (P6), or (h, w) as PGM
    (P5)."""
    if pixels.ndim == 2:
        h, w = pixels.shape
        return b"P5\n%d %d\n255\n" % (w, h) + pixels.tobytes()
    if pixels.ndim == 3 and pixels.shape[2] == 3:
        h, w, _ = pixels.shape
        return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()
    raise ValueError("encode_ppm expects (h, w) or (h, w, 3)")


def _parse_netpbm_header(b: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse the ASCII header of a binary netpbm file: returns
    (magic, width, height, maxval, data_offset). Comments (#) and any
    whitespace between tokens are legal per the spec."""
    magic = b[:2]
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        if pos >= len(b):
            raise ValueError("truncated netpbm header")
        c = b[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(b) and b[pos : pos + 1].isdigit():
                pos += 1
            vals.append(int(b[start:pos]))
        else:
            raise ValueError(f"bad netpbm header byte {c!r}")
    pos += 1  # single whitespace after maxval, then raw data
    return magic, vals[0], vals[1], vals[2], pos


def decode_image(b: bytes) -> tuple[int, int, int]:
    """Decode BMP/PPM/PGM header -> (width, height, channels). Raises
    ValueError on unknown magic or malformed/truncated payloads — the
    decode_images error column captures this per row."""
    if b[:2] == b"BM":
        if len(b) < _BMP_HEADER + _DIB_HEADER:
            raise ValueError("truncated BMP header")
        w, h = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        if bpp % 8 != 0 or bpp == 0:
            raise ValueError(f"unsupported BMP bpp {bpp}")
        return w, abs(h), bpp // 8
    if b[:2] in (b"P6", b"P5"):
        magic, w, h, maxval, off = _parse_netpbm_header(b)
        if maxval > 255:
            raise ValueError("16-bit netpbm not supported")
        c = 3 if magic == b"P6" else 1
        if len(b) - off < w * h * c:
            raise ValueError("truncated netpbm data")
        return w, h, c
    raise ValueError("unknown image format")


def decode_to_array(b: bytes) -> np.ndarray:
    """Decode BMP/PPM/PGM to an (h, w, channels) uint8 RGB array."""
    if b[:2] == b"BM":
        w, h, c = decode_image(b)
        if c != 3:
            raise ValueError("only 24-bit BMP pixel decode supported")
        off = struct.unpack_from("<I", b, 10)[0]
        row = _bmp_row_size(w)
        arr = np.empty((h, w, 3), dtype=np.uint8)
        for y in range(h):
            line = b[off + y * row : off + y * row + 3 * w]
            # bottom-up, BGR -> top-down, RGB
            arr[h - 1 - y] = np.frombuffer(line, dtype=np.uint8).reshape(
                w, 3
            )[:, ::-1]
        return arr
    if b[:2] in (b"P6", b"P5"):
        magic, w, h, _maxval, off = _parse_netpbm_header(b)
        c = 3 if magic == b"P6" else 1
        flat = np.frombuffer(b, dtype=np.uint8, count=w * h * c, offset=off)
        if magic == b"P5":
            return np.repeat(flat.reshape(h, w, 1), 3, axis=2)
        return flat.reshape(h, w, 3)
    raise ValueError("unknown image format")


def resize_nearest(b: bytes, target_w: int, target_h: int) -> bytes:
    """REAL resize: decode, nearest-neighbor sample to (target_h,
    target_w), re-encode in the input's container format (BMP in -> BMP
    out, netpbm in -> P6 out). Suitable for set_image_resizer."""
    src = decode_to_array(b)
    h, w = src.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    dst = src[ys][:, xs]
    if b[:2] == b"BM":
        return encode_bmp(dst)
    return encode_ppm(dst)


def grid_features(b: bytes, grid: int = 4) -> list[float]:
    """REAL feature vector from decoded pixels: mean intensity of each
    cell of a grid x grid partition, scaled to [0, 1] — a classic tiny
    image descriptor (grayscale grid pooling), deterministic and
    pure-numpy. Suitable for set_feature_extractor (dim = grid*grid)."""
    arr = decode_to_array(b).astype(np.float64)
    gray = arr.mean(axis=2)
    h, w = gray.shape
    out = []
    for gy in range(grid):
        y0, y1 = (gy * h) // grid, max((gy + 1) * h // grid, (gy * h) // grid + 1)
        for gx in range(grid):
            x0, x1 = (
                (gx * w) // grid,
                max((gx + 1) * w // grid, (gx * w) // grid + 1),
            )
            out.append(float(gray[y0:y1, x0:x1].mean() / 255.0))
    return out


def install() -> None:
    """Install the real codec into the multimodal hooks — after this,
    decode_images/resize_images/extract_features run REAL decode on
    BMP/PPM/PGM payloads (and reject others into the error column)."""
    from ballista_extensions_spark.operators import multimodal as M

    M.set_image_decoder(decode_image)
    M.set_image_resizer(resize_nearest)
    M.set_feature_extractor(grid_features)
