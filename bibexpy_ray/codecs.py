"""Image codecs for the synthetic image+caption corpus: stdlib-only.

The sandbox ships no image libraries (PIL/OpenCV), so per the task brief the
lossy-decode path is a clearly-marked deterministic stand-in:

- ``fmt="png"``  — REAL grayscale 8-bit PNG (encode + decode implemented here
  with zlib/struct/crc32; always filter type 0). Lossless.
- ``fmt="jpeg"`` — a deterministic fake-lossy container (magic ``FJPG``):
  pixels quantized to even values (uniform step q=2 -> MSE = 1/3 -> PSNR ≈ 53 dB,
  comfortably above the 40 dB survivor invariant) then zlib-compressed. This
  stands in for JPEG re-encoding; the Ray-side plumbing (binary column, batch
  sizes, actor signature, PSNR verify) is real and tested. Decoding a *real*
  JPEG (SOI magic 0xFFD8) raises NotImplementedError.

Also provides the 64-bit pHash (32x32 mean-resize -> DCT-II -> 8x8 low-frequency
block vs median) used as the perceptual signature, and PSNR for the survivor
invariant (BASELINE.json: decoded-pixel allclose / PSNR >= 40 dB for lossy).
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

_FAKE_JPEG_MAGIC = b"FJPG"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 array as a real grayscale 8-bit PNG."""
    h, w = pixels.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bit depth 8, gray
    raw = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))  # filter 0 per row
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _decode_png_gray(data: bytes) -> np.ndarray:
    pos = len(_PNG_MAGIC)
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color, *_ = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color != 0:
                raise NotImplementedError("only 8-bit grayscale PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("invalid PNG: no IHDR")
    raw = zlib.decompress(idat)
    stride = w + 1
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if (rows[:, 0] != 0).any():
        raise NotImplementedError("only PNG filter type 0 supported")
    return rows[:, 1:].copy()


def encode_fake_jpeg_gray(pixels: np.ndarray) -> bytes:
    """Deterministic fake-lossy encode (see module docstring). Quantizes to even
    pixel values — information is genuinely lost, PSNR vs source ≈ 53 dB."""
    h, w = pixels.shape
    quant = (pixels.astype(np.uint8) & 0xFE)
    return _FAKE_JPEG_MAGIC + struct.pack(">II", w, h) + zlib.compress(quant.tobytes(), 6)


def _decode_fake_jpeg_gray(data: bytes) -> np.ndarray:
    w, h = struct.unpack_from(">II", data, 4)
    raw = zlib.decompress(data[12:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w).copy()


def decode_image(data: bytes) -> np.ndarray:
    """Decode an image payload to a (h, w) uint8 grayscale array.

    Dispatches on magic bytes. Real JPEG decoding is STUBBED (no codec lib in
    this environment) and raises NotImplementedError with a clear message.
    """
    if data[:8] == _PNG_MAGIC:
        return _decode_png_gray(data)
    if data[:4] == _FAKE_JPEG_MAGIC:
        return _decode_fake_jpeg_gray(data)
    if data[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "real JPEG decode requires an image codec library not present in this "
            "environment; synthetic corpora use the deterministic FJPG stand-in"
        )
    raise ValueError(f"unknown image magic: {data[:4]!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images (inf if equal)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ---------------------------------------------------------------------------
# Perceptual hash
# ---------------------------------------------------------------------------

_DCT_N = 32
_DCT_LOW = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= 1.0 / np.sqrt(2)
    return m * np.sqrt(2.0 / n)


_DCT_M = _dct_matrix(_DCT_N)


def phash64(pixels: np.ndarray) -> int:
    """Classic 64-bit perceptual hash: mean-resize to 32x32, 2-D DCT-II, take
    the 8x8 low-frequency block, threshold at its median. Deterministic."""
    h, w = pixels.shape
    # block-mean resize to 32x32 (pad to a multiple first if needed)
    ph = int(np.ceil(h / _DCT_N)) * _DCT_N
    pw = int(np.ceil(w / _DCT_N)) * _DCT_N
    img = np.zeros((ph, pw), dtype=np.float64)
    img[:h, :w] = pixels
    if ph != h:
        img[h:, :w] = pixels[-1:, :]
    if pw != w:
        img[:, w:] = img[:, w - 1 : w]
    small = img.reshape(_DCT_N, ph // _DCT_N, _DCT_N, pw // _DCT_N).mean(axis=(1, 3))
    coef = _DCT_M @ small @ _DCT_M.T
    block = coef[:_DCT_LOW, :_DCT_LOW].ravel()
    med = np.median(block)
    bits = block > med
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


def phash64_signed(pixels: np.ndarray) -> int:
    """phash64 reinterpreted as signed int64 (for Arrow int64 storage)."""
    v = phash64(pixels)
    return v - (1 << 64) if v >= (1 << 63) else v
