"""Image output: PNG (gamma-mapped) and PFM (linear float) writers.

The reference delegates image output to pbrt's film->WriteImage (EXR);
we write PFM for lossless linear radiance and PNG for quick looks.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np


def to_srgb(img: np.ndarray) -> np.ndarray:
    """Linear → sRGB with the standard piecewise curve (pbrt's ToneMap)."""
    img = np.clip(np.asarray(img, np.float64), 0.0, 1.0)
    return np.where(
        img <= 0.0031308, img * 12.92, 1.055 * img ** (1.0 / 2.4) - 0.055
    )


def write_png(path: str, img: np.ndarray, gamma: bool = True) -> None:
    """Write [H, W, 3] float (linear radiance) as 8-bit PNG via stdlib zlib."""
    if gamma:
        img = to_srgb(img)
    data = (np.clip(img, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    h, w, _ = data.shape
    raw = b"".join(
        b"\x00" + data[y].tobytes() for y in range(h)
    )

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def write_pfm(path: str, img: np.ndarray) -> None:
    """Write [H, W, 3] float32 as PFM (linear, lossless)."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"PF\n%d %d\n-1.0\n" % (w, h))
        f.write(img[::-1].tobytes())  # PFM is bottom-up


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        assert f.readline().strip() == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    return data.reshape(h, w, 3)[::-1].copy()


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """L2 image error (the vendored-but-unused sdkComparePPM analogue,
    util/cuda/helper_image.h — actually wired up this time)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def relative_error(a: np.ndarray, ref: np.ndarray, floor: float = 1e-2) -> float:
    """Mean relative radiance error with a luminance floor."""
    a, ref = np.asarray(a, np.float64), np.asarray(ref, np.float64)
    return float(np.mean(np.abs(a - ref) / np.maximum(np.abs(ref), floor)))
