"""Pure-numpy codecs for the two uncompressed multimodal formats.

No PIL / libvips / soundfile in the execution environment, but the
multimodal operators should not have to stub EVERYTHING: BMP (24-bit
uncompressed) and WAV (PCM) are simple enough to parse with
``struct`` + numpy, which makes the ``fake_decode=False`` paths of
``extract_image_features`` / ``resize_images`` /
``extract_audio_features`` real — header parsing, pixel/sample math,
and re-encode all happen inside the Arrow batch, exactly where a
PIL/soundfile call would sit.

Format layouts are public file-format knowledge (the classic
BITMAPFILEHEADER/BITMAPINFOHEADER and RIFF/WAVE chunk structures).
Only the subsets a training-data pipeline actually meets in fixtures
are supported — 24-bit bottom-up or top-down uncompressed BMP, and
8/16-bit PCM WAV — everything else raises ``ValueError`` with the
offending field, never a silent wrong decode.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER)
# --------------------------------------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, pixel offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, compression, ...


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (height, width, 3) uint8 RGB array.

    Supports the common case: BITMAPINFOHEADER (or any >=40-byte info
    header), 24 bits per pixel, BI_RGB (no compression). Rows are
    4-byte aligned in the file and stored bottom-up when height > 0.
    """
    if len(payload) < _BMP_FILE_HDR.size + 40:
        raise ValueError(f"BMP too short: {len(payload)} bytes")
    magic, _, _, _, pixel_offset = _BMP_FILE_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP: magic {magic!r}")
    (hdr_size, width, height, planes, bpp, compression, *_rest) = _BMP_INFO_HDR.unpack_from(
        payload, _BMP_FILE_HDR.size
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP info header size {hdr_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant: planes={planes} bpp={bpp} compression={compression}"
        )
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    stride = (width * 3 + 3) // 4 * 4
    need = pixel_offset + stride * height
    if len(payload) < need:
        raise ValueError(f"BMP truncated: need {need} bytes, have {len(payload)}")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=pixel_offset)
    rows = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR on disk -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB array -> 24-bit bottom-up BMP bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    height, width = arr.shape[:2]
    stride = (width * 3 + 3) // 4 * 4
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = arr[::-1, :, ::-1].reshape(height, width * 3)  # RGB -> BGR, bottom-up
    pixel_offset = _BMP_FILE_HDR.size + 40
    body = rows.tobytes()
    file_hdr = _BMP_FILE_HDR.pack(b"BM", pixel_offset + len(body), 0, 0, pixel_offset)
    info_hdr = _BMP_INFO_HDR.pack(40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + body


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) array — pure index math,
    the same sampling PIL's Image.NEAREST performs."""
    h, w = pixels.shape[:2]
    if target_w <= 0 or target_h <= 0:
        raise ValueError(f"bad target size {target_w}x{target_h}")
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return pixels[ys][:, xs]


# --------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 8/16-bit)
# --------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, (n_frames, n_channels) int16 array).

    Walks the RIFF chunk list (so extra chunks like LIST/fact are
    skipped correctly), requires PCM (format tag 1) at 8 or 16 bits.
    8-bit samples (unsigned on disk) are widened to int16.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    if n_channels < 1:
        raise ValueError(f"bad channel count {n_channels}")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    else:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
    frames = len(samples) // n_channels
    return sample_rate, samples[: frames * n_channels].reshape(frames, n_channels)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n_frames, n_channels) or (n_frames,) int16 array -> 16-bit PCM WAV."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_channels = arr.shape[1]
    data = arr.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * n_channels * 2, n_channels * 2, 16
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
