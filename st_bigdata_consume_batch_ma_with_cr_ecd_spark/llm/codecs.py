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
        if pos + 8 + size > len(payload):
            # a declared size past the end means a truncated stream —
            # decoding the partial bytes would be a silent wrong result
            raise ValueError(
                f"WAV truncated: chunk {cid!r} declares {size} bytes, "
                f"{len(payload) - pos - 8} remain"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"WAV fmt chunk too short: {len(fmt)} bytes (need 16)")
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


# --------------------------------------------------------------------------
# PNG (8-bit truecolor / truecolor+alpha / grayscale, non-interlaced)
# --------------------------------------------------------------------------
#
# PNG adds one real compression layer (zlib, in the stdlib) plus the
# per-row predictor filters — both fully specified in the public PNG
# spec (RFC 2083). Supporting the subset real training fixtures use
# (bit depth 8, color types 0/2/6, no interlace) keeps the decoder
# ~80 lines of numpy while rejecting everything else loudly.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array.

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 6 (RGBA),
    non-interlaced — the fixtures a data pipeline actually generates.
    All five row filters (None/Sub/Up/Average/Paeth) are implemented;
    unsupported shapes raise ``ValueError`` naming the field.
    """
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    idat = b""
    height = bit_depth = color_type = interlace = None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type} (only 0/2/6)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    raw = zlib.decompress(idat)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, data_rows = rows[:, 0], rows[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        f, cur = filters[y], data_rows[y].copy()
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = cur + prior
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            row = out[y]
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                if f == 1:
                    val = int(cur[x]) + int(left)
                elif f == 3:
                    val = int(cur[x]) + ((int(left) + int(up)) >> 1)
                else:
                    val = int(cur[x]) + int(
                        _paeth(np.uint8(left), np.uint8(up), np.uint8(ul))
                    )
                row[x] = val & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f} on row {y}")
    return out.reshape(height, width, channels)


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 1|3|4) or (h, w) uint8 array -> PNG bytes (filter 0 rows,
    single IDAT) — fixture-generation twin of :func:`decode_png`."""
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, channels = px.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Container-sniffing image decode: dispatch on magic bytes to the
    BMP or PNG codec. Returns (h, w, channels) uint8."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    raise ValueError(f"unsupported image format (magic bytes {payload[:8]!r})")


# --------------------------------------------------------------------------
# Y4M / YUV4MPEG2 (uncompressed video container)
# --------------------------------------------------------------------------
#
# The one video container that is honestly parseable without
# pyav/ffmpeg: a text header line, then raw YUV frames each prefixed
# by a FRAME line (public format, shipped by ffmpeg/mjpegtools).
# Supporting it makes keyframe SAMPLING real — compressed codecs
# (h264/vp9) still genuinely need pyav and stay gated.

_Y4M_MAGIC = b"YUV4MPEG2"


def decode_y4m(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Y4M bytes -> (width, height, [luma plane (h, w) uint8, ...]).

    Supports C420* (1.5 bytes/px) and C444 (3 bytes/px) chroma, the
    ffmpeg defaults; chroma planes are skipped (luma is what frame
    sampling and thumbnailing consume). Malformed streams raise
    ``ValueError`` naming the field.
    """
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.index(b"\n")
    width = height = None
    chroma = "420"
    for tok in payload[len(_Y4M_MAGIC) : nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("C"):
            chroma = t[1:]
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if chroma.startswith("420"):
        frame_size = width * height * 3 // 2
    elif chroma == "444":
        frame_size = width * height * 3
    else:
        raise ValueError(f"unsupported Y4M chroma {chroma}")
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1
        if pos + frame_size > len(payload):
            raise ValueError("Y4M truncated mid-frame")
        luma = np.frombuffer(payload, dtype=np.uint8, count=width * height, offset=pos)
        frames.append(luma.reshape(height, width).copy())
        pos += frame_size
    return width, height, frames


def encode_y4m(frames: list[np.ndarray], *, fps: int = 30) -> bytes:
    """[(h, w) uint8 luma, ...] -> C420 Y4M bytes (flat gray chroma) —
    fixture-generation twin of :func:`decode_y4m`."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()]
    for f in frames:
        arr = np.asarray(f, dtype=np.uint8)
        if arr.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        out.append(b"FRAME\n" + arr.tobytes() + chroma + chroma)
    return b"".join(out)
