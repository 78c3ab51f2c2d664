"""Multimodal column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker sees whole record batches, never
single rows.

Decode status per op:

- images (``extract_image_features`` / ``resize_images``): REAL for
  24-bit uncompressed BMP and 8-bit PNG (gray/RGB/RGBA, all five row
  filters) via the pure-numpy codecs in :mod:`.codecs`, dispatched on
  magic bytes (``fake_decode=False``); ``fake_decode=True`` keeps
  the deterministic pseudo-features for payloads that are not images
  (the oracle-checked registered queries use text bytes as payloads).
- audio (``extract_audio_features``): REAL for PCM WAV, same codec
  module.
- video (``sample_video_frames``): REAL for uncompressed Y4M
  (YUV4MPEG2) containers via :mod:`.codecs`; compressed codecs
  (h264/vp9) genuinely need pyav/ffmpeg and raise with the dependency
  named. The fake path exercises the fan-out shape (1 row in, N frame
  rows out).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, width int, height int"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a text column as an opaque binary payload (stand-in for an
    image/audio blob column read from parquet)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", *, fake_decode: bool = True
) -> DataFrame:
    """Per-payload feature extraction via mapInPandas.

    ``fake_decode=True``: width/height derived from the first two
    payload bytes (deterministic, engine-independent — what the
    oracle-checked registered query uses, since its payloads are text
    bytes, not images). ``fake_decode=False``: REAL decode — the
    payload is sniffed by magic bytes and parsed as a 24-bit BMP or an
    8-bit PNG by the pure-numpy codecs (:func:`..codecs.decode_image`);
    width/height come from the actual image header. NULL payloads yield zeroed feature rows
    either way; malformed image bytes raise with the offending field.
    """

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        from .codecs import decode_image

        for pdf in batches:
            payloads = pdf[payload_col]
            if fake_decode:
                width = payloads.map(lambda b: (b[0] % 64) + 1 if b else 0)
                height = payloads.map(
                    lambda b: (b[1] % 64) + 1 if b is not None and len(b) > 1 else 0
                )
            else:
                dims = payloads.map(
                    lambda b: decode_image(b).shape[:2] if b is not None else (0, 0)
                )
                height = dims.map(lambda hw: hw[0])
                width = dims.map(lambda hw: hw[1])
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, payload binary, width int, height int"


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake_decode: bool = True,
) -> DataFrame:
    """Batch image resize via mapInPandas: payload in, resized payload +
    dimensions out. ``fake_decode=False`` is a REAL resize for 24-bit
    BMP payloads: decode -> nearest-neighbor index resample -> re-encode
    (pure numpy, :mod:`..codecs`). The fake path truncates/pads bytes to
    ``w*h`` so output sizes (and downstream partition planning) behave
    like the real thing for non-image payloads.

    For multi-MB blobs cap Arrow batch sizes
    (``spark.sql.execution.arrow.maxRecordsPerBatch``) so a batch fits
    executor memory — batch bytes = records x blob size.
    """
    size = target_w * target_h

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        from .codecs import decode_image, encode_bmp, resize_nearest

        for pdf in batches:
            if fake_decode:
                out = pdf[payload_col].map(
                    lambda b: (b or b"\x00")[:size].ljust(size, b"\x00")
                )
            else:
                def real_resize(b):
                    if b is None:
                        return None
                    px = decode_image(b)
                    if px.shape[2] == 1:  # gray PNG -> replicate to RGB
                        import numpy as np

                        px = np.repeat(px, 3, axis=2)
                    return encode_bmp(resize_nearest(px[..., :3], target_w, target_h))

                out = pdf[payload_col].map(real_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def sample_video_frames(
    df: DataFrame,
    *,
    frame_bytes: int = 16,
    every_n: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake_decode: bool = True,
) -> DataFrame:
    """Frame sampling: one input row fans out to one output row per
    kept frame (mapInPandas yields more rows than it receives — the
    shape a real sampler needs). Fake path treats the payload as
    ``frame_bytes``-sized frames and keeps every ``every_n``-th.

    ``fake_decode=False`` is a REAL decode for Y4M/YUV4MPEG2 payloads
    (:func:`..codecs.decode_y4m` — the uncompressed container ffmpeg
    emits): every ``every_n``-th frame's luma plane is the sampled
    frame. Compressed codecs (h264/vp9 in mp4/webm) genuinely need
    pyav/ffmpeg, which this environment lacks — those payloads raise
    ``NotImplementedError`` naming the dependency."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        from .codecs import decode_y4m

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc, b in zip(pdf[id_col], pdf[payload_col]):
                b = b or b""
                if fake_decode:
                    n_frames = max(1, (len(b) + frame_bytes - 1) // frame_bytes)
                    for i in range(0, n_frames, every_n):
                        ids.append(doc)
                        idxs.append(i)
                        frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
                elif not b:
                    continue  # NULL/empty payload: no frames to sample
                elif b.startswith(b"YUV4MPEG2"):
                    _w, _h, lumas = decode_y4m(b)
                    for i in range(0, len(lumas), every_n):
                        ids.append(doc)
                        idxs.append(i)
                        frames.append(lumas[i].tobytes())
                else:
                    raise NotImplementedError(
                        "real frame sampling of compressed video needs pyav/ffmpeg; "
                        "only uncompressed Y4M payloads decode natively"
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(op, FRAME_SCHEMA)


DHASH_SCHEMA = "doc_id long, dhash string"


def dhash_images(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    hash_w: int = 8,
    hash_h: int = 8,
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image payload: REAL decode
    (BMP/PNG via the pure-numpy codecs), nearest-neighbor downsample to
    ``(hash_w + 1) x hash_h``, integer-mean grayscale, then bit (r, c) =
    gray[r, c+1] > gray[r, c] — ``hash_w * hash_h`` gradient-sign bits
    packed row-major MSB-first into a hex string. dHash is stable under
    re-encoding, scaling, and small brightness shifts (the gradient
    SIGN survives what the raw pixels don't), which makes it the
    standard blocking key for image near-dedup; Hamming distance
    between hashes approximates visual difference.

    The hex signature is bit-compatible with the SimHash Hamming-LSH
    machinery (:func:`..dedup.simhash_candidate_pairs` — aligned-block
    banding), so image near-dedup composes from existing parts: dhash
    -> block buckets -> exact Hamming verify. Every arithmetic step is
    integer-exact (index-math resize, ``(r+g+b) // 3`` grayscale,
    strict > compare), so an oracle can replay the hash symbolically
    from the pixel formula of a synthetic corpus.

    NULL payloads emit no row (not comparable — the MinHash/SimHash
    "no signature" contract). ``hash_w * hash_h`` must be a multiple
    of 8 so the signature packs to whole hex bytes."""
    nbits = hash_w * hash_h
    if nbits % 8 != 0:
        raise ValueError(f"hash_w*hash_h must be a multiple of 8, got {nbits}")

    def op(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import decode_image, resize_nearest

        for pdf in batches:
            ids, hashes = [], []
            for doc, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                px = decode_image(bytes(b))
                if px.shape[2] == 1:  # gray PNG -> replicate to RGB
                    px = np.repeat(px, 3, axis=2)
                small = resize_nearest(px[..., :3], hash_w + 1, hash_h)
                gray = small.astype(np.int32).sum(axis=2) // 3
                bits = (gray[:, 1:] > gray[:, :-1]).astype(np.uint8).reshape(-1)
                ids.append(doc)
                hashes.append(np.packbits(bits).tobytes().hex())
            if ids:
                yield pd.DataFrame({"doc_id": ids, "dhash": hashes})

    return df.select(id_col, payload_col).mapInPandas(op, DHASH_SCHEMA)


AUDIO_SCHEMA = "doc_id long, n_samples long, mean_level double, peak_level int"


def extract_audio_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake_decode: bool = True,
) -> DataFrame:
    """Audio feature extraction (level stats) — vectorized per payload
    with numpy. ``fake_decode=False`` is a REAL decode for PCM WAV
    payloads (:func:`..codecs.decode_wav`): n_samples = frame count,
    levels over the absolute int16 amplitude across all channels. The
    fake path reads raw bytes as unsigned 8-bit samples for non-audio
    payloads."""

    def op(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import decode_wav

        for pdf in batches:
            if len(pdf) == 0:  # empty Arrow batch: zip(*[]) would raise
                yield pd.DataFrame(
                    {"doc_id": [], "n_samples": [], "mean_level": [], "peak_level": []}
                )
                continue
            stats = []
            for b in pdf[payload_col]:
                if fake_decode:
                    arr = np.frombuffer(b or b"\x00", dtype=np.uint8)
                    stats.append((len(arr), round(float(arr.mean()), 4), int(arr.max())))
                else:
                    frames = None if b is None else decode_wav(b)[1]
                    if frames is None or frames.size == 0:
                        stats.append((0, 0.0, 0))
                    else:
                        amp = np.abs(frames.astype(np.int32))
                        stats.append(
                            (frames.shape[0], round(float(amp.mean()), 4), int(amp.max()))
                        )
            n, mean, peak = zip(*stats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_samples": n,
                    "mean_level": mean,
                    "peak_level": peak,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, AUDIO_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "doc_id long, window_idx int, n int, sum_abs long, zero_crossings int"
)


def audio_energy_windows(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window: int = 64,
) -> DataFrame:
    """Windowed audio energy + zero-crossing features from REAL PCM WAV
    payloads — the VAD/segmentation primitives of an audio-corpus
    pipeline, one row per ``window``-sample window of each clip:
    ``(id, window_idx, n, sum_abs, zero_crossings)``.

    Everything is INTEGER-exact on purpose: ``sum_abs`` is the L1
    energy of the window (absolute int16 amplitudes summed in int64 —
    abs is taken AFTER widening, since ``abs(int16 -32768)`` overflows
    back to -32768), and ``zero_crossings`` counts sign flips between
    adjacent samples WITHIN the window (sign = ``s < 0``, so 0 is
    non-negative; the flip at a window boundary belongs to neither
    window). Integer outputs make the features bit-replayable by any
    SQL engine — no float RMS rounding contract needed. Multi-channel
    clips use channel 0 (the mono mixdown is a caller decision).

    The decode runs in one ``mapInPandas`` pass (Arrow-batched, decode
    cost linear in payload bytes); the final trailing window keeps its
    short ``n`` rather than being dropped or padded."""

    def op(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import decode_wav

        dtypes = {
            "doc_id": "int64",
            "window_idx": "int32",
            "n": "int32",
            "sum_abs": "int64",
            "zero_crossings": "int32",
        }
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in dtypes}
            for d, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                _, frames = decode_wav(b)
                s = frames[:, 0].astype(np.int64)
                n = s.shape[0]
                if n == 0:
                    continue
                # vectorized per-window aggregation (one reshape-sum per
                # clip instead of a Python loop per window): pad |s| and
                # the adjacent-sign-flip indicator to whole windows with
                # zeros — zeros change neither the L1 sum nor the flip
                # count — after first zeroing the flips that straddle a
                # window boundary (they belong to neither window)
                nw = -(-n // window)
                sa = np.zeros(nw * window, dtype=np.int64)
                sa[:n] = np.abs(s)
                fl = np.zeros(nw * window, dtype=np.int64)
                if n > 1:
                    neg = s < 0
                    fl[: n - 1] = neg[1:] != neg[:-1]
                    fl[window - 1 :: window] = 0  # boundary pairs
                ns = np.full(nw, window, dtype=np.int64)
                ns[-1] = n - (nw - 1) * window
                rows["doc_id"].extend([int(d)] * nw)
                rows["window_idx"].extend(range(nw))
                rows["n"].extend(ns.tolist())
                rows["sum_abs"].extend(sa.reshape(nw, window).sum(axis=1).tolist())
                rows["zero_crossings"].extend(fl.reshape(nw, window).sum(axis=1).tolist())
            yield pd.DataFrame(rows).astype(dtypes)

    return df.select(id_col, payload_col).mapInPandas(op, AUDIO_WINDOW_SCHEMA)


def audio_contour_signature(
    windows: DataFrame,
    *,
    id_col: str = "doc_id",
    n_bits: int = 64,
    window: int | None = None,
) -> DataFrame:
    """Energy-contour sign-delta signature per clip — the audio
    analogue of the image dHash (:func:`dhash_images`): bit ``w`` is
    ``E[w+1] > E[w]`` over the first ``n_bits + 1`` window energies of
    :func:`audio_energy_windows` output, packed MSB-first into a
    lowercase hex string bit-compatible with the SimHash Hamming-LSH
    machinery (``..dedup.simhash_candidate_pairs``). The gradient SIGN
    of the energy contour survives gain changes and re-encoding the
    way the raw energies don't — the standard robust fingerprint trick
    (dHash for images, sign-of-delta spectral fingerprints for audio).

    Pass ``window`` (the :func:`audio_energy_windows` window size) to
    exclude a trailing PARTIAL window from the contour: a short last
    window carries proportionally less energy, so its contour bit is
    systematically biased toward 0 (r8 ADVICE) — with the filter, a
    clip whose first ``n_bits + 1`` windows include the partial one
    emits no signature instead of a biased one. ``window=None`` keeps
    the unfiltered behavior for window frames produced elsewhere.

    Clips with fewer than ``n_bits + 1`` (full) windows emit no row
    (not enough contour to compare — the "no signature" contract
    shared with dhash_images). One shuffle: a single groupBy(id)
    collecting the bounded (n_bits + 1)-window prefix; the pairwise
    compare and hex pack are array expressions on the grouped row.
    Everything is integer-exact (``sum_abs`` is an int64 L1 energy),
    so a SQL oracle replays the signature symbolically."""
    if n_bits % 32 != 0:
        # packed 32 bits per conv() call (conv is exact to 64 bits;
        # 32-bit halves keep headroom and pad to whole hex bytes)
        raise ValueError(f"n_bits must be a multiple of 32, got {n_bits}")
    if window is not None:
        windows = windows.where(F.col("n") == window)
    grouped = (
        windows.where(F.col("window_idx") <= n_bits)
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("window_idx").alias("w"), F.col("sum_abs").alias("e")))
            ).alias("__ws")
        )
        .where(F.size("__ws") == n_bits + 1)
    )
    bits = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_bits)),
            lambda i: F.when(
                F.element_at(F.col("__ws"), i + 1)["e"] > F.element_at(F.col("__ws"), i)["e"],
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ),
        "",
    )
    halves = [
        F.lpad(F.conv(F.substring(F.col("__bits"), 1 + off, 32), 2, 16), 8, "0")
        for off in range(0, n_bits, 32)
    ]
    return (
        grouped.withColumn("__bits", bits)
        .select(F.col(id_col), F.lower(F.concat(*halves)).alias("sig"))
    )


def vad_segments(
    windows: DataFrame,
    *,
    id_col: str = "doc_id",
    energy_threshold: int,
) -> DataFrame:
    """Voice-activity segmentation over :func:`audio_energy_windows`
    output — the step an ASR-corpus pipeline runs between windowed
    features and clip chunking: windows with L1 energy ABOVE the
    threshold are speech, and maximal runs of consecutive speech
    windows become segments via the classic gaps-and-islands grouping
    (``window_idx - row_number()`` is constant within a run). Returns
    one row per segment: ``(id, seg_idx, start_window, end_window,
    n_windows, energy)`` with ``seg_idx`` numbering a clip's segments
    0..n-1 in time order.

    Integer-exact throughout (int64 energies, integer threshold), so a
    SQL oracle replays it bit-for-bit. Shuffle shape: the run grouping
    is one window function plus one groupBy on (id, run) — both
    partition by the clip id, so AQE plans a single exchange; cost
    tracks total window count (corpus bytes), never corpus pairs. A
    production caller chains ``where(n_windows >= min_run)`` for a
    hangover filter; the raw runs keep this operator deterministic and
    composable."""
    from pyspark.sql import Window

    speech = windows.where(F.col("sum_abs") > energy_threshold)
    w_doc = Window.partitionBy(id_col).orderBy("window_idx")
    runs = speech.withColumn(
        "__run", F.col("window_idx") - F.row_number().over(w_doc)
    )
    seg = runs.groupBy(id_col, "__run").agg(
        F.min("window_idx").alias("start_window"),
        F.max("window_idx").alias("end_window"),
        F.count(F.lit(1)).cast("int").alias("n_windows"),
        F.sum("sum_abs").cast("bigint").alias("energy"),
    )
    w_seg = Window.partitionBy(id_col).orderBy("start_window")
    return seg.select(
        F.col(id_col),
        (F.row_number().over(w_seg) - 1).cast("int").alias("seg_idx"),
        F.col("start_window").cast("int").alias("start_window"),
        F.col("end_window").cast("int").alias("end_window"),
        "n_windows",
        "energy",
    )


AUGMENT_SCHEMA = "doc_id long, payload binary, aug string"


def augment_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    ops: tuple[str, ...] = ("hflip", "vflip"),
    crop: int | None = None,
) -> DataFrame:
    """Deterministic image augmentation for training pipelines: each
    input image fans out to one row per requested op (plus the
    original, tagged ``orig``) — horizontal/vertical flips and an
    optional center crop — decoded and re-encoded with the pure-numpy
    BMP codec (:mod:`..codecs`), so the output payloads are real
    decodable images. Augmentation multiplies the corpus, so the op is
    a row-per-op ``mapInPandas`` fan-out (Arrow-batched, no driver
    involvement); at 100 TB the output partition count scales with
    ``len(ops)+1`` times the input — repartition downstream if the
    write layout matters. Deterministic (no RNG): random-aug policies
    belong in the caller as seeded op lists, keeping this operator
    replayable.

    NULL payloads pass through as a single ``orig`` row with a NULL
    payload (the fan-out never invents data)."""
    valid = {"hflip", "vflip"}
    bad = set(ops) - valid
    if bad:
        raise ValueError(f"unknown augmentation ops: {sorted(bad)} (valid: {sorted(valid)})")

    def op(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import decode_image, encode_bmp

        for pdf in batches:
            out_ids, out_payloads, out_tags = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out_ids.append(doc_id)
                out_payloads.append(payload)
                out_tags.append("orig")
                if payload is None:
                    continue
                img = decode_image(bytes(payload))
                base = img
                if crop is not None:
                    h, w = img.shape[:2]
                    ch, cw = min(crop, h), min(crop, w)
                    y0, x0 = (h - ch) // 2, (w - cw) // 2
                    base = img[y0 : y0 + ch, x0 : x0 + cw]
                    out_ids.append(doc_id)
                    out_payloads.append(encode_bmp(np.ascontiguousarray(base)))
                    out_tags.append(f"crop{crop}")
                for tag in ops:
                    aug = base[:, ::-1] if tag == "hflip" else base[::-1, :]
                    out_ids.append(doc_id)
                    out_payloads.append(encode_bmp(np.ascontiguousarray(aug)))
                    out_tags.append(tag)
            yield pd.DataFrame(
                {"doc_id": out_ids, "payload": out_payloads, "aug": out_tags}
            )

    return df.select(id_col, payload_col).mapInPandas(op, AUGMENT_SCHEMA)
