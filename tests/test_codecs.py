"""Pure-numpy BMP/WAV codec: roundtrips, layout details (row padding,
bottom-up storage, chunk walking), and loud rejection of unsupported
variants. No Spark needed — these run in milliseconds."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_nearest,
)


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (5, 3), (4, 4), (7, 2)])
def test_bmp_roundtrip_all_paddings(shape):
    # widths 1/2/3/5/7 exercise every 4-byte row-padding remainder
    rng = np.random.default_rng(shape[0] * 10 + shape[1])
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


def test_bmp_is_bottom_up_bgr_on_disk():
    # (0,0) red / rest black: bottom-up BGR puts the red pixel's bytes
    # (B=0, G=0, R=255) at the START of the LAST stored row
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]
    raw = encode_bmp(img)
    pixel_offset = struct.unpack_from("<I", raw, 10)[0]
    stride = 8  # 2 px * 3 B = 6, padded to 8
    last_row = raw[pixel_offset + stride : pixel_offset + 2 * stride]
    assert last_row[:3] == b"\x00\x00\xff"


def test_bmp_top_down_negative_height_decodes():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    raw = bytearray(encode_bmp(img[::-1]))  # encode flipped...
    struct.pack_into("<i", raw, 22, -2)  # ...then mark top-down
    # top-down decode must NOT flip: rows come back in file order,
    # which undoes the flip we encoded with
    assert (decode_bmp(bytes(raw)) == img).all()


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda r: r[:10], "too short"),
        (lambda r: b"XX" + r[2:], "magic"),
        (lambda r: r[:28] + struct.pack("<H", 32) + r[30:], "bpp=32"),
        (lambda r: r[:30] + struct.pack("<I", 1) + r[34:], "compression=1"),
        (lambda r: r[:-4], "truncated"),
    ],
)
def test_bmp_rejects_unsupported(mutate, msg):
    raw = encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match=msg):
        decode_bmp(mutate(raw))


def test_resize_nearest_identity_and_downsample():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (resize_nearest(img, 4, 4) == img).all()
    half = resize_nearest(img, 2, 2)
    assert (half == img[::2, ::2]).all()


def test_wav_roundtrip_mono_and_stereo():
    mono = np.array([0, 32767, -32768, 5], dtype=np.int16)
    rate, frames = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and frames.shape == (4, 1)
    assert (frames[:, 0] == mono).all()

    stereo = np.array([[1, -1], [2, -2], [3, -3]], dtype=np.int16)
    rate, frames = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and (frames == stereo).all()


def test_wav_skips_extra_chunks_and_reads_8bit():
    # hand-build: RIFF [junk chunk] [fmt 8-bit PCM] [data] — the chunk
    # walker must skip junk and widen u8 samples to int16
    samples = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    chunks = b"JUNK" + struct.pack("<I", 3) + b"xyz\x00"  # odd size -> word-aligned
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(samples)) + samples
    raw = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    rate, frames = decode_wav(raw)
    assert rate == 8000
    assert frames[:, 0].tolist() == [(-128) << 8, 0, 127 << 8]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda r: b"RIFX" + r[4:], "RIFF"),
        (lambda r: r.replace(b"fmt ", b"fmx "), "missing fmt"),
        (lambda r: r.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1), "format=3"),
    ],
)
def test_wav_rejects_unsupported(mutate, msg):
    raw = encode_wav(np.array([1, 2], dtype=np.int16))
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(raw))


# ---------------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 64),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    frames = (
        np.random.default_rng(seed)
        .integers(-(2**15), 2**15, (n, ch))
        .astype(np.int16)
    )
    got_rate, got = decode_wav(encode_wav(frames, rate))
    assert got_rate == rate and got.shape == (n, ch) and (got == frames).all()


# ------------------------------------------------------------------- PNG


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for shape in [(5, 4, 3), (3, 7, 4), (6, 2, 1)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (decode_png(encode_png(px)) == px).all()


def test_png_decodes_every_row_filter():
    # hand-encode one row with each of the five PNG filters (the
    # encoder only emits filter 0, so exercise 1-4 with a reference
    # filterer) and check the decoder reconstructs the pixels
    import struct
    import zlib

    import numpy as np

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import decode_png

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int16)
    rows, prior = [], np.zeros(stride, np.int16)
    for y, f in zip(range(h), [0, 1, 2, 3, 4]):
        cur = flat[y]
        left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
        ul = np.concatenate([np.zeros(c, np.int16), prior[:-c]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prior
        elif f == 3:
            enc = cur - ((left + prior) >> 1)
        else:
            pa = np.abs(prior - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + prior - 2 * ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul))
            enc = cur - pred
        rows.append(bytes([f]) + bytes((enc % 256).astype(np.uint8)))
        prior = cur
    raw = b"".join(rows)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == px).all()


def test_png_rejects_unsupported_variants():
    import struct
    import zlib

    import numpy as np
    import pytest

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import (
        decode_image,
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")
    # 16-bit depth rejected loudly
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)
    # the sniffing dispatcher routes both containers and rejects others
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_image(encode_png(px)).shape == (2, 2, 3)
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"GIF89a...")


def test_image_features_real_decode_handles_png(spark):
    import numpy as np

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import encode_png
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.multimodal import (
        extract_image_features,
    )

    rng = np.random.default_rng(5)
    rows = [
        (1, bytes(encode_png(rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)))),
        (2, bytes(encode_png(rng.integers(0, 256, size=(4, 3, 1), dtype=np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.width, r.height) for r in extract_image_features(df, fake_decode=False).collect()}
    assert got == {1: (11, 7), 2: (3, 4)}


# ------------------------------------------------------------------- Y4M


def test_y4m_roundtrip_and_rejections():
    import numpy as np
    import pytest

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.default_rng(2)
    fr = [rng.integers(0, 256, size=(4, 6), dtype=np.uint8) for _ in range(3)]
    w, h, back = decode_y4m(encode_y4m(fr))
    assert (w, h) == (6, 4)
    assert len(back) == 3 and all((a == b).all() for a, b in zip(fr, back))
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"not video")
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(encode_y4m(fr)[:-5])
    with pytest.raises(ValueError, match="even"):
        encode_y4m([np.zeros((3, 6), dtype=np.uint8)])


def test_resize_real_decode_handles_gray_png(spark):
    import numpy as np

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import decode_bmp, encode_png
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.multimodal import resize_images

    gray = np.arange(16, dtype=np.uint8).reshape(4, 4, 1) * 16
    df = spark.createDataFrame([(1, bytes(encode_png(gray)))], "doc_id long, payload binary")
    out = resize_images(df, 2, 2, fake_decode=False).collect()[0]
    px = decode_bmp(bytes(out.payload))
    assert px.shape == (2, 2, 3)
    # replicated channels: every pixel has r == g == b
    assert (px[..., 0] == px[..., 1]).all() and (px[..., 1] == px[..., 2]).all()


def test_video_frame_sampling_real_y4m(spark):
    import numpy as np

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import encode_y4m
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.multimodal import (
        sample_video_frames,
    )

    frames = [np.full((2, 4), i * 10, dtype=np.uint8) for i in range(5)]
    df = spark.createDataFrame(
        [(1, bytes(encode_y4m(frames)))], "doc_id long, payload binary"
    )
    # a NULL payload row yields no frames instead of failing the job
    df = df.unionByName(
        spark.createDataFrame([(2, None)], "doc_id long, payload binary")
    )
    out = sample_video_frames(df, every_n=2, fake_decode=False).collect()
    assert {r.doc_id for r in out} == {1}
    # frames 0, 2, 4 kept; each sampled frame is the 8-byte luma plane
    assert [(r.frame_idx, bytes(r.frame)) for r in sorted(out, key=lambda r: r.frame_idx)] == [
        (0, bytes([0] * 8)),
        (2, bytes([20] * 8)),
        (4, bytes([40] * 8)),
    ]


def test_dhash_brightness_invariant_and_structure_sensitive(spark):
    # dHash keys on gradient SIGNS: a uniform brightness shift must not
    # change a single bit, while transposing the structure must — the
    # property that makes it a usable near-dup blocking key
    import numpy as np

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import encode_bmp
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.multimodal import dhash_images

    rng = np.random.default_rng(7)
    base = rng.integers(0, 200, size=(16, 18), dtype=np.uint8)

    def bmp(gray):
        return bytes(encode_bmp(np.stack([gray.astype(np.uint8)] * 3, axis=2)))

    df = spark.createDataFrame(
        [
            (1, bmp(base)),
            (2, bmp(base + 30)),        # uniform brightness shift
            (3, bmp(base.T[:16, :18])), # different structure
            (4, None),                  # no payload -> no signature row
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.dhash for r in dhash_images(df).collect()}
    assert set(got) == {1, 2, 3}
    assert len(got[1]) == 16 and set(got[1]) <= set("0123456789abcdef")
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_dhash_matches_symbolic_pixel_formula(spark):
    # the fixture contract dedup_image_dhash's oracle relies on: for a
    # 2x2-block-upsampled image, decode -> 9x8 nearest resize -> gray ->
    # gradient bits must reproduce the hash computed straight from the
    # 8x9 formula grid
    import numpy as np

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import encode_bmp
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.multimodal import dhash_images

    rng = np.random.default_rng(11)
    v = rng.integers(0, 254, size=(8, 9), dtype=np.uint8)
    big = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
    df = spark.createDataFrame(
        [(1, bytes(encode_bmp(np.stack([big] * 3, axis=2))))],
        "doc_id long, payload binary",
    )
    [row] = dhash_images(df).collect()
    bits = (v[:, 1:].astype(int) > v[:, :-1].astype(int)).astype(np.uint8).reshape(-1)
    assert row.dhash == np.packbits(bits).tobytes().hex()


def test_wide_block_blocking_is_complete_for_hamming_3(spark):
    # the r7 scale path (4 blocks x 16 bits, threshold 3) must find
    # EXACTLY the hamming <= 3 subset of the default (8 x 8, threshold
    # 7) pairs on the same corpus — wide keys change the candidate
    # generation, never the verified result set
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
        image_dhash_verified_pairs,
    )

    docs = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    wide = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_dhash_verified_pairs(
            docs, n_patterns=11, band_hex_width=4, max_hamming=3
        ).collect()
    }
    default = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_dhash_verified_pairs(docs, n_patterns=11).collect()
    }
    assert wide == {p: h for p, h in default.items() if h <= 3}
    assert len(wide) > 0
    # inconsistent (width, threshold) pairs must fail loudly, not
    # silently lose completeness — ValueError, so `python -O` cannot
    # compile the guard away (r7 ADVICE)
    with pytest.raises(ValueError, match="pigeonhole"):
        image_dhash_verified_pairs(docs, band_hex_width=4, max_hamming=7)


def test_audio_contour_signature_matches_numpy(spark):
    # crafted clips: known per-window energies -> known sign-delta bits
    # -> known hex signature; a short clip (< 65 windows) emits no row
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import encode_wav
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.multimodal import (
        audio_contour_signature,
        audio_energy_windows,
    )

    rng = np.random.RandomState(7)
    v = rng.randint(0, 255, size=65)
    full = np.repeat(v, 16).astype(np.int16)          # 65 windows of 16
    short = np.repeat(v[:40], 16).astype(np.int16)    # only 40 windows
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(full, 16000))), (2, bytearray(encode_wav(short, 16000)))],
        "doc_id long, payload binary",
    )
    sigs = {
        r.doc_id: r.sig
        for r in audio_contour_signature(
            audio_energy_windows(df, window=16)
        ).collect()
    }
    bits = (v[1:] > v[:-1]).astype(np.uint8)
    assert sigs == {1: np.packbits(bits).tobytes().hex()}


def test_audio_contour_excludes_trailing_partial_window(spark):
    # r8 ADVICE: a clip whose length is not a window multiple leaves a
    # SHORT trailing window whose smaller energy biases the last
    # contour bit toward 0 — with window= passed, partial windows are
    # excluded from the contour entirely
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.codecs import encode_wav
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.multimodal import (
        audio_contour_signature,
        audio_energy_windows,
    )

    rng = np.random.RandomState(11)
    v = rng.randint(1, 255, size=66)
    # pin the boundary pair so the partial-window bias is OBSERVABLE:
    # full-window bit 64 is v[64] > v[63] (150 > 100 -> 1), while the
    # 8-sample partial window's energy 8*150 < 16*100 flips it to 0
    v[63], v[64] = 100, 150
    full66 = np.repeat(v, 16).astype(np.int16)  # 66 full windows
    # 65 full windows + an 8-sample partial 66th: the partial window is
    # beyond the first 65, so the signature must equal the full-window one
    trailing_beyond = np.concatenate(
        [np.repeat(v[:65], 16), np.repeat(v[65:66], 8)]
    ).astype(np.int16)
    # 64 full windows + a partial 65th: the contour would need the
    # partial window's biased bit -> NO signature row at all
    trailing_within = np.concatenate(
        [np.repeat(v[:64], 16), np.repeat(v[64:65], 8)]
    ).astype(np.int16)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(full66, 16000))),
            (2, bytearray(encode_wav(trailing_beyond, 16000))),
            (3, bytearray(encode_wav(trailing_within, 16000))),
        ],
        "doc_id long, payload binary",
    )
    sigs = {
        r.doc_id: r.sig
        for r in audio_contour_signature(
            audio_energy_windows(df, window=16), window=16
        ).collect()
    }
    bits = (v[1:65] > v[:64]).astype(np.uint8)
    expect = np.packbits(bits).tobytes().hex()
    assert sigs == {1: expect, 2: expect}  # 3 emits no row
    # WITHOUT the filter, clip 3 emits the biased signature the advice
    # flagged — pinning the old behavior documents what changed
    unfiltered = {
        r.doc_id: r.sig
        for r in audio_contour_signature(
            audio_energy_windows(df, window=16)
        ).collect()
    }
    assert 3 in unfiltered and unfiltered[3] != expect


def test_audio_wide_block_pairs_complete_for_hamming_3(spark):
    # two DIFFERENT complete blockings (4x16-bit keys and 8x8-bit keys,
    # both pigeonhole-complete for hamming <= 3) must verify the exact
    # same pair set — candidate generation changes, results never do
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
        audio_contour_verified_pairs,
    )

    docs = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    wide = {
        (r.doc_a, r.doc_b): r.hamming
        for r in audio_contour_verified_pairs(
            docs, n_patterns=11, band_hex_width=4, max_hamming=3
        ).collect()
    }
    narrow = {
        (r.doc_a, r.doc_b): r.hamming
        for r in audio_contour_verified_pairs(
            docs, n_patterns=11, band_hex_width=2, max_hamming=3
        ).collect()
    }
    assert wide == narrow
    assert len(wide) > 0
    with pytest.raises(ValueError, match="pigeonhole"):
        audio_contour_verified_pairs(docs, band_hex_width=4, max_hamming=7)


def test_audio_dedup_pipeline_clusters_patterns(spark):
    # with zero noise collisions same-pattern clips should mostly land
    # in one cluster; the contract columns and survivor rule must hold
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
        audio_dedup_pipeline,
    )

    docs = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    out = audio_dedup_pipeline(docs, n_patterns=6).collect()
    assert len(out) == 60
    by_doc = {r.doc_id: r for r in out}
    for r in out:
        assert r.is_survivor == (r.doc_id == r.cluster_id)
        # cluster id is the min doc in its cluster
        assert r.cluster_id <= r.doc_id
        assert by_doc[r.cluster_id].cluster_size == r.cluster_size
    # near-dup structure was actually found (not 60 singletons)
    assert sum(1 for r in out if r.cluster_size > 1) > 0
