"""SimHash64 near-dup signal and multimodal decode-stub contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import multimodal
from egal_yet_another_earthquake_project_spark.llm.text import hamming64, simhash64


def test_simhash_hamming_separates_near_from_far(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    near = base + " tonight"  # small tail edit
    far = (
        "completely unrelated text about distributed query engines and "
        "columnar storage formats with vectorized execution pipelines"
    )
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id long, text string"
    ).withColumn("sig", simhash64("text"))
    sigs = {r.id: r.sig for r in df.collect()}
    pairs = spark.createDataFrame(
        [(sigs[1], sigs[2]), (sigs[1], sigs[3])], "a long, b long"
    ).select(hamming64("a", "b").alias("d"))
    d_near, d_far = [r.d for r in pairs.collect()]
    assert d_near < d_far, (d_near, d_far)
    assert d_near <= 16  # near-dup: most bits agree
    assert d_far >= 16  # unrelated: ~32 expected


def test_simhash_deterministic(spark):
    df = spark.createDataFrame([("same text here",)], "text string")
    a = df.select(simhash64("text").alias("s")).collect()[0].s
    b = df.select(simhash64("text").alias("s")).collect()[0].s
    assert a == b


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_payload(b"\x89PNG...")


def test_multimodal_fake_features_deterministic(spark):
    f1 = multimodal.fake_features(b"hello world", dim=8)
    f2 = multimodal.fake_features(b"hello world", dim=8)
    assert f1 == f2
    assert abs(sum(f1) - 1.0) < 1e-9


def test_media_neardup_finds_planted_duplicate_payloads(spark):
    """Identical payloads MUST pair at hamming 0 (pigeonhole recall is
    exact at distance ≤ bands−1, trivially at 0); a payload with a
    wildly different byte-bigram profile must not pair with the text
    docs."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    base = "the quick brown fox jumps over the lazy dog " * 6
    other = "join scan filter hash table merge sort window batch " * 5
    weird = "!!!???###@@@$$$%%%^^^&&&***((()))" * 12
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other), (4, weird)],
        "doc_id long, text string",
    )
    corpus = lmm.attach_binary_payload(df)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in lmm.media_neardup_pairs(corpus).collect()
    }
    assert pairs.get((1, 2)) == 0, "identical payloads missed"
    assert not any(4 in p for p in pairs), f"weird payload paired: {pairs}"


def test_media_signature_deterministic_and_partition_invariant(spark):
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = lmm.attach_binary_payload(docs)
    a = sorted(map(tuple, lmm.payload_signatures(corpus).collect()))
    b = sorted(
        map(tuple, lmm.payload_signatures(corpus.repartition(9)).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# Real media decode (VERDICT r8 Next #5): dependency-free BMP/PPM decoder
# ---------------------------------------------------------------------------


def _test_pixels(width=5, height=3):
    return [
        [((x * 7 + y * 31) % 256, (x * 13 + y) % 256, (x + y * 101) % 256)
         for x in range(width)]
        for y in range(height)
    ]


def test_bmp_roundtrip_exact_pixels():
    """encode_bmp → decode_payload must return the exact pixels: width 5
    forces row padding (15 bytes → 16), and the bottom-up row order plus
    BGR byte order must both be undone."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    px = _test_pixels()
    blob = lmm.encode_bmp(5, 3, px)
    assert blob[:2] == b"BM" and len(blob) == 54 + 16 * 3
    got = lmm.decode_payload(blob)
    assert (got["format"], got["width"], got["height"]) == ("bmp", 5, 3)
    assert got["pixels"] == px


def test_ppm_p6_and_p3_roundtrip_and_feature_parity():
    """Both PPM containers decode to the same pixels as the BMP of the
    same image — and therefore to bit-identical features (hash-stable
    across containers)."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    px = _test_pixels()
    p6 = lmm.decode_payload(lmm.encode_ppm(5, 3, px))
    p3 = lmm.decode_payload(lmm.encode_ppm(5, 3, px, plain=True))
    bmp = lmm.decode_payload(lmm.encode_bmp(5, 3, px))
    assert p6["pixels"] == p3["pixels"] == bmp["pixels"] == px
    f = lmm.pixel_features
    assert f(p6) == f(p3) == f(bmp)
    assert abs(sum(f(p6)) - 1.0) < 1e-12


def test_decode_rejects_non_media_strictly():
    """Arbitrary text — including text that STARTS like a magic number —
    must raise NotImplementedError (strict header-vs-length validation),
    never half-parse; extract_features then routes it to the fake lane."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    for blob in (
        b"",
        b"hello world",
        b"BMnot really a bitmap at all........................................",
        b"P6 this is prose, not a pixmap",
        b"P3\n2 2\n255\n1 2 3 4",  # too few samples
        b"\x89PNG\r\n\x1a\n",  # real codec formats stay unimplemented
    ):
        with pytest.raises(NotImplementedError):
            lmm.decode_payload(blob)


def test_extract_features_mixed_media_and_text(spark):
    """One frame, both lanes: BMP rows get REAL pixel-luminance features,
    text rows fall back to the byte histogram — same schema, same plan."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    px = [[(0, 0, 0), (255, 255, 255)]]  # lum 0 and 255 → buckets 0 and 7
    bmp = lmm.encode_bmp(2, 1, px)
    text = b"abcd"
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(text))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in lmm.extract_features(df).collect()}
    assert rows[1].features == [0.5, 0, 0, 0, 0, 0, 0, 0.5]
    assert rows[1].n_bytes == len(bmp)
    assert rows[2].features == lmm.fake_features(text)


def test_wav_roundtrip_and_strict_rejection():
    """encode_wav → decode_payload returns the exact int16 samples
    (negative values included); RIFF-prefixed garbage and non-PCM
    claims are rejected strictly."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    samples = [0, 1, -1, 32767, -32768, 12345, -12345, 7]
    blob = lmm.encode_wav(samples, sample_rate=16000)
    got = lmm.decode_payload(blob)
    assert got["format"] == "wav"
    assert got["sample_rate"] == 16000 and got["n_channels"] == 1
    assert got["samples"] == samples

    feats = lmm.audio_features(got)
    assert feats["n_samples"] == 8 and feats["peak"] == 32768
    # sign flips: 0(+),1(+),-1(-),32767(+),-32768(-),12345(+),-12345(-),7(+)
    assert feats["zero_crossings"] == 6

    for bad in (
        b"RIFFgarbage that is not a wave file at all..............",
        blob[:-2],  # truncated data chunk
        blob[:4] + b"\x00\x00\x00\x00" + blob[8:],  # riff size mismatch
    ):
        with pytest.raises(NotImplementedError):
            lmm.decode_payload(bad)


def test_png_roundtrip_every_filter_and_rgba():
    """encode_png → decode_payload recovers the exact pixels through
    each of the five scanline filters (None/Sub/Up/Average/Paeth) and
    through a mixed per-row schedule — a real inflate + filter
    reconstruction, not an echo of filter 0. RGBA payloads reconstruct
    with the 4-byte stride and drop alpha into the unified (r,g,b)
    lane."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    w, h = 5, 4
    pixels = [
        [((y * w + x) * 7 % 256, (y * w + x) * 13 % 256, (y * w + x) * 29 % 256)
         for x in range(w)]
        for y in range(h)
    ]
    for f in (0, 1, 2, 3, 4, [0, 1, 3, 4]):
        blob = lmm.encode_png(w, h, pixels, filter_types=f)
        got = lmm.decode_payload(blob)
        assert got["format"] == "png" and got["maxval"] == 255
        assert got["width"] == w and got["height"] == h
        assert got["pixels"] == pixels, f"filter {f} misreconstructed"

    rgba = lmm.encode_png(w, h, pixels, filter_types=4, alpha=128)
    got = lmm.decode_payload(rgba)
    assert got["pixels"] == pixels  # alpha dropped, colors exact


def test_png_strict_rejection():
    """Corrupt PNGs are rejected, never half-decoded: bad CRC, truncated
    IDAT stream, wrong scanline payload size, unknown critical chunk,
    interlace flag, palette color type, and a bare signature with
    garbage. decode_payload surfaces each as NotImplementedError (the
    not-media routing signal)."""
    import struct
    import zlib

    import pytest

    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    pixels = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    good = lmm.encode_png(2, 2, pixels)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = good[:8]
    ihdr_at = 8
    ihdr_len = 12 + 13
    ihdr = good[ihdr_at : ihdr_at + ihdr_len]
    rest = good[ihdr_at + ihdr_len :]

    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    cases = [
        bytes(bad_crc),
        good[:-20],  # truncated mid-chunk
        sig + ihdr + chunk(b"IDAT", zlib.compress(b"\x00\x01")) + chunk(b"IEND", b""),  # wrong scanline size
        sig + ihdr + chunk(b"XCRT", b"?") + rest,  # unknown critical chunk
        sig + b"garbage follows the signature only..............",
    ]
    # interlaced header
    w_h = struct.pack(">II", 2, 2)
    cases.append(
        sig + chunk(b"IHDR", w_h + bytes([8, 2, 0, 0, 1])) + rest
    )
    # palette color type
    cases.append(
        sig + chunk(b"IHDR", w_h + bytes([8, 3, 0, 0, 0])) + rest
    )
    for bad in cases:
        with pytest.raises(NotImplementedError):
            lmm.decode_payload(bad)
    # ancillary (lowercase-first) chunks are skipped, not fatal
    ok = sig + ihdr + chunk(b"tEXt", b"k\x00v") + rest
    assert lmm.decode_payload(ok)["pixels"] == pixels


def test_extract_features_routes_png_to_pixel_histogram(spark):
    """The unified features lane decodes PNG payloads to REAL pixel
    luminance features (identical to the same image as BMP), not the
    byte-histogram fake — compressed bytes would histogram to noise."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    px = [[(0, 0, 0)] * 4, [(255, 255, 255)] * 4]  # half dark, half bright
    png = lmm.encode_png(4, 2, px, filter_types=2)
    bmp = lmm.encode_bmp(4, 2, px)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r.features for r in lmm.extract_features(df).collect()}
    assert rows[1] == [0.5, 0, 0, 0, 0, 0, 0, 0.5]
    assert rows[1] == rows[2]  # same image, either container


def test_stereo_wav_deinterleaves_before_featurizing():
    """ADVICE r9: a stereo stream's adjacent raw values belong to
    DIFFERENT channels, so featurizing the interleaved array computes a
    meaningless zero-crossing count (L compared against R). The decoder
    now downmixes to mono — floor((L+R)/2) per frame — before the
    features see the samples."""
    import struct

    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    # L = R = [1000, -1000, 1000, -1000]: interleaved raw stream is
    # [1000,1000,-1000,-1000,...] (ZCR over it would be 3 by luck of the
    # duplication, so use asymmetric channels too below)
    frames = [1000, -1000, 1000, -1000]
    inter = []
    for v in frames:
        inter += [v, v]
    data = struct.pack(f"<{len(inter)}h", *inter)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    blob = (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )
    got = lmm.decode_payload(blob)
    assert got["n_channels"] == 2
    assert got["samples"] == frames  # downmix of identical channels
    feats = lmm.audio_features(got)
    assert feats["n_samples"] == 4
    assert feats["zero_crossings"] == 3 and feats["peak"] == 1000

    # Asymmetric channels: L constant +100, R constant -100. Interleaved
    # ZCR would be 7 (every L→R and R→L step flips sign); the mono
    # downmix is all zeros — ZCR 0, the meaningful answer.
    inter2 = []
    for _ in range(4):
        inter2 += [100, -100]
    data2 = struct.pack(f"<{len(inter2)}h", *inter2)
    blob2 = (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data2), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data2))
        + data2
    )
    got2 = lmm.decode_payload(blob2)
    assert got2["samples"] == [0, 0, 0, 0]
    assert lmm.audio_features(got2)["zero_crossings"] == 0


def test_extract_features_routes_audio_to_sample_histogram(spark):
    """The unified features lane: a WAV payload gets the amplitude
    histogram (real decoded samples), not the byte-histogram fake."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    samples = [0] * 4 + [32767] * 4  # half bucket 0, half bucket 7
    blob = lmm.encode_wav(samples)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, payload binary"
    )
    row = lmm.extract_features(df).collect()[0]
    assert row.features == [0.5, 0, 0, 0, 0, 0, 0, 0.5]


def test_resize_pixels_nearest_neighbor_exact():
    """Integer nearest-neighbor resize: 4×4 → 2×2 picks the exact
    source pixels floor(dst·in/out); upscale repeats them; dims
    validated."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    px = [[(y * 16 + x, 0, 0) for x in range(4)] for y in range(4)]
    decoded = {"format": "bmp", "width": 4, "height": 4, "maxval": 255,
               "pixels": px}
    small = lmm.resize_pixels(decoded, 2, 2)
    assert small["pixels"] == [[(0, 0, 0), (2, 0, 0)],
                               [(32, 0, 0), (34, 0, 0)]]
    big = lmm.resize_pixels(small, 4, 2)
    assert big["pixels"][0] == [(0, 0, 0), (0, 0, 0), (2, 0, 0), (2, 0, 0)]
    # composes with the feature extractor
    assert abs(sum(lmm.pixel_features(small)) - 1.0) < 1e-12
    with pytest.raises(ValueError):
        lmm.resize_pixels(decoded, 0, 2)


def test_gif_lzw_roundtrip_exact_pixels():
    """encode_gif → decode_payload recovers exact pixels through a REAL
    LZW compress/decompress cycle: single-color frames (the KwKwK
    corner fires immediately), palettes from 1 to 256 colors, and an
    image large enough to walk the code width from mcs+1 up through 12
    bits and freeze the 4096-entry table."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    # KwKwK: the very first non-literal code equals next_code
    flat = [[(5, 6, 7)] * 4] * 4
    got = lmm.decode_payload(lmm.encode_gif(4, 4, flat))
    assert got["format"] == "gif" and got["maxval"] == 255
    assert got["pixels"] == flat

    # mixed palette, deterministic pseudo-random placement
    w, h = 23, 17
    cols = [((i * 37) % 256, (i * 59) % 256, (i * 83) % 256) for i in range(40)]
    px = [[cols[(x * 7 + y * 11 + x * y) % 40] for x in range(w)] for y in range(h)]
    assert lmm.decode_payload(lmm.encode_gif(w, h, px))["pixels"] == px

    # large image: code width grows 9→10→11→12, table freezes at 4096
    w, h = 200, 120
    cols = [(i, (i * 7) % 256, (i * 13) % 256) for i in range(256)]
    big = [[cols[(x * 31 + y * 17 + (x * y) % 97) % 256] for x in range(w)]
           for y in range(h)]
    blob = lmm.encode_gif(w, h, big)
    assert len(blob) < w * h * 3  # actually compressed
    assert lmm.decode_payload(blob)["pixels"] == big


def test_gif_strict_rejection_and_extension_skip():
    """Corrupt GIFs are rejected, never half-decoded: trailing bytes
    after the trailer, missing trailer, corrupted LZW data, interlace
    flag, a second frame (animation), truncation. Extensions are
    skipped by their sub-block framing; GIF87a signatures decode."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    px = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)],
          [(1, 2, 3), (1, 2, 3), (9, 9, 9)]]
    good = lmm.encode_gif(3, 2, px)
    idesc = 13 + 3 * 4  # header+LSD, then the 4-entry global color table
    assert good[idesc] == 0x2C

    corrupt_lzw = bytearray(good)
    corrupt_lzw[-10] ^= 0xFF
    interlaced = bytearray(good)
    interlaced[idesc + 9] |= 0x40
    animated = good[:-1] + good[idesc:-1] + b"\x3b"
    cases = [
        good + b"x",
        good[:-2],
        b"GIF89a" + good[6:20],
        bytes(corrupt_lzw),
        bytes(interlaced),
        animated,
        b"GIF89anot really a gif.........................",
    ]
    for bad in cases:
        with pytest.raises(NotImplementedError):
            lmm.decode_payload(bad)

    # a graphic-control extension before the frame is skipped cleanly
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = good[:idesc] + ext + good[idesc:]
    assert lmm.decode_payload(spliced)["pixels"] == px
    # GIF87a signature is accepted too
    assert lmm.decode_payload(b"GIF87a" + good[6:])["pixels"] == px


def test_extract_features_routes_gif_to_pixel_histogram(spark):
    """The unified features lane decodes GIF payloads to REAL pixel
    luminance features, identical to the same image in BMP and PNG —
    LZW-compressed bytes would histogram to noise."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    px = [[(0, 0, 0)] * 4, [(255, 255, 255)] * 4]
    gif = lmm.encode_gif(4, 2, px)
    bmp = lmm.encode_bmp(4, 2, px)
    png = lmm.encode_png(4, 2, px, filter_types=1)
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(bmp)), (3, bytearray(png))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r.features for r in lmm.extract_features(df).collect()}
    assert rows[1] == [0.5, 0, 0, 0, 0, 0, 0, 0.5]
    assert rows[1] == rows[2] == rows[3]


def test_gif_frames_roundtrip_and_sampling():
    """Multi-frame GIF (the video container): encode_gif_frames →
    decode_gif_frames recovers every frame exactly through per-frame
    local color tables and LZW; sample_frames picks every stride-th
    frame as a composable single-image dict; patch frames (sub-canvas
    descriptors) and the single-frame decoder's animation rejection
    both hold."""
    import struct

    import pytest

    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    w, h = 7, 5
    frames = []
    for f in range(4):
        cols = [((f * 50 + i * 13) % 256, (i * 29) % 256, (f * 90 + i * 7) % 256)
                for i in range(20)]
        frames.append(
            [[cols[(x * 3 + y * 5 + f) % 20] for x in range(w)] for y in range(h)]
        )
    blob = lmm.encode_gif_frames(w, h, frames)
    d = lmm.decode_gif_frames(blob)
    assert d["format"] == "gif-frames" and (d["width"], d["height"]) == (w, h)
    assert d["frames"] == frames

    sampled = lmm.sample_frames(d, 2)
    assert [i for i, _ in sampled] == [0, 2]
    assert sampled[1][1]["pixels"] == frames[2]
    assert abs(sum(lmm.pixel_features(sampled[0][1])) - 1.0) < 1e-12

    # the still-image decoder refuses animation; the frames decoder
    # accepts a single-frame file
    with pytest.raises(NotImplementedError):
        lmm.decode_payload(blob)
    single = lmm.encode_gif(4, 2, [[(1, 2, 3)] * 4] * 2)
    assert len(lmm.decode_gif_frames(single)["frames"]) == 1

    # a patch frame (left=1) is rejected, never half-rendered
    patch = bytearray(blob)
    assert patch[21] == 0x2C  # 13-byte header (no GCT) + 8-byte GCE
    struct.pack_into("<HH", patch, 22, 1, 0)
    with pytest.raises(ValueError, match="patch"):
        lmm.decode_gif_frames(bytes(patch))
    with pytest.raises(ValueError):
        lmm.sample_frames(d, 0)


def test_extract_frame_features_one_row_per_sampled_frame(spark):
    """The Spark video lane: stride-2 sampling of a 3-frame payload
    yields rows (frame 0, frame 2) per doc with real per-frame
    luminance histograms."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    dark = [[(0, 0, 0)] * 4] * 2
    bright = [[(255, 255, 255)] * 4] * 2
    blob = lmm.encode_gif_frames(4, 2, [dark, bright, dark])
    df = spark.createDataFrame(
        [(7, bytearray(blob))], "doc_id long, payload binary"
    )
    rows = {
        r.frame_idx: r
        for r in lmm.extract_frame_features(df, stride=2).collect()
    }
    assert set(rows) == {0, 2}
    assert all(r.n_frames == 3 for r in rows.values())
    assert rows[0].features == [1.0, 0, 0, 0, 0, 0, 0, 0.0]
    assert rows[2].features == rows[0].features


def _jpeg_exact_pattern(did: int, width: int = 16, height: int = 16):
    """The DC + F(4,4)-checkerboard pattern whose JPEG round trip is
    exact by construction (see q_jpeg_decode_features): grayscale, each
    8x8 block = base_b + amp_b * s(x) * s(y) with s the (4,4) basis
    sign pattern, quantized losslessly by the uniform-8 table."""
    sgn = [1 if x % 8 in (0, 3, 4, 7) else -1 for x in range(max(width, height))]
    rows = []
    for y in range(height):
        row = []
        for x in range(width):
            blk = (y // 8) * (width // 8) + (x // 8)
            base = 16 + (did * 37 + blk * 59) % 208
            amp = 1 + (did * 11 + blk * 7) % 13
            v = base + amp * sgn[x] * sgn[y]
            row.append((v, v, v))
        rows.append(row)
    return rows


def test_jpeg_roundtrip_exact_on_dct_grid_420_and_444():
    """encode_jpeg → decode_payload is bit-exact on the DCT-grid
    pattern through BOTH subsampling modes: real Huffman entropy coding
    (DC prediction across the 4-block MCU, two ZRL runs before the
    F(4,4) coefficient, EOB), dequantize, float IDCT, 4:2:0 chroma
    upsample, YCbCr→RGB."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    for did in (0, 1, 7, 42, 1999):
        px = _jpeg_exact_pattern(did)
        for sub in ("420", "444"):
            got = lmm.decode_payload(lmm.encode_jpeg(16, 16, px, subsampling=sub))
            assert got["format"] == "jpeg" and got["maxval"] == 255
            assert (got["width"], got["height"]) == (16, 16)
            assert got["pixels"] == px, f"did={did} sub={sub}"


def test_jpeg_lossy_error_is_quant_bounded():
    """On arbitrary pixels JPEG is lossy, but 4:4:4 with the uniform-8
    table must reconstruct within a small per-channel bound (~q): a
    blow-up means the entropy coding or IDCT misreads real bytes, not
    just quantization noise."""
    import random

    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    rng = random.Random(7)
    px = [
        [(rng.randrange(256),) * 3 for _ in range(16)] for _ in range(16)
    ]
    got = lmm.decode_payload(lmm.encode_jpeg(16, 16, px, subsampling="444"))
    err = max(
        abs(a - b)
        for ry, dy in zip(px, got["pixels"])
        for pa, pb in zip(ry, dy)
        for a, b in zip(pa, pb)
    )
    assert err <= 16


def test_jpeg_strict_rejection():
    """Corrupt/unsupported JPEGs are rejected, never half-decoded:
    progressive SOF2, truncation, trailing garbage, missing Huffman
    table, restart intervals, bare SOI+EOI."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    good = lmm.encode_jpeg(16, 16, _jpeg_exact_pattern(3))
    assert lmm.decode_payload(good)["format"] == "jpeg"

    cases = [
        good[:-1],                                      # truncated before EOI
        good + b"??",                                   # trailing garbage
        good.replace(b"\xff\xc0", b"\xff\xc2", 1),       # progressive
        good.replace(b"\xff\xc4", b"\xff\xfe", 1),       # DHT -> COM: tables missing
        b"\xff\xd8" + b"\xff\xdd\x00\x04\x00\x10" + good[2:],  # DRI
        b"\xff\xd8\xff\xd9",                             # no scan at all
    ]
    for bad in cases:
        with pytest.raises(NotImplementedError):
            lmm.decode_payload(bad)


def test_extract_features_routes_jpeg_to_pixel_histogram(spark):
    """The unified features lane decodes JPEG payloads to REAL pixel
    luminance features, identical to the same exact-grid image shipped
    as PNG — compressed entropy bytes would histogram to noise."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    px = _jpeg_exact_pattern(11)
    jpg = lmm.encode_jpeg(16, 16, px)
    png = lmm.encode_png(16, 16, px, filter_types=1)
    df = spark.createDataFrame(
        [(1, bytearray(jpg)), (2, bytearray(png))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r.features for r in lmm.extract_features(df).collect()}
    assert rows[1] == rows[2]
