"""MP3 frame demux + MP4 box parse (llm.multimodal container lane,
VERDICT r11 'What's missing' #3): real header/CRC/box arithmetic,
strict rejection, and the Arrow-batched typed extractors."""

from __future__ import annotations

import pytest

from egal_yet_another_earthquake_project_spark.llm import multimodal as mm


def test_mp3_roundtrip_all_parameter_corners():
    for ch in (1, 2):
        for crc in (True, False):
            for br, sr in ((64, 32000), (128, 44100), (320, 48000)):
                d = mm.demux_mp3(
                    mm.encode_mp3_frames(4, br, sr, ch, with_crc=crc, seed=9)
                )
                assert d["n_frames"] == 4
                assert d["bitrate_kbps"] == br
                assert d["sample_rate"] == sr
                assert d["n_channels"] == ch
                assert d["crc_frames"] == (4 if crc else 0)
                assert d["crc_ok"] is True
                assert d["duration_us"] == 4 * 1152 * 1_000_000 // sr


def test_mp3_crc_corruption_detected():
    blob = bytearray(mm.encode_mp3_frames(3, 96, 48000, 2, with_crc=True))
    blob[8] ^= 0xFF  # a side-info byte of frame 0 — covered by the CRC
    assert mm.demux_mp3(bytes(blob))["crc_ok"] is False


def test_mp3_strict_rejections():
    good = mm.encode_mp3_frames(2, 128, 44100, 2)
    with pytest.raises(ValueError, match="truncated"):
        mm.demux_mp3(b"\xff\xfb")
    with pytest.raises(ValueError, match="truncated"):
        mm.demux_mp3(good[:-10])
    with pytest.raises(ValueError, match="sync lost"):
        mm.demux_mp3(good + b"\x00\x00\x00\x00" + good)
    # free-format bitrate index (0) and reserved rate index (3)
    hdr = bytearray(good[:4])
    hdr[2] = 0x00  # bitrate idx 0 = free
    with pytest.raises(ValueError, match="bitrate"):
        mm.demux_mp3(bytes(hdr) + good[4:])
    hdr = bytearray(good[:4])
    hdr[2] = (hdr[2] & 0xF0) | (0b11 << 2)  # rate idx 3 = reserved
    with pytest.raises(ValueError, match="sampling-rate"):
        mm.demux_mp3(bytes(hdr) + good[4:])
    # MPEG-2 / Layer I rejected
    hdr = bytearray(good[:4])
    hdr[1] &= ~0b10000  # version -> MPEG-2
    with pytest.raises(ValueError, match="MPEG-1 Layer III"):
        mm.demux_mp3(bytes(hdr) + good[4:])
    # parameter change mid-stream (pseudo-VBR)
    other = mm.encode_mp3_frames(1, 192, 44100, 2)
    with pytest.raises(ValueError, match="VBR"):
        mm.demux_mp3(mm.encode_mp3_frames(1, 128, 44100, 2) + other)


def test_mp4_roundtrip():
    blob = mm.encode_mp4_boxes(4321, timescale=90000, n_tracks=3, mdat_bytes=40)
    assert mm.parse_mp4(blob) == {
        "format": "mp4",
        "brand": "isom",
        "n_boxes": 3,
        "n_tracks": 3,
        "timescale": 90000,
        "duration_us": 4321 * 1_000_000 // 90000,
        "mdat_bytes": 40,
    }


def test_mp4_strict_rejections():
    blob = mm.encode_mp4_boxes(1000)
    with pytest.raises(ValueError):
        mm.parse_mp4(blob[:-3])  # boxes no longer tile the stream
    with pytest.raises(ValueError, match="ftyp"):
        mm.parse_mp4(blob[len(blob) - 72 :])  # stream without leading ftyp
    with pytest.raises(ValueError, match="moov"):
        mm.parse_mp4(blob[:20])  # exactly the ftyp box, nothing else
    # non-ASCII box type
    bad = bytearray(blob)
    bad[4] = 0x01
    with pytest.raises(ValueError, match="ASCII|ftyp"):
        mm.parse_mp4(bytes(bad))


def test_decode_payload_routes_containers():
    assert mm.decode_payload(mm.encode_mp3_frames(2, 64, 32000, 1))["format"] == "mp3"
    assert mm.decode_payload(mm.encode_mp4_boxes(10))["format"] == "mp4"
    # text blobs still raise NotImplementedError (the unified-lane route)
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"plain text, not media")


def test_typed_extractors_spark_lane(spark):
    rows = [
        (1, bytearray(mm.encode_mp3_frames(3, 128, 44100, 2, with_crc=True))),
        (2, bytearray(mm.encode_mp3_frames(5, 64, 32000, 1, with_crc=False))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in mm.extract_mp3_features(df).collect()}
    assert got[1]["n_frames"] == 3 and got[1]["crc_frames"] == 3
    assert got[2]["n_frames"] == 5 and got[2]["crc_frames"] == 0
    assert got[2]["duration_us"] == 5 * 1152 * 1_000_000 // 32000

    rows4 = [(7, bytearray(mm.encode_mp4_boxes(5000, 600, n_tracks=2)))]
    df4 = spark.createDataFrame(rows4, "doc_id long, payload binary")
    got4 = mm.extract_mp4_features(df4).collect()[0]
    assert got4["n_tracks"] == 2
    assert got4["duration_us"] == 5000 * 1_000_000 // 600
