"""Multimodal binary-column plumbing: encode (JVM) → Arrow → decode (Python)."""

import pytest

from steampipe_sqlite_spark.operators.multimodal import (
    decode_audio_meta,
    decode_image_meta,
    decode_image_real,
    decode_video_meta,
    resize_plan,
    sample_frames,
    synthesize_media,
)
from steampipe_sqlite_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(load_table(spark, SF_DIR, "documents")).cache()


def test_payload_is_binary_with_typed_meta(media):
    schema = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<")


def test_image_header_roundtrip(media):
    rows = decode_image_meta(media).collect()
    assert rows, "expected image rows"
    for r in rows:
        assert r.doc_id % 3 == 0
        assert r.width == 64 + (r.doc_id * 37) % 193
        assert r.height == 48 + (r.doc_id * 53) % 145
        assert r.channels in (1, 3)
        assert r.n_pixels == r.width * r.height * r.channels
        assert r.first_px == (r.doc_id * 7) % 256
        pxs = [(r.doc_id * 7 + j * 13) % 256 for j in range(8)]
        assert r.px_mean == sum(pxs) / 8
        assert r.px_max == max(pxs)


def test_audio_and_video_headers(media):
    vid = decode_video_meta(media).collect()
    assert all(r.fps == 24 and 30 <= r.n_frames < 301 for r in vid)
    aud = decode_audio_meta(media).collect()
    assert all(r.sample_rate in (8000, 16000, 24000) for r in aud)


def test_resize_preserves_aspect_and_fits_box(media):
    for r in resize_plan(decode_image_meta(media), box=64).collect():
        assert max(r.out_w, r.out_h) <= 64
        assert min(r.out_w, r.out_h) >= 1
        # longest side fills the box exactly (floor rounding)
        assert max(r.out_w, r.out_h) == 64 * max(r.width, r.height) // max(r.width, r.height)


def test_frame_sampling_stride(media):
    vids = decode_video_meta(media)
    frames = sample_frames(vids, every=10)
    per = {r.doc_id: r.n for r in frames.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    expected = {r.doc_id: (r.n_frames - 1) // 10 + 1 for r in vids.collect()}
    assert per == expected


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")
