"""Multimodal plumbing tests: magic-byte sniffing, binary metadata,
the stubbed decode path (schema/batch shape real, codec faked), and
frame sampling (referenced from plans/catalog.py
`multimodal_binary_meta`)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from universal_data_connector_spark.operators.multimodal import (
    binary_metadata,
    decode_image_batch,
    partition_by_content_hash,
    sample_frames,
)

PNG = bytes.fromhex("89504e470d0a1a0a") + b"fakepng"
JPG = bytes.fromhex("ffd8ffe0") + b"fakejpeg"
GIF = b"GIF89a" + b"fakegif"
WAV = b"RIFF" + b"\x00" * 4 + b"WAVE"
MP3 = b"ID3\x03" + b"fakemp3"
WEBM = bytes.fromhex("1a45dfa3") + b"fakewebm"
RAW = b"just some text bytes"


@pytest.fixture(scope="module")
def assets(spark):
    rows = [(1, PNG), (2, JPG), (3, GIF), (4, WAV), (5, MP3), (6, WEBM), (7, RAW)]
    return spark.createDataFrame(rows, "asset_id bigint, content binary")


def test_magic_byte_media_types(assets):
    got = {r.asset_id: r.media_type for r in binary_metadata(assets).collect()}
    assert got == {1: "image/png", 2: "image/jpeg", 3: "image/gif",
                   4: "audio/wav", 5: "audio/mp3", 6: "video/webm",
                   7: "application/octet-stream"}


def test_binary_metadata_length_and_sha(assets):
    rows = {r.asset_id: r for r in binary_metadata(assets).collect()}
    assert rows[1].byte_length == len(PNG)
    assert rows[7].content_sha256 == hashlib.sha256(RAW).hexdigest()


def test_decode_stub_raises_without_fake(assets):
    plan = decode_image_batch(assets, fake=False)
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        plan.collect()


def test_decode_fake_features_deterministic(assets):
    out = {r.asset_id: r.features
           for r in decode_image_batch(assets, feature_dim=4, fake=True).collect()}
    assert out[1] == [float(len(PNG))] + [float(b) for b in PNG[:3]]
    assert all(len(v) == 4 for v in out.values())
    again = {r.asset_id: r.features
             for r in decode_image_batch(assets, feature_dim=4, fake=True).collect()}
    assert out == again


def test_sample_frames_counts(assets):
    out = sample_frames(assets, every_n_bytes=4, max_frames=3)
    counts = {r[0]: r[1] for r in
              out.groupBy("asset_id").agg(F.count("*")).collect()}
    # every asset >= 12 bytes -> capped at max_frames
    assert all(c == 3 for c in counts.values())
    offs = [r.frame_offset for r in
            out.filter(F.col("asset_id") == 1).orderBy("frame_idx").collect()]
    assert offs == [0, 4, 8]


def test_partition_by_content_hash(assets):
    out = partition_by_content_hash(assets, n_shards=8)
    assert out.rdd.getNumPartitions() == 8
    shards = {r.shard for r in out.select("shard").collect()}
    assert all(0 <= s < 8 for s in shards)


def test_resize_media_batch_fake(spark):
    from universal_data_connector_spark.operators.multimodal import resize_media_batch
    df = spark.createDataFrame(
        [(1, b"0123456789abcdef"), (2, b""), (3, None)],
        "asset_id bigint, content binary")
    out = {r.asset_id: r for r in
           resize_media_batch(df, target_bytes=8, fake=True).collect()}
    assert all(r.resized_length == 8 for r in out.values())
    assert out[1].content_resized == b"02468ace"  # nearest-neighbor bytes
    assert out[2].content_resized == bytes(8)    # empty -> zero bytes
    assert out[3].content_resized == bytes(8)    # null -> zero bytes


def test_resize_media_batch_requires_fake(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from universal_data_connector_spark.operators.multimodal import resize_media_batch
    df = spark.createDataFrame([(1, b"xx")], "asset_id bigint, content binary")
    with pytest.raises(Exception) as exc:
        resize_media_batch(df, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "resize requires" in str(exc.value)


# ---------------------------------------------------------------------------
# real codec path (round 10): activates wherever pillow exists; in a
# codec-less container these SKIP and the NotImplementedError contract
# above is the evidence (SURVEY §2B r10 permanence decision)
# ---------------------------------------------------------------------------

def _real_png(px=8) -> bytes:
    """A genuine PNG via pillow (env-gated callers only)."""
    import io

    from PIL import Image
    im = Image.new("RGB", (px, px), (255, 0, 0))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def test_decode_real_path_with_pillow(spark):
    pytest.importorskip("PIL")
    df = spark.createDataFrame(
        [(1, _real_png(8)), (2, b"not an image")],
        "asset_id bigint, content binary")
    rows = {r.asset_id: r.features
            for r in decode_image_batch(df, feature_dim=6).collect()}
    # real decode: width, height, channels, then channel means
    assert rows[1][:3] == [8.0, 8.0, 3.0]
    assert rows[1][3] == pytest.approx(255.0)   # solid red
    assert rows[1][4] == pytest.approx(0.0)
    # undecodable payload -> NULL features, not a task failure
    assert rows[2] is None


def test_resize_real_path_with_pillow(spark):
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from universal_data_connector_spark.operators.multimodal import (
        resize_media_batch,
    )
    df = spark.createDataFrame(
        [(1, _real_png(64)), (2, b"junk")],
        "asset_id bigint, content binary")
    rows = {r.asset_id: r for r in
            resize_media_batch(df, target_px=16).collect()}
    out = Image.open(io.BytesIO(bytes(rows[1].content_resized)))
    assert out.size == (16, 16)
    assert rows[1].resized_length == len(bytes(rows[1].content_resized))
    assert rows[2].content_resized is None
    assert rows[2].resized_length is None
