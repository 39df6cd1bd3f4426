"""Environment-gated end-to-end tests for external infrastructure.

The Kafka and S3 connectors are contract-tested broker-free in
`test_round3_fixes.py` / `test_round4_fixes.py` / `test_round6_fixes.py`
(option mapping, record shaping, key naming, exact-byte writes). The
I/O itself needs real infrastructure that does not exist in the build
sandbox, so these tests skip unless pointed at it:

* ``UDC_KAFKA_BOOTSTRAP=host:9092`` — a reachable Kafka broker, plus
  the ``spark-sql-kafka`` connector on the Spark classpath (e.g.
  ``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
* ``UDC_S3_ENDPOINT`` / ``UDC_S3_BUCKET`` (and optionally
  ``UDC_S3_ACCESS_KEY`` / ``UDC_S3_SECRET_KEY``) — an S3-compatible
  object store (MinIO works), plus ``hadoop-aws`` on the classpath.

Run them anywhere real infra exists:

    UDC_KAFKA_BOOTSTRAP=localhost:9092 pytest tests/test_external_infra.py

Reference behavior verified end-to-end here:
* Kafka: value-first read (``KafkaSourceContext.java:48-56``) and
  item-as-key-AND-value write (``KafkaSinkContext.java:50``).
* S3: object per file under bucket/prefix, raw filename keys, exact
  bytes (``S3SinkContext.java:56-103``).
"""

from __future__ import annotations

import os
import time
import uuid

import pytest

KAFKA = os.environ.get("UDC_KAFKA_BOOTSTRAP")
S3_ENDPOINT = os.environ.get("UDC_S3_ENDPOINT")
S3_BUCKET = os.environ.get("UDC_S3_BUCKET")

kafka_required = pytest.mark.skipif(
    not KAFKA, reason="UDC_KAFKA_BOOTSTRAP not set (no broker here)")
s3_required = pytest.mark.skipif(
    not (S3_ENDPOINT and S3_BUCKET),
    reason="UDC_S3_ENDPOINT/UDC_S3_BUCKET not set (no object store here)")


@kafka_required
def test_kafka_sink_then_source_roundtrip(spark):
    """Batch write via kafka_sink, batch read via kafka_source: the
    reference's content-as-key-and-value contract must round-trip."""
    from universal_data_connector_spark.sinks.kafka import kafka_sink
    from universal_data_connector_spark.sources.kafka import kafka_source

    topic = f"udc-e2e-{uuid.uuid4().hex[:12]}"
    payloads = [f"msg-{i}" for i in range(5)]
    df = spark.createDataFrame([(p,) for p in payloads], "content string")
    kafka_sink(df, {"bootstrapServers": KAFKA, "topic": topic},
               streaming=False)

    out = kafka_source(
        spark, {"bootstrapServers": KAFKA, "topic": topic,
                "autoOffsetReset": "smallest"},  # reference legacy spelling
        streaming=False).collect()
    assert sorted(r.content for r in out) == sorted(payloads)
    # item-as-key-AND-value (KafkaSinkContext.java:50)
    assert all(r.message_key == r.content for r in out)


@kafka_required
def test_kafka_streaming_pipeline_e2e(spark, tmp_path):
    """Streaming kafka source -> filter transform -> file sink through
    the engine, the reference's primary Kafka topology."""
    from universal_data_connector_spark import engine
    from universal_data_connector_spark.config import parse_config

    topic = f"udc-e2e-{uuid.uuid4().hex[:12]}"
    seed = spark.createDataFrame(
        [("keep-1",), ("drop-2",), ("keep-3",)], "content string")
    from universal_data_connector_spark.sinks.kafka import kafka_sink
    kafka_sink(seed, {"bootstrapServers": KAFKA, "topic": topic},
               streaming=False)

    cfg = parse_config({"pipelines": [{
        "name": "kafka-e2e",
        "source": {"type": "kafka", "properties": {
            "bootstrapServers": KAFKA, "topic": topic,
            "autoOffsetReset": "earliest"}},
        "transformations": [{"type": "filter", "properties": {
            "condition": "keep"}}],
        "sink": {"type": "file", "properties": {
            "path": str(tmp_path / "out"),
            "checkpointLocation": str(tmp_path / "ckpt")}},
    }]}).pipelines[0]
    query = engine.run(spark, cfg, streaming=True)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            names = (os.listdir(tmp_path / "out")
                     if (tmp_path / "out").exists() else [])
            if names:
                break
            time.sleep(1)
        assert names, "no output produced within 60s"
    finally:
        query.stop()


@s3_required
def test_s3_sink_object_per_file_roundtrip(spark):
    """Raw objects land under bucket/prefix with raw filename keys and
    exact bytes — via whichever write path (boto3 / Hadoop S3A) is
    available in this environment."""
    boto3 = pytest.importorskip("boto3")
    from universal_data_connector_spark.sinks.files import s3_sink

    prefix = f"udc-e2e/{uuid.uuid4().hex[:12]}"
    props = {"bucketName": S3_BUCKET, "prefix": prefix,
             "endpoint": S3_ENDPOINT,
             "accessKey": os.environ.get("UDC_S3_ACCESS_KEY"),
             "secretKey": os.environ.get("UDC_S3_SECRET_KEY")}
    df = spark.createDataFrame(
        [("in/a.txt", "TEXT", "hello-s3"), ("in/b.csv", "CSV", "x,y\n1,2")],
        "source_file string, file_type string, content string")
    s3_sink(df, dict(props), streaming=False)

    client = boto3.client(
        "s3", endpoint_url=S3_ENDPOINT,
        aws_access_key_id=props["accessKey"],
        aws_secret_access_key=props["secretKey"])
    a = client.get_object(Bucket=S3_BUCKET, Key=f"{prefix}/a.txt")
    b = client.get_object(Bucket=S3_BUCKET, Key=f"{prefix}/b.csv")
    # exact bytes, no trailing newline (S3SinkContext.java:85-97)
    assert a["Body"].read() == b"hello-s3"
    assert b["Body"].read() == b"x,y\n1,2"
    assert a["ContentType"] == "application/octet-stream"
    assert b["ContentType"] == "text/csv"


@s3_required
def test_s3_source_whole_object_read(spark):
    """Seed objects with boto3, read through the s3 source (boto3
    fallback here, S3A where hadoop-aws is present): s3a:// URIs,
    whole-object content, basename glob. The loopback twin lives in
    tests/test_s3_loopback.py; this one proves the same contract
    against a real endpoint when the environment provides one."""
    boto3 = pytest.importorskip("boto3")
    from universal_data_connector_spark.sources.files import s3_source

    prefix = f"udc-src-e2e/{uuid.uuid4().hex[:12]}"
    client = boto3.client(
        "s3", endpoint_url=S3_ENDPOINT,
        aws_access_key_id=os.environ.get("UDC_S3_ACCESS_KEY"),
        aws_secret_access_key=os.environ.get("UDC_S3_SECRET_KEY"))
    client.put_object(Bucket=S3_BUCKET, Key=f"{prefix}/a.txt",
                      Body=b"real endpoint")
    client.put_object(Bucket=S3_BUCKET, Key=f"{prefix}/skip.bin",
                      Body=b"\x00")
    try:
        df = s3_source(spark, {
            "bucketName": S3_BUCKET, "prefix": prefix,
            "pattern": "*.txt", "endpoint": S3_ENDPOINT,
            "accessKey": os.environ.get("UDC_S3_ACCESS_KEY"),
            "secretKey": os.environ.get("UDC_S3_SECRET_KEY")})
        rows = df.collect()
        assert [(r.source_file, r.content) for r in rows] == [
            (f"s3a://{S3_BUCKET}/{prefix}/a.txt", "real endpoint")]
    finally:
        client.delete_object(Bucket=S3_BUCKET, Key=f"{prefix}/a.txt")
        client.delete_object(Bucket=S3_BUCKET, Key=f"{prefix}/skip.bin")
