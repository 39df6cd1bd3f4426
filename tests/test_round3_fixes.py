"""Regression tests for round-3 ADVICE/VERDICT fixes."""

from __future__ import annotations

import os

import pytest

from universal_data_connector_spark.sources.files import directory_source


def _write(path: str, content: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)
    return path


def test_contamination_overlap_planted(spark):
    """A train doc containing a benchmark passage verbatim flags with
    the passage's gram count; clean docs and sub-13-word docs don't."""
    from universal_data_connector_spark.operators.dedup import (
        contamination_overlap)

    passage = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lam mu nu xi omicron")                      # 15 words
    train = spark.createDataFrame(
        [(1, "intro words here " + passage + " closing words"),  # contains it
         (2, passage.replace("theta", "SWAPPED")),               # broken grams
         (3, "totally unrelated text about storage engines and joins"),
         (4, "short doc")],
        "doc_id bigint, text string")
    bench = spark.createDataFrame([(100, passage)],
                                  "bench_id bigint, text string")
    got = {r.doc_id: r for r in contamination_overlap(train, bench).collect()}
    # the 15-word passage has 3 distinct 13-grams, all inside doc 1
    assert got[1].n_shared_grams == 3 and got[1].n_bench_docs == 1
    assert set(got) == {1}   # 2's grams all differ; 3 unrelated; 4 too short


def test_pack_sequences_boundaries(spark):
    """Concat-and-split contract on planted sizes: within one shard,
    pack_id/pack_offset advance by exact token counts and documents
    straddle pack boundaries rather than opening fresh packs."""
    from pyspark.sql import functions as F

    from universal_data_connector_spark.operators.packing import pack_sequences

    # one shard (ids all % 16 == 1): token counts 600, 500, 300
    rows = [(1, "w " * 600), (17, "w " * 500), (33, "w " * 300)]
    d = spark.createDataFrame([(i, t.strip()) for i, t in rows],
                              "doc_id bigint, text string")
    got = {r.doc_id: r for r in pack_sequences(d, budget=1024).collect()}
    assert all(r.shard == 1 for r in got.values())
    assert (got[1].pack_id, got[1].pack_offset) == (0, 0)
    assert (got[17].pack_id, got[17].pack_offset) == (0, 600)   # straddles
    assert (got[33].pack_id, got[33].pack_offset) == (1, 76)    # 1100 % 1024
    assert [r.n_tokens for r in got.values()] == [600, 500, 300]

    # custom shard expression groups independently
    by_even = pack_sequences(d, budget=1024,
                             shard=F.pmod(F.col("doc_id"), F.lit(2)))
    assert {r.shard for r in by_even.collect()} == {1}


def test_pack_sequences_matches_python_model(spark):
    """Property-style check against a sequential Python model of
    concat-and-split packing: for randomized token counts across
    shards, every (pack_id, pack_offset) equals the model's prefix-sum
    assignment."""
    import random

    from pyspark.sql import functions as F

    from universal_data_connector_spark.operators.packing import pack_sequences

    rng = random.Random(7)
    rows = [(i, "w " * rng.randint(0, 700)) for i in range(200)]
    d = spark.createDataFrame([(i, t.strip()) for i, t in rows],
                              "doc_id bigint, text string")
    budget, n_shards = 256, 4
    got = {r.doc_id: (r.shard, r.pack_id, r.pack_offset, r.n_tokens)
           for r in pack_sequences(d, budget=budget, n_shards=n_shards).collect()}

    cum: dict[int, int] = {}
    for i, t in rows:                      # ordered by doc_id, like the window
        n = len(t.split())
        shard = i % n_shards
        c = cum.get(shard, 0)
        assert got[i] == (shard, c // budget, c % budget, n), (i, got[i], c, n)
        cum[shard] = c + n


def test_kafka_source_contract_without_broker(spark):
    """Everything short of the broker I/O: the consumer-option mapping
    (including the reference's legacy smallest/largest offset values,
    KafkaSourceContext.java:27-41) and the wire-schema projection run
    against a synthetic frame with Kafka's exact read schema."""
    from datetime import datetime

    from universal_data_connector_spark.sources.kafka import (
        kafka_reader_options,
        project_kafka,
    )

    opts = kafka_reader_options({"bootstrapServers": "b1:9092,b2:9092",
                                 "topic": "events",
                                 "autoOffsetReset": "smallest",
                                 "groupId": "cg-1"})
    assert opts == {"kafka.bootstrap.servers": "b1:9092,b2:9092",
                    "subscribe": "events",
                    "startingOffsets": "earliest",   # smallest -> earliest
                    "kafka.group.id": "cg-1"}
    assert kafka_reader_options({"bootstrapServers": "b", "topic": "t",
                                 "autoOffsetReset": "largest"}
                                )["startingOffsets"] == "latest"
    assert "kafka.group.id" not in kafka_reader_options(
        {"bootstrapServers": "b", "topic": "t"})

    wire = spark.createDataFrame(
        [(b"k1", b"payload", "events", 0, 42, datetime(2026, 1, 1), 0)],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int")
    row = project_kafka(wire).collect()[0]
    assert row.content == "payload" and row.message_key == "k1"
    assert (row.topic, row.partition, row.offset) == ("events", 0, 42)
    assert row.source_file == "KAFKA_SOURCE"


def test_kafka_sink_contract_without_broker(spark):
    """Record shaping per KafkaSinkContext.java:50 — content becomes
    BOTH key and value; frames already carrying key/value pass through
    untouched — plus the producer option mapping."""
    from universal_data_connector_spark.sinks.kafka import (
        kafka_records,
        kafka_writer_options,
    )

    filemode = spark.createDataFrame([("a.txt", "TEXT", "hello")],
                                     "source_file string, file_type string, "
                                     "content string")
    row = kafka_records(filemode).collect()[0]
    assert row.key == "hello" and row.value == "hello"

    explicit = spark.createDataFrame([("k", "v")], "key string, value string")
    assert kafka_records(explicit).collect()[0].asDict() == {"key": "k",
                                                             "value": "v"}

    assert kafka_writer_options({"bootstrapServers": "b:9092",
                                 "topic": "out"}) == {
        "kafka.bootstrap.servers": "b:9092", "topic": "out"}


def test_s3_content_type_mapping():
    """Reference S3SinkContext.java:105-115 switch, exactly: CSV ->
    text/csv, PARQUET -> application/x-parquet, everything else ->
    application/octet-stream."""
    from universal_data_connector_spark.sinks.files import content_type_for
    assert content_type_for("CSV") == "text/csv"
    assert content_type_for("csv") == "text/csv"
    assert content_type_for("PARQUET") == "application/x-parquet"
    assert content_type_for("CRC") == "application/octet-stream"
    assert content_type_for("BINARY") == "application/octet-stream"
    assert content_type_for("TEXT") == "application/octet-stream"
    assert content_type_for("anything") == "application/octet-stream"
    assert content_type_for(None) == "application/octet-stream"


def test_directory_source_root_reappearing_in_tree(spark, tmp_path):
    """preserveStructure must strip only the PREFIX occurrence of the
    configured root: a root /a/b holding /a/b/x/a/b/y.bin yields
    x/a/b/y.bin (substring_index on the LAST occurrence truncated it
    to y.bin)."""
    base = tmp_path / "a" / "b"
    _write(str(base / "x" / "a" / "b" / "y.bin"), "payload")
    df = directory_source(spark, {"path": str(base), "preserveStructure": "true"})
    assert [r.source_file for r in df.collect()] == ["x/a/b/y.bin"]
