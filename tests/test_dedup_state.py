"""Cross-run exact dedup against the persistent seen-key store
(``operators/dedup_state.py`` + the ``dedup_state`` YAML
transformation), including the crash-ordering contract the engine
enforces in ``finalize_batch_sink``: seen keys commit strictly after
the sink and strictly before archive/manifest."""

from __future__ import annotations

import os

import pytest

from universal_data_connector_spark.operators.dedup_state import (
    compact_seen_store,
    seen_filter,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _ids(df):
    return sorted(r.doc_id for r in df.collect())


def test_seen_filter_across_batches(spark, tmp_path):
    store = str(tmp_path / "seen")
    b1, c1 = seen_filter(_docs(spark, [(1, "aa"), (2, "bb")]),
                         store, ["text"], num_buckets=4)
    assert _ids(b1) == [1, 2]
    c1()
    # batch 2: one repeat (different doc_id, same text), one new
    b2, c2 = seen_filter(_docs(spark, [(3, "aa"), (4, "cc")]),
                         store, ["text"], num_buckets=4)
    assert _ids(b2) == [4]
    c2()
    # batch 3: everything seen
    b3, _ = seen_filter(_docs(spark, [(5, "aa"), (6, "bb"), (7, "cc")]),
                        store, ["text"], num_buckets=4)
    assert _ids(b3) == []


def test_uncommitted_batch_leaves_store_untouched(spark, tmp_path):
    """A failed sink never commits: the rerun must ship the same
    survivors (no data loss from a half-run)."""
    store = str(tmp_path / "seen")
    b1, c1 = seen_filter(_docs(spark, [(1, "aa")]), store, ["text"],
                         num_buckets=4)
    assert _ids(b1) == [1]
    # crash before commit — c1 never called
    b1r, c1r = seen_filter(_docs(spark, [(1, "aa")]), store, ["text"],
                           num_buckets=4)
    assert _ids(b1r) == [1]
    c1r()
    b2, _ = seen_filter(_docs(spark, [(2, "aa")]), store, ["text"],
                        num_buckets=4)
    assert _ids(b2) == []


def test_within_batch_duplicates_resolve_deterministically(
        spark, tmp_path):
    store = str(tmp_path / "seen")
    batch = _docs(spark, [(9, "xx"), (3, "xx"), (6, "xx"), (1, "yy")])
    first, _ = seen_filter(batch, store, ["text"], num_buckets=4)
    winner = {r.text: r.doc_id for r in first.collect()}
    for _ in range(3):
        again, _ = seen_filter(batch, store, ["text"], num_buckets=4)
        assert {r.text: r.doc_id for r in again.collect()} == winner


def test_replayed_commit_is_harmless_and_compactable(spark, tmp_path):
    """Duplicate seen rows from a replayed commit change nothing about
    filtering; compact_seen_store collapses them to distinct keys."""
    store = str(tmp_path / "seen")
    b1, c1 = seen_filter(_docs(spark, [(1, "aa"), (2, "bb")]),
                         store, ["text"], num_buckets=4)
    _ids(b1)
    c1()
    c1()  # replay after a crash between commit and bookkeeping
    b2, _ = seen_filter(_docs(spark, [(3, "aa"), (4, "new")]),
                        store, ["text"], num_buckets=4)
    assert _ids(b2) == [4]
    compact_seen_store(spark, store)
    # one file per live bucket, distinct keys, filtering unchanged
    for name in os.listdir(store):
        if name.startswith("udc_kb="):
            parts = [f for f in os.listdir(os.path.join(store, name))
                     if f.endswith(".parquet")]
            assert len(parts) == 1
    b3, _ = seen_filter(_docs(spark, [(5, "aa"), (6, "bb"), (7, "zz")]),
                        store, ["text"], num_buckets=4)
    assert _ids(b3) == [7]


def test_compact_crash_between_renames_recovers(spark, tmp_path):
    """compact's two-rename swap interrupted between live->old and
    staged->live: the next seen_filter restores the old copy — keys
    must never vanish (vanished keys = downstream duplicates)."""
    store = str(tmp_path / "seen")
    b1, c1 = seen_filter(_docs(spark, [(1, "aa")]), store, ["text"],
                         num_buckets=4)
    _ids(b1)
    c1()
    live = next(os.path.join(store, n) for n in os.listdir(store)
                if n.startswith("udc_kb="))
    bucket = os.path.basename(live).split("=")[1]
    os.rename(live, os.path.join(store, f"_udc_old_{bucket}"))
    # recovery runs on the next store open
    b2, _ = seen_filter(_docs(spark, [(2, "aa")]), store, ["text"],
                        num_buckets=4)
    assert _ids(b2) == []


def test_dedup_state_yaml_pipeline_two_runs(spark, tmp_path):
    """Engine e2e: content-level dedup across two batch runs WITHOUT a
    manifest — the second run re-reads the first file, and its content
    is dropped because the seen store (committed post-sink by
    finalize_batch_sink step 0) already has the key."""
    from universal_data_connector_spark.config import parse_config
    from universal_data_connector_spark.engine import run

    inp = tmp_path / "in"
    out = tmp_path / "out"
    inp.mkdir()
    cfg = parse_config({"pipelines": [{
        "name": "dedup-ingest",
        "source": {"type": "file",
                   "properties": {"path": str(inp), "pattern": "*.txt"}},
        "transformations": [
            {"type": "dedup_state",
             "properties": {"stateDir": str(tmp_path / "seen"),
                            "keys": "content", "numBuckets": "4"}},
        ],
        "sink": {"type": "file",
                 "properties": {"path": str(out), "extension": ".txt"}},
    }]}).pipelines[0]

    (inp / "a.txt").write_text("hello corpus")
    run(spark, cfg)
    assert sorted(os.listdir(out)) == ["a.txt"]

    # run 2: a.txt unchanged (re-read, seen -> dropped), b.txt is a
    # byte-duplicate of a.txt under a new name (dropped — THE case a
    # file manifest cannot catch), c.txt is new content (ships)
    (inp / "b.txt").write_text("hello corpus")
    (inp / "c.txt").write_text("fresh content")
    run(spark, cfg)
    assert sorted(os.listdir(out)) == ["a.txt", "c.txt"]
    # (trailing newline = the file sink's reference-faithful text write)
    assert (out / "c.txt").read_text() == "fresh content\n"


def test_dedup_state_commit_precedes_manifest(spark, tmp_path,
                                              monkeypatch):
    """Crash between the seen-store commit (finalize step 0) and
    manifest_record (step 2): the rerun re-reads the same file, the
    survivors filter as seen, and the store holds exactly one copy of
    the keys — the ordering that prevents future duplicates."""
    from universal_data_connector_spark.config import parse_config
    from universal_data_connector_spark.engine import run
    from universal_data_connector_spark.sources import files as files_mod

    inp = tmp_path / "in"
    out = tmp_path / "out"
    inp.mkdir()
    cfg = parse_config({"pipelines": [{
        "name": "dedup-ingest-manifest",
        "source": {"type": "file",
                   "properties": {"path": str(inp), "pattern": "*.txt",
                                  "manifestDir": str(tmp_path / "m")}},
        "transformations": [
            {"type": "dedup_state",
             "properties": {"stateDir": str(tmp_path / "seen"),
                            "keys": "content", "numBuckets": "4"}},
        ],
        "sink": {"type": "file",
                 "properties": {"path": str(out), "extension": ".txt"}},
    }]}).pipelines[0]

    (inp / "a.txt").write_text("only once")

    def crashing_record(*a, **kw):
        raise RuntimeError("injected crash after dedup commit")

    monkeypatch.setattr(files_mod, "manifest_record", crashing_record)
    with pytest.raises(RuntimeError, match="after dedup commit"):
        run(spark, cfg)
    monkeypatch.undo()
    # sink succeeded before the crash; the rerun re-reads a.txt
    # (manifest never recorded) but ships nothing new
    assert sorted(os.listdir(out)) == ["a.txt"]
    run(spark, cfg)
    assert sorted(os.listdir(out)) == ["a.txt"]
    # and a later duplicate under a new name still dedups
    (inp / "dup.txt").write_text("only once")
    run(spark, cfg)
    assert sorted(os.listdir(out)) == ["a.txt"]


def test_dedup_state_rejects_streaming(spark, tmp_path):
    from universal_data_connector_spark.engine import (
        _dedup_state_transform,
    )

    stream = (spark.readStream.schema("doc_id bigint, text string")
              .json(str(tmp_path)))
    with pytest.raises(ValueError, match="batch-only"):
        _dedup_state_transform(stream, {"stateDir": str(tmp_path / "s")})


def test_dedup_state_missing_key_column_raises(spark, tmp_path):
    from universal_data_connector_spark.engine import (
        _dedup_state_transform,
    )

    with pytest.raises(ValueError, match="not in"):
        _dedup_state_transform(
            _docs(spark, [(1, "x")]),
            {"stateDir": str(tmp_path / "s"), "keys": "nope"})
