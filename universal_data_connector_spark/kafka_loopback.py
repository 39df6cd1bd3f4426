"""In-process loopback Kafka broker: the sandbox e2e double for S4/K4.

The reference's Kafka pair (``factory/source/KafkaSourceContext.java:
48-56`` — a ``KafkaConsumer`` poll loop that keeps record VALUES;
``factory/sink/KafkaSinkContext.java:43-56`` — each item produced as
key AND value) needs a broker to prove end-to-end. This container has
none, and no kafka client library either — so, the way moto graduated
the S3 pair to every-run loopback e2e (``tests/test_s3_loopback.py``),
this module emulates just enough broker for the engine's own code
paths to run for real: topics, partitions, offsets, consumer-group
commits, keyed partitioning. It is a TEST DOUBLE with faithful
semantics, not a wire-protocol Kafka; real deployments use Spark's
``format("kafka")`` connector (the unchanged primary path in
``sources/kafka.py`` / ``sinks/kafka.py``), and the env-gated
real-broker tests in ``tests/test_external_infra.py`` remain the
actual-infra proof.

Activation: ``bootstrapServers: "loopback:///abs/dir"`` — a scheme no
real ``host:port`` list can collide with. Loopback pipelines run BATCH
(one poll per run, the reference's loop body): a consumer group's
committed offsets make successive runs incremental, exactly the
static-set/manifest discipline the file and S3 sources use.

Broker layout under the directory::

    <topic>/.meta.json      {"partitions": N}   (created on demand)
    <topic>/p<k>.jsonl      partition log; OFFSET = line number
    <topic>/p<k>.jsonl.idx  {"lines": n, "bytes": b} — O(1) end
                            offsets, recount fallback on mismatch
    _groups/<groupId>.json  {"<topic>/<p>": next offset to read}

One JSON record per line: ``{"k": b64|null, "v": b64|null, "ts": ms}``
— base64 so arbitrary key/value bytes survive the text log; a null
value is a TOMBSTONE, which Kafka's wire format and Spark's connector
both accept (compacted-topic deletes). Appends are single ``write()``
calls under an ``flock``: per-partition produce order is append order,
as on a real broker.

Partitioning replicates Kafka's ``DefaultPartitioner``: murmur2 of the
key bytes (the exact public algorithm from
``org.apache.kafka.common.utils.Utils.murmur2``), masked positive,
mod partition count; a null key falls to round-robin over partitions.

Scale posture: the loopback is sandbox-sized by design — the listing
is bounded metadata (topic partitions), and record bytes flow through
``mapInPandas`` slice reads on executors (the ``_s3_source_boto3``
pattern), never through the driver; but a directory on one filesystem
is not a distributed log, and nothing here replaces the Kafka
connector at scale.
"""

from __future__ import annotations

import base64
import json
import os
import time

_META = ".meta.json"
_GROUPS = "_groups"


def is_loopback(props: dict) -> bool:
    return str(props.get("bootstrapServers", "")).startswith("loopback:")


def broker_dir(props: dict) -> str:
    """``loopback:///abs/dir`` -> ``/abs/dir``."""
    raw = str(props["bootstrapServers"])
    path = raw.split(":", 1)[1]
    if path.startswith("//"):
        path = path[2:]
        # loopback://host/path has no meaning; the "authority" is the
        # first path segment only when it is empty (loopback:///x)
    if not path.startswith("/"):
        path = "/" + path
    return path


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (``Utils.murmur2``), bit-exact in 32-bit
    two's-complement arithmetic — so a key routes to the SAME
    partition here as under a real broker with default partitioning."""
    def _i32(x: int) -> int:
        x &= 0xFFFFFFFF
        return x - 0x100000000 if x >= 0x80000000 else x

    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    r = 24
    h = _i32(seed ^ length)
    i = 0
    for _ in range(length // 4):
        k = int.from_bytes(data[i:i + 4], "little", signed=True)
        i += 4
        k = _i32(k * m)
        k = _i32(k ^ ((k & 0xFFFFFFFF) >> r))
        k = _i32(k * m)
        h = _i32(h * m)
        h = _i32(h ^ k)
    left = length & 3
    if left == 3:
        h = _i32(h ^ ((data[i + 2] & 0xFF) << 16))
    if left >= 2:
        h = _i32(h ^ ((data[i + 1] & 0xFF) << 8))
    if left >= 1:
        h = _i32(h ^ (data[i] & 0xFF))
        h = _i32(h * m)
    h = _i32(h ^ ((h & 0xFFFFFFFF) >> 13))
    h = _i32(h * m)
    h = _i32(h ^ ((h & 0xFFFFFFFF) >> 15))
    return h


def partition_for(key: bytes | None, n_partitions: int,
                  counter: int = 0) -> int:
    """DefaultPartitioner: keyed -> toPositive(murmur2(key)) % n;
    null key -> round-robin on the producer's counter."""
    if key is None:
        return counter % n_partitions
    return (murmur2(key) & 0x7FFFFFFF) % n_partitions


def ensure_topic(dir_: str, topic: str, n_partitions: int = 1) -> int:
    """Auto-create (the broker default) and return the partition
    count; an existing topic keeps its count, like a real broker.

    The claim is EXCLUSIVE via ``os.link`` (rename would silently
    REPLACE an existing meta, letting two concurrent creators with
    different counts clobber each other — r10 review): exactly one
    creator's count wins, every loser reads the winner's."""
    tdir = os.path.join(dir_, topic)
    meta = os.path.join(tdir, _META)
    if not os.path.isfile(meta):
        os.makedirs(tdir, exist_ok=True)
        tmp = f"{meta}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"partitions": int(n_partitions)}, fh)
        try:
            os.link(tmp, meta)  # fails if meta exists: true claim
        except FileExistsError:
            pass  # another creator won; its count is the topic's
        finally:
            os.remove(tmp)
    with open(meta) as fh:
        return int(json.load(fh)["partitions"])


def _log_path(dir_: str, topic: str, partition: int) -> str:
    return os.path.join(dir_, topic, f"p{partition}.jsonl")


def _sidecar_lines(log_path: str, expect_bytes: int,
                   already_locked: bool = False) -> int:
    """Line count of a partition log in O(1): the ``.idx`` sidecar
    (written atomically under the append flock) records
    ``{"lines": n, "bytes": b}``. A byte-size mismatch — a crash
    between log append and sidecar update, or a hand-edited log —
    falls back to a full recount, so the sidecar can lag but never
    lie (r10 review: the old per-call full read made every poll
    O(total record bytes) of driver I/O).

    The recount takes LOCK_SH so a concurrent multi-OS-write append
    cannot expose a torn final line mid-flush — UNLESS the caller
    already holds the append LOCK_EX (``already_locked=True``):
    flock conflicts across fds even within one process, so taking
    LOCK_SH there would self-deadlock.

    The recount counts only NEWLINE-TERMINATED lines: a producer that
    crashed mid-append can leave a torn (unterminated) tail, and a
    real broker's log recovery would truncate it — counting it as a
    record would both corrupt it on the next append (concatenation)
    and shift every later offset by one (r10 ADVICE)."""
    import fcntl

    idx = log_path + ".idx"
    try:
        with open(idx) as fh:
            rec = json.load(fh)
        if int(rec["bytes"]) == expect_bytes:
            return int(rec["lines"])
    except (OSError, ValueError, KeyError, TypeError):
        # TypeError: valid-JSON-but-not-an-object sidecar (`5`,
        # `[1,2]`) — every malformation falls to the recount, per the
        # can-lag-never-lie contract (r10 third review pass)
        pass
    with open(log_path, "rb") as fh:
        if not already_locked:
            fcntl.flock(fh.fileno(), fcntl.LOCK_SH)
        try:
            return sum(1 for line in fh if line.endswith(b"\n"))
        finally:
            if not already_locked:
                fcntl.flock(fh.fileno(), fcntl.LOCK_UN)


def _sidecar_write(log_path: str, lines: int, nbytes: int) -> None:
    idx = log_path + ".idx"
    tmp = f"{idx}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"lines": lines, "bytes": nbytes}, fh)
    os.replace(tmp, idx)


def append_records(dir_: str, topic: str,
                   records: list[tuple[bytes | None, bytes]],
                   n_partitions: int = 1,
                   counter_base: int = 0) -> None:
    """Produce a batch: route each (key, value) to its partition and
    append one JSON line per record. The per-partition flock serializes
    concurrent producers (Spark tasks), keeping offsets = line numbers
    consistent; each line lands in ONE write call.

    ``counter_base`` seeds the null-key round-robin counter: callers
    producing from many Spark tasks pass a per-task seed (the task
    partition id) so unkeyed records spread across topic partitions
    instead of every task restarting at partition 0 (r10 ADVICE)."""
    import fcntl

    n = ensure_topic(dir_, topic, n_partitions)
    ts = int(time.time() * 1000)
    by_part: dict[int, list[str]] = {}
    for i, (key, value) in enumerate(records):
        p = partition_for(key, n, counter=counter_base + i)
        line = json.dumps({
            "k": None if key is None
            else base64.b64encode(key).decode(),
            "v": None if value is None
            else base64.b64encode(value).decode(),
            "ts": ts,
        })
        by_part.setdefault(p, []).append(line)
    for p, lines in by_part.items():
        log = _log_path(dir_, topic, p)
        with open(log, "a+b") as fh:  # +: readable fd for the
            # torn-tail pread below; O_APPEND still pins writes to EOF
            fcntl.flock(fh.fileno(), fcntl.LOCK_EX)
            try:
                fd = fh.fileno()
                start_bytes = os.fstat(fd).st_size
                # Log recovery (the real broker's on-start truncation,
                # r10 ADVICE): a producer that crashed mid-append can
                # leave a torn unterminated tail; appending onto it
                # would concatenate two records into one corrupt line.
                # Truncate back to the last record boundary first —
                # safe under the exclusive append lock.
                if start_bytes and os.pread(fd, 1, start_bytes - 1) != b"\n":
                    # bounded backwards scan (64 KiB chunks) for the
                    # last record boundary: O(torn-tail length), not
                    # O(log size) of memory/IO under the exclusive
                    # lock (review finding r11)
                    keep, chunk = 0, 65536
                    pos = start_bytes
                    while pos > 0:
                        lo = max(0, pos - chunk)
                        buf = os.pread(fd, pos - lo, lo)
                        nl = buf.rfind(b"\n")
                        if nl >= 0:
                            keep = lo + nl + 1
                            break
                        pos = lo
                    os.ftruncate(fd, keep)
                    start_bytes = keep
                n0 = _sidecar_lines(log, start_bytes,
                                    already_locked=True)
                payload = "".join(line + "\n" for line in lines).encode()
                fh.write(payload)
                fh.flush()
                _sidecar_write(log, n0 + len(lines),
                               start_bytes + len(payload))
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)


def end_offsets(dir_: str, topic: str) -> dict[int, int]:
    """Per-partition end offset (= line count) — O(partitions) via the
    ``.idx`` sidecars, with a recount fallback on mismatch."""
    tdir = os.path.join(dir_, topic)
    if not os.path.isdir(tdir):
        return {}
    out = {}
    for p in range(ensure_topic(dir_, topic)):
        path = _log_path(dir_, topic, p)
        if os.path.isfile(path):
            out[p] = _sidecar_lines(path, os.path.getsize(path))
        else:
            out[p] = 0
    return out


def _group_path(dir_: str, group: str) -> str:
    return os.path.join(dir_, _GROUPS, f"{group}.json")


def committed_offsets(dir_: str, group: str) -> dict[str, int]:
    path = _group_path(dir_, group)
    if not os.path.isfile(path):
        return {}
    with open(path) as fh:
        return {k: int(v) for k, v in json.load(fh).items()}


def commit_offsets(dir_: str, group: str, offsets: dict[str, int]) -> None:
    """Merge-commit ``{"topic/partition": next_offset}`` atomically
    (write-then-rename, the state sinks' crash contract).

    The read-merge-replace runs under an flock on a ``.lock`` sibling
    (the partition-log locking discipline): two concurrent runs
    sharing a groupId would otherwise interleave read/write and lose
    one commit — still at-least-once, but extra redelivery
    (r10 ADVICE). The lock file, not the group file itself, carries
    the flock because ``os.replace`` swaps the inode the lock lives
    on."""
    import fcntl

    os.makedirs(os.path.join(dir_, _GROUPS), exist_ok=True)
    path = _group_path(dir_, group)
    with open(path + ".lock", "w") as lock_fh:
        fcntl.flock(lock_fh.fileno(), fcntl.LOCK_EX)
        try:
            merged = {**committed_offsets(dir_, group), **offsets}
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump(merged, fh)
            os.replace(tmp, path)
        finally:
            fcntl.flock(lock_fh.fileno(), fcntl.LOCK_UN)


def read_slice(dir_: str, topic: str, partition: int,
               start: int, end: int) -> list[tuple]:
    """Records [start, end) of one partition log as
    (key, value, topic, partition, offset, ts_ms) tuples — called on
    EXECUTORS by the source's mapInPandas fetch."""
    import fcntl

    path = _log_path(dir_, topic, partition)
    out = []
    if start >= end or not os.path.isfile(path):
        return out
    # LOCK_SH: an in-flight append larger than the IO buffer flushes
    # in several OS writes, and an unlocked reader could see a torn
    # JSON prefix as its last line (r10 review). Shared readers
    # proceed concurrently; only the LOCK_EX appender excludes. The
    # lock covers only the BYTE reads — JSON parse and base64 decode
    # run after release, so producers are not blocked for the decode
    # duration (r10 third review pass).
    raw: list[tuple[int, bytes]] = []
    with open(path, "rb") as fh:
        fcntl.flock(fh.fileno(), fcntl.LOCK_SH)
        try:
            for offset, line in enumerate(fh):
                if offset >= end:
                    break
                if not line.endswith(b"\n"):
                    break  # torn tail from a crashed producer: not a
                    # record yet (matches the recount/append repair)
                if offset < start:
                    continue
                raw.append((offset, line))
        finally:
            fcntl.flock(fh.fileno(), fcntl.LOCK_UN)
    for offset, line in raw:
        rec = json.loads(line)
        out.append((
            None if rec["k"] is None else base64.b64decode(rec["k"]),
            None if rec["v"] is None else base64.b64decode(rec["v"]),
            topic, partition, offset, int(rec["ts"]),
        ))
    return out
