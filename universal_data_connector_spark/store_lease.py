"""Store-carried maintenance exclusion for the persistent stores.

The manager's ``maintenance_window`` can only exclude pipelines IT
knows about: a second config (or a second process) writing the same
store path is invisible to one manager's config-name view, and POSIX
compaction's rename swap racing a concurrent append silently deletes
freshly appended seen keys (``dedup_state._compact_root``). This
module moves the exclusion INTO the store, so it holds across
configs, managers and processes:

* maintenance (compaction / vacuum) acquires an EXCLUSIVE lease —
  one ``O_CREAT|O_EXCL`` lock file on POSIX, one ``If-None-Match:*``
  conditional PUT on the object store (``S3StateTarget._put_cas``);
* every writer commit registers a WRITER MARK (a nonce file/object
  under ``_udc_writers/``) for the commit's duration.

The claim order makes the exclusion airtight without any blocking:
a writer creates its mark and THEN checks the lease; maintenance
creates the lease and THEN checks for marks. If both proceeded, the
writer saw no lease after its mark existed and maintenance saw no
marks after its lease existed — but one of the two artifacts was
created first and stays visible until its holder finishes, a
contradiction. (S3 lists and reads are strongly consistent, so the
same argument carries.) The loser raises ``StoreLeaseHeld`` — fail
loudly instead of losing data; the caller retries after the holder
finishes.

Staleness (a crashed holder must not wedge the store forever) — a
lease or mark is breakable when ANY of:

* its recorded owner string equals the checker's own owner
  (``lease_owner``): a restarted incarnation of the SAME logical
  writer — e.g. a streaming query resuming its checkpoint — may
  supersede its dead predecessor, because two live incarnations of
  one checkpoint cannot coexist;
* it was taken on THIS host by a pid that no longer runs;
* its TTL elapsed (object-store default 1 h; POSIX leases rely on
  pid-liveness and carry no TTL by default).

Non-goals: writer-vs-writer exclusion (the stores keep their
single-writer contract; marks are visible to maintenance only) and
reader fencing (a reader racing compaction can fail on a swapped
file and retry — loud and lossless).
"""

from __future__ import annotations

import contextlib
import contextvars
import json
import logging
import os
import socket
import time
import uuid

log = logging.getLogger(__name__)

LEASE_NAME = "_udc_lease"
WRITERS_DIR = "_udc_writers"
DEFAULT_S3_TTL = 3600.0

_OWNER: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "udc_lease_owner", default=None)


class StoreLeaseHeld(RuntimeError):
    """Mutual exclusion refused: the store's lease (or a writer mark)
    is held by a live holder. Retry after it finishes."""

    def __init__(self, message: str, holder: dict | None = None):
        super().__init__(message)
        self.holder = holder or {}


@contextlib.contextmanager
def lease_owner(owner: str | None):
    """Scope a logical-owner identity (e.g. ``stream:<checkpoint>``)
    over the marks/leases taken inside: a restarted incarnation of the
    same owner may break its dead predecessor's artifacts."""
    token = _OWNER.set(owner)
    try:
        yield
    finally:
        _OWNER.reset(token)


def current_owner() -> str | None:
    return _OWNER.get()


def _payload(op: str, owner: str | None, ttl: float | None) -> dict:
    return {"owner": owner, "op": op, "pid": os.getpid(),
            "host": socket.gethostname(),
            "acquired_unix": time.time(), "ttl_seconds": ttl}


def _is_stale(payload: dict | None, checker_owner: str | None) -> bool:
    """Breakable per the module docstring's three rules. An unreadable
    payload (crash mid-write) is NOT breakable here — the POSIX paths
    fall back to file mtime + the default TTL for that case."""
    if payload is None:
        return False
    owner = payload.get("owner")
    if owner is not None and owner == checker_owner:
        return True
    if (payload.get("host") == socket.gethostname()
            and isinstance(payload.get("pid"), int)):
        try:
            os.kill(payload["pid"], 0)
        except ProcessLookupError:
            return True
        except PermissionError:
            pass  # alive, owned by another user
    ttl = payload.get("ttl_seconds")
    acquired = payload.get("acquired_unix")
    if (isinstance(ttl, (int, float)) and isinstance(acquired, (int, float))
            and time.time() > acquired + ttl):
        return True
    return False


# ---------------------------------------------------------------------------
# POSIX backend
# ---------------------------------------------------------------------------

def _posix_read(path: str) -> dict | None:
    """Payload of a lease/mark file, or None when unreadable. A file
    that cannot be parsed (crash between O_EXCL create and the payload
    write) counts as stale once its mtime is older than the default
    TTL — otherwise an empty 0-byte lease would wedge the store with
    no recorded pid to liveness-check."""
    try:
        with open(path) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise
    except Exception:  # noqa: BLE001 - torn/empty payload
        return None


def _posix_stale(path: str, checker_owner: str | None) -> bool:
    try:
        payload = _posix_read(path)
    except FileNotFoundError:
        return True  # already gone
    if payload is None:
        try:
            return time.time() > os.path.getmtime(path) + DEFAULT_S3_TTL
        except FileNotFoundError:
            return True
    return _is_stale(payload, checker_owner)


def _posix_claim(path: str, payload: dict, checker_owner: str | None,
                 kind: str) -> None:
    """Create ``path`` with O_CREAT|O_EXCL (the claim IS the create),
    breaking one stale predecessor."""
    for attempt in (0, 1):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            if attempt == 0 and _posix_stale(path, checker_owner):
                log.warning("store_lease: breaking stale %s %s", kind, path)
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(path)
                continue
            try:
                holder = _posix_read(path)
            except FileNotFoundError:
                holder = None
            raise StoreLeaseHeld(
                f"store {kind} {path!r} is held by a live holder "
                f"({holder}); retry after it finishes", holder) from None
        with os.fdopen(fd, "w") as fh:
            json.dump(payload, fh)
        return


def _posix_live_writers(store_dir: str,
                        checker_owner: str | None) -> list[str]:
    """Live writer-mark paths under the store, removing stale ones."""
    wdir = os.path.join(store_dir, WRITERS_DIR)
    if not os.path.isdir(wdir):
        return []
    live = []
    for name in os.listdir(wdir):
        mark = os.path.join(wdir, name)
        if _posix_stale(mark, checker_owner):
            with contextlib.suppress(FileNotFoundError):
                os.unlink(mark)
        else:
            live.append(mark)
    return live


@contextlib.contextmanager
def posix_maintenance_lease(store_dir: str, op: str = "maintenance",
                            owner: str | None = None):
    """Exclusive maintenance lease on a POSIX store: claim the lock
    file, then refuse if any writer commit is in flight."""
    owner = owner if owner is not None else current_owner()
    path = os.path.join(store_dir, LEASE_NAME)
    os.makedirs(store_dir, exist_ok=True)
    _posix_claim(path, _payload(op, owner, None), owner, "lease")
    try:
        live = _posix_live_writers(store_dir, owner)
        if live:
            raise StoreLeaseHeld(
                f"store {store_dir!r} has {len(live)} writer commit(s) "
                f"in flight ({live[:3]}); maintenance is exclusive — "
                "retry after they finish")
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(path)


@contextlib.contextmanager
def posix_writer_mark(store_dir: str, owner: str | None = None):
    """Writer-commit mark on a POSIX store: register the mark, then
    refuse if a maintenance lease is live (mark removed on refusal,
    so a refused commit leaves nothing behind)."""
    owner = owner if owner is not None else current_owner()
    wdir = os.path.join(store_dir, WRITERS_DIR)
    os.makedirs(wdir, exist_ok=True)
    mark = os.path.join(wdir, uuid.uuid4().hex)
    _posix_claim(mark, _payload("commit", owner, None), owner, "mark")
    try:
        lease = os.path.join(store_dir, LEASE_NAME)
        if os.path.exists(lease):
            if _posix_stale(lease, owner):
                log.warning("store_lease: breaking stale lease %s", lease)
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(lease)
            else:
                holder = None
                with contextlib.suppress(FileNotFoundError):
                    holder = _posix_read(lease)
                raise StoreLeaseHeld(
                    f"store {store_dir!r} is under maintenance "
                    f"({holder}); the commit was refused BEFORE any "
                    "append — rerun after maintenance completes", holder)
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(mark)


# ---------------------------------------------------------------------------
# object-store backend (duck-typed over S3StateTarget)
# ---------------------------------------------------------------------------

def _s3_lease_key(target) -> str:
    return target._key(LEASE_NAME)


def _s3_delete_control(target, key: str) -> None:
    """Delete a lease/mark control object DIRECTLY, not through
    ``target.delete_keys``: the release must not share a failure mode
    with the data-plane deletes (a compaction whose data deletes are
    failing must still release its lease, or every later maintenance
    run wedges on it until the TTL)."""
    target.client.delete_object(Bucket=target.bucket, Key=key)


def _s3_stale(payload: dict | None, checker_owner: str | None) -> bool:
    # an unreadable object cannot happen (PUTs are atomic); a payload
    # without TTL fields still breaks on owner match or same-host pid
    return _is_stale(payload, checker_owner)


def _s3_claim_lease(target, payload: dict,
                    checker_owner: str | None) -> None:
    from universal_data_connector_spark.streaming.object_state import (
        CasConflict,
    )

    key = _s3_lease_key(target)
    for attempt in (0, 1):
        try:
            target._put_cas(key, payload, None)
            return
        except CasConflict:
            holder, _ = target._get_json(key)
            if attempt == 0 and _s3_stale(holder, checker_owner):
                log.warning("store_lease: breaking stale lease %s", key)
                _s3_delete_control(target, key)
                continue
            raise StoreLeaseHeld(
                f"store s3://{target.bucket}/{target.prefix} lease is "
                f"held by a live holder ({holder}); retry after it "
                "finishes", holder) from None


def _s3_live_writers(target, checker_owner: str | None) -> list[str]:
    live = []
    for k in target.list_keys(under=WRITERS_DIR):
        payload, _ = target._get_json(k)
        if _s3_stale(payload, checker_owner):
            _s3_delete_control(target, k)
        else:
            live.append(k)
    return live


@contextlib.contextmanager
def s3_maintenance_lease(target, op: str = "maintenance",
                         owner: str | None = None,
                         ttl: float = DEFAULT_S3_TTL):
    """Exclusive maintenance lease on an object-store target (CAS
    create via ``If-None-Match:*``), refused while writer commits are
    in flight. Carries a TTL (default 1 h): no cross-host pid
    liveness exists on an object store, so a crashed holder's lease
    must expire on its own."""
    owner = owner if owner is not None else current_owner()
    _s3_claim_lease(target, _payload(op, owner, ttl), owner)
    try:
        live = _s3_live_writers(target, owner)
        if live:
            raise StoreLeaseHeld(
                f"store s3://{target.bucket}/{target.prefix} has "
                f"{len(live)} writer commit(s) in flight ({live[:3]}); "
                "maintenance is exclusive — retry after they finish")
        yield
    finally:
        with contextlib.suppress(Exception):
            _s3_delete_control(target, _s3_lease_key(target))


@contextlib.contextmanager
def s3_writer_mark(target, owner: str | None = None,
                   ttl: float = DEFAULT_S3_TTL):
    """Writer-commit mark on an object-store target: one nonce object
    under ``_udc_writers/`` for the commit's duration (excluded from
    vacuum and never read as data — bucket objects must match
    ``seen-*.parquet``)."""
    owner = owner if owner is not None else current_owner()
    key = target._key(WRITERS_DIR, uuid.uuid4().hex)
    target.client.put_object(
        Bucket=target.bucket, Key=key,
        Body=json.dumps(_payload("commit", owner, ttl)).encode())
    try:
        holder, _ = target._get_json(_s3_lease_key(target))
        if holder is not None:
            if _s3_stale(holder, owner):
                log.warning("store_lease: breaking stale lease under "
                            "s3://%s/%s", target.bucket, target.prefix)
                _s3_delete_control(target, _s3_lease_key(target))
            else:
                raise StoreLeaseHeld(
                    f"store s3://{target.bucket}/{target.prefix} is "
                    f"under maintenance ({holder}); the commit was "
                    "refused BEFORE any append — rerun after "
                    "maintenance completes", holder)
        yield
    finally:
        with contextlib.suppress(Exception):
            _s3_delete_control(target, key)
