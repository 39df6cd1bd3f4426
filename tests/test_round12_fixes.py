"""Round-12 additions.

1. `events_window_funnel_conversion` semantics pinned on CRAFTED
   events (the sf0.001/sf0.01 oracle gates cover it statistically;
   this pins each rule on a case built to exercise it): strict-after
   step ordering, the inclusive 6-hour window cap anchored at the
   VIEW (not the click), purchase-after-click within the view's
   window, best-depth-over-anchors, and the no-view exclusion. The
   Spark result is additionally cross-checked against the DuckDB
   oracle SQL on the same crafted table, so the engine and oracle are
   proven to encode the same rules on adversarial inputs, not just on
   driver testdata.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from tests.oracle_harness import compare
from universal_data_connector_spark.plans.catalog import ORACLES, QUERIES

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)
H = dt.timedelta(hours=1)
US = dt.timedelta(microseconds=1)


def _events(spark):
    rows = []
    eid = [0]

    def ev(user, typ, ts):
        eid[0] += 1
        rows.append((eid[0], ts, user, typ, 1.0, "{}"))

    # u1: clean conversion inside the window -> depth 3
    ev(1, "view", T0)
    ev(1, "click", T0 + 1 * H)
    ev(1, "purchase", T0 + 2 * H)
    # u2: first anchor's click misses the window; a second anchor
    # catches it (best-over-anchors) but no purchase -> depth 2
    ev(2, "view", T0)
    ev(2, "view", T0 + 6 * H)
    ev(2, "click", T0 + 7 * H)
    # u3: purchases but never a click -> purchase cannot count -> 1
    ev(3, "purchase", T0 - 1 * H)
    ev(3, "view", T0)
    ev(3, "purchase", T0 + 1 * H)
    # u4: purchase inside the window but BEFORE the first click ->
    # ordering rule rejects it -> depth 2
    ev(4, "view", T0)
    ev(4, "purchase", T0 + 30 * dt.timedelta(minutes=1))
    ev(4, "click", T0 + 1 * H)
    # u5: click at the exact view instant is NOT strictly after (the
    # later click is); purchase at EXACTLY view+6h is inside the
    # inclusive cap -> depth 3
    ev(5, "view", T0)
    ev(5, "click", T0)
    ev(5, "click", T0 + 1 * H)
    ev(5, "purchase", T0 + 6 * H)
    # u5b boundary sibling: purchase one microsecond past the cap ->
    # depth 2
    ev(6, "view", T0)
    ev(6, "click", T0 + 1 * H)
    ev(6, "purchase", T0 + 6 * H + US)
    # u7: no view at all -> excluded from the output entirely
    ev(7, "click", T0)
    ev(7, "purchase", T0 + 1 * H)
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string")


def test_window_funnel_semantics_on_crafted_events(spark, tmp_path):
    df = _events(spark)
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    out = QUERIES["events_window_funnel_conversion"](spark, sf_dir)
    got = {r.funnel_depth: r.n_users for r in out.collect()}
    # u3 -> 1; u2, u4, u6 -> 2; u1, u5 -> 3; u7 absent
    assert got == {1: 1, 2: 3, 3: 2}

    # the oracle must encode the same rules on the same crafted rows
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet/*.parquet')")
    ok, detail = compare(out, con.sql(ORACLES["events_window_funnel_conversion"]))
    assert ok, detail


def test_window_funnel_empty_and_degenerate(spark, tmp_path):
    """Zero qualifying users must yield an empty frame (not an error),
    and a single lonely view yields depth 1."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, T0, 9, "view", 1.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).write.parquet(f"{sf_dir}/events.parquet")
    out = QUERIES["events_window_funnel_conversion"](spark, sf_dir)
    assert [(r.funnel_depth, r.n_users) for r in out.collect()] == [(1, 1)]
