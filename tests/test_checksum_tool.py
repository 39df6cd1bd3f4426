"""The sf10 checksum differential's own contract
(``tools/sf10_checksum_differential.py``): the cross-engine hash idiom
must be value-identical, the checksum SQL must produce matching rows on
matching inputs (and mismatched rows on mutated inputs), and the
comparator must tolerate ONLY the raw double sum — everything else is
exact. The tool is correctness infrastructure (it adjudicates sf10
values), so its own semantics are pinned here.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "cksum", os.path.join(REPO, "tools", "sf10_checksum_differential.py"))
cksum = importlib.util.module_from_spec(spec)
sys.modules["cksum"] = cksum
spec.loader.exec_module(cksum)


def test_hash_idiom_identical_across_engines(spark):
    """`conv(substr(md5(c),1,15),16,10)` on Spark must equal
    `('0x'||substr(md5(c),1,15))::BIGINT` on DuckDB for arbitrary
    strings — the string-column checksum is built on this identity."""
    vals = ["", "a", "abc", "hello world", "NACIÓN", "0", " ",
            "line\nbreak", "x" * 500]
    sp = spark.createDataFrame([(v,) for v in vals], "s string")
    sp.createOrReplaceTempView("hash_t")
    h_sp = cksum._hash_expr("s", spark=True)
    got_sp = [r[0] for r in spark.sql(
        f"SELECT {h_sp} FROM hash_t ORDER BY s").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE hash_t(s VARCHAR)")
    con.executemany("INSERT INTO hash_t VALUES (?)", [(v,) for v in vals])
    h_du = cksum._hash_expr("s", spark=False)
    got_du = [r[0] for r in con.sql(
        f'SELECT {h_du} FROM hash_t ORDER BY s').fetchall()]
    assert got_sp == got_du


def test_checksum_sql_matches_on_equal_inputs_and_catches_mutation(spark):
    rows = [(1, "alpha", 1.5), (2, "beta", 2.25), (3, None, None)]
    fields = [("k", "bigint"), ("s", "string"), ("d", "double")]
    sp = spark.createDataFrame(rows, "k bigint, s string, d double")
    sp.createOrReplaceTempView("ck_t")
    sp_row = spark.sql(cksum.checksum_sql(
        fields, "SELECT * FROM ck_t", spark=True)).collect()[0].asDict()

    con = duckdb.connect()
    con.execute("CREATE TABLE ck_t(k BIGINT, s VARCHAR, d DOUBLE)")
    con.executemany("INSERT INTO ck_t VALUES (?,?,?)", rows)
    rel = con.sql(cksum.checksum_sql(
        fields, "SELECT * FROM ck_t", spark=False))
    du_row = dict(zip(rel.columns, rel.fetchone()))
    ok, detail = cksum.compare_checksums(sp_row, du_row)
    assert ok, detail

    # a single mutated string value must flip both sh and xh
    con.execute("UPDATE ck_t SET s = 'ALPHA' WHERE k = 1")
    rel = con.sql(cksum.checksum_sql(
        fields, "SELECT * FROM ck_t", spark=False))
    du_mut = dict(zip(rel.columns, rel.fetchone()))
    ok, detail = cksum.compare_checksums(sp_row, du_mut)
    assert not ok
    assert "__sh" in detail and "__xh" in detail

    # a one-ulp-style integer drift must be caught exactly
    con.execute("UPDATE ck_t SET s = 'alpha', k = 4 WHERE k = 1")
    rel = con.sql(cksum.checksum_sql(
        fields, "SELECT * FROM ck_t", spark=False))
    du_int = dict(zip(rel.columns, rel.fetchone()))
    ok, detail = cksum.compare_checksums(sp_row, du_int)
    assert not ok and "k__" in detail


@pytest.mark.parametrize("rel_err,expect", [(1e-12, True), (1e-6, False)])
def test_fsum_tolerance_is_scoped_to_double_sums(rel_err, expect):
    base = {"n": 3, "d__cnt": 3, "d__min": 1.0, "d__max": 2.0,
            "d__fsum": 4.5}
    other = dict(base, d__fsum=4.5 * (1 + rel_err))
    ok, _ = cksum.compare_checksums(base, other)
    assert ok is expect
    # the same relative drift on an EXACT field (min) always fails
    drifted = dict(base, d__min=1.0 + 1e-12)
    ok, detail = cksum.compare_checksums(base, drifted)
    assert not ok and "d__min" in detail
