"""Golden-semantics tests for the quirky reference behaviors
(SURVEY.md §5.2.2): lenient casts, per-type defaults, text functions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from universal_data_connector_spark.functions import casts as fc
from universal_data_connector_spark.functions import text as ft


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


@pytest.mark.parametrize("raw,expect", [
    ("42", 42), ("42.7", 42), (" 17 ", 17), ("-3.9", -3),
    ("junk", None), ("", None),
])
def test_lenient_int(spark, raw, expect):
    """Reference INT cast truncates decimals (ParquetSinkContext.java:
    402-408): '42.7' -> 42; junk -> NULL."""
    assert _one(spark, fc.lenient_int(F.lit(raw))) == expect


@pytest.mark.parametrize("raw,expect", [
    ("$75,000.00", 75000.0), ("1 234,56", 123456.0), ("99.5", 99.5),
    ("USD 12.50", 12.50), ("-$8.25", -8.25), ("garbage", None),
])
def test_lenient_currency_double(spark, raw, expect):
    """Currency-tolerant DOUBLE (ParquetSinkContext.java:411-415) —
    with the documented improvement that '-' survives the strip."""
    assert _one(spark, fc.lenient_currency_double(F.lit(raw))) == expect


@pytest.mark.parametrize("raw,expect", [
    ("true", True), ("TRUE", True), (" True ", True),
    ("false", False), ("yes", False), ("", False),
])
def test_lenient_bool(spark, raw, expect):
    """Boolean.parseBoolean semantics: only 'true' (any case) is true."""
    assert _one(spark, fc.lenient_bool(F.lit(raw))) == expect


def test_defaults_on_null(spark):
    """NULL -> per-type default (ParquetSinkContext.java:428-443)."""
    null_s = F.lit(None).cast("string")
    assert _one(spark, fc.with_default(null_s, "string")) == ""
    assert _one(spark, fc.with_default(F.lit(None).cast("int"), "int")) == 0
    assert _one(spark, fc.with_default(F.lit(None).cast("double"), "double")) == 0.0
    assert _one(spark, fc.with_default(F.lit(None).cast("boolean"), "boolean")) is False
    with pytest.raises(KeyError):
        fc.with_default(null_s, "decimal(10,2)")


def test_tokenize_and_ngrams(spark):
    toks = _one(spark, ft.tokenize(F.lit("  The quick   brown FOX  ")))
    assert toks == ["the", "quick", "brown", "fox"]
    grams = _one(spark, ft.word_ngrams(ft.tokenize(F.lit("a b c d")), 2))
    assert grams == ["a b", "b c", "c d"]
    assert _one(spark, ft.word_ngrams(ft.tokenize(F.lit("a b")), 5)) == []


def test_fingerprint_normalization(spark):
    a = _one(spark, ft.text_fingerprint(F.lit("Hello   World")))
    b = _one(spark, ft.text_fingerprint(F.lit("  hello world ")))
    c = _one(spark, ft.text_fingerprint(F.lit("hello worlds")))
    assert a == b != c


def test_language_id(spark):
    assert _one(spark, ft.language_id(
        F.lit("the cat is on the roof and the dog is in the garden"))) == "en"
    assert _one(spark, ft.language_id(
        F.lit("der hund ist auf dem dach und die katze ist im garten"))) == "de"
    assert _one(spark, ft.language_id(
        F.lit("le chat est dans le jardin et la maison est sur la colline"))) == "fr"
    assert _one(spark, ft.language_id(F.lit("zzz qqq xxx"))) == "unknown"


def test_quality_score_bounds_and_ordering(spark):
    prose = ("the quick brown fox jumps over the lazy dog and runs into the "
             "forest where the birds sing ") * 5
    soup = "!!! ??? ... ;;; ::: ,,," * 20
    q_prose = _one(spark, ft.quality_score(F.lit(prose)))
    q_soup = _one(spark, ft.quality_score(F.lit(soup)))
    assert 0.0 <= q_soup < q_prose <= 1.0


def test_regex_token_count(spark):
    # "hello" "," "world" "!" "42" -> 5 pre-tokens
    assert _one(spark, ft.regex_token_count(F.lit("Hello, world! 42"))) == 5


def test_salted_join_equals_plain_join(spark):
    """Salting must not change join semantics: every (key, salt) bucket
    on the skewed side meets exactly one replica of the other side."""
    from universal_data_connector_spark.operators.relational import salted_join

    skewed = spark.createDataFrame(
        [(1, f"row{i}") for i in range(500)] + [(2, "only"), (3, "none")],
        "k bigint, payload string")
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "k bigint, label string")

    plain = {tuple(r) for r in skewed.join(dim, ["k"], "inner").collect()}
    salted = {tuple(r) for r in salted_join(skewed, dim, ["k"], "inner", salt=8).collect()}
    assert salted == plain and len(plain) == 501

    left_plain = {tuple(r) for r in skewed.join(dim, ["k"], "left").collect()}
    left_salted = {tuple(r) for r in salted_join(skewed, dim, ["k"], "left", salt=8).collect()}
    assert left_salted == left_plain and len(left_plain) == 502


def test_redact_pii_order_and_counts(spark):
    """EMAIL redacts before PHONE (emails can embed digit runs); SSN
    and PHONE patterns don't cross-match; counts are per-kind."""
    from universal_data_connector_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("mail a.b-c%d@ex-ample.co.uk or call 415-555-2671 ssn 078-05-1120 ip 10.0.0.1",)],
        "t string")
    out = df.select(
        redact_pii(F.col("t")).alias("r"),
        *[c.alias(f"n_{k.lower()}") for k, c in pii_counts(F.col("t")).items()],
    ).collect()[0]
    assert out.r == "mail [EMAIL] or call [PHONE] ssn [SSN] ip [IPV4]"
    assert (out.n_email, out.n_ssn, out.n_phone, out.n_ipv4) == (1, 1, 1, 1)


def test_csv_fields_fuzz_against_python_csv(spark):
    """RFC-4180 tokenizer fuzz: 300 seeded random rows (quotes, commas,
    empties, unicode) written by Python's csv module must tokenize back
    to the original fields — the reference's naive split(\",\") breaks
    on most of these (SURVEY.md §7.4.2, the documented divergence)."""
    import csv
    import io
    import random

    from pyspark.sql import functions as F

    from universal_data_connector_spark.sources.records import csv_fields

    rng = random.Random(42)
    alphabet = ['a', 'b', ',', '"', "'", ' ', 'é', '0', ';', '|']
    rows = []
    for _ in range(300):
        fields = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))
                  for _ in range(rng.randint(1, 5))]
        buf = io.StringIO()
        csv.writer(buf, lineterminator="").writerow(fields)
        rows.append((buf.getvalue(), fields))

    df = spark.createDataFrame([(line,) for line, _ in rows], "line string")
    got = [r.f for r in df.select(csv_fields(F.col("line")).alias("f")).collect()]
    for (line, expected), actual in zip(rows, got):
        assert actual == expected, f"line {line!r}: {actual} != {expected}"


def test_kafka_source_dispatch_gated(spark):
    """No broker or kafka connector jar in this container: the source
    must build its declarative contract and surface Spark's own
    data-source error, not crash earlier in our dispatch."""
    import pytest

    from universal_data_connector_spark.sources.kafka import kafka_source
    with pytest.raises(Exception) as exc:
        kafka_source(spark, {"bootstrapServers": "localhost:9092",
                             "topic": "t", "groupId": "g"})
    msg = str(exc.value)
    assert "kafka" in msg.lower()


def test_rolling_hash_matches_python_reference(spark):
    """The catalog's Rabin-Karp fold must equal a straight Python
    implementation over the same normalization (lower, collapse
    whitespace, strip non-printable-ASCII), including unicode and
    empty-string edge cases."""
    import re as _re

    from pyspark.sql import functions as F

    from universal_data_connector_spark.functions.text import normalize_text

    def py_hash(text):
        t = _re.sub(r"\s+", " ", text.lower()).strip()
        t = _re.sub(r"[^\x20-\x7e]", "", t)
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % 1000000007
        return h  # 0 for empty, same as the query's guard

    cases = ["hello world", "  Spaced\tOUT  ", "", "é∂ƒ unicode müx",
             "a", "comma, \"quoted\"", "ASCII and é mixed 123"]
    t = F.regexp_replace(normalize_text(F.col("s")), r"[^\x20-\x7e]", "")
    chars = F.filter(F.split(t, ""), lambda c: c != "")
    fold = F.aggregate(chars, F.lit(0).cast("bigint"),
                       lambda a, c: (a * 31 + F.ascii(c).cast("bigint")) % 1000000007)
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r.h for r in df.select(
        F.when(F.length(t) == 0, F.lit(0).cast("bigint")).otherwise(fold).alias("h")
    ).collect()]
    assert got == [py_hash(c) for c in cases]
