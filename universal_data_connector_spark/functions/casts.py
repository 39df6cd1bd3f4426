"""Lenient string->type casts with per-type defaults.

Re-expresses the reference Parquet sink's ``convertToAvroType`` /
``getDefaultValue`` observable behavior
(``factory/sink/ParquetSinkContext.java:382-443`` in
ThatNinjaGuy/universal-data-connector) as pure column expressions:

* INT parsing truncates decimals: ``"42.7" -> 42`` (`:402-408`).
* DOUBLE strips currency symbols / thousands separators:
  ``"$75,000.00" -> 75000.0`` (`:411-415`, ``replaceAll("[^\\d.]","")``).
* Unparseable / empty -> NULL -> per-type default (`:428-443`):
  string ``""``, int 0, long 0, float 0.0f, double 0.0, bool false.

All of this is `F.regexp_replace` + `cast` + `coalesce` — JVM-side,
codegen-friendly, no UDFs; it scales to 100 TB because it is just a
projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matches the reference's "\\D" pre-strip tolerance: keep digits, dot,
# leading minus. (The reference uses [^\d.] which also drops '-'; we keep
# '-' as a deliberate, documented improvement — negatives survive.)
_NUM_KEEP = r"[^0-9.\-]"


def _clean_numeric(col: Column) -> Column:
    return F.regexp_replace(F.trim(col), _NUM_KEEP, "")


def lenient_int(col: Column) -> Column:
    """Integer.parseInt, falling back to Double.parseDouble().intValue().

    ``"42" -> 42``, ``"42.7" -> 42`` (truncate toward zero), junk ->
    NULL. Out-of-range values SATURATE like Java's narrowing
    ``Double.intValue()`` (``"3000000000" -> 2147483647``, ``"NaN" ->
    0``) — ``try_cast('int')`` would instead null them to the per-type
    default 0, a silent divergence from the reference's Parquet sink
    (``ParquetSinkContext.java:402-408``)."""
    d = F.trim(col).try_cast("double")
    return (F.when(F.isnan(d), F.lit(0))
             .when(d > 2147483647, F.lit(2147483647))
             .when(d < -2147483648, F.lit(-2147483648))
             .otherwise(d.cast("int")))


def lenient_long(col: Column) -> Column:
    """Long.parseLong first (exact for the full 64-bit range — routing
    everything through double would lose integers above 2^53), then the
    Double.parseDouble().longValue() fallback for decimal strings,
    saturating out-of-range doubles like Java's narrowing
    ``longValue()`` (NaN -> 0). Remaining documented divergence from
    the reference: decimal strings ("42.7") are accepted via the
    fallback where Long.parseLong would reject the whole value,
    matching lenient_int's truncate behavior."""
    t = F.trim(col)
    d = t.try_cast("double")
    fallback = (F.when(F.isnan(d), F.lit(0).cast("bigint"))
                 .when(d >= F.lit(float(2 ** 63)),
                       F.lit(2 ** 63 - 1).cast("bigint"))
                 .when(d <= F.lit(-float(2 ** 63)),
                       F.lit(-(2 ** 63)).cast("bigint"))
                 .otherwise(d.try_cast("bigint")))
    return F.coalesce(t.try_cast("bigint"), fallback)


def lenient_double(col: Column) -> Column:
    return F.trim(col).try_cast("double")


def lenient_float(col: Column) -> Column:
    return F.trim(col).try_cast("float")


def lenient_currency_double(col: Column) -> Column:
    """Currency-tolerant double: parse first, strip currency noise
    only when the plain parse fails — the reference's order
    (``ParquetSinkContext.java:411-415``).

    ``"$75,000.00" -> 75000.0`` via the strip path; ``"1e5" ->
    100000.0`` via the parse path. Stripping UNCONDITIONALLY (the old
    form) corrupted scientific notation by orders of magnitude
    ("1e5" -> "15" -> 15.0) on every CSV double/float column.
    """
    parsed = F.trim(col).try_cast("double")
    return F.coalesce(parsed, _clean_numeric(col).try_cast("double"))


def lenient_bool(col: Column) -> Column:
    """Boolean.parseBoolean semantics: 'true' (any case) -> true, else false."""
    return F.lower(F.trim(col)) == "true"


_DEFAULTS = {
    "string": "",
    "int": 0,
    "bigint": 0,
    "float": 0.0,
    "double": 0.0,
    "boolean": False,
}


def with_default(col: Column, spark_type: str) -> Column:
    """NULL -> the reference's per-type default (`ParquetSinkContext.java:428-443`)."""
    if spark_type not in _DEFAULTS:
        raise KeyError(f"no reference default for type {spark_type!r}")
    return F.coalesce(col, F.lit(_DEFAULTS[spark_type]).cast(spark_type))


def base64_std(col: Column) -> Column:
    """RFC 4648 base64 WITHOUT line breaks — the reference's envelope
    encoding (`java.util.Base64.getEncoder()`, S3SinkAdapter.java:29-47
    / DirectorySourceContext.java:115). Spark's ``base64()`` follows
    Hive/MIME chunking and inserts ``\\r\\n`` every 76 output chars
    (unconditional in this Spark build — no
    ``spark.sql.legacy.chunkBase64String.enabled`` conf), which
    corrupts the envelope for any payload over 57 bytes; strip the
    chunk breaks to recover the standard encoding. ``unbase64``
    accepts both forms, so decode needs no twin."""
    return F.regexp_replace(F.base64(col), "\r\n", "")
