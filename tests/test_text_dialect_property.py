"""Property-based differential pinning of the shared text dialect
(functions/text.py vs the DuckDB expressions every oracle builds on).

The round-12/14 fuzz campaigns sweep the CATALOG with fixed-seed random
tables; this file attacks the four dialect PRIMITIVES underneath them
(tokenize, normalize/fingerprint, distinct word n-grams, BPE-ish regex
token count) with hypothesis-generated strings — arbitrary shapes the
seeded generators never compose (whitespace runs, mark-only strings,
mixed CJK/Latin-1, punctuation soup, empty and NULL documents). Spark
and DuckDB must agree exactly; any divergence here would eventually
surface as a driver hash mismatch on some real corpus.

Scope: the documented shared-dialect whitespace set (space, tab,
newline — SURVEY §5.2 / round-12 scope decision: vertical tab etc. are
classified differently by Java \\s and RE2 \\s by design), and
letters from ASCII, Latin-1, and CJK (full Unicode special-casing like
Turkish dotted-I is out of the shared contract).
"""

from __future__ import annotations

import string

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from universal_data_connector_spark.functions import text as ft

_ALPHABET = (
    " \t\n"                          # the shared whitespace set
    + string.ascii_letters + string.digits + string.punctuation
    + "àéüñçößøÆŒ漢字東京"
)

texts = st.lists(
    st.one_of(st.none(), st.text(alphabet=_ALPHABET, max_size=120)),
    min_size=1, max_size=30)

_SEP = "\x1f"

_DUCK_SQL = """
WITH rows AS (
    SELECT unnest($1::INT[]) AS i, unnest($2::VARCHAR[]) AS t
), tok AS (
    SELECT i, t,
           list_filter(string_split_regex(trim(lower(t)), '\\s+'),
                       x -> x <> '') AS w
    FROM rows
)
SELECT i,
       -- coalesce mirrors Spark's concat_ws-on-empty-array '' (DuckDB
       -- array_to_string of [] is NULL — same representational edge
       -- the reshape_chunk_tokens oracle pins); the LISTS agree
       CASE WHEN t IS NULL THEN NULL
            ELSE COALESCE(array_to_string(w, chr(31)), '') END AS toks,
       sha256(trim(regexp_replace(lower(t), '\\s+', ' ', 'g'))) AS fp,
       CASE WHEN t IS NULL THEN NULL
            ELSE COALESCE(array_to_string(list_sort(list_distinct(
           CASE WHEN len(w) >= 3
                THEN [array_to_string(w[j:j+2], ' ')
                      for j in range(1, greatest(len(w) - 1, 1))]
                ELSE [] END)), chr(31)), '') END AS grams3,
       CAST(len(regexp_extract_all(lower(t),
                '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
           '{EMAIL}', '[EMAIL]', 'g'),
           '{SSN}', '[SSN]', 'g'),
           '{PHONE}', '[PHONE]', 'g'),
           '{IPV4}', '[IPV4]', 'g') AS redacted
FROM tok
""".format(**ft.PII_PATTERNS)


@pytest.mark.parametrize("lane", ["dialect"])
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ts=texts)
def test_text_dialect_differential(spark, lane, ts):
    df = spark.createDataFrame(list(enumerate(ts)), "i int, t string")
    toks = ft.tokenize(F.col("t"))
    got = {
        r.i: (r.toks, r.fp, r.grams3, r.n_bpe, r.redacted)
        for r in df.select(
            "i",
            F.concat_ws(_SEP, toks).alias("toks"),
            ft.text_fingerprint(F.col("t")).alias("fp"),
            F.concat_ws(_SEP, F.array_sort(ft.word_ngrams(toks, 3)))
             .alias("grams3"),
            ft.regex_token_count(F.col("t")).alias("n_bpe"),
            ft.redact_pii(F.col("t")).alias("redacted"),
        ).collect()
    }
    want = {}
    con = duckdb.connect()
    for i, tk, fp, g3, nb, red in con.execute(
            _DUCK_SQL, [list(range(len(ts))), ts]).fetchall():
        want[i] = (tk, fp, g3, nb, red)
    # NULL text: every derived column is NULL on both engines; Spark's
    # concat_ws over a NULL array yields '' though, so normalize the
    # comparison through the same rule
    for i, t in enumerate(ts):
        if t is None:
            assert got[i][1] is None and got[i][3] is None, (i, got[i])
            assert want[i][1] is None and want[i][3] is None, (i, want[i])
            continue
        assert got[i] == want[i], (
            f"text {t!r}: spark={got[i]} duck={want[i]}")
