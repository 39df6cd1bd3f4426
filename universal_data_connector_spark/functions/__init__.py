"""Scalar / expression-level function library.

Everything here is a *column expression builder* — pure
``pyspark.sql.functions`` compositions that stay inside whole-stage
codegen (no Python UDFs on the hot path). These re-express the
reference's embedded scalar utilities (SURVEY.md §2A utility table) plus
the text/vector functions the LLM-data operators need.
"""

from universal_data_connector_spark.functions.casts import (  # noqa: F401
    lenient_bool,
    lenient_currency_double,
    lenient_double,
    lenient_float,
    lenient_int,
    lenient_long,
    with_default,
)
from universal_data_connector_spark.functions.text import (  # noqa: F401
    char_ngrams,
    language_id,
    quality_score,
    regex_token_count,
    text_fingerprint,
    tokenize,
    word_ngrams,
)
from universal_data_connector_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
