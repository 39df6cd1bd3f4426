"""Vector math over `array<float>` embedding columns.

Pure higher-order-function expressions (`zip_with` + `aggregate`)
evaluated JVM-side: elementwise work is sequential within a row, so the
result is deterministic (same IEEE op order everywhere) and there is no
Python/Arrow transfer. For very wide vectors a Pandas-UDF/numpy path can
win on constant factors; see operators/similarity.py which offers both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-order dot product in double precision."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def l2_normalize(a: Column) -> Column:
    """Unit-normalize (NULL for zero-norm input). Normalizing each
    side ONCE turns pairwise cosine into a single dot product — for a
    candidate join over P pairs this evaluates O(N) norms instead of
    O(P) norm pairs.

    The norm is λ-bound so it evaluates once per ROW: referencing the
    norm expression directly inside the transform lambda embeds the
    whole O(d) aggregate subtree per ELEMENT, and higher-order
    functions run interpreted without subexpression elimination —
    O(d^2) per row for wide embeddings."""
    def build(n: Column) -> Column:
        return F.when(n > 0, F.transform(_as_double(a), lambda x: x / n))

    return F.element_at(F.transform(F.array(l2_norm(a)), build), 1)
