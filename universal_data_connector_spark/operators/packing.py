"""Sequence packing for LLM-training-data pipelines.

Pretraining pipelines concatenate documents and split the token stream
at a fixed budget (GPT-style "concat-and-split" packing): every
document gets a (pack_id, pack_offset) assignment, packs are exactly
`budget` tokens except each shard's last. The truly-greedy variant
(doc that doesn't fit starts a new pack) is inherently sequential;
concat-and-split is the formulation production packers use *because*
it is a pure prefix-sum — and a prefix sum within deterministic shards
is one window over one shuffle, no global sort, no driver loop.

Scale: the window partitions by shard, so parallelism = n_shards and
no single partition ever holds the corpus. Real 100 TB runs shard by
the same key they shard storage with (here: a modulus of the doc id,
swappable for any deterministic expression); assignment is
reproducible across runs, engines, and partitionings — the property
resumable training-data sharding needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from universal_data_connector_spark.functions.text import tokenize


def pack_sequences(df: DataFrame, budget: int, id_col: str = "doc_id",
                   token_count: Column | None = None,
                   shard: Column | None = None,
                   n_shards: int = 16) -> DataFrame:
    """Assign each document a (shard, pack_id, pack_offset) under a
    fixed token budget per pack.

    * ``token_count`` defaults to whitespace-token count of ``text``;
      pass a real tokenizer's count column when available.
    * ``shard`` defaults to ``id % n_shards`` (deterministic,
      engine-portable); pass any stable expression (language, source)
      to pack within those groups instead.

    Output: (id, shard, n_tokens, pack_id, pack_offset), where
    pack_offset is the document's first-token position within its pack
    — documents may straddle pack boundaries, the concat-and-split
    contract."""
    tc = (token_count if token_count is not None
          else F.size(tokenize(F.col("text"))))
    sh = shard if shard is not None else F.pmod(F.col(id_col), F.lit(n_shards))
    d = df.select(F.col(id_col),
                  sh.cast("bigint").alias("shard"),
                  tc.cast("bigint").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        id_col, "shard", "n_tokens",
        F.floor(cum / budget).cast("bigint").alias("pack_id"),
        F.pmod(cum, F.lit(budget)).cast("bigint").alias("pack_offset"))
