"""Multimodal (image / audio / video) column plumbing.

Design: media are opaque `binary` columns plus typed metadata — the
schema, partitioning, and Pandas-UDF batch shapes are real and tested;
only the codec step is stubbed (no image/audio libraries in this
container). `decode_image_batch` raises `NotImplementedError` unless
`fake=True`, in which case it produces a deterministic fake feature
vector so the end-to-end plumbing (mapInPandas over binary columns,
Arrow batch transfer, output schema) is exercised by tests.

Scale notes: binary payloads ride inside the row (Spark's binaryFile
source caps single files via `spark.sql.sources.binaryFile.maxLength`);
at 100 TB you partition by a content-hash prefix so downstream
grouped work (per-asset dedup, per-shard encoding) is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic-byte sniffing — same spirit as the reference's extension-based
# type detection (DirectorySourceContext.java:64-74), but content-based.
_MAGIC = [
    ("89504e47", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),  # RIFF
    ("494433", "audio/mp3"),    # ID3
    ("1a45dfa3", "video/webm"),
]

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("byte_length", T.LongType(), True),
    T.StructField("content_sha256", T.StringType(), True),
])


def binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach typed metadata columns to a binary column: byte length,
    sha256, and magic-byte media type. Pure projection."""
    hexhead = F.lower(F.hex(F.substring(F.col(content_col), 1, 8)))
    mt = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        mt = F.when(hexhead.startswith(magic.upper()) | hexhead.startswith(magic), F.lit(mime)).otherwise(mt)
    return (df
            .withColumn("byte_length", F.length(F.col(content_col)).cast("bigint"))
            .withColumn("content_sha256", F.sha2(F.col(content_col), 256))
            .withColumn("media_type", mt))


def partition_by_content_hash(df: DataFrame, n_shards: int = 1024,
                              content_col: str = "content") -> DataFrame:
    """Repartition assets by a content-hash shard — uniform by
    construction, so no shard skew at any scale."""
    shard = F.pmod(F.xxhash64(F.col(content_col)), F.lit(n_shards))
    return df.withColumn("shard", shard).repartition(n_shards, "shard")


def decode_image_batch(df: DataFrame, content_col: str = "content",
                       feature_dim: int = 8, fake: bool = False) -> DataFrame:
    """Decode/feature-extract images via mapInPandas.

    Real decode needs an image library that is not in this container —
    without `fake=True` the returned plan raises NotImplementedError at
    execution. With `fake=True` features are a deterministic function
    of the bytes (length + first bytes), so schema/partitioning/batch
    shape are fully testable.
    """
    # Build a NEW StructType: StructType.add mutates in place, and
    # df.schema is a cached object — mutating it corrupts df.columns.
    out_schema = (df.schema if "features" in df.columns
                  else T.StructType([*df.schema.fields,
                                     T.StructField("features",
                                                   T.ArrayType(T.DoubleType()))]))

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv — not available; "
                    "pass fake=True for deterministic plumbing tests")
            feats = []
            for raw in pdf[content_col]:
                raw = bytes(raw or b"")
                feats.append([float(len(raw))] +
                             [float(b) for b in raw[: feature_dim - 1]] +
                             [0.0] * max(0, feature_dim - 1 - len(raw)))
            pdf = pdf.assign(features=feats)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_media_batch(df: DataFrame, target_bytes: int = 64,
                       content_col: str = "content",
                       fake: bool = False) -> DataFrame:
    """Resize/resample plumbing via mapInPandas: binary in, binary out
    (`content_resized`) plus `resized_length`.

    A real implementation would decode, resize (image) or resample
    (audio), and re-encode; that needs codec libraries this container
    lacks, so without `fake=True` execution raises NotImplementedError.
    With `fake=True` the output is deterministic nearest-neighbor byte
    sampling to exactly `target_bytes` — the Arrow batch shape, binary
    output schema, and per-row size contract are the real, tested part.
    """
    out_schema = T.StructType([*df.schema.fields,
                               T.StructField("content_resized", T.BinaryType()),
                               T.StructField("resized_length", T.LongType())])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media resize requires codec libraries — not available; "
                    "pass fake=True for deterministic plumbing tests")
            resized = []
            for raw in pdf[content_col]:
                raw = bytes(raw or b"")
                if not raw:
                    resized.append(bytes(target_bytes))
                    continue
                resized.append(bytes(raw[(i * len(raw)) // target_bytes]
                                     for i in range(target_bytes)))
            yield pdf.assign(content_resized=resized,
                             resized_length=[len(r) for r in resized])

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024,
                  content_col: str = "content", max_frames: int = 16) -> DataFrame:
    """Frame-sampling plumbing: explode one row per sampled "frame"
    offset. A real video decoder would replace the offset arithmetic;
    the explode/partition shape is what matters for the pipeline."""
    n = F.least(F.floor(F.length(F.col(content_col)) / every_n_bytes).cast("int") + 1,
                F.lit(max_frames))
    offsets = F.sequence(F.lit(0), n - 1)
    return (df.withColumn("frame_idx", F.explode(offsets))
              .withColumn("frame_offset", F.col("frame_idx") * every_n_bytes))
