"""Multimodal (image / audio / video) column plumbing.

Design: media are opaque `binary` columns plus typed metadata — the
schema, partitioning, and Pandas-UDF batch shapes are real and tested.
The codec step resolves per executor: a REAL pillow-backed decode /
resize when the public `PIL` package imports, the deterministic
`fake=True` seam for plumbing tests, and a clear `NotImplementedError`
when neither applies (this container ships no codec, so the catalog's
multimodal keys run the fake path and stay rows-only by recorded
decision — SURVEY §2B r10; the real path's tests are env-gated via
``pytest.importorskip("PIL")`` and activate wherever pillow exists).

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
# RIFF is handled separately: it is a CONTAINER magic shared by WAV,
# WebP, and AVI, disambiguated by the format tag at bytes 9-12.
_MAGIC = [
    ("89504e47", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("47494638", "image/gif"),
    ("494433", "audio/mp3"),    # ID3
    ("1a45dfa3", "video/webm"),
]

_RIFF_FORMS = [
    ("57415645", "audio/wav"),      # WAVE
    ("57454250", "image/webp"),     # WEBP
    ("41564920", "video/x-msvideo"),  # 'AVI '
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
    hexhead = F.lower(F.hex(F.substring(F.col(content_col), 1, 12)))
    mt = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        mt = F.when(hexhead.startswith(magic), F.lit(mime)).otherwise(mt)
    # RIFF container: bytes 1-4 'RIFF', format tag at bytes 9-12 (hex
    # chars 17-24) decides WAV vs WebP vs AVI; unknown tags stay
    # octet-stream rather than mislabeling every RIFF as audio
    riff_tag = F.substring(hexhead, 17, 8)
    riff_mt = F.lit("application/octet-stream")
    for tag, mime in reversed(_RIFF_FORMS):
        riff_mt = F.when(riff_tag == tag, F.lit(mime)).otherwise(riff_mt)
    mt = F.when(hexhead.startswith("52494646"), riff_mt).otherwise(mt)
    return (df
            .withColumn("byte_length", F.length(F.col(content_col)).cast("bigint"))
            .withColumn("content_sha256", F.sha2(F.col(content_col), 256))
            .withColumn("media_type", mt))


def partition_by_content_hash(df: DataFrame, n_shards: int = 1024,
                              content_col: str = "content") -> DataFrame:
    """Repartition assets uniformly by content hash; attach the shard
    id as a column for downstream grouped work.

    The repartition keys on the FULL-entropy 64-bit content hash, not
    the n_shards-valued ``shard`` column: hash-partitioning a column
    that already holds only n_shards distinct values re-hashes those
    few values balls-into-bins style (~1/e of partitions empty, the
    hottest holding 4-5 shards' data) — the exact skew this operator
    exists to prevent. With ~unique hash keys, murmur3 spreads rows
    evenly across all n_shards partitions."""
    full_hash = F.xxhash64(F.col(content_col))
    shard = F.pmod(full_hash, F.lit(n_shards))
    return (df.withColumn("shard", shard)
              .repartition(n_shards, full_hash))


def _pil_image():
    """The public pillow codec if importable, else None — resolved on
    the EXECUTOR inside the UDF (the decision must be made where the
    decode runs, not on the driver)."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def decode_image_batch(df: DataFrame, content_col: str = "content",
                       feature_dim: int = 8, fake: bool = False) -> DataFrame:
    """Decode/feature-extract images via mapInPandas.

    Three execution modes, resolved per batch on the executor:
    ``fake=True`` -> deterministic byte-derived features (length +
    first bytes), the plumbing-test seam; otherwise, if pillow imports,
    a REAL decode (``PIL.Image.open`` -> RGB; features = width, height,
    channel count, then per-channel means, zero-padded/truncated to
    ``feature_dim``); otherwise ``NotImplementedError`` at execution —
    this container ships no codec, so the driver records this key
    rows-only on the fake path (permanence decision, SURVEY §2B r10;
    the real path is env-gated-tested via ``pytest.importorskip``).
    An undecodable payload on the real path yields NULL features
    rather than killing the task (the filter-don't-fail discipline of
    the corpus pipeline).
    """
    # Build a NEW StructType: StructType.add mutates in place, and
    # df.schema is a cached object — mutating it corrupts df.columns.
    out_schema = (df.schema if "features" in df.columns
                  else T.StructType([*df.schema.fields,
                                     T.StructField("features",
                                                   T.ArrayType(T.DoubleType()))]))

    def real_features(image_mod, raw: bytes) -> list | None:
        import io
        try:
            with image_mod.open(io.BytesIO(raw)) as im:
                im = im.convert("RGB")
                w, h = im.size
                # channel means over a bounded thumbnail: feature
                # cost must not scale with megapixels
                im.thumbnail((64, 64))
                px = list(im.getdata())
                n = max(1, len(px))
                means = [sum(c[i] for c in px) / n for i in range(3)]
        except Exception:
            return None
        feats = [float(w), float(h), 3.0, *means]
        return (feats + [0.0] * feature_dim)[:feature_dim]

    def run(batches: Iterator) -> Iterator:
        image_mod = None if fake else _pil_image()
        for pdf in batches:
            if not fake and image_mod is None:
                raise NotImplementedError(
                    "image decode requires a codec (pip install pillow) "
                    "— not available; pass fake=True for deterministic "
                    "plumbing tests")
            feats = []
            for raw in pdf[content_col]:
                if raw is None:
                    # a missing asset has no features — NULL, matching
                    # the real path's NULL-on-undecodable contract and
                    # distinct from a present-but-empty asset (fake
                    # features [0.0, ...]); round-14 NULL fuzz
                    feats.append(None)
                    continue
                raw = bytes(raw)
                if fake:
                    feats.append([float(len(raw))] +
                                 [float(b) for b in raw[: feature_dim - 1]] +
                                 [0.0] * max(0, feature_dim - 1 - len(raw)))
                else:
                    feats.append(real_features(image_mod, raw))
            pdf = pdf.assign(features=feats)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_media_batch(df: DataFrame, target_bytes: int = 64,
                       content_col: str = "content",
                       fake: bool = False, target_px: int = 32) -> DataFrame:
    """Resize/resample plumbing via mapInPandas: binary in, binary out
    (`content_resized`) plus `resized_length`.

    With ``fake=True`` (the plumbing-test seam, and what the catalog's
    rows-only key runs in codec-less containers) the output is
    deterministic nearest-neighbor byte sampling to exactly
    `target_bytes` — the Arrow batch shape, binary output schema, and
    per-row size contract are the real, tested part. Otherwise, if
    pillow imports on the executor, a REAL image resize runs: decode,
    thumbnail to fit ``target_px`` square, re-encode as PNG (a
    lossless, always-available encoder), with undecodable payloads
    mapping to NULL output rather than task failure; without a codec,
    ``NotImplementedError`` at execution (permanence decision, SURVEY
    §2B r10 — env-gated real-path tests via ``pytest.importorskip``).
    """
    out_schema = T.StructType([*df.schema.fields,
                               T.StructField("content_resized", T.BinaryType()),
                               T.StructField("resized_length", T.LongType())])

    def real_resize(image_mod, raw: bytes) -> bytes | None:
        import io
        try:
            with image_mod.open(io.BytesIO(raw)) as im:
                im = im.convert("RGB")
                im.thumbnail((target_px, target_px))
                buf = io.BytesIO()
                im.save(buf, format="PNG")
                return buf.getvalue()
        except Exception:
            return None

    def run(batches: Iterator) -> Iterator:
        image_mod = None if fake else _pil_image()
        for pdf in batches:
            if not fake and image_mod is None:
                raise NotImplementedError(
                    "media resize requires a codec (pip install pillow) "
                    "— not available; pass fake=True for deterministic "
                    "plumbing tests")
            resized = []
            for raw in pdf[content_col]:
                raw = bytes(raw or b"")
                if fake:
                    if not raw:
                        resized.append(bytes(target_bytes))
                        continue
                    resized.append(bytes(raw[(i * len(raw)) // target_bytes]
                                         for i in range(target_bytes)))
                else:
                    resized.append(real_resize(image_mod, raw))
            yield pdf.assign(
                content_resized=resized,
                resized_length=[len(r) if r is not None else None
                                for r in resized])

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024,
                  content_col: str = "content", max_frames: int = 16) -> DataFrame:
    """Frame-sampling plumbing: explode one row per sampled "frame"
    offset. A real video decoder would replace the offset arithmetic;
    the explode/partition shape is what matters for the pipeline.

    Every emitted offset addresses a real byte: a ``len`` that is an
    exact multiple of ``every_n_bytes`` does NOT emit the one-past-end
    offset (n = floor((len-1)/n)+1, not floor(len/n)+1). NULL or empty
    content yields one row with NULL frame_idx/offset (explode_outer)
    so assets are never silently dropped by sampling."""
    length = F.length(F.col(content_col))
    n = F.least(
        F.when(length > 0,
               F.floor((length - 1) / every_n_bytes).cast("int") + 1
               ).otherwise(F.lit(0)),
        F.lit(max_frames))
    offsets = F.when(n >= 1, F.sequence(F.lit(0), n - 1)) \
               .otherwise(F.lit(None).cast("array<int>"))
    return (df.withColumn("frame_idx", F.explode_outer(offsets))
              .withColumn("frame_offset", F.col("frame_idx") * every_n_bytes))
