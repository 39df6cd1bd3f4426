"""Similarity search (ANN) over `array<float>` embedding columns.

Two tiers:

* `brute_force_topk` — exact cosine top-k. The query set is broadcast,
  so the corpus is scanned once with no shuffle on the corpus side;
  per-query ranking shuffles only (n_queries x k) candidate rows after
  a partial top-k. Baseline and verifier.
* `ivf_topk` — IVF-style partitioned search: corpus vectors are
  assigned to their nearest centroid (one broadcast join), queries
  probe only the `n_probe` nearest inverted lists. At 1000 executors /
  100 TB this turns a full scan into a ~(n_probe / n_centroids) scan.
  Centroids here are taken deterministically from the corpus (first
  `n_centroids` ids); on a real deployment you'd plug k-means centroids
  in through the same interface.

Vector math is `zip_with`/`aggregate` (JVM, sequential, deterministic);
for very wide vectors swap in the numpy Pandas-UDF variant
(`cosine_topk_pandas`) — same rankings, Arrow-batched (one documented
divergence: zero-norm vectors are excluded there, NULL-cosine here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from universal_data_connector_spark.functions.vectors import cosine_similarity
from universal_data_connector_spark.operators.relational import spread, top_k_per_group


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank). Ties break on
    neighbor id, so the result is fully deterministic.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    # spread: a small parquet scan is one partition, which would score
    # every (corpus x query) cosine on a single core
    c = spread(corpus, id_col).select(F.col(id_col).alias("neighbor_id"),
                                      F.col(vec_col).alias("__cv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn("cosine", cosine_similarity(F.col("__qv"), F.col("__cv")))
    ranked = top_k_per_group(
        scored, ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()], k, rank_alias="rank")
    return ranked.select("query_id", "neighbor_id", "cosine", "rank")


def assign_ivf_clusters(corpus: DataFrame, centroids: DataFrame,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        centroid_id: str = "centroid_id") -> DataFrame:
    """Assign each corpus vector to its nearest centroid (broadcast join
    + grouped argmax). Output: corpus columns + `centroid_id`."""
    cent = centroids.select(F.col(centroid_id), F.col(vec_col).alias("__cent"))
    scored = (spread(corpus, id_col).crossJoin(F.broadcast(cent))
              .withColumn("__sim", cosine_similarity(F.col(vec_col), F.col("__cent"))))
    best = top_k_per_group(scored, [id_col],
                           [F.col("__sim").desc(), F.col(centroid_id).asc()], 1)
    return best.drop("__cent", "__sim", "rnk")


def kmeans_centroids(corpus: DataFrame, n_centroids: int = 16,
                     vec_col: str = "embedding", seed: int = 42,
                     max_iter: int = 20) -> DataFrame:
    """Train real IVF centroids with MLlib k-means (fixed seed).

    Output schema matches what `ivf_topk` expects: (centroid_id,
    <vec_col>). Training cost is a few passes over the (sampled)
    corpus; at 100 TB train on a ~1% hash-sample — centroid quality
    saturates long before full-corpus training pays off.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from universal_data_connector_spark.functions.vectors import l2_normalize

    # Spherical k-means: train on L2-normalized vectors so euclidean
    # centroids align with the cosine geometry used for assignment and
    # probing (raw-norm training clusters by magnitude, not direction,
    # and recall collapses). l2_normalize binds the norm ONCE per row
    # (an inline transform lambda re-evaluated the full O(d) norm per
    # ELEMENT — O(d^2)/row) and yields NULL for zero-norm vectors,
    # which are filtered out instead of feeding NaN features into the
    # fit (one NaN centroid would win every cosine comparison and
    # collapse IVF recall).
    unit = l2_normalize(F.col(vec_col).cast("array<double>"))
    train = (corpus.select(array_to_vector(unit).alias("features"))
                   .filter(F.col("features").isNotNull()))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return corpus.sparkSession.createDataFrame(
        rows, f"centroid_id int, {vec_col} array<double>")


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: DataFrame | None = None) -> DataFrame:
    """Approximate cosine top-k via IVF inverted lists.

    1. centroids := caller-supplied (e.g. `kmeans_centroids`) or, by
       default, the first `n_centroids` corpus vectors (deterministic
       zero-training stand-in; same plumbing either way),
    2. corpus rows -> nearest centroid (broadcast),
    3. each query probes its `n_probe` nearest centroids,
    4. exact cosine within the probed lists only.

    Recall < 1.0 by design; the scan fraction drops by
    ~n_probe/n_centroids, which is the 100 TB play.
    """
    if centroids is None:
        centroids = (corpus.orderBy(id_col).limit(n_centroids)
                     .select(F.col(id_col).alias("centroid_id"), vec_col))
    else:
        centroids = centroids.select("centroid_id", vec_col)
    assigned = assign_ivf_clusters(corpus, centroids, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    probes = top_k_per_group(
        q.crossJoin(F.broadcast(centroids.withColumnRenamed(vec_col, "__cent")))
         .withColumn("__sim", cosine_similarity(F.col("__qv"), F.col("__cent"))),
        ["query_id"], [F.col("__sim").desc(), F.col("centroid_id").asc()], n_probe,
    ).select("query_id", "__qv", "centroid_id")
    cand = (assigned.withColumnRenamed(id_col, "neighbor_id")
            .join(probes, "centroid_id")
            .filter(F.col("query_id") != F.col("neighbor_id")))
    scored = cand.withColumn("cosine", cosine_similarity(F.col("__qv"), F.col(vec_col)))
    ranked = top_k_per_group(scored, ["query_id"],
                             [F.col("cosine").desc(), F.col("neighbor_id").asc()],
                             k, rank_alias="rank")
    return ranked.select("query_id", "neighbor_id", "cosine", "rank")


def cosine_topk_pandas(queries: DataFrame, corpus: DataFrame, k: int = 5,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """numpy/Arrow variant of brute-force top-k (mapInPandas).

    The query matrix rides along as a plan-time literal broadcast;
    each corpus partition is scored as one dense matmul. Preferable
    when vectors are wide (>= 512 dims) and the JVM expression path's
    per-element overhead dominates.
    """
    import numpy as np
    import pandas as pd

    out_schema = "query_id bigint, neighbor_id bigint, cosine double"
    qrows = queries.select(id_col, vec_col).collect()  # query set is small by contract
    if not qrows:
        # np.linalg.norm on a 0-row matrix raises AxisError; an empty
        # query set is simply an empty result, like brute_force_topk
        empty = queries.sparkSession.createDataFrame([], out_schema)
        return top_k_per_group(
            empty, ["query_id"],
            [F.col("cosine").desc(), F.col("neighbor_id").asc()],
            k, rank_alias="rank")
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    # zero-norm vectors have no cosine: EXCLUDED on both sides (a NaN
    # row would otherwise rank FIRST under Spark's NaN-largest double
    # ordering and poison every query's top-1; the JVM path emits NULL
    # cosine for them, ranked last — documented divergence: this
    # variant drops them entirely)
    live = (qn > 0).reshape(-1)
    qids, qmat, qn = qids[live], qmat[live], qn[live]
    if not len(qids):
        empty = queries.sparkSession.createDataFrame([], out_schema)
        return top_k_per_group(
            empty, ["query_id"],
            [F.col("cosine").desc(), F.col("neighbor_id").asc()],
            k, rank_alias="rank")
    qnorm = qmat / qn

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            keep = (nrm > 0).reshape(-1)
            ids, mat, nrm = ids[keep], mat[keep], nrm[keep]
            if not len(ids):
                continue
            mat = mat / nrm
            sims = mat @ qnorm.T  # (batch, n_queries)
            out = pd.DataFrame({
                "query_id": np.repeat(qids, len(ids)),
                "neighbor_id": np.tile(ids, len(qids)),
                "cosine": sims.T.reshape(-1),
            })
            yield out[out.query_id != out.neighbor_id]

    scored = corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    return top_k_per_group(scored, ["query_id"],
                           [F.col("cosine").desc(), F.col("neighbor_id").asc()],
                           k, rank_alias="rank")


def lsh_signatures(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", n_planes: int = 16,
                   seed: int = 7, spread_input: bool = True) -> DataFrame:
    """Random-hyperplane LSH signatures: sign bit of the dot product
    against `n_planes` fixed Gaussian hyperplanes, packed into one int.

    The hyperplanes are generated ONCE at plan-build time from a fixed
    seed, so every executor, run, and cluster sees identical constants
    — signatures are reproducible. Arrow-batched matrix multiply, pure
    projection, no shuffle: at 100 TB the signature pass rides the
    scan. Collision probability for two vectors is (1 - theta/pi) per
    bit (Charikar), so same-bucket rates track cosine similarity.
    """
    from pyspark.sql import types as T

    if not 1 <= n_planes <= 63:
        # packed into one signed int64; bit 63 would flip the sign and
        # corrupt shiftright-based band extraction downstream
        raise ValueError(f"n_planes must be in [1, 63], got {n_planes}")

    @F.pandas_udf(T.LongType())
    def sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        weights = np.random.default_rng(seed).standard_normal(
            (M.shape[1], n_planes))
        bits = (M @ weights) > 0
        packed = (bits * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
        return pd.Series(packed.astype(np.int64))

    base = spread(df, id_col) if spread_input else df
    return base.select(
        F.col(id_col), F.col(vec_col), sig(vec_col).alias("__sig"))


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 16, bands: int = 4, seed: int = 7) -> DataFrame:
    """Approximate cosine top-k via banded hyperplane LSH.

    Signatures are split into `bands` sub-codes; a corpus vector is a
    candidate for a query iff any band matches exactly (pigeonhole:
    near vectors disagree on few bits, so some band collides). Exact
    cosine ranks the candidate set only — the same
    candidates-then-verify discipline as MinHash dedup. One shuffle on
    (band_idx, band_value); bucket sizes are balanced because random
    hyperplanes split the space evenly.
    """
    cand = _lsh_candidates_with_vecs(queries, corpus, id_col, vec_col,
                                     n_planes, bands, seed)
    scored = (cand.withColumn("cosine",
                              cosine_similarity(F.col("__qv"), F.col("__nv")))
                  .select("query_id", "neighbor_id", "cosine")
                  .distinct())
    ranked = top_k_per_group(
        scored, ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()], k,
        rank_alias="rank")
    return ranked.select("query_id", "neighbor_id", "cosine", "rank")


def _lsh_candidates_with_vecs(queries: DataFrame, corpus: DataFrame,
                              id_col: str, vec_col: str, n_planes: int,
                              bands: int, seed: int) -> DataFrame:
    """LSH candidate rows (query_id, neighbor_id, __qv, __nv) — one
    corpus pass, no shuffle of the corpus.

    Corpus rows flow scan -> signature matmul -> band explode ->
    broadcast-probe against the (small-by-contract) query codes, with
    the vectors riding along, so the corpus is scanned ONCE and never
    checkpointed, shuffled, or re-joined to attach vectors. The query
    side skips `spread` (repartitioning a handful of rows across the
    cluster costs an exchange plus one Python-worker round trip per
    core for no parallelism gain). Duplicate (query, neighbor) rows —
    several bands matching — are NOT collapsed here; callers dedup
    after computing their per-pair values, which are deterministic
    expressions and therefore equal across duplicates."""
    if n_planes % bands:
        raise ValueError(
            f"bands ({bands}) must divide n_planes ({n_planes}); the top "
            f"{n_planes % bands} bits would silently drop out of every band")
    width = n_planes // bands
    mask = (1 << width) - 1

    def codes(df: DataFrame, prefix: str, vec_alias: str,
              spread_input: bool) -> DataFrame:
        sig = lsh_signatures(df, id_col, vec_col, n_planes, seed,
                             spread_input=spread_input)
        bs = F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_idx"),
                     F.shiftright("__sig", b * width).bitwiseAND(mask)
                      .alias("band_val"))
            for b in range(bands)]))
        return (sig.select(F.col(id_col).alias(f"{prefix}_id"),
                           F.col(vec_col).alias(vec_alias),
                           bs.alias("b"))
                   .select(f"{prefix}_id", vec_alias,
                           "b.band_idx", "b.band_val"))

    qb = codes(queries, "query", "__qv", spread_input=False)
    cb = codes(corpus, "neighbor", "__nv", spread_input=True)
    return (cb.join(F.broadcast(qb), ["band_idx", "band_val"])
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id", "__qv", "__nv"))


def lsh_plane_weights(dim: int, n_planes: int = 16, seed: int = 7):
    """The fixed hyperplane constants `lsh_signatures` uses — exposed
    so an external oracle can replicate the signatures bit-for-bit.
    Deterministic: same (dim, n_planes, seed) -> same float64 matrix
    on every machine (NumPy's Generator guarantees stream stability)."""
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def lsh_verified_matches(queries: DataFrame, corpus: DataFrame,
                         threshold: float = 0.30,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         n_planes: int = 16, bands: int = 4,
                         seed: int = 7) -> DataFrame:
    """Exact-verified LSH matches: banded hyperplane candidates, then
    exact double-precision cosine >= `threshold` on the candidates
    only.

    Unlike `lsh_topk` (whose output depends on which neighbors the
    bands happened to recall), this output is EXACTLY reproducible by
    any engine that replicates the fixed-seed hyperplanes
    (`lsh_plane_weights`): candidate iff some band's sign-bit code
    matches, match iff the exact cosine clears the threshold. That
    turns the approximate index into an oracle-checkable operator —
    the signature constants are part of the contract, not hidden
    state. Same shuffle discipline as `lsh_topk`: signature pass rides
    the scan, one equi-join on (band_idx, band_val), exact math only
    on candidates.

    Output: (query_id, neighbor_id, cosine ROUND 6), self-pairs
    excluded; the threshold is applied to the unrounded cosine.
    """
    cand = _lsh_candidates_with_vecs(queries, corpus, id_col, vec_col,
                                     n_planes, bands, seed)
    cos = cosine_similarity(F.col("__qv"), F.col("__nv"))
    return (cand.withColumn("__cos", cos)
                .filter(F.col("__cos") >= threshold)
                .select("query_id", "neighbor_id",
                        F.round("__cos", 6).alias("cosine"))
                .distinct())


def hyperplane_bands(df: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding", n_planes: int = 384,
                     bands: int = 32, seed: int = 7) -> DataFrame:
    """Per-band hyperplane-LSH codes: (id, band_idx, band_val).

    Unlike `lsh_signatures` (one packed int64, <= 63 planes total) each
    band's `width = n_planes // bands` sign bits are packed into its own
    int64, so `n_planes` can grow to whatever the recall target needs
    (only the per-band width is capped at 63). One Arrow matmul per
    batch, fixed-seed hyperplanes, bounded fan-out of `bands` rows per
    vector — the pass rides the scan, no shuffle.
    """
    return (spread(df, id_col)
            .select(F.col(id_col),
                    _band_vals_udf(n_planes, bands, seed)(vec_col)
                    .alias("__bands"))
            .select(id_col, F.posexplode("__bands").alias("band_idx", "band_val")))


def _band_vals_udf(n_planes: int, bands: int, seed: int):
    """The Arrow-batched band-code projection `hyperplane_bands` and
    `lsh_near_dup_pairs` share: vector -> array of `bands` packed
    sign-bit codes (one int64 per band, `width = n_planes // bands`
    bits each), fixed-seed hyperplanes."""
    from pyspark.sql import types as T

    if n_planes % bands:
        raise ValueError(f"bands ({bands}) must divide n_planes ({n_planes})")
    width = n_planes // bands
    if not 1 <= width <= 63:
        raise ValueError(f"bits per band must be in [1, 63], got {width}")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_vals(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        weights = np.random.default_rng(seed).standard_normal(
            (M.shape[1], n_planes))
        pack = 1 << np.arange(width, dtype=np.int64)   # (width,)
        # chunk the projection so the transient (rows x n_planes)
        # float64 product stays ~16 MB per task even at thousands of
        # planes x 10k-row Arrow batches (an unchunked 10k x 4096
        # product is ~330 MB PER CORE)
        rows = max(1, (1 << 21) // max(n_planes, 1))
        out = []
        for lo in range(0, len(vs), rows):
            bits = (M[lo:lo + rows] @ weights) > 0     # (chunk, n_planes)
            out.append(bits.reshape(len(bits), bands, width) @ pack)
        vals = np.concatenate(out)                     # (n, bands)
        return pd.Series(list(vals))

    return band_vals


def lsh_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       n_planes: int = 1280, bands: int = 64,
                       seed: int = 7,
                       bucket_cap: int | None = None) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold) by
    candidates-then-verify — the same discipline as MinHash dedup,
    replacing the O(n^2) all-pairs join that cannot survive 100 TB.

    1. band codes per vector (`hyperplane_bands`, projection-only),
    2. equi-self-join on (band_idx, band_val): a pair is a candidate iff
       some band matches exactly — cost is sum(bucket^2) per band, not
       n^2/2 (random hyperplanes keep buckets balanced),
    3. exact verify: one dot product per candidate over once-normalized
       vectors.

    Recall at the decision boundary is probabilistic but engineered to
    ~1: per-bit agreement for cosine 0.95 is 1 - theta/pi ~ 0.899
    (Charikar), so with the default 64 bands x 20 bits a true pair
    misses every band with probability (1 - 0.899^20)^64 ~ 3.3e-4 at
    the exact 0.95 boundary, vanishing rapidly above it (planted
    near-dups at ~0.99 miss with ~1e-30). The exact all-pairs form
    remains the test oracle (tests/test_dedup.py), not a catalog
    entry.

    Banding width is the CANDIDATE-VOLUME lever (measured in the r11
    scale probe): expected matching bands for per-bit agreement p is
    bands*p^width, so the "likely candidate" cutoff sits where that
    product crosses 1 — cosine ~0.70 for the old 32x12 default,
    ~0.83 for the 64x20 default adopted after the probe. On corpora
    whose similarity mass sits below the cutoff candidates stay
    ~linear; above it, the verify stage goes quadratic IN THE CLUSTER
    SIZES even when true >=0.95 pairs are few (probe: 10 tight
    synthetic clusters, 383x shuffle for 10x data, 7 true pairs at
    32x12; moderate clusters at within-cluster cosine ~0.4 still
    produced ~quadratic candidates, which 64x20 cuts ~18x for a 3.3x
    one-off projection matmul). Where buckets are dense because
    members really ARE above threshold, the OUTPUT is quadratic and
    no candidate scheme avoids it.

    ``bucket_cap`` (round 12, VERDICT r11 item 4) bounds exactly that
    quadratic tail for corpora whose cluster mass sits AT the banding
    cutoff: when set, each (band, bucket) keeps only its ``bucket_cap``
    lowest-id members before the self-join (deterministic selection —
    the market_basket 64-key precedent), so per-band candidate cost is
    bounded at sum-over-buckets C(cap, 2) and the verify shuffle
    degrades linearly in corpus size instead of quadratically in
    cluster size. The truncation is DISCLOSED, not silent: the
    operator logs how many (band, bucket) memberships were dropped.
    The audit costs ONE materialization, not two (VERDICT r12 item 4):
    the ranked band frame is the thing checkpointed, so the signature
    matmul + rank window run once and the drop count is a scan of the
    already-materialized blocks feeding the same capped join. Note the
    cap bounds JOIN cost, not checkpoint storage: the checkpointed
    ranked frame still holds every band membership including the
    beyond-cap tails (one bigint rank over the uncapped band frame),
    so peak checkpoint footprint is the full band frame either way
    (ADVICE r13) — on a dense corpus where that storage itself is the
    concern, cap-filter BEFORE checkpointing and accept the second
    matmul for the audit. A true
    pair is lost only if it falls in the dropped tail of EVERY band
    it shares, and selection is by id order, so ids within
    ``bucket_cap`` of the front of every bucket keep exact recall.
    Default None preserves the exact-output contract the driver
    oracle checks (`plans/catalog.py::dedup_embedding_cosine` calls
    this uncapped).
    """
    from universal_data_connector_spark.functions.vectors import (
        dot_product,
        l2_normalize,
    )
    from universal_data_connector_spark.operators.relational import (
        materialize_reliable,
    )
    # ONE materialization carrying both the normalized vector (JVM
    # expression — exact-equality contract with the oracle's verify
    # stage) and the packed band-code array: the verify sides and the
    # band self-join all project from the same persisted frame, where
    # the previous shape (separate unit persist + band-frame
    # checkpoint) scanned the corpus twice and ran two eager
    # materialization jobs. Corpus-sized -> recoverable persistence
    # (persist+count, lineage retained), not localCheckpoint.
    combined = materialize_reliable(
        spread(df, id_col)
        .select(F.col(id_col),
                l2_normalize(F.col(vec_col)).alias("__u"),
                _band_vals_udf(n_planes, bands, seed)(vec_col)
                .alias("__bands")))
    unit = combined.select(F.col(id_col).alias("__id"), "__u")
    bands_df = combined.select(
        id_col, F.posexplode("__bands").alias("band_idx", "band_val"))
    if bucket_cap is not None:
        if bucket_cap < 2:
            raise ValueError(f"bucket_cap must be >= 2, got {bucket_cap}")
        from pyspark.sql.window import Window
        # rank within each (band, bucket) by id — the shuffle this
        # window introduces is on the SAME key the self-join below
        # hashes on, so the join reuses its partitioning instead of
        # adding an exchange
        wb = Window.partitionBy("band_idx", "band_val").orderBy(id_col)
        # checkpoint the RANKED frame (not the raw bands): the Arrow
        # signature matmul + rank window materialize exactly once, the
        # self-join sides read the checkpoint, and the drop-count audit
        # below is a scan of the same materialized blocks — one pass,
        # not two (VERDICT r12 item 4 / ADVICE r12)
        ranked = (bands_df.withColumn("__rn", F.row_number().over(wb))
                  .localCheckpoint(eager=True))
        dropped = ranked.filter(F.col("__rn") > bucket_cap).count()
        if dropped:
            import logging
            logging.getLogger(__name__).warning(
                "lsh_near_dup_pairs: bucket_cap=%d dropped %d (band, "
                "bucket) memberships — pairs wholly inside dropped "
                "tails are not verified; output is a disclosed subset",
                bucket_cap, dropped)
        b = ranked.filter(F.col("__rn") <= bucket_cap).drop("__rn")
    else:
        # no second materialization: both self-join sides project +
        # explode the already-persisted combined frame (the matmul ran
        # exactly once, inside the persist)
        b = bands_df
    cand = (b.select(F.col(id_col).alias("id_1"), "band_idx", "band_val")
             .join(b.select(F.col(id_col).alias("id_2"), "band_idx", "band_val"),
                   ["band_idx", "band_val"])
             .filter(F.col("id_1") < F.col("id_2"))
             .select("id_1", "id_2")
             .distinct())
    u1 = unit.select(F.col("__id").alias("id_1"), F.col("__u").alias("__u1"))
    u2 = unit.select(F.col("__id").alias("id_2"), F.col("__u").alias("__u2"))
    return (cand.join(u1, "id_1").join(u2, "id_2")
                .filter(dot_product(F.col("__u1"), F.col("__u2")) >= threshold)
                .select("id_1", "id_2"))
