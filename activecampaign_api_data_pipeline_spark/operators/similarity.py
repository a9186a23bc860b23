"""Similarity search over embedding columns (array<float>).

North-star extension (BASELINE.json): approximate-nearest-neighbor over the
``embeddings`` table. Two paths:

- :func:`cosine_topk` — brute-force exact top-k, the correctness baseline.
  Dot products are built-in array expressions (``zip_with`` +
  ``aggregate``) in double precision, sequential order — reproducible by
  the SQL oracle.
- :func:`ivf_topk` — IVF-style partitioned search: assign every vector to
  its nearest centroid (coarse quantizer), then search only the query's
  cell. At 100 TB this is the scale path: the expensive pairwise join is
  confined to cells (data is shuffled once on cell_id; each cell is a
  separate hash-join partition), and nprobe trades recall for cost.

Both avoid Python UDFs entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


# Parameter-keyed cache for frames persisted by ANN plan builds (ivf/pq/
# ivfpq). Codebooks, codes and cell assignments are INDEX ARTIFACTS — they
# depend only on (input plan, build parameters), not on the query — so two
# searches with the same parameters (e.g. pq_topk then ivfpq_topk at the
# same m/ksub) must reuse one build instead of retraining k-means. A
# persist()'d plan stays pinned in executor storage for the life of the
# session (the cache manager holds it by logical plan — driver GC never
# frees it), so entries are bounded by an LRU: reuse moves a key to the
# back, insertion past the cap unpersists the oldest. Keys carry the
# CANONICALIZED analyzed-plan string of the input (expression-id-free, so
# two independent reads of the same parquet path hit the same entry) plus
# the session identity (a new session never sees a dead frame) plus every
# build parameter. :func:`release_cached` stays the explicit cleanup handle.
from collections import OrderedDict

_BUILD_CACHE: "OrderedDict[tuple, DataFrame]" = OrderedDict()
_BUILD_CACHE_MAX = 8
# dim probes are one driver scalar per (plan, column) — cache them too so a
# repeated search does not pay a first() job just to re-learn the width.
# Same LRU discipline as _BUILD_CACHE: in-memory frames mint a fresh #obj
# token per object, so an unbounded dict would grow for the session's life.
_DIM_CACHE: "OrderedDict[tuple, int]" = OrderedDict()
_DIM_CACHE_MAX = 64


import hashlib
import itertools

_IDENT_COUNTER = itertools.count()


def _plan_key(df: DataFrame) -> tuple:
    """Session-scoped identity of a DataFrame's plan AND its data.

    The canonicalized analyzed-plan string is expression-id-free but for
    file sources it also omits the file path — ``sf0.001/embeddings`` and
    ``sf0.01/embeddings`` canonicalize identically (round-4 verdict:
    confirmed cross-dataset cache collision, silently wrong neighbors).
    So the key mixes in the DATA identity:

    - file-backed plans: an md5 over ``sorted(df.inputFiles())`` — stable
      across re-reads of the same table, distinct across tables, and it
      also changes when the underlying files change (new snapshot);
    - RDD-backed plans (``createDataFrame`` -> LocalRelation/LogicalRDD),
      whose data never appears in any plan string: a never-reused token
      pinned on the Python wrapper (plain ``id()`` could be recycled
      after GC).

    Both tags can apply (e.g. a file scan joined with a local relation).
    """
    s = df._jdf.queryExecution().analyzed().canonicalized().toString()
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        h = hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()
        s = f"{s}#files{h}"
    if "LogicalRDD" in s or "LocalRelation" in s:
        tok = getattr(df, "_ann_ident", None)
        if tok is None:
            tok = next(_IDENT_COUNTER)
            df._ann_ident = tok
        s = f"{s}#obj{tok}"
    return (id(df.sparkSession), s)


def _cached_build(key: tuple, build) -> DataFrame:
    """Return the persisted frame for ``key``, building it on first use."""
    df = _BUILD_CACHE.get(key)
    if df is not None:
        _BUILD_CACHE.move_to_end(key)
        return df
    df = build().persist()
    _BUILD_CACHE[key] = df
    while len(_BUILD_CACHE) > _BUILD_CACHE_MAX:
        _, old = _BUILD_CACHE.popitem(last=False)
        try:
            old.unpersist()
        except Exception:
            pass  # owning session already stopped
    return df


def _probe_dim(emb: DataFrame, vec_col: str) -> int:
    key = _plan_key(emb) + (vec_col,)
    if key in _DIM_CACHE:
        _DIM_CACHE.move_to_end(key)
        return _DIM_CACHE[key]
    dim = len(emb.select(vec_col).first()[0])
    _DIM_CACHE[key] = dim
    while len(_DIM_CACHE) > _DIM_CACHE_MAX:
        _DIM_CACHE.popitem(last=False)
    return dim


def release_cached() -> None:
    """Unpersist every frame cached by prior ANN plan builds."""
    while _BUILD_CACHE:
        _, df = _BUILD_CACHE.popitem()
        try:
            df.unpersist()
        except Exception:
            pass
    _DIM_CACHE.clear()


def _dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two array<float> columns."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int | None = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (brute force).

    Queries (a small set) are broadcast against the full collection —
    a map-side join, no shuffle of the big side; the per-query top-k is a
    window ranked by (similarity desc, neighbor_id) for determinism.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import ensure_min_parallelism

    q = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    if query_ids is not None:
        q = q.filter(F.col("query_id").isin(query_ids))
    elif max_query_id is not None:
        q = q.filter(F.col("query_id") < max_query_id)
    c = ensure_min_parallelism(emb).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    pairs = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def _assign(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: cell = argmax cosine over ``cents``
    (columns ``cent_id``, ``cv``). Ties break to the lower centroid id."""
    from activecampaign_api_data_pipeline_spark.sources.tables import ensure_min_parallelism

    scored = (
        ensure_min_parallelism(emb)
        .select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(cents))
        .withColumn("cc", cosine(F.col(vec_col), F.col("cv")))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cc").desc(), F.col("cent_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(F.col(id_col), F.col(vec_col), F.col("cent_id").alias("cell"))
    )


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd iterations as DataFrame aggregates.

    Init = the first ``n_centroids`` vectors by id (fixed, reproducible);
    each iteration assigns every vector to its nearest centroid by cosine
    (ties → lower centroid id) and recomputes each centroid as the
    element-wise mean of its members, ROUNDED to 6 decimals so the result
    is bit-reproducible across engines and partitionings (FP summation
    order is not; the mean is stable far below 1e-6). A cell that loses
    all members simply drops out. ``n_iters=0`` returns the raw seeds.

    Everything is expression work: assignment is a broadcast join +
    window argmax, the mean is posexplode → avg → array re-assembly —
    one shuffle per iteration, no Python UDFs, scales with the data.
    """
    cents = emb.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv")
    )
    for _ in range(n_iters):
        assigned = _assign(emb, cents, id_col, vec_col)
        px = assigned.select(F.col("cell"), F.posexplode(F.col(vec_col)))
        cm = px.groupBy("cell", "pos").agg(
            F.round(F.avg(F.col("col").cast("double")), 6).alias("m")
        )
        cents = (
            cm.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("cv")
            )
            .select(F.col("cell").alias("cent_id"), "cv")
        )
    return cents


def assign_cells(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
) -> DataFrame:
    """IVF coarse quantization over k-means centroids (:func:`kmeans_centroids`)."""
    return _assign(emb, kmeans_centroids(emb, n_centroids, n_iters, id_col, vec_col), id_col, vec_col)


def ivf_topk(
    emb: DataFrame,
    n_centroids: int = 8,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int | None = 10,
    nprobe: int = 1,
    n_iters: int = 2,
) -> DataFrame:
    """ANN top-k searching the query's ``nprobe`` nearest IVF cells.

    Cells come from :func:`kmeans_centroids` (``n_iters`` Lloyd rounds).
    The pairwise work drops from O(Q·N) to O(Q·nprobe·N/C); the join is
    co-partitioned on ``cell``. ``nprobe`` is the standard recall/cost
    knob — each collection vector lives in exactly one cell, so probing
    more cells never duplicates a (query, neighbor) pair. Recall < 1 by
    design — the exact counterpart is :func:`cosine_topk`.
    """
    cents = kmeans_centroids(emb, n_centroids, n_iters, id_col, vec_col)
    # materialize the assignment ONCE: it feeds both the query side and the
    # collection side of the cell join, and Spark does not reuse exchanges
    # across their differing projections — without the persist the whole
    # k-means lineage (2 Lloyd passes over the data) executes twice. The
    # parameter-keyed cache also shares it across queries (e.g. nprobe=1
    # and nprobe=2 searches over the same table reuse one assignment).
    cells = _cached_build(
        _plan_key(emb) + ("ivf_assign", n_centroids, n_iters, id_col, vec_col),
        lambda: _assign(emb, cents, id_col, vec_col),
    )
    # max_query_id=None means "all vectors are queries" (mirrors cosine_topk;
    # a raw `col < None` would silently filter everything to empty)
    qfilter = F.lit(True) if max_query_id is None else F.col(id_col) < max_query_id
    if nprobe <= 1:
        q = cells.filter(qfilter).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell"
        )
    else:
        qs = (
            emb.filter(qfilter)
            .join(F.broadcast(cents))
            .withColumn("cc", cosine(F.col(vec_col), F.col("cv")))
        )
        w_probe = Window.partitionBy(id_col).orderBy(F.col("cc").desc(), F.col("cent_id").asc())
        q = (
            qs.withColumn("_pr", F.row_number().over(w_probe))
            .filter(F.col("_pr") <= nprobe)
            .select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qv"),
                F.col("cent_id").alias("cell"),
            )
        )
    c = cells.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "cell")
    pairs = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def srp_planes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic ±1 random hyperplanes for SRP-LSH (shared verbatim by
    the DuckDB oracle, so both engines gate on identical planes)."""
    import random

    rng = random.Random(seed)
    return [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        for _ in range(n_planes)
    ]


def srp_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    n_bands: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via signed-random-projection LSH gating.

    The 100 TB scale path the blocked all-pairs kernel
    (:func:`embedding_neardup_pairs`) cannot be: each vector gets
    ``n_bands`` codes of ``n_bits`` sign bits (bit = sign of ``v·plane``,
    planes from :func:`srp_planes`); only pairs sharing a (band, code)
    bucket become candidates — the shuffle carries (band, code, id), the
    join is equality on the bucket, and the exact cosine verify is
    confined to candidates. Goemans–Williamson: P[bit agrees] = 1 − θ/π,
    so P[candidate] = 1 − (1 − (1−θ/π)^n_bits)^n_bands — a sigmoid in
    cos θ. Tuning: the 8×8 default gives ~0.94 recall at cos ≥ 0.9 with
    ~0.4 % random-pair noise; for looser thresholds (θ larger) use fewer
    bits / more bands (e.g. 4×16 → ~0.94 recall at cos 0.4, but ~64 %
    noise — SRP gates weakly far from θ=0; it is a NEAR-dup gate).

    Output: (id_a, id_b, cos) with id_a < id_b, cos ≥ threshold, exact
    cosine on the verified pairs. Deterministic given ``seed`` —
    recall < 1 by design (the missed pairs are the gating's false
    negatives), which is why the oracle mirrors the gate rather than
    comparing against the exhaustive operator.
    """
    planes = srp_planes(n_bits * n_bands, dim, seed)
    # planes as a broadcast TABLE, not inline literals: 64 embedded
    # array-literal HOF expressions cost ~9 s of driver-side analysis
    # alone; one small dot expression against a broadcast dim analyzes
    # instantly and is the right shape at scale anyway (planes are a dim).
    planes_df = emb.sparkSession.createDataFrame(
        [(p, planes[p]) for p in range(len(planes))], "p int, w array<double>"
    )
    v = F.col(vec_col)
    prods = F.zip_with(v, F.col("w"), lambda x, w: x.cast("double") * w)
    dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
    # bit p contributes 2^(p mod n_bits) to band (p div n_bits)'s code;
    # the group-by assembles each band code as a map-side partial sum
    banded = (
        emb.select(F.col(id_col).alias("vid"), v)
        .crossJoin(F.broadcast(planes_df))
        .select(
            "vid",
            (F.col("p") / n_bits).cast("int").alias("band"),
            ((dot >= 0).cast("long") * F.expr(f"shiftleft(1L, p % {n_bits})")).alias("bitval"),
        )
        .groupBy("vid", "band")
        .agg(F.sum("bitval").cast("int").alias("code"))
    )

    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "code"])
        .filter(F.col("l.vid") < F.col("r.vid"))
        .select(F.col("l.vid").alias("id_a"), F.col("r.vid").alias("id_b"))
        .distinct()
    )
    base = emb.select(F.col(id_col).alias("vid"), v.alias("_v"))
    return (
        cand.join(base.withColumnsRenamed({"vid": "id_a", "_v": "va"}), "id_a")
        .join(base.withColumnsRenamed({"vid": "id_b", "_v": "vb"}), "id_b")
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold, a < b). Exact.

    Blocked all-pairs with a BLAS inner kernel: vectors are hashed into
    ``n_blocks`` blocks, every unordered block pair (i ≤ j) becomes one
    task, and each task computes the full normalized ``A @ B.T`` with
    numpy over Arrow batches. Row-at-a-time evaluation of the dot product
    (``zip_with``/``aggregate`` or a DuckDB-style scalar loop) costs
    ~35 µs per pair interpreted; the matmul amortizes it to nanoseconds.

    Scale shape: replication factor is ~(n_blocks+1)/2 per row and each
    task touches two blocks only — pick ``n_blocks`` so a block fits an
    executor (rows/blocks grow together, task count grows as B², no
    unbounded cross join). At 100 TB you'd additionally gate the block
    pairs on LSH candidates; the verify kernel stays identical.
    """
    pair_rows = []
    for i in range(n_blocks):
        for j in range(i, n_blocks):
            pid = i * n_blocks + j
            if i == j:
                pair_rows.append((i, pid, "ab"))
            else:
                pair_rows.append((i, pid, "a"))
                pair_rows.append((j, pid, "b"))
    spark = emb.sparkSession
    assign = spark.createDataFrame(pair_rows, "blk int, pair_id int, side string")

    base = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    replicated = base.join(F.broadcast(assign), "blk").select(
        "pair_id", "side", "vid", "v"
    )

    def _block_pairs(pdf):
        import numpy as np
        import pandas as pd

        a = pdf[pdf["side"].isin(("a", "ab"))]
        b = pdf[pdf["side"].isin(("b", "ab"))]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        ma = np.stack(a["v"].to_numpy()).astype("float64")
        mb = np.stack(b["v"].to_numpy()).astype("float64")
        ma /= np.linalg.norm(ma, axis=1, keepdims=True)
        mb /= np.linalg.norm(mb, axis=1, keepdims=True)
        sims = ma @ mb.T
        ia = a["vid"].to_numpy()
        ib = b["vid"].to_numpy()
        if (pdf["side"] == "ab").any():
            # diagonal block: both sides hold the same rows → each unordered
            # pair appears twice; keep the strictly-ordered half.
            mask = (sims >= threshold) & (ia[:, None] < ib[None, :])
        else:
            # cross block: sides are disjoint, every pair appears once, but
            # id order does not follow block order → normalize below.
            mask = sims >= threshold
        rows, cols = np.nonzero(mask)
        lo = np.minimum(ia[rows], ib[cols])
        hi = np.maximum(ia[rows], ib[cols])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": sims[rows, cols]})

    out = replicated.groupBy("pair_id").applyInPandas(
        _block_pairs, "id_a long, id_b long, cos double"
    )
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def _l2(a: Column, b: Column) -> Column:
    """Sequential double-precision squared-L2 distance of two arrays."""
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Product-quantization codebooks: per-subspace k-means, trained on all
    ``m`` subspaces AT ONCE by carrying ``sub`` as a grouping column
    (one shuffle per Lloyd round total, not per subspace).

    Same determinism contract as :func:`kmeans_centroids`: seeds = the
    first ``ksub`` vectors by id, L2 argmin assignment (ties -> lower
    centroid id), element-wise means rounded to 6 decimals. Returns
    ``(sub, cent_id, cv)`` with ``cv`` a ``dim/m``-length double array.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import ensure_min_parallelism

    dim = dim or len(emb.select(vec_col).first()[0])
    dsub = dim // m
    sv = ensure_min_parallelism(emb).select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.transform(
                            F.slice(F.col(vec_col), j * dsub + 1, dsub),
                            lambda x: x.cast("double"),
                        ).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(id_col, F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
    cents = sv.filter(F.col(id_col) < ksub).select(
        "sub", F.col(id_col).alias("cent_id"), F.col("sv").alias("cv")
    )
    for _ in range(n_iters):
        scored = sv.join(F.broadcast(cents), "sub").withColumn(
            "d", _l2(F.col("sv"), F.col("cv"))
        )
        w = Window.partitionBy(id_col, "sub").orderBy(F.col("d").asc(), F.col("cent_id").asc())
        assigned = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .select(id_col, "sub", "sv", F.col("cent_id").alias("cell"))
        )
        px = assigned.select("sub", "cell", F.posexplode("sv"))
        cm = px.groupBy("sub", "cell", "pos").agg(
            F.round(F.avg("col"), 6).alias("mval")
        )
        cents = (
            cm.groupBy("sub", "cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mval"))),
                    lambda s: s.getField("mval"),
                ).alias("cv")
            )
            .select("sub", F.col("cell").alias("cent_id"), "cv")
        )
    return cents


def pq_encode(
    emb: DataFrame,
    cents: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Encode every vector as ``m`` codebook ids: ``(vec_id, sub, code)``.

    This is the 100 TB artifact: ``m`` small ints per vector (~32x
    smaller than the raw array), and the ONLY thing the search has to
    scan. The raw embedding column never appears in the search plan.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import ensure_min_parallelism

    dim = dim or len(emb.select(vec_col).first()[0])
    dsub = dim // m
    sv = ensure_min_parallelism(emb).select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.transform(
                            F.slice(F.col(vec_col), j * dsub + 1, dsub),
                            lambda x: x.cast("double"),
                        ).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(id_col, F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
    scored = sv.join(F.broadcast(cents), "sub").withColumn("d", _l2(F.col("sv"), F.col("cv")))
    w = Window.partitionBy(id_col, "sub").orderBy(F.col("d").asc(), F.col("cent_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(id_col, "sub", F.col("cent_id").alias("code"))
    )


def pq_topk(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 8,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int | None = 10,
    n_iters: int = 2,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance computation (ADC).

    The classic Jegou/Douze/Schmid scheme re-expressed as DataFrame ops:

    1. train per-subspace codebooks (:func:`pq_codebooks`),
    2. encode the collection (:func:`pq_encode`) — m ints per vector,
    3. per (query, sub) compute the distance TABLE to all ksub centroids
       (Q*m*ksub rows — broadcast-sized for any realistic Q),
    4. approximate distance = sum over sub of table[code] — an equi-join
       of the code rows against the broadcast table plus one grouped sum;
       the raw vectors are never touched after encoding.

    The per-pair sum folds the m per-subspace terms IN SUB ORDER
    (sorted-struct fold, not a grouped SUM) so the double-precision total
    is bit-reproducible across engines and partitionings. Ranks tie-break
    on neighbor id. Returns (query_id, neighbor_id, rank, adist).

    At 100 TB: codebooks are a few KB (broadcast); codes are ~3% of the
    corpus bytes; the only shuffle is the (query_id, neighbor_id) group —
    over code rows, not vectors. nprobe-style gating composes by
    intersecting with :func:`assign_cells` cells before the grouped sum.
    """
    # the dim probe is ONE driver scalar, shared by every stage below
    dim = _probe_dim(emb, vec_col)
    # codebooks feed BOTH the encode branch and the distance-table branch;
    # without the persist the whole Lloyd lineage executes twice. Keyed on
    # build parameters, so ivfpq_topk (non-residual) with the same (m, ksub,
    # n_iters) reuses these exact frames instead of retraining.
    pq_key = _plan_key(emb) + (m, ksub, n_iters, id_col, vec_col, dim)
    cents = _cached_build(
        pq_key + ("pq_cents",),
        lambda: pq_codebooks(emb, m, ksub, n_iters, id_col, vec_col, dim=dim),
    )
    # codebooks + codes feed the search twice conceptually (table build and
    # code join); materialize codes once — they are the compressed corpus
    codes = _cached_build(
        pq_key + ("pq_codes",),
        lambda: pq_encode(emb, cents, m, id_col, vec_col, dim=dim),
    )

    dtab = _adc_distance_table(emb, cents, m, dim, id_col, vec_col, max_query_id)
    return _adc_topk(codes, dtab, id_col, k)


def _adc_distance_table(
    emb: DataFrame,
    cents: DataFrame,
    m: int,
    dim: int,
    id_col: str,
    vec_col: str,
    max_query_id: int | None,
) -> DataFrame:
    """Per-(query, sub) L2 distances to every codebook centroid —
    Q*m*ksub rows, broadcast-sized for any realistic query set."""
    dsub = dim // m
    q = emb
    if max_query_id is not None:
        q = q.filter(F.col(id_col) < max_query_id)
    qsv = q.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.transform(
                            F.slice(F.col(vec_col), j * dsub + 1, dsub),
                            lambda x: x.cast("double"),
                        ).alias("qv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("query_id", F.col("s.sub").alias("sub"), F.col("s.qv").alias("qv"))
    return qsv.join(F.broadcast(cents), "sub").select(
        "query_id", "sub", F.col("cent_id").alias("code"), _l2(F.col("qv"), F.col("cv")).alias("d")
    )


def _adc_topk(
    codes: DataFrame,
    dtab: DataFrame,
    id_col: str,
    k: int,
    cand: DataFrame | None = None,
    join_keys: list[str] | None = None,
) -> DataFrame:
    """ADC scoring: join code rows to the broadcast distance table, fold the
    m per-subspace terms IN SUB ORDER (bit-reproducible), rank per query.
    ``cand`` (query_id, id_col) restricts scoring to gated candidates —
    the IVF-PQ path — applied BEFORE the grouped sum so non-candidates
    never enter the shuffle. ``join_keys`` defaults to (sub, code); the
    residual path adds ``cell`` so each candidate is scored against the
    query's distance table FOR THAT CANDIDATE'S cell."""
    terms = codes.join(F.broadcast(dtab), join_keys or ["sub", "code"]).filter(
        F.col(id_col) != F.col("query_id")
    )
    if cand is not None:
        terms = terms.join(cand, ["query_id", id_col], "left_semi")
    summed = (
        terms.groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "d"))),
                    lambda s: s.getField("d"),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("neighbor_id").asc())
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("adist", 6).alias("adist"))
    )


def ivfpq_topk(
    emb: DataFrame,
    n_centroids: int = 8,
    m: int = 4,
    ksub: int = 8,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int | None = 10,
    nprobe: int = 1,
    n_iters: int = 2,
    residual: bool = False,
) -> DataFrame:
    """IVF-gated PQ search — the FAISS IVF-PQ composition.

    Coarse quantizer (:func:`kmeans_centroids` + cosine argmax) prunes the
    candidate set to the query's ``nprobe`` cells; PQ/ADC scores ONLY the
    survivors. At 100 TB this is the full scale recipe: the corpus is
    stored as (cell, m codes) — a few bytes per vector — and a query
    touches nprobe/n_cells of it, via a broadcast distance table.
    Candidate gating happens before the ADC shuffle (left-semi on the
    cell join output), so pruned vectors never enter it.

    ``residual=True`` is the actual FAISS IVFPQ quality step: codebooks
    are trained on, and codes encode, the residual ``v − c(cell(v))``
    instead of the raw vector. Residuals cluster around the origin with
    far less spread than raw vectors, so the same (m, ksub) budget buys
    finer quantization. Query side, the distance table is built per
    (query, probed cell) from ``q − c(cell)`` — still Q·nprobe·m·ksub
    rows, broadcast-sized — and ADC joins pick the table matching each
    candidate's own cell. Note the nprobe=all ≡ plain-PQ identity holds
    only for ``residual=False`` (residual codebooks differ by design).
    """
    dim = _probe_dim(emb, vec_col)
    coarse = kmeans_centroids(emb, n_centroids, n_iters, id_col, vec_col)
    from activecampaign_api_data_pipeline_spark.sources.tables import ensure_min_parallelism

    def _build_ranked() -> DataFrame:
        scored = (
            ensure_min_parallelism(emb)
            .select(F.col(id_col), F.col(vec_col))
            .join(F.broadcast(coarse))
            .withColumn("cc", cosine(F.col(vec_col), F.col("cv")))
        )
        w = Window.partitionBy(id_col).orderBy(F.col("cc").desc(), F.col("cent_id").asc())
        return scored.withColumn("rn", F.row_number().over(w)).select(
            id_col, F.col("cent_id").alias("cell"), "rn"
        )

    # one ranked assignment serves data cells (rn=1) AND query probes
    # (rn<=nprobe); persisted so the k-means lineage runs once, and keyed so
    # repeated searches (any nprobe, residual or not) reuse the assignment
    ranked = _cached_build(
        _plan_key(emb) + ("ivf_ranked", n_centroids, n_iters, id_col, vec_col),
        _build_ranked,
    )
    cells = ranked.filter(F.col("rn") == 1).select(id_col, "cell")
    qcells = ranked.filter(F.col("rn") <= nprobe).select(
        F.col(id_col).alias("query_id"), "cell"
    )
    if max_query_id is not None:
        qcells = qcells.filter(F.col("query_id") < max_query_id)
    cand = qcells.join(cells, "cell").filter(F.col(id_col) != F.col("query_id")).select(
        "query_id", id_col
    )

    if not residual:
        # identical keys to pq_topk: an ivfpq search after a plain-PQ search
        # (or vice versa) at the same (m, ksub, n_iters) retrains nothing
        pq_key = _plan_key(emb) + (m, ksub, n_iters, id_col, vec_col, dim)
        cents = _cached_build(
            pq_key + ("pq_cents",),
            lambda: pq_codebooks(emb, m, ksub, n_iters, id_col, vec_col, dim=dim),
        )
        codes = _cached_build(
            pq_key + ("pq_codes",),
            lambda: pq_encode(emb, cents, m, id_col, vec_col, dim=dim),
        )
        dtab = _adc_distance_table(emb, cents, m, dim, id_col, vec_col, max_query_id)
        return _adc_topk(codes, dtab, id_col, k, cand=cand)

    # --- residual encoding: subtract each vector's own coarse centroid
    # (rounded means -> the subtraction is elementwise and deterministic,
    # reproducible bit-for-bit in the SQL oracle)
    ccv = F.broadcast(coarse.select(F.col("cent_id").alias("cell"), "cv"))
    rbase = (
        ensure_min_parallelism(emb)
        .select(id_col, vec_col)
        .join(cells, id_col)
        .join(ccv, "cell")
        .select(
            id_col,
            F.zip_with(
                F.col(vec_col), F.col("cv"), lambda x, y: x.cast("double") - y
            ).alias("rvec"),
        )
    )
    # residual artifacts depend on the coarse quantizer too -> key includes
    # n_centroids and the residual marker (they can never alias plain-PQ)
    res_key = _plan_key(emb) + (n_centroids, m, ksub, n_iters, id_col, vec_col, dim, "residual")
    cents = _cached_build(
        res_key + ("pq_cents",),
        lambda: pq_codebooks(rbase, m, ksub, n_iters, id_col, "rvec", dim=dim),
    )
    # codes carry the vector's cell: ADC must score a candidate against the
    # query's distance table for THAT cell
    codes = _cached_build(
        res_key + ("pq_codes",),
        lambda: pq_encode(rbase, cents, m, id_col, "rvec", dim=dim).join(cells, id_col),
    )
    # per-(query, probed cell) residual -> distance table rows gain `cell`
    dsub = dim // m
    qres = (
        qcells.join(emb.select(F.col(id_col).alias("query_id"), vec_col), "query_id")
        .join(ccv, "cell")
        .select(
            "query_id",
            "cell",
            F.zip_with(
                F.col(vec_col), F.col("cv"), lambda x, y: x.cast("double") - y
            ).alias("rvec"),
        )
    )
    qsv = qres.select(
        "query_id",
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.slice(F.col("rvec"), j * dsub + 1, dsub).alias("qv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("query_id", "cell", F.col("s.sub").alias("sub"), F.col("s.qv").alias("qv"))
    dtab = qsv.join(F.broadcast(cents), "sub").select(
        "query_id",
        "cell",
        "sub",
        F.col("cent_id").alias("code"),
        _l2(F.col("qv"), F.col("cv")).alias("d"),
    )
    return _adc_topk(codes, dtab, id_col, k, cand=cand, join_keys=["cell", "sub", "code"])


def sq8_stats(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension [min, max] calibration for 8-bit scalar quantization
    (the FAISS ``SQ8`` codec re-expressed declaratively), returned as ONE
    row holding two dim-length double arrays ``(mns, mxs)``.

    The posexplode looks like a dim-fold blow-up, but hash aggregation
    over ``dim`` keys collapses it map-side (partial min/max per
    partition), so the exchange carries dim rows per partition — the
    calibration costs one scan at any corpus size and the artifact is a
    few hundred bytes, broadcast everywhere downstream.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import ensure_min_parallelism

    px = ensure_min_parallelism(emb).select(F.posexplode(F.col(vec_col)))
    st = px.groupBy("pos").agg(
        F.min(F.col("col").cast("double")).alias("mn"),
        F.max(F.col("col").cast("double")).alias("mx"),
    )
    return st.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))),
            lambda s: s.getField("mn"),
        ).alias("mns"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))),
            lambda s: s.getField("mx"),
        ).alias("mxs"),
    )


def sq8_encode(
    emb: DataFrame,
    stats: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector into a dim-length array of 8-bit codes
    ``floor((x − mn) / (mx − mn) * 255)`` clamped to [0, 255] (constant
    dims code to 0). Map-only against the broadcast one-row stats frame.

    Codes are kept as BIGINT so downstream distance arithmetic is EXACT
    integer math — the distinguishing property of this codec vs PQ/ADC:
    the quantized distance is engine- and partitioning-bit-exact with no
    float-fold ceremony. Storage story: 64 codes ≈ 64 bytes vs 256 raw
    float bytes (4x), and the scan that matters reads codes only.
    """
    d = F.zip_with(
        F.col(vec_col), F.col("mns"), lambda x, mn: x.cast("double") - mn
    )
    rng = F.zip_with(F.col("mxs"), F.col("mns"), lambda a, b: a - b)
    code = F.zip_with(
        d,
        rng,
        # greatest(0, ·) is a no-op for in-corpus encodes (x >= mn by
        # construction) but clamps out-of-range vectors encoded against
        # FROZEN calibration stats (the persisted-index append path)
        lambda dd, r: F.when(
            r > 0,
            F.greatest(F.lit(0), F.least(F.lit(255), F.floor(dd / r * 255.0))),
        )
        .otherwise(0)
        .cast("long"),
    )
    return emb.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), code.alias("code")
    )


def sq8_topk(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int | None = 10,
) -> DataFrame:
    """Approximate top-k under 8-bit scalar quantization: calibrate
    (:func:`sq8_stats`), encode corpus + queries (:func:`sq8_encode`),
    score every (query, neighbor) by EXACT integer squared distance over
    the code arrays, rank per query with the repo's deterministic
    (dist asc, neighbor_id asc) tie-break.

    The third codec in the ANN ladder next to IVF and PQ: SQ8 keeps
    per-dimension resolution (PQ shares centroids across a subspace), so
    it ranks better on anisotropic data at 4x compression, and its
    distances are BIGINT-exact — the only ANN path with a zero-epsilon
    oracle. Brute scan of codes = the baseline; cell-gating composes by
    intersecting with :func:`assign_cells` exactly as in IVF-PQ.

    At 100 TB: stats are one scan + a broadcast; the search scans codes
    only (no raw vectors in the search plan), queries broadcast against
    the corpus — the single shuffle is the per-query ranking window.
    """
    key = _plan_key(emb) + ("sq8", id_col, vec_col)
    stats = _cached_build(key + ("stats",), lambda: sq8_stats(emb, id_col, vec_col))
    codes = _cached_build(
        key + ("codes",), lambda: sq8_encode(emb, stats, id_col, vec_col)
    )
    qfilter = (
        F.lit(True) if max_query_id is None else F.col(id_col) < max_query_id
    )  # None = all-pairs; a null-literal compare would silently select 0 queries
    q = codes.filter(qfilter).select(
        F.col(id_col).alias("query_id"), F.col("code").alias("qc")
    )
    scored = (
        codes.select(F.col(id_col).alias("neighbor_id"), "code")
        .join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("qdist", _sq8_dist(F.col("qc"), F.col("code")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "qdist",
        )
    )


def _sq8_dist(a: Column, b: Column) -> Column:
    """Exact integer squared distance between two SQ8 code arrays — the
    zero-epsilon fold (BIGINT accumulator, no FP anywhere)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq8_ivf_topk(
    emb: DataFrame,
    n_centroids: int = 8,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int | None = 10,
    nprobe: int = 2,
    n_iters: int = 2,
) -> DataFrame:
    """IVF-gated SQ8 search: coarse k-means cells prune candidates (the
    ``ivf_topk`` gate, shared cache key → nprobe variants and plain IVF
    searches reuse ONE assignment), then integer SQ8 distances score only
    the survivors — IVF-PQ's shape with SQ8's zero-epsilon arithmetic.

    Each corpus vector lives in exactly one cell and a query probes
    ``nprobe`` DISTINCT cells, so no (query, neighbor) pair can appear
    twice — the rank window sees each candidate once.

    At 100 TB: the search scans codes ⋈ cells (both vec_id-keyed index
    artifacts — ``ann_index``-style persistence stores them side by side,
    bucketed on the id, so the join is co-located); the Q×nprobe probe
    list broadcasts, and per-query work is O(nprobe·N/C) code rows.
    """
    cents = kmeans_centroids(emb, n_centroids, n_iters, id_col, vec_col)
    cells = _cached_build(
        _plan_key(emb) + ("ivf_assign", n_centroids, n_iters, id_col, vec_col),
        lambda: _assign(emb, cents, id_col, vec_col),
    )
    key = _plan_key(emb) + ("sq8", id_col, vec_col)
    stats = _cached_build(key + ("stats",), lambda: sq8_stats(emb, id_col, vec_col))
    codes = _cached_build(
        key + ("codes",), lambda: sq8_encode(emb, stats, id_col, vec_col)
    )
    qfilter = F.lit(True) if max_query_id is None else F.col(id_col) < max_query_id
    qs = (
        emb.filter(qfilter)
        .join(F.broadcast(cents))
        .withColumn("cc", cosine(F.col(vec_col), F.col("cv")))
    )
    w_probe = Window.partitionBy(id_col).orderBy(F.col("cc").desc(), F.col("cent_id").asc())
    qp = (
        qs.withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= nprobe)
        .select(F.col(id_col).alias("query_id"), F.col("cent_id").alias("cell"))
    )
    qc = codes.filter(qfilter).select(
        F.col(id_col).alias("query_id"), F.col("code").alias("qcode")
    )
    q = qp.join(qc, "query_id")
    corpus = codes.join(cells.select(F.col(id_col), "cell"), id_col).select(
        F.col(id_col).alias("neighbor_id"), "code", "cell"
    )
    scored = (
        corpus.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("qdist", _sq8_dist(F.col("qcode"), F.col("code")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "qdist",
        )
    )
