"""DuckDB oracle SQL — the ANSI-SQL twin of every query in queries.py.

Built programmatically from the SAME constants the Spark implementations
use (minhash permutation params, language marker lists, stopword lists), so
sketch signatures match bit-for-bit. Conventions mirrored from queries.py:

- ``strftime(ts, '%Y-%m-%d %H:%M:%S')`` == Spark ``date_format`` w/ UTC tz
- decimal casts before every sum; final cast to DOUBLE
- explicit INTEGER casts where Spark emits int32 (size/length/row_number)
"""

from __future__ import annotations

from activecampaign_api_data_pipeline_spark.functions.text import LANG_MARKERS, STOPWORDS_EN
from activecampaign_api_data_pipeline_spark.operators.dedup import MINHASH_P, minhash_perm_params
from activecampaign_api_data_pipeline_spark.operators.similarity import srp_planes

TS = "strftime(ts, '%Y-%m-%d %H:%M:%S')"
DEC = "CAST({c} AS DECIMAL(18,2))"
ONE = "CAST(1 AS DECIMAL(18,2))"
HASH60 = "CAST(concat('0x', substr(md5({s}), 1, 15)) AS BIGINT)"

# shared: events with standard derived columns
EVENTS_STD = f"""
SELECT event_id, user_id, event_type, ts, {TS} AS ts_str,
       CAST(value AS DECIMAL(18,2)) AS value_dec, props
FROM events
"""

# shared: conformed union of events + orders (mirrors plans/chatter.py)
CONFORMED = """
SELECT 'events' AS source,
       concat_ws(':', 'ev', CAST(event_id AS VARCHAR)) AS event_id,
       user_id,
       ts AS event_ts,
       event_type,
       concat_ws(' ', 'Event:', event_type) AS title,
       concat_ws('=', 'k', regexp_extract(props, '"k":\\s*(\\d+)', 1)) AS detail,
       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS amount
FROM events
UNION ALL
SELECT 'orders',
       concat_ws(':', 'ord', CAST(o_orderkey AS VARCHAR)),
       o_custkey,
       o_orderdate,
       concat_ws('_', 'order', lower(o_orderstatus)),
       concat_ws(' ', 'Order', o_orderpriority),
       concat_ws('=', 'status', o_orderstatus),
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
FROM orders
"""

# shared: distinct word 3-gram shingles per document
SHINGLES = """
toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(generate_series(1, len(t) - 2),
                          i -> array_to_string(t[i:i+2], ' '))
         ) AS shingles
  FROM toks WHERE len(t) >= 3
)
"""


def _rowhash_expr(cols: list[str]) -> str:
    parts = ", ".join(f"coalesce(CAST({c} AS VARCHAR), '')" for c in cols)
    return f"md5(concat_ws('||', {parts}))"


def _cos(a: str, b: str) -> str:
    dot = f"list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"
    na = f"sqrt(list_sum(list_transform({a}, x -> x * x)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x * x)))"
    return f"({dot} / ({na} * {nb}))"


def _ivf_assign_parts(n_centroids: int | str, n_iters: int) -> list[str]:
    """CTE list ending in ``rf`` (per-(vector, centroid) ranking) and
    ``af`` (final cell assignment) — the deterministic k-means shared by
    the IVF search twin and the SemDeDup twin: seeds = first N by id,
    then ``n_iters`` Lloyd rounds (cosine argmax assignment, element-wise
    mean ROUNDED to 6 decimals — the rounding is what makes the centroids
    bit-identical across engines despite FP summation order).
    ``n_centroids`` may be an int literal or a SQL scalar expression
    (e.g. a count-derived subquery for proportional clustering)."""
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {n_centroids})",
    ]
    cur = "c0"
    for it in range(1, n_iters + 1):
        parts += [
            f"s{it} AS (SELECT e.vec_id, e.v, cent_id, {_cos('v', 'cv')} AS cc FROM e CROSS JOIN {cur})",
            f"""a{it} AS (SELECT vec_id, v, cent_id AS cell FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS rn FROM s{it}
) WHERE rn = 1)""",
            # element-wise mean: zip position/value unnests, avg per (cell, i)
            f"px{it} AS (SELECT cell, unnest(generate_series(1, len(v))) AS i, unnest(v) AS x FROM a{it})",
            f"cm{it} AS (SELECT cell, i, round(avg(x), 6) AS m FROM px{it} GROUP BY cell, i)",
            f"c{it} AS (SELECT cell AS cent_id, list(m ORDER BY i) AS cv FROM cm{it} GROUP BY cell)",
        ]
        cur = f"c{it}"
    parts += [
        f"sf AS (SELECT e.vec_id, e.v, cent_id, {_cos('v', 'cv')} AS cc FROM e CROSS JOIN {cur})",
        "rf AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS rn FROM sf)",
        "af AS (SELECT vec_id, v, cent_id AS cell FROM rf WHERE rn = 1)",
    ]
    return parts


def _ivf_sql(
    n_centroids: int = 8,
    k: int = 3,
    max_query_id: int = 10,
    nprobe: int = 1,
    n_iters: int = 2,
) -> str:
    """IVF top-k twin of operators.similarity.ivf_topk (assignment CTEs
    from :func:`_ivf_assign_parts`)."""
    parts = _ivf_assign_parts(n_centroids, n_iters)
    if nprobe <= 1:
        parts.append(
            f"q AS (SELECT vec_id AS query_id, v AS qv, cell FROM af WHERE vec_id < {max_query_id})"
        )
    else:
        parts.append(
            f"q AS (SELECT vec_id AS query_id, v AS qv, cent_id AS cell FROM rf "
            f"WHERE vec_id < {max_query_id} AND rn <= {nprobe})"
        )
    parts += [
        "c AS (SELECT vec_id AS neighbor_id, v AS nv, cell FROM af)",
        f"""p AS (
  SELECT query_id, neighbor_id, {_cos('qv', 'nv')} AS cos
  FROM q JOIN c USING (cell) WHERE neighbor_id <> query_id
)""",
        "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk FROM p)",
    ]
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rank, round(cos, 6) AS cos
FROM r WHERE rk <= {k}
"""


def _semantic_dedup_sql(n_centroids: int | str, n_iters: int, tau: float) -> str:
    """SemDeDup twin of operators.curation.semantic_dedup: the shared
    k-means assignment, then within-cell pairs with cos >= tau drop the
    higher id; survivors keep ``kept = 1``."""
    parts = _ivf_assign_parts(n_centroids, n_iters)
    parts += [
        "pa AS (SELECT vec_id AS id_a, v AS va, cell FROM af)",
        "pb AS (SELECT vec_id AS id_b, v AS vb, cell FROM af)",
        f"""dr AS (
  SELECT DISTINCT id_b AS vec_id
  FROM pa JOIN pb USING (cell)
  WHERE id_a < id_b AND {_cos('va', 'vb')} >= {tau}
)""",
    ]
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT af.vec_id, cell,
       CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM af LEFT JOIN dr ON af.vec_id = dr.vec_id
"""


def _l2_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _pq_parts(
    m: int,
    ksub: int,
    max_query_id: int,
    n_iters: int,
    src: str = "e",
    residual: bool = False,
    train_where: str | None = None,
) -> list[str]:
    """CTE list for the PQ stages (subvector split, per-subspace k-means,
    codes, query distance table) — shared by _pq_sql and _ivfpq_sql.
    Assumes a prior CTE ``e(vec_id, v)``; with ``src`` the training/encode
    vectors come from that CTE instead (residual mode trains on
    ``resid(vec_id, v)``). ``residual=True`` additionally expects
    ``qresid(query_id, cell, v)`` — per-(query, probed-cell) residuals —
    and emits a CELL-aware distance table. ``train_where`` restricts the
    k-means TRAINING rows (seeds + Lloyd rounds) while codes still encode
    every vector — the incremental-index twin (frozen codebooks, appended
    codes)."""
    parts = [
        "dimt AS (SELECT len(v) AS dim FROM e LIMIT 1)",
        f"""sv AS (
  SELECT vec_id, s.sub, v[s.sub * (dim // {m}) + 1 : (s.sub + 1) * (dim // {m})] AS sv
  FROM {src} CROSS JOIN dimt CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS sub) s
)""",
    ]
    svt = "sv"
    if train_where:
        parts.append(f"svtr AS (SELECT * FROM sv WHERE {train_where})")
        svt = "svtr"
    parts.append(
        f"c0 AS (SELECT sub, vec_id AS cent_id, sv AS cv FROM {svt} WHERE vec_id < {ksub})"
    )
    cur = "c0"
    for it in range(1, n_iters + 1):
        parts += [
            f"s{it} AS (SELECT {svt}.vec_id, {svt}.sub, {svt}.sv, cent_id, {_l2_sql(f'{svt}.sv', 'cv')} AS d FROM {svt} JOIN {cur} USING (sub))",
            f"""a{it} AS (SELECT vec_id, sub, sv, cent_id AS cell FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, cent_id ASC) AS rn FROM s{it}
) WHERE rn = 1)""",
            f"px{it} AS (SELECT sub, cell, unnest(generate_series(1, len(sv))) AS i, unnest(sv) AS x FROM a{it})",
            f"cm{it} AS (SELECT sub, cell, i, round(avg(x), 6) AS mv FROM px{it} GROUP BY sub, cell, i)",
            f"c{it} AS (SELECT sub, cell AS cent_id, list(mv ORDER BY i) AS cv FROM cm{it} GROUP BY sub, cell)",
        ]
        cur = f"c{it}"
    parts += [
        f"sf AS (SELECT sv.vec_id, sv.sub, sv.sv, cent_id, {_l2_sql('sv.sv', 'cv')} AS d FROM sv JOIN {cur} USING (sub))",
        """codes AS (SELECT vec_id, sub, cent_id AS code FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, cent_id ASC) AS rn FROM sf
) WHERE rn = 1)""",
    ]
    if residual:
        parts += [
            f"""qsv AS (
  SELECT query_id, cell, s.sub, v[s.sub * (dim // {m}) + 1 : (s.sub + 1) * (dim // {m})] AS qv
  FROM qresid CROSS JOIN dimt CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS sub) s
)""",
            f"dtab AS (SELECT query_id, cell, sub, cent_id AS code, {_l2_sql('qv', 'cv')} AS d FROM qsv JOIN {cur} USING (sub))",
        ]
    else:
        parts += [
            f"qsv AS (SELECT vec_id AS query_id, sub, sv AS qv FROM sv WHERE vec_id < {max_query_id})",
            f"dtab AS (SELECT query_id, sub, cent_id AS code, {_l2_sql('qv', 'cv')} AS d FROM qsv JOIN {cur} USING (sub))",
        ]
    return parts


_ADC_TAIL = """summed AS (SELECT query_id, neighbor_id, list_sum(list(d ORDER BY sub)) AS adist FROM terms GROUP BY query_id, neighbor_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rk FROM summed)"""


def _pq_sql(
    m: int = 4,
    ksub: int = 8,
    k: int = 3,
    max_query_id: int = 10,
    n_iters: int = 2,
) -> str:
    """PQ/ADC top-k twin of operators.similarity.pq_topk, sharing the
    deterministic per-subspace k-means (seeds = first ksub by id, L2
    argmin, 6-dp-rounded means) and summing the m ADC terms in sub order
    (list ordered by sub -> list_sum) so totals are bit-identical."""
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        *_pq_parts(m, ksub, max_query_id, n_iters),
        """terms AS (
  SELECT query_id, codes.vec_id AS neighbor_id, codes.sub, d
  FROM codes JOIN dtab USING (sub, code) WHERE codes.vec_id <> query_id
)""",
        _ADC_TAIL,
    ]
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rank, round(adist, 6) AS adist
FROM r WHERE rk <= {k}
"""


def _ivfpq_sql(
    n_centroids: int = 8,
    m: int = 4,
    ksub: int = 8,
    k: int = 3,
    max_query_id: int = 10,
    nprobe: int = 1,
    n_iters: int = 2,
    residual: bool = False,
    train_where: str | None = None,
    refine_r: int | None = None,
    delete_where: str | None = None,
) -> str:
    """IVF-PQ twin of operators.similarity.ivfpq_topk: the coarse k-means
    cell pyramid (cosine argmax, prefix g*) gates candidates; the shared
    PQ stages score only gated (query, neighbor) pairs. ``residual=True``
    mirrors the FAISS residual refinement — PQ trains on/encodes
    ``v − c(cell(v))`` and the distance table is per (query, probed
    cell), joined on the candidate's own cell. ``train_where`` restricts
    TRAINING (coarse + PQ seeds and Lloyd rounds) to a subset while final
    cell assignment and codes cover every vector — the twin of
    build-on-base + append_ann_index-on-the-rest. ``refine_r`` adds the
    FAISS refine tail (ann_index.ivfpq_refine_index): the top-``refine_r``
    ADC candidates are re-ranked by exact L2 over the raw vectors and the
    final top-``k`` is reported with the exact distance. ``delete_where``
    excludes matching corpus ids from CANDIDACY only (training, cells and
    codes still cover them) — the twin of ann_index tombstone deletion,
    where the ledger anti-join sits on the cells gate."""
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
    ]
    tsrc = "e"
    if train_where:
        parts.append(f"etr AS (SELECT * FROM e WHERE {train_where})")
        tsrc = "etr"
    parts.append(
        f"gc0 AS (SELECT vec_id AS cent_id, v AS cv FROM {tsrc} WHERE vec_id < {n_centroids})"
    )
    cur = "gc0"
    for it in range(1, n_iters + 1):
        parts += [
            f"gs{it} AS (SELECT {tsrc}.vec_id, {tsrc}.v, cent_id, {_cos('v', 'cv')} AS cc FROM {tsrc} CROSS JOIN {cur})",
            f"""ga{it} AS (SELECT vec_id, v, cent_id AS cell FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS rn FROM gs{it}
) WHERE rn = 1)""",
            f"gpx{it} AS (SELECT cell, unnest(generate_series(1, len(v))) AS i, unnest(v) AS x FROM ga{it})",
            f"gcm{it} AS (SELECT cell, i, round(avg(x), 6) AS mv FROM gpx{it} GROUP BY cell, i)",
            f"gc{it} AS (SELECT cell AS cent_id, list(mv ORDER BY i) AS cv FROM gcm{it} GROUP BY cell)",
        ]
        cur = f"gc{it}"
    parts += [
        f"gsf AS (SELECT e.vec_id, e.v, cent_id, {_cos('v', 'cv')} AS cc FROM e CROSS JOIN {cur})",
        "grf AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS rn FROM gsf)",
        "gcells AS (SELECT vec_id, cent_id AS cell FROM grf WHERE rn = 1)",
        f"gqc AS (SELECT vec_id AS query_id, cent_id AS cell FROM grf WHERE vec_id < {max_query_id} AND rn <= {nprobe})",
        f"""cand AS (
  SELECT query_id, gcells.vec_id AS cvid
  FROM gqc JOIN gcells USING (cell) WHERE gcells.vec_id <> query_id{
      f" AND NOT ({delete_where})" if delete_where else ""}
)""",
    ]
    if residual:
        parts += [
            f"""resid AS (
  SELECT grf.vec_id, list_transform(generate_series(1, len(grf.v)), i -> grf.v[i] - fc.cv[i]) AS v
  FROM grf JOIN {cur} fc ON grf.cent_id = fc.cent_id WHERE grf.rn = 1
)""",
            f"""qresid AS (
  SELECT grf.vec_id AS query_id, grf.cent_id AS cell,
         list_transform(generate_series(1, len(grf.v)), i -> grf.v[i] - fc.cv[i]) AS v
  FROM grf JOIN {cur} fc ON grf.cent_id = fc.cent_id
  WHERE grf.vec_id < {max_query_id} AND grf.rn <= {nprobe}
)""",
            *_pq_parts(m, ksub, max_query_id, n_iters, src="resid", residual=True),
            "codesc AS (SELECT codes.vec_id, gcells.cell, sub, code FROM codes JOIN gcells USING (vec_id))",
            """terms AS (
  SELECT dtab.query_id AS query_id, codesc.vec_id AS neighbor_id, codesc.sub, d
  FROM codesc JOIN dtab USING (cell, sub, code)
  JOIN cand ON cand.query_id = dtab.query_id AND cand.cvid = codesc.vec_id
)""",
            _ADC_TAIL,
        ]
    else:
        parts += [
            *_pq_parts(m, ksub, max_query_id, n_iters, train_where=train_where),
            """terms AS (
  SELECT dtab.query_id AS query_id, codes.vec_id AS neighbor_id, codes.sub, d
  FROM codes JOIN dtab USING (sub, code)
  JOIN cand ON cand.query_id = dtab.query_id AND cand.cvid = codes.vec_id
)""",
            _ADC_TAIL,
        ]
    if refine_r is not None:
        parts += [
            f"candr AS (SELECT query_id, neighbor_id FROM r WHERE rk <= {refine_r})",
            f"""ex AS (
  SELECT candr.query_id, candr.neighbor_id, {_l2_sql('eq.v', 'en.v')} AS dist
  FROM candr
  JOIN e en ON en.vec_id = candr.neighbor_id
  JOIN e eq ON eq.vec_id = candr.query_id
)""",
            "rr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS rk2 FROM ex)",
        ]
        ctes = ",\n".join(parts)
        return f"""
WITH {ctes}
SELECT query_id, neighbor_id, CAST(rk2 AS INTEGER) AS rank, round(dist, 6) AS dist
FROM rr WHERE rk2 <= {k}
"""
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rank, round(adist, 6) AS adist
FROM r WHERE rk <= {k}
"""


def _srp_sql(
    threshold: float = 0.9,
    n_bits: int = 8,
    n_bands: int = 8,
    dim: int = 64,
    seed: int = 7,
    plant_below: int | None = 50,
) -> str:
    """SRP-LSH near-dup twin of operators.similarity.srp_neardup_pairs,
    gating on the IDENTICAL ±1 hyperplanes (srp_planes is shared). Plane
    dot products fold the per-component terms IN COMPONENT ORDER
    (``list_sum(list(x*w ORDER BY j))`` — the same sequential fold as
    Spark's ``F.aggregate`` over ``zip_with``), so a sign bit whose true
    dot is ~0 cannot flip between engines and the candidate set matches
    bit-for-bit. ``plant_below``: mirror queries.sim_srp_neardup's
    planted near-dups (id + max(vec_id)+1, every other component
    × 1.001)."""
    planes = srp_planes(n_bits * n_bands, dim, seed)
    plane_rows = ", ".join(
        f"({p}, {j + 1}, {planes[p][j]})" for p in range(len(planes)) for j in range(dim)
    )
    if plant_below is not None:
        # planted copies live at id + max(id)+1 — data-derived so a corpus
        # of ANY size keeps planted ids disjoint from real ids (a fixed
        # literal offset would silently collide on both engines at once)
        e_cte = f"""base AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
e AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + (SELECT max(vec_id) + 1 FROM base) AS vec_id,
         list_transform(generate_series(1, len(v)), i -> v[i] * (1.0 + 0.001 * ((i - 1) % 2))) AS v
  FROM base WHERE vec_id < {plant_below}
)"""
    else:
        e_cte = "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

    # planes as a relation + vectorized join/group-sum (per-row inline list
    # dots are ~10 s in DuckDB at sf0.01; this form is sub-second)
    return f"""
WITH {e_cte},
planes(p, j, w) AS (VALUES {plane_rows}),
px AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS j, unnest(v) AS x FROM e),
dots AS (SELECT vec_id, p, list_sum(list(x * w ORDER BY j)) AS d FROM px JOIN planes USING (j) GROUP BY vec_id, p),
banded AS (
  SELECT vec_id, p // {n_bits} AS band,
         CAST(sum(CASE WHEN d >= 0 THEN (1 << (p % {n_bits})) ELSE 0 END) AS INTEGER) AS code
  FROM dots GROUP BY vec_id, p // {n_bits}
),
cand AS (
  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
  FROM banded l JOIN banded r ON l.band = r.band AND l.code = r.code AND l.vec_id < r.vec_id
),
pairs AS (
  SELECT id_a, id_b, {_cos('a.v', 'b.v')} AS cos
  FROM cand JOIN e a ON cand.id_a = a.vec_id JOIN e b ON cand.id_b = b.vec_id
)
SELECT id_a, id_b, round(cos, 6) AS cos FROM pairs WHERE cos >= {threshold}
"""


def _minhash_sql(num_perm: int = 32, bands: int = 8, threshold: float = 0.5) -> str:
    rows = num_perm // bands
    params = minhash_perm_params(num_perm)
    mins = ",\n      ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {MINHASH_P}))" for a, b in params
    )
    band_cols = " , ".join(
        f"CAST(sig[j*{rows}+{r+1}] AS VARCHAR)" for r in range(rows)
    )
    return f"""
WITH {SHINGLES},
hs AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {HASH60.format(s='s')} % {MINHASH_P}) AS h
  FROM sh WHERE len(shingles) > 0
),
sigs AS (
  SELECT doc_id, shingles,
         [{mins}] AS sig
  FROM hs
),
bands AS (
  SELECT doc_id, j, md5(concat_ws(',', {band_cols})) AS bh
  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS j) u
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.j = b.j AND a.bh = b.bh AND a.doc_id < b.doc_id
),
v AS (
  SELECT doc_a, doc_b,
         len(list_intersect(x.shingles, y.shingles)) AS ni,
         len(x.shingles) AS na, len(y.shingles) AS nb
  FROM cand JOIN hs x ON x.doc_id = cand.doc_a JOIN hs y ON y.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b, round(CAST(ni AS DOUBLE) / (na + nb - ni), 6) AS jaccard FROM v
) WHERE jaccard >= {threshold}
"""


def _simhash_sql(max_hamming: int = 3, chunks: int = 4) -> str:
    width = 60 // chunks
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(h, x -> (x >> {j}) & 1 = 1)) >= len(h) "
        f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {j})"
        for j in range(60)
    )
    chunk_rows = " UNION ALL ".join(
        f"SELECT doc_id, sig, {j} AS chunk, (sig >> {j * width}) & {(1 << width) - 1} AS cv FROM sigs"
        for j in range(chunks)
    )
    return f"""
WITH {SHINGLES},
hs AS (
  SELECT doc_id, list_transform(shingles, s -> {HASH60.format(s='s')}) AS h
  FROM sh
),
sigs AS (SELECT doc_id, {bit_terms} AS sig FROM hs),
chunked AS ({chunk_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def _lang_id_sql() -> str:
    branches = []
    for i, lg in enumerate(sorted(LANG_MARKERS)):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lg])
        branches.append(
            f"SELECT doc_id, lang, '{lg}' AS cand, {i} AS ord, "
            f"len(list_filter(toks, x -> x IN ({markers}))) AS score FROM t"
        )
    scores = "\n  UNION ALL ".join(branches)
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> lower(x)) AS toks
  FROM documents
),
s AS (
  {scores}
)
SELECT doc_id, lang, cand AS lang_pred FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, ord ASC) AS rn FROM s
) WHERE rn = 1
"""


def _corpus_prep_ctes() -> str:
    """WITH-body (t, s, pred, g) for the corpus-prep chain: lang-id gate +
    token-count gate + fingerprint column — shared by _corpus_prep_sql and
    _corpus_pipeline_sql."""
    branches = []
    for i, lg in enumerate(sorted(LANG_MARKERS)):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lg])
        branches.append(
            f"SELECT doc_id, '{lg}' AS cand, {i} AS ord, "
            f"len(list_filter(toks, x -> x IN ({markers}))) AS score FROM t"
        )
    scores = "\n  UNION ALL ".join(branches)
    fp = r"md5(regexp_replace(regexp_replace(lower(trim(text)), '[^\w\s]', '', 'g'), '\s+', ' ', 'g'))"
    return f"""
WITH t AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> lower(x)) AS toks
  FROM documents
),
s AS (
  {scores}
),
pred AS (
  SELECT doc_id, cand AS lang_pred FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, ord ASC) AS rn FROM s
  ) WHERE rn = 1
),
g AS (
  SELECT d.doc_id,
         CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS INTEGER) AS n_tokens,
         {fp} AS fp
  FROM documents d JOIN pred p USING (doc_id)
  WHERE p.lang_pred = 'en'
    AND len(regexp_split_to_array(trim(d.text), '\\s+')) >= 5
)"""


def _corpus_prep_sql() -> str:
    """Composed twin of queries.llm_corpus_prep: lang-id gate + token-count
    gate + fingerprint dedup (keep lowest doc_id)."""
    return f"""
{_corpus_prep_ctes()}
SELECT doc_id, n_tokens, fp FROM (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn FROM g
) WHERE rn = 1
"""


def _corpus_pipeline_sql() -> str:
    """Twin of queries.llm_corpus_pipeline: the prep chain's survivors ->
    hash split assignment -> overlapping token chunks, one statement."""
    split_case = (
        "CASE WHEN CAST(concat('0x', substr(md5(concat_ws('||', 'split', CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 < 9000 THEN 'train' "
        "WHEN CAST(concat('0x', substr(md5(concat_ws('||', 'split', CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 < 9500 THEN 'val' "
        "ELSE 'test' END"
    )
    return f"""
{_corpus_prep_ctes()},
kept AS (
  SELECT doc_id FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn FROM g
  ) WHERE rn = 1
),
base AS (
  SELECT d.doc_id, d.text, {split_case} AS split
  FROM documents d JOIN kept USING (doc_id)
),
btoks AS (
  -- guard on trim(text) <> '', NOT len(bt) > 0: DuckDB splits '' to ['']
  -- (len 1) while Spark's tokens() maps empty text to an empty array —
  -- len(bt) > 0 would emit a phantom 1-token empty chunk Spark never does
  SELECT doc_id, split, regexp_split_to_array(trim(text), '\\s+') AS bt
  FROM base WHERE trim(text) <> ''
),
bst AS (
  SELECT doc_id, split, bt,
         unnest(generate_series(1, CAST(greatest(len(bt) - 8, 1) AS INTEGER), 56)) AS start
  FROM btoks
)
SELECT doc_id, split,
       CAST((start - 1) // 56 AS INTEGER) AS chunk_id,
       CAST(len(bt[start : start + 63]) AS INTEGER) AS n_tokens,
       array_to_string(bt[start : start + 63], ' ') AS chunk_text
FROM bst
"""


def build_oracles() -> dict[str, str]:
    dec_ep = DEC.format(c="l_extendedprice")
    dec_di = DEC.format(c="l_discount")
    rev = f"{dec_ep} * ({ONE} - {dec_di})"
    stop = ", ".join(f"'{s}'" for s in STOPWORDS_EN)

    o: dict[str, str] = {}

    o["flagship_chatter"] = f"""
WITH unified AS ({CONFORMED}),
capped AS (
  SELECT * FROM (
    SELECT u.*, row_number() OVER (
      PARTITION BY user_id
      ORDER BY strftime(event_ts, '%Y-%m-%d %H:%M:%S') DESC, event_id DESC
    ) AS rn FROM unified u
  ) WHERE rn <= 20
),
dim AS (
  SELECT c_custkey AS user_id, c_name AS customer_name, n_name AS nation_name,
         c_mktsegment AS segment
  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
),
enr AS (
  SELECT capped.*, customer_name, nation_name, segment,
         coalesce(
           nullif(trim(concat_ws(' ', coalesce(customer_name, ''), coalesce(nation_name, ''))), ''),
           concat('user:', CAST(capped.user_id AS VARCHAR))
         ) AS contact_name
  FROM capped LEFT JOIN dim ON capped.user_id = dim.user_id
)
SELECT user_id, event_id,
       strftime(event_ts, '%Y-%m-%d %H:%M:%S') AS event_ts_str,
       event_type, title, detail, amount, customer_name, nation_name, segment, contact_name,
       concat_ws(' — ',
         strftime(event_ts, '%Y-%m-%d %H:%M:%S'),
         event_type,
         concat_ws(': ', title, nullif(detail, '')),
         contact_name
       ) AS chatter_line
FROM enr
"""

    o["w1_latest_per_key"] = f"""
WITH b AS ({EVENTS_STD})
SELECT user_id, event_id, event_type, ts_str, CAST(value_dec AS DOUBLE) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_str DESC, event_id DESC) AS rn FROM b)
WHERE rn = 1
"""

    o["w2_top3_per_user"] = f"""
WITH b AS ({EVENTS_STD})
SELECT user_id, event_id, event_type, ts_str
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_str DESC, event_id DESC) AS rn FROM b)
WHERE rn <= 3
"""

    o["w3_earliest3_per_user"] = f"""
WITH b AS ({EVENTS_STD})
SELECT user_id, event_id, event_type, ts_str
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_str ASC, event_id ASC) AS rn FROM b)
WHERE rn <= 3
"""

    hash_cols = ["event_id", "user_id", "event_type", "ts_str", "value_str", "props"]
    o["a1_exact_dedup"] = f"""
WITH base AS (
  SELECT event_id, user_id, event_type, {TS} AS ts_str,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value_str, props
  FROM events
),
doubled AS (SELECT * FROM base UNION ALL SELECT * FROM base),
hashed AS (SELECT *, {_rowhash_expr(hash_cols)} AS h FROM doubled),
ded AS (SELECT h, min(event_type) AS event_type FROM hashed GROUP BY h)
SELECT event_type, count(*) AS n FROM ded GROUP BY event_type
"""

    o["a4_watermark_max_id"] = (
        "SELECT max(event_id) AS max_id, count(*) AS n FROM events"
    )

    o["a5_set_rollup"] = f"""
WITH b AS ({EVENTS_STD})
SELECT user_id,
       array_to_string(list_sort(list_distinct(list(event_type))), ', ') AS event_types,
       count(*) AS n_events,
       CAST(sum(value_dec) AS DOUBLE) AS total_value
FROM b GROUP BY user_id
"""

    o["a6_contact_digest"] = f"""
WITH b AS ({EVENTS_STD}),
l AS (SELECT user_id, ts_str, event_id, concat_ws(' — ', ts_str, event_type) AS line FROM b),
a AS (SELECT user_id, list(line ORDER BY ts_str, event_id) AS ls FROM l GROUP BY user_id)
SELECT user_id,
       array_to_string(list_slice(ls, greatest(len(ls) - 2, 1), len(ls)), chr(10)) AS digest
FROM a
"""

    o["a_count_distinct"] = f"""
WITH e AS (SELECT event_id, user_id, event_type, {TS} AS ts_str FROM events)
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       min(ts_str) AS first_ts,
       max(ts_str) AS last_ts
FROM e GROUP BY event_type
"""

    o["a_percentiles"] = """
WITH p AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem),
r AS (
  SELECT l_returnflag, cents,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM p)
SELECT l_returnflag,
       CAST(min(CASE WHEN rn = ((n-1)*5) // 10 + 1 THEN cents END)
              * (10 - min(((n-1)*5) % 10))
          + coalesce(min(CASE WHEN rn = ((n-1)*5) // 10 + 2 THEN cents END),
                     min(CASE WHEN rn = ((n-1)*5) // 10 + 1 THEN cents END))
              * min(((n-1)*5) % 10) AS DOUBLE)
         / CAST(1000 AS DOUBLE) AS median_price,
       CAST(min(CASE WHEN rn = ((n-1)*9) // 10 + 1 THEN cents END)
              * (10 - min(((n-1)*9) % 10))
          + coalesce(min(CASE WHEN rn = ((n-1)*9) // 10 + 2 THEN cents END),
                     min(CASE WHEN rn = ((n-1)*9) // 10 + 1 THEN cents END))
              * min(((n-1)*9) % 10) AS DOUBLE)
         / CAST(1000 AS DOUBLE) AS p90_price,
       CAST(min(cents) AS DOUBLE) / CAST(100 AS DOUBLE) AS min_price,
       CAST(max(cents) AS DOUBLE) / CAST(100 AS DOUBLE) AS max_price
FROM r GROUP BY l_returnflag
"""

    o["a_rollup_revenue"] = """
SELECT coalesce(l_returnflag, '<all>') AS returnflag,
       coalesce(l_linestatus, '<all>') AS linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

    o["w_running_analytics"] = f"""
WITH e AS (SELECT event_id, user_id, event_type, {TS} AS ts_str,
                  CAST(value AS DECIMAL(18,2)) AS value_dec FROM events)
SELECT user_id, event_id, ts_str,
       CAST(sum(value_dec) OVER w AS DOUBLE) AS running_value,
       lag(event_type, 1) OVER w2 AS prev_type,
       lead(event_type, 1) OVER w2 AS next_type,
       CAST(row_number() OVER w2 AS BIGINT) AS seq
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_str, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w2 AS (PARTITION BY user_id ORDER BY ts_str, event_id)
"""

    o["j1_broadcast_enrich"] = f"""
SELECT p_brand, s_nationkey,
       CAST(sum({rev}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand, s_nationkey
"""

    o["j3_left_join_coalesce"] = """
SELECT o_orderkey,
       coalesce(nullif(trim(c_name), ''), concat('cust:', CAST(o_custkey AS VARCHAR))) AS customer_name,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey < 1000
"""

    o["j5_chained_lookup"] = """
SELECT event_id, user_id,
       coalesce(name1, name2, concat('user:', CAST(user_id AS VARCHAR))) AS resolved_name
FROM events
LEFT JOIN (SELECT c_custkey AS k1, c_name AS name1 FROM customer WHERE c_custkey % 3 = 0) l1
  ON user_id = k1
LEFT JOIN (SELECT c_custkey AS k2, c_name AS name2 FROM customer WHERE c_custkey % 3 = 1) l2
  ON user_id = k2
"""

    o["j_asof_last_order"] = f"""
WITH e AS (SELECT event_id, user_id, ts, {TS} AS ts_str FROM events),
o AS (
  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS last_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts_str, o.last_orderkey
FROM e ASOF LEFT JOIN o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""

    o["j_range_events_in_window"] = f"""
WITH e AS (SELECT event_id, user_id, ts, {TS} AS ts_str FROM events),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS win_start,
         ts + INTERVAL 2 HOUR AS win_end
  FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id, p.purchase_id, e.user_id, e.ts_str,
       strftime(p.win_start, '%Y-%m-%d %H:%M:%S') AS win_start_str
FROM e JOIN p
  ON e.user_id = p.user_id
 AND e.ts >= p.win_start AND e.ts < p.win_end
"""

    o["u2_conform_union"] = f"""
WITH unified AS ({CONFORMED})
SELECT source, event_type, count(*) AS n,
       CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
FROM unified GROUP BY source, event_type
"""

    o["u3_set_ops_users"] = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03 00:00:00'
"""

    o["p2_rowhash"] = f"""
WITH base AS (
  SELECT event_id, user_id, event_type, {TS} AS ts_str,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value_str, props
  FROM events
)
SELECT event_id, {_rowhash_expr(hash_cols)} AS row_hash FROM base
"""

    o["p3_id_from_url"] = r"""
WITH b AS (
  SELECT doc_id,
         concat('https://example.com/api/3/docs/', CAST(doc_id AS VARCHAR),
                CASE WHEN doc_id % 2 = 0 THEN '?x=1' ELSE '' END) AS url
  FROM documents
)
SELECT doc_id, url,
       coalesce(
         TRY_CAST(trim(nullif(regexp_extract(url, '/(\d+)(?:\?|$)', 1), '')) AS BIGINT),
         -1
       ) AS extracted_id
FROM b
"""

    o["p8_sentinel_cleanup"] = f"""
WITH b AS (
  SELECT event_id, regexp_extract(props, '"k":\\s*(\\d+)', 1) AS k, {TS} AS ts_str
  FROM events
),
c AS (
  SELECT event_id,
         CASE WHEN trim(k) IN ('', '0', 'None', 'nan') THEN NULL ELSE trim(k) END AS k_clean,
         ts_str
  FROM b
)
SELECT event_id, k_clean,
       coalesce(nullif(trim(k_clean), ''), nullif(trim(ts_str), '')) AS picked
FROM c
"""

    o["p_scalar_derivations"] = """
SELECT c_custkey,
       coalesce(TRY_CAST(trim(CAST(c_name AS VARCHAR)) AS BIGINT), 0) AS name_as_int,
       coalesce(
         CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'Auto' WHEN 'BUILDING' THEN 'Bldg' END,
         c_mktsegment
       ) AS segment_label,
       coalesce(
         nullif(trim(concat_ws(' ', coalesce(c_name, ''), coalesce(n_name, ''))), ''),
         'unknown'
       ) AS display_name
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
"""

    dec_q = DEC.format(c="l_quantity")
    dec_tax = DEC.format(c="l_tax")
    disc_price = f"CAST({rev} AS DECIMAL(18,4))"
    o["f6_json_extraction"] = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_path,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_typed,
       to_json(struct_pack(t := event_type, k := CAST(json_extract(props, '$.k') AS INTEGER))) AS rejson
FROM events
"""

    o["p9_event_id_synth"] = f"""
WITH e AS (SELECT event_id, user_id, event_type, {TS} AS ts_str FROM events),
m AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN '' ELSE CAST(event_id AS VARCHAR) END AS rid,
         md5(concat_ws('||',
             coalesce(CAST(user_id AS VARCHAR), ''),
             coalesce(event_type, ''),
             coalesce(ts_str, ''))) AS h
  FROM e
)
SELECT event_id,
       concat_ws(':', 'ev', CASE WHEN rid IS NULL OR trim(rid) = '' THEN h ELSE rid END) AS synth_id
FROM m
"""

    o["q1_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum({dec_q}) AS DOUBLE) AS sum_qty,
       CAST(sum({dec_ep}) AS DOUBLE) AS sum_base_price,
       CAST(sum({disc_price}) AS DOUBLE) AS sum_disc_price,
       CAST(sum({disc_price} * ({ONE} + {dec_tax})) AS DOUBLE) AS sum_charge,
       CAST(sum({dec_q}) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum({dec_ep}) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum({dec_di}) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

    o["q3_shipping_priority"] = f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
       CAST(sum({rev}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

    o["q5_revenue_by_nation"] = f"""
SELECT n_name,
       CAST(sum({rev}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""

    # medallion gold snapshot == latest event per user with explicit total
    # order (the run split/overlap and hash-dedup are invisible in the
    # observable state — that is exactly the T2 idempotency claim)
    o["k2_medallion_snapshot"] = f"""
WITH e AS (SELECT event_id, user_id, event_type, {TS} AS ts_str FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts_str DESC, event_id DESC) AS rn
  FROM e
)
SELECT user_id, event_id, event_type, ts_str FROM r WHERE rn = 1
"""

    # time-travel twin: gold AS OF run 1 == latest-per-user over run 1's
    # rows only (event_id % 3 != 1 is the staging filter in the query)
    o["k_gold_asof"] = f"""
WITH e AS (SELECT event_id, user_id, event_type, {TS} AS ts_str FROM events
           WHERE event_id % 3 != 1),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts_str DESC, event_id DESC) AS rn
  FROM e
)
SELECT user_id, event_id, event_type, ts_str FROM r WHERE rn = 1
"""

    o["q_anti_join"] = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""

    o["q_semi_join"] = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND o_orderstatus = 'O'
)
"""

    o["t_window_hourly"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""
    # the streaming runs must land on the identical result as the batch twin
    # (complete-mode memory harness AND the production-shaped append/
    # foreachBatch/parquet path — sentinel-flushed, so nothing stays open)
    o["t_stream_window_hourly"] = o["t_window_hourly"]
    o["t_stream_append"] = o["t_window_hourly"]

    # stream-stream interval join: every (purchase, click) pair for the
    # same user with the click inside the preceding hour — the emitted set
    # of an inner stream-stream join is batch-boundary-independent
    o["t_stream_interval_join"] = """
SELECT l.user_id,
       l.event_id AS purchase_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       r.event_id AS click_id,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'purchase' AND r.event_type = 'click'
 AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
"""

    # stateful streaming top-N: the latest update-mode emission per key
    # after the stream drains equals the batch rank over all rows
    o["t_stream_topn"] = """
SELECT user_id, event_id, CAST(value AS DOUBLE) AS value, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
  FROM events
) WHERE rnk <= 3
"""

    # streaming dedup: planted full-row duplicate copies must all be
    # swallowed, every original row kept once -> the distinct corpus
    # (event_id is unique in the source, so this IS one-row-per-event)
    o["t_stream_dedup"] = """
SELECT event_id, user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       CAST(value AS DOUBLE) AS value
FROM events
"""

    # two-run watermarked replay must equal ONE full pass (T1/T2)
    o["t_incremental_replay"] = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY o_orderstatus
"""

    # session_window batch twin: gaps-and-islands. A new session starts when
    # the gap to the previous event is >= 30 min (Spark merges event windows
    # [ts, ts+gap) on OVERLAP, so an exact-gap successor does NOT merge);
    # session end = last event + gap. Tie order within equal ts is
    # irrelevant: a 0 gap never opens an island.
    o["t_sessionize"] = """
WITH l AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM l
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""

    o["w_rank_family"] = f"""
SELECT user_id, event_id, {TS} AS ts_str,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       round(percent_rank() OVER w, 6) AS prnk,
       round(cume_dist() OVER w, 6) AS cdist,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""

    # pinned-type pivot == conditional aggregation (null when a user has no
    # rows of that type, matching Spark's pivot-sum)
    pivot_cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS {t}"
        for t in ("click", "error", "purchase", "signup", "view")
    )
    o["a_pivot_events"] = f"""
SELECT user_id,
       {pivot_cols}
FROM events GROUP BY user_id
"""

    o["u_unpivot_events"] = f"""
WITH wide AS (
SELECT user_id,
       {pivot_cols}
FROM events GROUP BY user_id
)
SELECT user_id, event_type, total
FROM (UNPIVOT wide ON click, error, purchase, signup, view INTO NAME event_type VALUE total)
"""

    o["q_correlated_decorrelation"] = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(18,2)) = (
    SELECT max(CAST(o2.o_totalprice AS DECIMAL(18,2)))
    FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
"""

    o["a_cube_events"] = """
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(d, '<all>') AS d,
       CAST(GROUPING(event_type, d) AS BIGINT) AS gid,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS d, value FROM events)
GROUP BY CUBE (event_type, d)
"""

    o["dedup_exact_fingerprint"] = r"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(lower(trim(text)), '[^\w\s]', '', 'g'), '\s+', ' ', 'g')) AS fp
FROM documents
"""

    o["dedup_minhash_lsh"] = _minhash_sql(num_perm=32, bands=8, threshold=0.5)

    # pairs -> exact transitive closure (recursive CTE) -> min-id canonical;
    # the Spark side reaches the same fixpoint by min-label propagation
    o["dedup_cluster_canonical"] = f"""
WITH RECURSIVE pairs AS ({_minhash_sql(num_perm=32, bands=8, threshold=0.5)}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
),
canon AS (SELECT u AS doc_id, min(v) AS canonical_id FROM reach GROUP BY u)
SELECT d.doc_id,
       coalesce(c.canonical_id, d.doc_id) AS canonical_id,
       CAST(coalesce(c.canonical_id, d.doc_id) = d.doc_id AS INTEGER) AS is_kept
FROM documents d LEFT JOIN canon c USING (doc_id)
"""

    # mirrors ngram_jaccard_pairs(max_df=1000): hot shingles (df > 1000)
    # are cut BEFORE the pairwise join, from intersections AND set sizes
    o["dedup_ngram_jaccard"] = f"""
WITH {SHINGLES},
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
dfc AS (SELECT shingle FROM (SELECT shingle, count(*) AS c FROM ex GROUP BY shingle) WHERE c <= 1000),
kept AS (SELECT doc_id, list(shingle) AS shingles FROM ex JOIN dfc USING (shingle) GROUP BY doc_id)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))),
           6
         ) AS jaccard
  FROM kept a JOIN kept b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.1
"""

    o["dedup_simhash"] = _simhash_sql(max_hamming=3, chunks=4)

    emb = "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
    o["sim_cosine_topk"] = f"""
{emb},
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, v AS nv FROM e),
p AS (
  SELECT query_id, neighbor_id, {_cos('qv', 'nv')} AS cos
  FROM q CROSS JOIN c WHERE neighbor_id <> query_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk FROM p)
SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rank, round(cos, 6) AS cos
FROM r WHERE rk <= 5
"""

    o["sim_ivf_topk"] = _ivf_sql(n_centroids=8, k=3, max_query_id=10, nprobe=1, n_iters=2)
    o["sim_ivf_nprobe2"] = _ivf_sql(n_centroids=8, k=3, max_query_id=10, nprobe=2, n_iters=2)
    o["sim_pq_topk"] = _pq_sql(m=4, ksub=8, k=3, max_query_id=10, n_iters=2)
    o["sim_ivfpq_topk"] = _ivfpq_sql(
        n_centroids=8, m=4, ksub=8, k=3, max_query_id=10, nprobe=2, n_iters=2
    )
    o["sim_ivfpq_residual"] = _ivfpq_sql(
        n_centroids=8, m=4, ksub=8, k=3, max_query_id=10, nprobe=2, n_iters=2,
        residual=True,
    )
    # the persisted-index searches are bit-identical to the in-session
    # operator at the same parameters (parquet round-trips of doubles/ints
    # are exact), so they share the _ivfpq_sql twin — only nprobe differs
    o["sim_ivfpq_from_index"] = _ivfpq_sql(
        n_centroids=8, m=4, ksub=8, k=3, max_query_id=10, nprobe=2, n_iters=2
    )
    o["sim_ann_index_nprobe1"] = _ivfpq_sql(
        n_centroids=8, m=4, ksub=8, k=3, max_query_id=10, nprobe=1, n_iters=2
    )
    # incremental index: TRAIN on the first 80 % of ids only, append-encode
    # the rest with frozen artifacts — the twin restricts the Lloyd rounds
    # to the training subset while assignment/codes cover every vector
    o["sim_ann_index_append"] = _ivfpq_sql(
        n_centroids=8, m=4, ksub=8, k=3, max_query_id=10, nprobe=2, n_iters=2,
        train_where="vec_id < (SELECT (max(vec_id) * 4) // 5 FROM embeddings)",
    )
    o["sim_ann_index_refine"] = _ivfpq_sql(
        n_centroids=8, m=4, ksub=8, k=3, max_query_id=10, nprobe=2, n_iters=2,
        refine_r=10,
    )

    o["sim_srp_neardup"] = _srp_sql(
        threshold=0.9, n_bits=8, n_bands=8, dim=64, seed=7, plant_below=50
    )

    o["sim_embedding_neardup"] = f"""
{emb},
a AS (SELECT vec_id AS id_a, v AS va FROM e),
b AS (SELECT vec_id AS id_b, v AS vb FROM e)
SELECT id_a, id_b, round(cos, 6) AS cos FROM (
  SELECT id_a, id_b, {_cos('va', 'vb')} AS cos
  FROM a JOIN b ON id_a < id_b
) WHERE cos >= 0.4
"""

    # multimodal stubs: byte semantics of the fake decode are ASCII-exact
    o["mm_frame_sample"] = """
WITH m AS (
  SELECT doc_id AS media_id, n_chars * 10 AS dur, octet_length(encode(text)) AS clen
  FROM documents
),
f AS (SELECT media_id, dur // 500 AS nf, clen FROM m WHERE dur // 500 >= 1),
x AS (SELECT media_id, nf, clen, unnest(generate_series(0, nf - 1)) AS i FROM f)
SELECT media_id,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(i * 500 AS INTEGER) AS ts_ms,
       CAST(clen // nf AS INTEGER) AS frame_len
FROM x
"""

    o["mm_image_features"] = """
WITH m AS (
  SELECT doc_id AS media_id, text, 16 * (n_chars // 16) AS np
  FROM documents WHERE n_chars // 16 >= 1
),
i AS (SELECT media_id, np, text, unnest(generate_series(1, np)) AS pos FROM m),
v AS (SELECT media_id, np, least(ord(substr(text, CAST(pos AS INTEGER), 1)) // 16, 15) AS bin FROM i)
SELECT media_id, CAST(bin AS INTEGER) AS bin,
       round(CAST(count(*) AS DOUBLE) / np, 6) AS frac
FROM v GROUP BY media_id, bin, np
"""

    # mirrors audio_window_energy(window_ms=25): 200-sample windows of
    # unsigned-8-bit PCM, rms = sqrt(mean(((byte-128)/128)^2)); ord() ==
    # byte value on the pure-ASCII corpus
    o["mm_audio_energy"] = """
WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
w AS (SELECT media_id, text, n // 200 AS n_win FROM m WHERE n // 200 >= 1),
i AS (SELECT media_id, text, unnest(generate_series(0, n_win - 1)) AS widx FROM w),
s AS (SELECT media_id, widx, text, unnest(generate_series(1, 200)) AS k FROM i),
v AS (SELECT media_id, widx,
             (ord(substr(text, CAST(widx * 200 + k AS INTEGER), 1)) - 128.0) / 128.0 AS x
      FROM s)
SELECT media_id, CAST(widx AS INTEGER) AS window_idx, round(sqrt(avg(x * x)), 6) AS rms
FROM v GROUP BY media_id, widx
"""

    # acoustic fingerprints: 2ms windows (16 samples at sr=8000), RMS
    # rounded to 6dp, q = floor(rms*16), 4-window shingle md5s, postings
    # pair join with hot cap df > 100, shared >= 3
    o["mm_audio_neardup"] = """
WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
w AS (SELECT media_id, text, n // 16 AS n_win FROM m WHERE n // 16 >= 1),
i AS (SELECT media_id, text, unnest(generate_series(0, n_win - 1)) AS widx FROM w),
s AS (SELECT media_id, widx, text, unnest(generate_series(1, 16)) AS k FROM i),
v AS (SELECT media_id, widx,
             (ord(substr(text, CAST(widx * 16 + k AS INTEGER), 1)) - 128.0) / 128.0 AS x
      FROM s),
e AS (SELECT media_id, widx, round(sqrt(avg(x * x)), 6) AS rms
      FROM v GROUP BY media_id, widx),
q AS (SELECT media_id, widx, CAST(floor(rms * 16) AS INTEGER) AS qv FROM e),
l AS (SELECT media_id, list(qv ORDER BY widx) AS ql FROM q GROUP BY media_id),
fp0 AS (
  SELECT media_id,
         unnest(list_transform(generate_series(1, len(ql) - 3),
                i -> md5(concat_ws(',', ql[i], ql[i+1], ql[i+2], ql[i+3])))) AS fp
  FROM l WHERE len(ql) >= 4
),
f AS (SELECT DISTINCT media_id, fp AS fh FROM fp0),
sizes AS (SELECT media_id, count(*) AS nf FROM f GROUP BY media_id),
hot AS (SELECT fh FROM (SELECT fh, count(*) AS df FROM f GROUP BY fh) WHERE df > 100),
cold AS (SELECT f.* FROM f ANTI JOIN hot USING (fh)),
sh AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b, count(*) AS shared
  FROM cold a JOIN cold b ON a.fh = b.fh AND a.media_id < b.media_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(shared AS INTEGER) AS shared,
       round(CAST(shared AS DOUBLE) / least(sa.nf, sb.nf), 6) AS containment
FROM sh JOIN sizes sa ON sh.id_a = sa.media_id
        JOIN sizes sb ON sh.id_b = sb.media_id
WHERE shared >= 3
"""

    # mirrors sample_frames(every_ms=500) + frame_dedup_pairs(min_shared=2,
    # max_df=100): n_frames = duration_ms // 500, frame = fixed byte slice,
    # fh = md5 (ASCII corpus: string md5 == binary md5), distinct per media
    o["mm_video_neardup"] = """
WITH m AS (
  SELECT doc_id AS media_id, text, length(text) AS len, (n_chars * 10) // 500 AS n_frames
  FROM documents
),
w AS (SELECT media_id, text, len // greatest(n_frames, 1) AS fb, n_frames FROM m WHERE n_frames > 0),
f AS (
  SELECT DISTINCT media_id,
         md5(substr(text, CAST(idx * fb + 1 AS INTEGER), CAST(fb AS INTEGER))) AS fh
  FROM w CROSS JOIN LATERAL (SELECT unnest(generate_series(0, CAST(n_frames - 1 AS INTEGER))) AS idx) i
),
sizes AS (SELECT media_id, count(*) AS nf FROM f GROUP BY media_id),
hot AS (SELECT fh FROM (SELECT fh, count(*) AS df FROM f GROUP BY fh) WHERE df > 100),
cold AS (SELECT f.* FROM f ANTI JOIN hot USING (fh)),
sh AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b, count(*) AS shared
  FROM cold a JOIN cold b ON a.fh = b.fh AND a.media_id < b.media_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(shared AS INTEGER) AS shared,
       round(CAST(shared AS DOUBLE) / least(sa.nf, sb.nf), 6) AS containment
FROM sh JOIN sizes sa ON sa.media_id = id_a JOIN sizes sb ON sb.media_id = id_b
WHERE shared >= 2
"""

    o["text_quality"] = f"""
WITH t AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
)
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_actual,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / CAST(len(toks) AS INTEGER) AS avg_token_len,
       round(
         CAST(len(list_filter(list_transform(toks, x -> lower(x)), x -> x IN ({stop}))) AS DOUBLE)
         / CAST(len(toks) AS INTEGER),
         6
       ) AS stopword_ratio,
       round(
         CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
         / length(text),
         6
       ) AS punct_ratio
FROM t
"""

    o["text_lang_id"] = _lang_id_sql()

    o["llm_corpus_prep"] = _corpus_prep_sql()
    o["llm_corpus_pipeline"] = _corpus_pipeline_sql()

    o["text_winnowing"] = f"""
WITH n AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
h AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(t) - 4, 0)),
                        i -> {HASH60.format(s="substr(t, CAST(i AS INTEGER), 5)")}) AS hs
  FROM n
),
wmin AS (
  SELECT doc_id,
         list_distinct(
           list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
                          i -> list_min(hs[i:i+3]))
         ) AS fps
  FROM h
)
SELECT doc_id, unnest(fps) AS fp FROM wmin WHERE len(fps) > 0
"""

    # hash60('split||<id>') % 10000 -> cumulative weight ranges (.9/.05/.05)
    o["llm_split_assign"] = """
SELECT doc_id,
       CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val' ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(concat_ws('||', 'split', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 AS b
  FROM documents
)
"""

    # 64-token windows advancing by 56 (8-token overlap); last start is the
    # largest s <= len - overlap so a chunk always adds new tokens
    # guard on trim(text) <> '', NOT len(t) > 0: DuckDB splits '' to ['']
    # (len 1, so the length guard passes) while Spark's tokens() maps empty
    # text to an empty array and emits no chunk at all
    o["llm_token_chunks"] = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
),
st AS (
  SELECT doc_id, t,
         unnest(generate_series(1, CAST(greatest(len(t) - 8, 1) AS INTEGER), 56)) AS start
  FROM toks
)
SELECT doc_id,
       CAST((start - 1) // 56 AS INTEGER) AS chunk_id,
       CAST(start AS INTEGER) AS start,
       CAST(len(t[start : start + 63]) AS INTEGER) AS n_tokens,
       array_to_string(t[start : start + 63], ' ') AS chunk_text
FROM st
"""

    # hash-split the corpus, df-cap shingles across BOTH splits, then flag
    # (train, test) pairs by containment |A∩B| / |B| of the held-out doc
    o["llm_decontaminate"] = r"""
WITH sp AS (
  SELECT doc_id, text,
         CASE WHEN CAST(concat('0x', substr(md5(concat_ws('||', 'split', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 < 9000
              THEN 'train' ELSE 'other' END AS grp
  FROM documents
),
toks AS (SELECT doc_id, grp, regexp_split_to_array(trim(text), '\s+') AS t FROM sp),
sh AS (
  SELECT doc_id, grp,
         list_distinct(
           list_transform(generate_series(1, len(t) - 2),
                          i -> array_to_string(t[i:i+2], ' '))
         ) AS shingles
  FROM toks WHERE len(t) >= 3
),
ex AS (SELECT doc_id, grp, unnest(shingles) AS shingle FROM sh),
hot AS (SELECT shingle FROM (SELECT shingle, count(*) AS c FROM ex GROUP BY shingle) WHERE c > 1000),
exk AS (SELECT ex.* FROM ex ANTI JOIN hot USING (shingle)),
tr AS (SELECT doc_id AS train_id, shingle FROM exk WHERE grp = 'train'),
te AS (SELECT doc_id AS test_id, shingle FROM exk WHERE grp <> 'train'),
tsz AS (SELECT test_id, count(*) AS n_test FROM te GROUP BY test_id),
cm AS (SELECT train_id, test_id, count(*) AS n_common FROM tr JOIN te USING (shingle) GROUP BY train_id, test_id)
SELECT train_id, test_id, n_common,
       round(n_common / CAST(n_test AS DOUBLE), 6) AS containment
FROM cm JOIN tsz USING (test_id)
WHERE round(n_common / CAST(n_test AS DOUBLE), 6) >= 0.5
"""

    o["text_token_counts"] = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INTEGER) AS bpe_ish_tokens
FROM documents
"""

    # Gopher-style repetition: dup-bigram fraction (1 - distinct/total
    # word 2-grams) + top-token fraction (mode count / tokens, case-folded)
    o["text_repetition"] = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents
),
g AS (
  SELECT doc_id, t,
         list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                        i -> t[i] || ' ' || t[i+1]) AS bigrams,
         list_transform(t, x -> lower(x)) AS lt
  FROM toks
)
SELECT doc_id,
       round(CASE WHEN len(bigrams) > 0
             THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
             ELSE 0.0 END, 6) AS dup_bigram_frac,
       round(CASE WHEN len(lt) > 0
             THEN CAST(list_aggregate(list_transform(list_distinct(lt),
                        d -> len(list_filter(lt, x -> x = d))), 'max') AS DOUBLE) / len(lt)
             ELSE 0.0 END, 6) AS top_token_frac
FROM g
"""

    # concat-and-chunk packing: shard = hash60('pack'||id) % 8, running
    # token offset per shard, sequence = start // 256
    o["llm_pack_sequences"] = r"""
WITH toks AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
         CAST(concat('0x', substr(md5(concat_ws('||', 'pack', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8 AS shard
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS BIGINT) AS start_off
  FROM toks
)
SELECT doc_id, shard, n_tokens,
       start_off // 256 AS seq_in_shard,
       start_off % 256 AS offset_in_seq
FROM c
"""

    # per-language mixture resampling; rate constants mirror
    # queries.MIXTURE_RATES (en 0.4x down-sample, zh 2.5x epochs, de
    # 1.25x), bucket = hash60('mix'||id) % 10000
    o["llm_mixture_sample"] = r"""
WITH b AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(concat_ws('||', 'mix', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 AS bucket
  FROM documents
),
n AS (
  SELECT doc_id, lang,
         CASE lang
           WHEN 'de' THEN 1 + CASE WHEN bucket < 2500 THEN 1 ELSE 0 END
           WHEN 'en' THEN 0 + CASE WHEN bucket < 4000 THEN 1 ELSE 0 END
           WHEN 'zh' THEN 2 + CASE WHEN bucket < 5000 THEN 1 ELSE 0 END
           ELSE 1 END AS n_copies
  FROM b
)
SELECT doc_id, lang, CAST(unnest(generate_series(1, n_copies)) AS INTEGER) AS copy_id
FROM n WHERE n_copies > 0
"""

    # KMV distinct sketch per language over whitespace tokens: k=32
    # smallest distinct hash60 values; estimate (k-1)*2^60/h_k, exact
    # count when the group has fewer than k distinct hashes
    o["a_kmv_distinct_tokens"] = r"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
h AS (
  SELECT DISTINCT lang,
         CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS _h
  FROM toks
),
r AS (
  SELECT lang, _h,
         row_number() OVER (PARTITION BY lang ORDER BY _h ASC) AS rn
  FROM h
),
agg AS (
  SELECT lang, max(_h) AS kth, CAST(count(*) AS INTEGER) AS k_eff
  FROM r WHERE rn <= 32 GROUP BY lang
)
SELECT lang, k_eff,
       CASE WHEN k_eff < 32 THEN CAST(k_eff AS DOUBLE)
            ELSE round(CAST(k_eff - 1 AS DOUBLE) * 1152921504606846976.0 / CAST(kth AS DOUBLE), 4)
       END AS distinct_est
FROM agg
"""

    # proportional-clusters DEFAULT (constant ~64-vector cells): C is the
    # same count-derived expression the operator computes, so the oracle
    # tracks it at any SF — the linear configuration is the checked one
    o["sim_semantic_dedup"] = _semantic_dedup_sql(
        n_centroids="(SELECT greatest(1, CAST(ceil(count(*) / 64.0) AS BIGINT)) FROM e)",
        n_iters=2,
        tau=0.5,
    )

    # SCD2 validity intervals: lead(ts) over the version order; NULL
    # valid_to marks the current row
    o["w_scd2_intervals"] = f"""
SELECT user_id,
       event_type AS state,
       {TS} AS valid_from,
       strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
       CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current,
       event_id AS version_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""

    # repetition gate -> mixture resample -> pack copies; pack identity is
    # the string 'doc_id#copy_id' (bytewise order in both engines)
    o["llm_curation_pipeline"] = r"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents
),
g AS (
  SELECT doc_id, lang, CAST(len(t) AS BIGINT) AS n_tokens,
         list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                        i -> t[i] || ' ' || t[i+1]) AS bigrams,
         list_transform(t, x -> lower(x)) AS lt
  FROM toks
),
m AS (
  SELECT doc_id, lang, n_tokens,
         round(CASE WHEN len(bigrams) > 0
               THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
               ELSE 0.0 END, 6) AS dup,
         round(CASE WHEN len(lt) > 0
               THEN CAST(list_aggregate(list_transform(list_distinct(lt),
                          d -> len(list_filter(lt, x -> x = d))), 'max') AS DOUBLE) / len(lt)
               ELSE 0.0 END, 6) AS top
  FROM g
),
gated AS (SELECT doc_id, lang, n_tokens FROM m WHERE dup <= 0.05 AND top <= 0.12),
b AS (
  SELECT *,
         CAST(concat('0x', substr(md5(concat_ws('||', 'mix', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 AS bucket
  FROM gated
),
n AS (
  SELECT doc_id, lang, n_tokens,
         CASE lang
           WHEN 'de' THEN 1 + CASE WHEN bucket < 2500 THEN 1 ELSE 0 END
           WHEN 'en' THEN 0 + CASE WHEN bucket < 4000 THEN 1 ELSE 0 END
           WHEN 'zh' THEN 2 + CASE WHEN bucket < 5000 THEN 1 ELSE 0 END
           ELSE 1 END AS n_copies
  FROM b
),
cp AS (
  SELECT doc_id, lang, n_tokens,
         CAST(unnest(generate_series(1, n_copies)) AS INTEGER) AS copy_id
  FROM n WHERE n_copies > 0
),
pk AS (
  SELECT doc_id, copy_id, n_tokens,
         concat_ws('#', CAST(doc_id AS VARCHAR), CAST(copy_id AS VARCHAR)) AS pack_id
  FROM cp
),
sh AS (
  SELECT *,
         CAST(concat('0x', substr(md5(concat_ws('||', 'pack', pack_id)), 1, 15)) AS BIGINT) % 8 AS shard
  FROM pk
),
c AS (
  SELECT doc_id, copy_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pack_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS BIGINT) AS start_off
  FROM sh
)
SELECT doc_id, copy_id, shard, n_tokens,
       start_off // 256 AS seq_in_shard,
       start_off % 256 AS offset_in_seq
FROM c
"""

    # global top-100 token vocabulary; rank deterministic (cnt desc, token)
    o["a_vocab_topk"] = r"""
WITH t AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents WHERE trim(text) != ''
),
c AS (SELECT token, count(*) AS cnt FROM t WHERE token != '' GROUP BY token),
r AS (
  SELECT token, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS BIGINT) AS rank
  FROM c
)
SELECT token, cnt, rank FROM r WHERE rank <= 100
"""

    # per-doc top-3 TF-IDF terms; idf rounded to 6dp BEFORE scoring
    o["text_tfidf_topterms"] = r"""
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents WHERE trim(text) != ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t WHERE term != '' GROUP BY doc_id, term),
dfreq AS (
  SELECT term, count(*) AS df,
         round(ln((CAST((SELECT count(*) FROM documents) AS DOUBLE) + 1)
                  / (count(*) + 1)), 6) AS idf
  FROM tf GROUP BY term
),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(CAST(tf.tf AS DOUBLE) * dfreq.idf, 6) AS score
  FROM tf JOIN dfreq USING (term)
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, term ASC) AS BIGINT) AS rank
  FROM s
)
SELECT doc_id, term, tf, score, rank FROM r WHERE rank <= 3
"""

    # deterministic stratified sample: hash bucket rule, rates en 10% /
    # zh 80% / rest 25% — mirrors queries.a_sample_stratified
    o["a_sample_stratified"] = """
WITH b AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(concat_ws('||', 'strat', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 1000 WHEN 'zh' THEN 8000 ELSE 2500 END
"""

    # bigram conditional probabilities P(w2|w1); integer counts divide
    # exactly, p rounds to 6
    o["a_bigram_condprob"] = r"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS arr
  FROM documents WHERE trim(text) != ''
),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
                               i -> arr[i] || ' ' || arr[i + 1])) AS bigram
  FROM toks WHERE len(arr) >= 2
),
c AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram),
p AS (
  SELECT bigram, split_part(bigram, ' ', 1) AS w1, cnt,
         CAST(sum(cnt) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS BIGINT)
           AS prefix_cnt
  FROM c
)
SELECT bigram, w1, cnt, prefix_cnt,
       round(CAST(cnt AS DOUBLE) / CAST(prefix_cnt AS DOUBLE), 6) AS p
FROM p
"""

    # temperature-smoothed language mixture weights (alpha = 0.3); the
    # powered share is rounded then summed as DECIMAL so the
    # normalization is order-free and cross-engine exact
    o["llm_mixture_temperature"] = """
WITH a AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
t AS (
  SELECT lang, n_docs,
         CAST(sum(n_docs) OVER () AS BIGINT) AS total
  FROM a
),
pw AS (
  SELECT lang, n_docs,
         round(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE), 6) AS p_raw,
         CAST(round(pow(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE), 0.3), 6)
              AS DECIMAL(18,6)) AS pw
  FROM t
)
SELECT lang, n_docs, p_raw,
       round(CAST(pw AS DOUBLE) / CAST(sum(pw) OVER () AS DOUBLE), 6) AS p_temp
FROM pw
"""

    # trailing 1-hour RANGE window per user over second-truncated epochs
    # (Spark unix_timestamp truncates; floor(epoch()) matches); sums in
    # DECIMAL, counts cast BIGINT (window count is BIGINT in DuckDB but
    # the sum would be HUGEINT — cast both for safety)
    o["w_trailing_1h"] = f"""
WITH e AS (
  SELECT event_id, user_id, {TS} AS ts_str,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
)
SELECT user_id, event_id, ts_str,
       CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ep
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS trailing_1h_sum,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ep
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trailing_1h_n
FROM e
"""

    # hourly forward-fill grid per user (resample + ffill); grid bounded
    # by each user's own first/last event hour
    o["t_gapfill_forward"] = """
WITH e AS (
  SELECT user_id, ts, event_id, CAST(value AS DECIMAL(18,2)) AS v,
         date_trunc('hour', ts) AS h
  FROM events
),
hv AS (
  SELECT user_id, h, v FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, h
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
),
b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hv GROUP BY user_id),
g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
j AS (
  SELECT g.user_id, g.h, hv.v
  FROM g LEFT JOIN hv ON g.user_id = hv.user_id AND g.h = hv.h
)
SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(last_value(v IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS value
FROM j
"""

    # data-quality expectations report: one row per check
    o["k_dq_report"] = """
SELECT 'null_name' AS check, 'customer' AS table_name,
       CAST(count(*) AS BIGINT) AS n_violations
FROM customer WHERE c_name IS NULL
UNION ALL
SELECT 'dup_pk', 'orders', CAST(count(*) AS BIGINT) FROM (
  SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1
)
UNION ALL
SELECT 'orphan_fk_custkey', 'orders', CAST(count(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'nonpositive_quantity', 'lineitem', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_quantity <= 0
UNION ALL
SELECT 'negative_price', 'lineitem', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_extendedprice < 0
UNION ALL
SELECT 'discount_over_8pct', 'lineitem', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_discount > 0.08
"""

    # decontamination via the persisted eval-set store: same containment
    # computation as llm_decontaminate but the hot-shingle cut is
    # TEST-side-only (the store is built before any training batch exists)
    o["llm_decontam_store"] = r"""
WITH sp AS (
  SELECT doc_id, text,
         CASE WHEN CAST(concat('0x', substr(md5(concat_ws('||', 'split', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 < 9000
              THEN 'train' ELSE 'other' END AS grp
  FROM documents
),
toks AS (SELECT doc_id, grp, regexp_split_to_array(trim(text), '\s+') AS t FROM sp),
sh AS (
  SELECT doc_id, grp,
         list_distinct(
           list_transform(generate_series(1, len(t) - 2),
                          i -> array_to_string(t[i:i+2], ' '))
         ) AS shingles
  FROM toks WHERE len(t) >= 3
),
ex AS (SELECT doc_id, grp, unnest(shingles) AS shingle FROM sh),
te0 AS (SELECT doc_id AS test_id, shingle FROM ex WHERE grp <> 'train'),
hot AS (SELECT shingle FROM (SELECT shingle, count(*) AS c FROM te0 GROUP BY shingle) WHERE c > 1000),
te AS (SELECT te0.* FROM te0 ANTI JOIN hot USING (shingle)),
tr AS (SELECT doc_id AS train_id, shingle FROM ex WHERE grp = 'train'),
tsz AS (SELECT test_id, count(*) AS n_test FROM te GROUP BY test_id),
cm AS (SELECT train_id, test_id, count(*) AS n_common FROM tr JOIN te USING (shingle) GROUP BY train_id, test_id)
SELECT train_id, test_id, n_common,
       round(n_common / CAST(n_test AS DOUBLE), 6) AS containment
FROM cm JOIN tsz USING (test_id)
WHERE round(n_common / CAST(n_test AS DOUBLE), 6) >= 0.5
"""

    # per-source token-budget sampling: deterministic hash admission order,
    # cumulative-including-current <= budget (window sum cast BIGINT)
    o["llm_token_budget_sample"] = r"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INTEGER) AS n_tokens,
         CAST(concat('0x', substr(md5(concat_ws('||', 'budget', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
  FROM toks
)
SELECT doc_id, source, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 400
"""

    # gold snapshot diff keyed by (user_id, event_type): run1 withholds
    # event_id % 3 == 1, run2 has everything; added = key only in run2,
    # changed = latest event moved (event_id differs — rows are
    # functionally determined by event_id, so content-hash inequality on
    # the Spark side is the same predicate)
    o["k_dataset_diff"] = f"""
WITH e AS (SELECT event_id, user_id, event_type, {TS} AS ts_str FROM events),
s1 AS (
  SELECT * FROM (
    SELECT user_id, event_type, event_id,
           row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts_str DESC, event_id DESC) AS rn
    FROM e WHERE event_id % 3 = 0
  ) WHERE rn = 1
),
s2 AS (
  SELECT * FROM (
    SELECT user_id, event_type, event_id,
           row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts_str DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
)
SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
       coalesce(s1.event_type, s2.event_type) AS event_type,
       CASE WHEN s1.event_id IS NULL THEN 'added'
            WHEN s2.event_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       s1.event_id AS event_id_a,
       s2.event_id AS event_id_b
FROM s1 FULL OUTER JOIN s2
  ON s1.user_id = s2.user_id AND s1.event_type = s2.event_type
WHERE s1.event_id IS NULL OR s2.event_id IS NULL OR s1.event_id != s2.event_id
"""

    # checkpointed time-travel: gold as of run 3 == latest-per-key over the
    # union of the three runs' rows (run1 %3!=1 and run2 %3!=0 already
    # cover every event; run3 adds only re-appearances)
    o["k_gold_ckpt_asof"] = f"""
WITH e AS (SELECT event_id, user_id, event_type, {TS} AS ts_str FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts_str DESC, event_id DESC) AS rn
  FROM e
)
SELECT user_id, event_id, event_type, ts_str FROM r WHERE rn = 1
"""

    # CCNet-style passage dedup: 3-word blocks, global first-occurrence
    # wins on the 60-bit md5 hash, documents reassembled in block order
    o["dedup_blocks"] = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
         CAST(ceil(len(regexp_split_to_array(trim(text), '\s+')) / 3.0) AS BIGINT)
           AS n_blocks
  FROM documents WHERE trim(text) != ''
),
b AS (
  SELECT doc_id, n_blocks, unnest(generate_series(0, n_blocks - 1)) AS bidx, ws
  FROM d
),
blk AS (
  SELECT doc_id, n_blocks, bidx,
         array_to_string(ws[bidx * 3 + 1 : bidx * 3 + 3], ' ') AS blk
  FROM b
),
h AS (
  SELECT *, CAST(concat('0x', substr(md5(blk), 1, 15)) AS BIGINT) AS bh FROM blk
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY bh ORDER BY doc_id, bidx) AS rn FROM h
)
SELECT doc_id, max(n_blocks) AS n_blocks, CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(blk, ' ' ORDER BY bidx) AS clean_text
FROM r WHERE rn = 1 GROUP BY doc_id
"""

    # DSIR importance scores: hashed-unigram buckets, integer ppm
    # target/raw ratio weights, deterministic top-100 of the raw pool
    o["llm_importance_weights"] = r"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_t,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents WHERE trim(text) != ''
),
b AS (
  SELECT doc_id, is_t,
         CAST(concat('0x', substr(md5(concat_ws('||', 'dsir', tok)), 1, 15)) AS BIGINT)
           % 128 AS bucket
  FROM toks
),
cnt AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
         CAST(sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
  FROM b GROUP BY bucket
),
w AS (SELECT bucket, t_cnt * 1000000 // (r_cnt + 1) AS w_ppm FROM cnt),
ds AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(w_ppm) AS BIGINT) AS score
  FROM b JOIN w USING (bucket) WHERE NOT is_t GROUP BY doc_id
),
top AS (SELECT * FROM ds ORDER BY score DESC, doc_id LIMIT 100)
SELECT doc_id, n_toks, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM top
"""

    # weekly cohort retention: cohort = ISO week (Monday-truncated, both
    # engines) of the user's first event; join-free (min-window cohort,
    # offset-0 census as cohort size), mirroring the Spark plan
    o["a_cohort_retention"] = """
WITH e AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
c AS (
  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_wk FROM e
),
j AS (
  SELECT user_id, cohort_wk,
         CAST(date_diff('day', CAST(cohort_wk AS DATE), CAST(wk AS DATE))
              AS BIGINT) // 7 AS week_offset
  FROM c
),
r AS (
  SELECT cohort_wk, week_offset, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM j GROUP BY cohort_wk, week_offset
),
s AS (
  SELECT *, CAST(max(CASE WHEN week_offset = 0 THEN n_users END)
                 OVER (PARTITION BY cohort_wk) AS BIGINT) AS cohort_size
  FROM r
)
SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week, week_offset, n_users,
       cohort_size,
       round(CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6) AS retention
FROM s
"""

    # round-7/round-9/round-11/round-12 promotions: each staged batch
    # keeps its oracles next to its implementations; merge them here so
    # every REGISTRY entry resolves.
    from activecampaign_api_data_pipeline_spark import (
        staged_r7,
        staged_r8,
        staged_r9,
        staged_r10,
        staged_r11,
    )

    for batch in (
        staged_r7.PROMOTED_ORACLES,
        staged_r8.PROMOTED_ORACLES,
        staged_r9.PROMOTED_ORACLES,
        staged_r10.PROMOTED_ORACLES,
        staged_r11.PROMOTED_ORACLES,
    ):
        overlap = set(o) & set(batch)
        assert not overlap, f"duplicate oracle keys: {overlap}"
        o.update(batch)
    # r10 trim: retired parameter variants leave the driver contract but
    # keep their oracles for replica re-verification (queries.RETIRED has
    # the matching functions; bench's frozen prefixes still time them)
    RETIRED_ORACLES.clear()
    RETIRED_ORACLES.update({k: o.pop(k) for k in _RETIRED_KEYS})
    return o


_RETIRED_KEYS = (
    "sim_ivf_nprobe2",
    "sim_ivfpq_residual",
    "sim_ann_index_nprobe1",
    "llm_corpus_prep",
    # r12 trim: subsumed by the promoted q4_priority_late /
    # q22_idle_customers cousins (same semi/anti join shapes)
    "q_semi_join",
    "q_anti_join",
    # r13 trim DEFERRED: the eight named-cousin duplicates the r13
    # window retired were restored to REGISTRY (the optimization-round
    # contract forbids removing a declared query), so their oracles stay
    # in build_oracles; the trim re-executes in the next BUILD window.
)
RETIRED_ORACLES: dict[str, str] = {}
