"""Scalar derivation functions (SURVEY.md §2.2 P3-P9, §2.7 F1-F8).

Every one of the reference's row-wise Python helpers maps to a built-in
Spark expression — zero Python UDFs, everything stays inside whole-stage
codegen. Reference citations point into
/root/reference/scripts/run_ac_extraction.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: String sentinels the reference treats as "no value" (:949, :1085, :1418).
SENTINELS = ("", "0", "None", "nan")

#: Regex that pulls a numeric id off the tail of an API URL (:83-87).
ID_FROM_URL_RE = r"/(\d+)(?:\?|$)"


def safe_int(c: Column | str, default: int = 0) -> Column:
    """Defensive int parse, default 0 (reference ``safe_int`` :58-62)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(F.trim(c.cast("string")).try_cast("long"), F.lit(default))


def id_from_url(c: Column | str) -> Column:
    """Extract trailing numeric id from a URL (reference :83-87)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.nullif(F.regexp_extract(c, ID_FROM_URL_RE, 1), F.lit(""))


def code_map(c: Column | str, mapping: dict[str, str]) -> Column:
    """Code→label map with pass-through on miss (reference :409-410,781-782)."""
    c = F.col(c) if isinstance(c, str) else c
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    return F.coalesce(F.element_at(m, c.cast("string")), c.cast("string"))


def full_name(first: Column | str, last: Column | str, fallback: Column | str) -> Column:
    """``first + " " + last`` trimmed, else fallback (reference ``_mk_name`` :1011-1013)."""
    first = F.col(first) if isinstance(first, str) else first
    last = F.col(last) if isinstance(last, str) else last
    fallback = F.col(fallback) if isinstance(fallback, str) else fallback
    joined = F.trim(F.concat_ws(" ", F.coalesce(first, F.lit("")), F.coalesce(last, F.lit(""))))
    return F.coalesce(F.nullif(joined, F.lit("")), fallback)


def pick_ts(*candidates: Column | str) -> Column:
    """First non-null / non-blank among candidate ts columns (reference ``_pick_ts`` :1165-1169)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in candidates]
    return F.coalesce(*[F.nullif(F.trim(c.cast("string")), F.lit("")) for c in cols])


def nullify_sentinels(c: Column | str, sentinels: tuple[str, ...] = SENTINELS) -> Column:
    """Map the reference's string sentinels to proper NULL (:949,1085)."""
    c = F.col(c) if isinstance(c, str) else c
    s = F.trim(c.cast("string"))
    return F.when(s.isin(*sentinels), F.lit(None).cast("string")).otherwise(s)


def event_id_synth(source: str, rid: Column | str, row_hash_col: Column | str) -> Column:
    """``"{source}:{rid}"`` else source:md5(row) (reference :1197-1200)."""
    rid = F.col(rid) if isinstance(rid, str) else rid
    row_hash_col = F.col(row_hash_col) if isinstance(row_hash_col, str) else row_hash_col
    return F.concat_ws(
        ":",
        F.lit(source),
        F.coalesce(F.nullif(F.trim(rid.cast("string")), F.lit("")), row_hash_col),
    )
