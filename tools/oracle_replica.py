"""Type-aware replica of the driver's correctness hash.

``check_correctness.py`` compares values through ``fetchdf()`` +
``astype(str)``, which silently erases type skew: a DuckDB windowed
``sum(BIGINT)`` returns HUGEINT (int128), pandas renders it as a Python
int, and the string compare passes — while the driver's *typed* value
hash fails (exactly what happened to ``llm_pack_sequences`` /
``llm_curation_pipeline`` in round 5).

This tool closes that gap: both sides are materialised as Arrow tables
(``DataFrame.toArrow()`` on Spark, ``.arrow()`` on DuckDB), columns are
sorted by name, rows sorted canonically, and the comparison hashes
``(column_name, arrow_type, canonical_value_repr)`` triples.  Any
result column whose Arrow type differs between Spark and the oracle —
decimal128 vs int64, large_string vs string aside (widths of the same
logical family are normalised) — is a FAIL here even when the rendered
values match.

Only one DuckDB version ships in this container, so multi-version
sweeps aren't possible; the typed compare is the portable proxy — a
query/oracle pair whose Arrow types agree exactly is robust to the
driver's canonicalisation regardless of its DuckDB build.

Usage: python tools/oracle_replica.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

# Logical families: widths within a family are considered equivalent
# (string vs large_string, list vs large_list); everything else must
# match exactly.  int64 vs decimal128(38,0) is deliberately NOT merged —
# that's the skew class the driver flags.
def type_tag(t: pa.DataType) -> str:
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_tag(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"  # tz-naive vs tz-aware kept distinct below
    return str(t)


def canon_value(v, t: pa.DataType) -> str:
    if v is None:
        return "\x00NULL"
    if pa.types.is_floating(t):
        f = float(v)
        return repr(f)  # exact bits via repr round-trip
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "[" + ",".join(canon_value(x, t.value_type) for x in v) + "]"
    if pa.types.is_timestamp(t):
        return v.isoformat()
    return str(v)


def typed_hash(tbl: pa.Table) -> tuple[str, list[tuple[str, str]]]:
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    schema = [(c, type_tag(tbl.schema.field(c).type)) for c in cols]
    rows = []
    pycols = [tbl.column(c).to_pylist() for c in cols]
    types = [tbl.schema.field(c).type for c in cols]
    for i in range(tbl.num_rows):
        rows.append("\x01".join(canon_value(pycols[j][i], types[j]) for j in range(len(cols))))
    rows.sort()
    h = hashlib.md5()
    h.update(repr(schema).encode())
    for r in rows:
        h.update(r.encode())
        h.update(b"\x02")
    return h.hexdigest(), schema


def main() -> int:
    import __spark_entry__ as entrymod
    from activecampaign_api_data_pipeline_spark.session import get_spark

    spark = get_spark("oracle-replica")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    # staged queries verify through the same gate before registration
    from activecampaign_api_data_pipeline_spark import staged_r12, staged_r13

    for mod in (staged_r12, staged_r13):
        for name in mod.STAGED_ORACLES:
            if name not in qs:
                qs[name] = getattr(mod, name)
                os_[name] = mod.STAGED_ORACLES[name]
    # retired entries (r10 trim) stay replica-verifiable after leaving
    # the driver contract — frozen bench prefixes still run their code
    from activecampaign_api_data_pipeline_spark import oracles as _om
    from activecampaign_api_data_pipeline_spark.queries import RETIRED

    for name, fn in RETIRED.items():
        if name not in qs:
            qs[name] = fn
            os_[name] = _om.RETIRED_ORACLES[name]
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if name not in os_:
            print(f"SKIP {name}: no oracle (rows-only)")
            continue
        t0 = time.time()
        try:
            stbl = fn(spark, SF_DIR).toArrow()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        try:
            otbl = con.execute(os_[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            failures += 1
            continue
        sh, sschema = typed_hash(stbl)
        oh, oschema = typed_hash(otbl)
        dt = time.time() - t0
        if stbl.num_rows != otbl.num_rows:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): rows spark={stbl.num_rows} oracle={otbl.num_rows}")
        elif sschema != oschema:
            failures += 1
            diff = [
                f"{c}: spark={st} oracle={ot}"
                for (c, st), (_, ot) in zip(sschema, oschema)
                if st != ot
            ]
            print(f"FAIL {name} ({dt:.1f}s): TYPE skew — " + "; ".join(diff))
        elif sh != oh:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): typed value hash mismatch ({stbl.num_rows} rows)")
        else:
            print(f"OK   {name} ({dt:.1f}s, {stbl.num_rows} rows)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
