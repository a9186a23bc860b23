"""Medallion table store — the reference's write path, re-designed for scale.

Re-expresses ``persist_table_dual`` (reference run_ac_extraction.py:134-188)
and the JSON state checkpoint (:70-80, :1557-1559, :1696-1700) WITHOUT the
reference's read-modify-rewrite of the whole master on every run (the
scalability cliff called out in SURVEY.md §3.2):

- **delta**  = ``bronze/<table>/run_id=<id>`` — the reference's immutable
  per-run drop (K1/K2) is exactly bronze's run partition; ``read_delta``
  reads it partition-pruned instead of writing a duplicate directory.
- **bronze** ``bronze/<table>/run_id=…`` — per-run partition, idempotently
  OVERWRITTEN on replay of the same ``run_id`` (reference "raw" before
  dedup). run_ids must therefore be unique per logical run: replaying a
  run_id with a *different* batch replaces that run's earlier bronze drop
  (an append would have preserved it) — the orchestrator owns uniqueness.
- **silver** ``silver/<table>/_kb=…``    — content-hash-deduped history
  (reference "raw" after A1 dedup), partitioned by a key-hash bucket.
- **gold**   ``gold/<table>/_kb=…``      — last-per-key snapshot (reference
  "latest", A2/W1), same bucketing.

Why the bucket column ``_kb = pmod(xxhash64(keys), n_buckets)`` is the load-
bearing design: exact duplicates agree on their key columns, so they agree
on ``_kb``. Both incremental maintenance joins can therefore be restricted
to the buckets the new batch actually touches:

- silver append = ``new LEFT ANTI JOIN silver ON (_kb, _row_hash)`` — the
  probe side reads ONLY affected bucket partitions (partition pruning) and
  only the ``_row_hash`` column (column pruning).
- gold refresh  = latest-per-key over silver restricted to affected buckets,
  written with dynamic partition overwrite — untouched buckets are not read
  and not rewritten.

So per run, work is O(new batch + touched buckets), not O(master) as in the
reference. At 100 TB raise ``n_buckets`` so a bucket ≪ executor memory; a
run touching k buckets rewrites k/n_buckets of gold, nothing else.

Exactly-once under SAME-BATCH restart: every write is either per-run-
partition idempotent (bronze: dynamic overwrite of ``run_id=<id>``),
duplicate-proof (silver: anti-join on ``(_kb, _row_hash)`` — replayed rows
vanish), or a pure recomputation from silver (gold: dynamic overwrite of
the batch's buckets, executed even when the replay contributes zero new
silver rows). Re-running ``persist`` with the same ``run_id``/
``extracted_at`` AND the same (or bucket-covering) batch after a crash at
ANY point therefore converges the store to the committed state — see
``tests/test_storage.py::test_exactly_once_restart``. The claim is scoped
to same-batch replay because dynamic partition overwrite is not atomic: a
crash mid-gold-commit can leave some bucket partitions deleted, and a
retry whose re-extract no longer hashes to those buckets (source data
changed between attempts) will not repair them. :meth:`TableStore.
rebuild_gold` is the recovery path — it recomputes gold from silver for
arbitrary buckets (default: all).

Determinism: gold ordering is an explicit total order
(updated_col DESC, extracted_at DESC, run_id DESC, _row_hash DESC) — the
reference leans on pandas' stable mergesort file order (:186), which has no
distributed equivalent (SURVEY.md §7.3).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.functions.hashing import row_hash

LINEAGE_COLS = ("run_id", "extracted_at")
BUCKET_COL = "_kb"
HASH_COL = "_row_hash"


@dataclass
class PersistResult:
    table: str
    run_id: str
    n_delta: int
    n_new_silver: int
    # every bucket the batch staged = every gold partition rewritten this
    # run (gold refresh is keyed on the staged buckets, not just the ones
    # that gained silver rows — a replay with n_new_silver == 0 still
    # rewrites them). Downstream cache invalidation must key on THIS.
    touched_buckets: list[int]
    # the narrower set: buckets that actually gained new silver rows
    new_silver_buckets: list[int]


def write_text_sidecar(spark: SparkSession, path: str, payload: str) -> None:
    """One-file text sidecar via direct FileSystem ops — NO Spark job.

    Replaces the ``createDataFrame([(json,)]).coalesce(1).write.text(path)``
    pattern for params.json markers: that shape schedules a full Spark job
    (driver→executor round-trip, task launch, commit protocol) to move
    ~100 bytes — locally a fixed ~0.2-0.4 s per call, at 100 TB a
    cluster-wide barrier per sidecar. The store protocols are unchanged:
    callers still write a ``_building_`` marker first and finalize last;
    this writes ``<path>.__tmp__`` and renames over the target, so the
    crash window (missing/partial sidecar ⇒ store reads as incomplete) is
    no worse than the old overwrite-commit window. The target may be a
    legacy DIRECTORY layout (old text-writer output) — deleted before the
    rename. Same mechanism as the matview/minhash param writers this
    generalizes; works on any Hadoop FileSystem.
    """
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    target = P(path)
    fs = target.getFileSystem(spark._jsc.hadoopConfiguration())
    parent = target.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    tmp = P(path + ".__tmp__")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(target):
        fs.delete(target, True)  # recursive: legacy layout is a directory
    # Hadoop FileSystem.rename reports some failures by RETURNING false
    # (not raising) — e.g. a missing parent on some implementations. At
    # this point the old sidecar is already deleted, so a swallowed false
    # would silently degrade the store to "incomplete" (forcing a
    # rebuild) with no error surfaced. Make it loud.
    if not fs.rename(tmp, target):
        raise IOError(f"sidecar rename failed: {tmp} -> {target}")


def read_text_sidecar(spark: SparkSession, path: str) -> str | None:
    """First non-empty line of a text sidecar — single-file OR legacy
    directory layout (part-* files from the old Spark text writer) — via
    direct FileSystem ops, no Spark job. Returns ``None`` when the sidecar
    is absent or empty (the crashed-legacy-dir-write case); genuine IO
    errors propagate."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    target = P(path)
    fs = target.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(target):
        return None
    paths = (
        [
            st.getPath()
            for st in fs.listStatus(target)
            if st.getPath().getName().startswith("part-")
        ]
        if fs.getFileStatus(target).isDirectory()
        else [target]
    )
    for p in paths:
        stream = fs.open(p)
        try:
            data = bytes(
                stream.readAllBytes()
                if hasattr(stream, "readAllBytes")
                else jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()
        for line in data.decode("utf-8").splitlines():
            if line.strip():
                return line
    return None


def path_exists(spark: SparkSession, path: str) -> bool:
    """Explicit Hadoop-FS existence probe.

    The store readers use this instead of ``try: read / except: first
    batch`` — a bare except treats corruption, permission, or transient
    IO failures as "no store yet", which silently drops the whole corpus
    history (dedup) or rebuilds an index over an existing path (ANN).
    With an explicit probe, only genuine absence takes the first-batch
    path; real read errors propagate.
    """
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def compact_artifact(
    spark: SparkSession,
    path: str,
    max_files: int = 8,
    target_bytes_per_file: int = 128 * 1024 * 1024,
) -> bool:
    """Stats-driven compaction for an append-only, unpartitioned parquet
    artifact directory (signature-store ``sigs``/``bands``, ANN-index
    ``cells``/``codes``): those sinks append one file set per micro-batch
    forever, so without maintenance a year of ingest is ~10⁵ tiny files
    and every candidate join pays the open-file tax. Returns whether a
    rewrite ran.

    Cheap metadata probe first (one ``listStatus``): rewrite only when the
    part-file count exceeds ``max_files``. The rewrite coalesces to
    ``ceil(bytes / target_bytes_per_file)`` files — sized for row-group
    locality at scale, not a blind ``coalesce(1)``.

    Crash-safe swap (no reader ever sees duplicated or partial DATA):
    write the compacted copy to ``{path}__compacting``, rename the live
    dir to ``{path}__old``, rename staging into place, delete ``__old``.
    Every invocation heals a previous crash first: a dangling staging dir
    is discarded (its data is still fully present in the live dir), a
    missing live dir with staging present is the between-renames window
    (complete the swap), a leftover ``__old`` beside a live dir is
    post-swap garbage (delete). Contract: single WRITER (the same
    contract the appending sinks already require); an external reader
    racing the two renames can observe a brief path-not-found and should
    retry — it can never observe duplicate or partial rows.
    """
    jvm = spark._jvm
    jsc = spark._jsc
    hconf = jsc.hadoopConfiguration()

    def P(p):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = P(path).getFileSystem(hconf)
    staging, old = f"{path}__compacting", f"{path}__old"
    # ---- heal prior crash ----
    if not fs.exists(P(path)):
        if fs.exists(P(staging)):  # crashed between the two renames
            fs.rename(P(staging), P(path))
        else:
            return False  # artifact genuinely absent
    if fs.exists(P(old)):
        fs.delete(P(old), True)
    if fs.exists(P(staging)):
        fs.delete(P(staging), True)
    # ---- stats probe ----
    parts = [
        f
        for f in fs.listStatus(P(path))
        if f.isFile() and not f.getPath().getName().startswith("_")
    ]
    if len(parts) <= max_files:
        return False
    total_bytes = sum(f.getLen() for f in parts)
    n_out = max(1, -(-total_bytes // target_bytes_per_file))  # ceil div
    # ---- rewrite + swap ----
    spark.read.parquet(path).coalesce(int(n_out)).write.mode("overwrite").parquet(staging)
    fs.rename(P(path), P(old))
    fs.rename(P(staging), P(path))
    fs.delete(P(old), True)
    return True


def _key_bucket(key_cols: list[str], n_buckets: int) -> Column:
    ks = [F.coalesce(F.col(k).cast("string"), F.lit("\x00null")) for k in key_cols]
    return F.pmod(F.xxhash64(*ks), F.lit(n_buckets)).cast("int")


class TableStore:
    """Bronze/silver/gold store rooted at a directory (local or DFS URI)."""

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        self.spark = spark
        self.root = root.rstrip("/")
        self.n_buckets = n_buckets

    # ------------------------------------------------------------- paths/fs

    def _path(self, layer: str, table: str) -> str:
        return f"{self.root}/{layer}/{table}"

    def _exists(self, path: str) -> bool:
        return path_exists(self.spark, path)

    # ------------------------------------------------------------- persist

    def persist(
        self,
        df: DataFrame,
        table: str,
        key_cols: list[str],
        run_id: str,
        updated_col: str | None = None,
        extracted_at: str | None = None,
        tombstone_col: str | None = None,
    ) -> PersistResult:
        """Tri-destination persist (reference :134-188), incremental form.

        ``df`` is one run's extract. ``updated_col`` orders the gold
        snapshot (reference's update-column, fallback ``extracted_at``).
        ``extracted_at`` may be pinned for reproducible tests; defaults to
        the driver's current UTC time, constant for the whole run.
        ``tombstone_col`` names a BOOLEAN column marking delete ops (CDC
        'D' rows / GDPR erasure requests): tombstones flow through
        bronze/silver as auditable history, but a key whose LATEST row is
        a tombstone is excluded from gold — and a later upsert resurrects
        it. This is Delta/Hudi MERGE delete semantics at O(batch buckets)
        cost, since tombstones hash to the same buckets as their keys.
        """
        content_cols = [c for c in df.columns if c not in LINEAGE_COLS]
        stamp = (
            F.lit(extracted_at)
            if extracted_at is not None
            else F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
        )
        # P1 lineage + P2 content hash + bucket, all expression work (no UDFs)
        staged = (
            df.select(*content_cols)
            .withColumn("run_id", F.lit(run_id))
            .withColumn("extracted_at", stamp)
            .withColumn(HASH_COL, row_hash(df, content_cols))
            .withColumn(BUCKET_COL, _key_bucket(key_cols, self.n_buckets))
        )
        # cluster by bucket FIRST, then batch-internal exact dedup (A1
        # within the run) keyed (bucket, hash): equal hashes imply equal
        # content, hence equal keys, hence the same bucket, so the dedup
        # result is identical — but the bucket partitioning now satisfies
        # the dedup's clustering requirement and the whole stage runs on
        # ONE exchange where dedup-then-repartition paid two full
        # shuffles of the batch (plan-verified: 2 Exchange → 1). The
        # bucket clustering also keeps every partitioned write below at
        # one file per touched bucket instead of (tasks × buckets) small
        # files — at 100 TB this shuffle-before-dynamic-partition-insert
        # is the standard pattern; without it a 1000-task stage writing
        # 4096 buckets would create millions of files.
        staged = staged.repartition(F.col(BUCKET_COL)).dropDuplicates(
            [BUCKET_COL, HASH_COL]
        )
        staged.persist()
        try:
            # one job yields the batch size AND its buckets
            per_bucket = staged.groupBy(BUCKET_COL).count().collect()
            n_delta = sum(r["count"] for r in per_bucket)
            buckets = [r[BUCKET_COL] for r in per_bucket]

            # 1. bronze: per-run partition (never read-modify other runs).
            #    The per-run "delta" drop of the reference (:156-157) IS the
            #    bronze run_id partition — same rows, one write, partition-
            #    pruned via read_delta() instead of a duplicate directory.
            #    Dynamic partition OVERWRITE (not append) makes a replayed
            #    run_id land on its own partition idempotently: a run killed
            #    anywhere after this write can be re-run with the same run_id
            #    without doubling its bronze rows. Other runs' partitions are
            #    untouched.
            staged.drop(BUCKET_COL).withColumn("run_id", F.lit(run_id)).write.mode(
                "overwrite"
            ).option("partitionOverwriteMode", "dynamic").partitionBy("run_id").parquet(
                self._path("bronze", table)
            )

            # 2. silver: anti-join on (_kb, _row_hash) — bucket-pruned probe
            silver_path = self._path("silver", table)
            first_batch = not self._exists(silver_path)
            if first_batch:
                # no silver yet: the anti-join is vacuous, fresh IS staged —
                # reuse the per-bucket stats already collected above instead
                # of paying a second count job over the same rows
                fresh = staged
                fresh_per_bucket = per_bucket
            else:
                old = (
                    self.read("silver", table)
                    .filter(F.col(BUCKET_COL).isin(buckets))
                    .select(BUCKET_COL, HASH_COL)
                )
                fresh = staged.join(old, [BUCKET_COL, HASH_COL], "left_anti").repartition(
                    F.col(BUCKET_COL)
                )
                fresh.persist()
                # collect BEFORE the append: writing to silver_path invalidates
                # any cached plan that reads it (fresh's anti-join does), and a
                # recompute after the append would anti-join away its own rows.
                fresh_per_bucket = fresh.groupBy(BUCKET_COL).count().collect()
            n_new = sum(r["count"] for r in fresh_per_bucket)
            touched = [r[BUCKET_COL] for r in fresh_per_bucket]
            if n_new:
                fresh.write.mode("append").partitionBy(BUCKET_COL).parquet(silver_path)

            if n_delta:
                # 3. gold: recompute ONLY the batch's buckets from silver,
                #    dynamic partition overwrite leaves the rest untouched.
                #    Refresh is keyed on the STAGED buckets, not just the
                #    fresh ones, and runs even when n_new == 0: a run killed
                #    between the silver append and this refresh replays with
                #    every row anti-joined away (n_new == 0), and gold must
                #    still be repaired from silver. The refresh is a pure
                #    function of silver, so re-running it is idempotent; the
                #    cost stays O(batch buckets) either way (duplicates hash
                #    to the same buckets as their originals).
                self.rebuild_gold(
                    table, key_cols, updated_col, buckets=buckets,
                    tombstone_col=tombstone_col,
                )
            if not first_batch:
                fresh.unpersist()
        finally:
            staged.unpersist()
        return PersistResult(table, run_id, n_delta, n_new, sorted(buckets), sorted(touched))

    def rebuild_gold(
        self,
        table: str,
        key_cols: list[str],
        updated_col: str | None = None,
        buckets: list[int] | None = None,
        tombstone_col: str | None = None,
    ) -> None:
        """Recompute gold from silver for ``buckets`` (default: ALL).

        Gold is a pure function of silver (latest-per-key under the total
        order below), so this is safe to run at any time — it is both the
        incremental refresh used by :meth:`persist` and the repair path for
        the non-atomic dynamic-overwrite window documented in the module
        docstring (a crash mid-gold-commit followed by a changed re-extract
        can orphan bucket partitions; rebuild with ``buckets=None`` to
        restore the invariant). Cost is O(selected buckets), never
        O(store).
        """
        silver = self.read("silver", table)
        if buckets is not None:
            silver = silver.filter(F.col(BUCKET_COL).isin(buckets))
        order = []
        if updated_col is not None:
            order.append(F.col(updated_col).desc_nulls_last())
        order += [
            F.col("extracted_at").desc_nulls_last(),
            F.col("run_id").desc_nulls_last(),
            F.col(HASH_COL).desc(),
        ]
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(*order)
        latest = (
            silver.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        rebuilt = None
        if tombstone_col is not None:
            # drop keys whose LATEST row is a delete marker (after the
            # rank, so an upsert newer than a tombstone resurrects the
            # key); null marker = not deleted
            rebuilt = (
                buckets
                if buckets is not None
                else [r[BUCKET_COL] for r in silver.select(BUCKET_COL).distinct().collect()]
            )
            latest = latest.filter(
                ~F.coalesce(F.col(tombstone_col), F.lit(False))
            )
        latest = latest.repartition(F.col(BUCKET_COL))
        gold_path = self._path("gold", table)
        if tombstone_col is not None:
            # dynamic overwrite only rewrites partitions PRESENT in the
            # output — a bucket whose every key tombstoned away would keep
            # its stale partition. Find the selected buckets with zero
            # survivors and drop their partition dirs explicitly (after
            # the write; a crash in between is repaired by re-running this
            # idempotent rebuild, same as the documented gold-commit
            # window). O(selected buckets) directory ops, no data rewrite.
            latest.persist()
            survivors = {
                r[BUCKET_COL] for r in latest.select(BUCKET_COL).distinct().collect()
            }
        latest.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(BUCKET_COL).parquet(gold_path)
        if tombstone_col is not None:
            latest.unpersist()
            jvm = self.spark._jvm
            hconf = self.spark._jsc.hadoopConfiguration()
            fs = jvm.org.apache.hadoop.fs.Path(gold_path).getFileSystem(hconf)
            for b in set(rebuilt) - survivors:
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(f"{gold_path}/{BUCKET_COL}={b}"),
                    True,
                )
            if not survivors:
                # every key of the selected buckets tombstoned away. If NO
                # bucket dir remains anywhere in gold, the directory has
                # zero parquet footers and a later read('gold', ...) dies
                # with 'unable to infer schema' — write one empty,
                # schema-bearing part file instead (BUCKET_COL stays as a
                # regular int column, same name/type the partitioned read
                # surfaces), so an emptied table reads as 0 typed rows.
                gp = jvm.org.apache.hadoop.fs.Path(gold_path)
                has_bucket_dirs = fs.exists(gp) and any(
                    st.getPath().getName().startswith(f"{BUCKET_COL}=")
                    for st in fs.listStatus(gp)
                )
                if not has_bucket_dirs:
                    self.spark.createDataFrame([], latest.schema).coalesce(
                        1
                    ).write.mode("overwrite").parquet(gold_path)

    def gold_asof(
        self,
        table: str,
        run_id: str,
        key_cols: list[str],
        updated_col: str | None = None,
    ) -> DataFrame:
        """Time-travel: the gold snapshot AS OF a historical run — the
        dataset-versioning read a reproducible training job needs ("train
        on the corpus exactly as it stood after run N").

        Derivation, not storage: bronze partitions ≤ ``run_id`` are
        replayed through the same dedup (first occurrence of each content
        hash, matching the persist path) and the same latest-per-key
        total order as :meth:`rebuild_gold` — so ``gold_asof(latest run)``
        equals current gold bit-for-bit, and any earlier run yields the
        state gold had then. Cost is O(bronze history ≤ run); bound it
        with :meth:`vacuum_bronze`'s retention window (vacuumed runs are
        no longer reachable as snapshots — the documented trade-off).
        run_id comparison is lexicographic == chronological for both
        producers (``run_…`` pipeline ids, zero-padded ``batch_%08d``).

        Replay cost is bounded by :meth:`checkpoint_asof` snapshots when
        present: the dedup state is restored from the nearest checkpoint
        ≤ ``run_id`` and only the bronze delta after it is replayed —
        which also keeps snapshots reachable after :meth:`vacuum_bronze`
        has dropped the runs a checkpoint already covers.
        """
        from pyspark.sql import Window

        first = self._first_asof(table, run_id, key_cols)
        order = []
        if updated_col is not None:
            order.append(F.col(updated_col).desc_nulls_last())
        order += [
            F.col("extracted_at").desc_nulls_last(),
            F.col("run_id").desc_nulls_last(),
            F.col(HASH_COL).desc(),
        ]
        w = Window.partitionBy(*key_cols).orderBy(*order)
        return (
            first.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def gold_diff(
        self,
        table: str,
        run_a: str,
        run_b: str,
        key_cols: list[str],
        carry_cols: list[str] | None = None,
        updated_col: str | None = None,
    ) -> DataFrame:
        """Dataset diff between two gold snapshots: which keys were
        ``added``, ``removed``, or ``changed`` from run_a to run_b — the
        data-versioning primitive behind "what changed in the corpus
        between the checkpoint we trained on and today".

        Built on :meth:`gold_asof` (so both sides benefit from
        checkpoints and survive bronze vacuum), keyed full-outer join,
        change detection via the persisted content hash — any column
        difference counts, no per-column compare list to maintain.
        Unchanged keys are dropped (at 100 TB the diff output is
        O(churn), the join is one shuffle on the snapshot keys).
        ``carry_cols`` are emitted from both sides as ``<col>_a`` /
        ``<col>_b`` for human-readable reports.
        """
        carry_cols = carry_cols or []
        a = self.gold_asof(table, run_a, key_cols, updated_col=updated_col)
        b = self.gold_asof(table, run_b, key_cols, updated_col=updated_col)
        a_sel = a.select(
            *key_cols,
            F.col(HASH_COL).alias("_hash_a"),
            *[F.col(c).alias(f"{c}_a") for c in carry_cols],
        )
        b_sel = b.select(
            *key_cols,
            F.col(HASH_COL).alias("_hash_b"),
            *[F.col(c).alias(f"{c}_b") for c in carry_cols],
        )
        j = a_sel.join(b_sel, key_cols, "full_outer")
        status = (
            F.when(F.col("_hash_a").isNull(), F.lit("added"))
            .when(F.col("_hash_b").isNull(), F.lit("removed"))
            .when(F.col("_hash_a") != F.col("_hash_b"), F.lit("changed"))
        )
        return (
            j.withColumn("status", status)
            .filter(F.col("status").isNotNull())
            .select(
                *key_cols,
                "status",
                *[f"{c}_a" for c in carry_cols],
                *[f"{c}_b" for c in carry_cols],
            )
        )

    def _first_asof(self, table: str, run_id: str, key_cols: list[str]) -> DataFrame:
        """The dedup state as of ``run_id``: first occurrence of every
        ``(bucket, row_hash)`` across bronze runs ≤ run_id, carrying its
        FIRST run's lineage (re-appearing content keeps its original
        timestamps, exactly as the persist path's anti-join behaves).

        Incremental from the nearest :meth:`checkpoint_asof` snapshot ≤
        ``run_id`` when one exists: restore the checkpoint, replay only
        the bronze delta (checkpoint_run, run_id], anti-join the delta's
        hashes against the restored state (a hash the checkpoint already
        holds is a re-appearance, not a new row), dedup within the delta,
        union. By induction this equals the full replay bit-for-bit while
        reading O(delta) bronze instead of O(history).
        """
        from pyspark.sql import Window

        ckpt_run = max(
            (r for r in self.list_checkpoints(table) if r <= run_id), default=None
        )
        bronze = self.read("bronze", table).filter(F.col("run_id") <= run_id)
        if ckpt_run is not None:
            base = self.spark.read.parquet(self._ckpt_path(table, ckpt_run))
            bronze = bronze.filter(F.col("run_id") > ckpt_run)
        staged = bronze.withColumn(BUCKET_COL, _key_bucket(key_cols, self.n_buckets))
        if ckpt_run is not None:
            staged = staged.join(
                base.select(BUCKET_COL, HASH_COL), [BUCKET_COL, HASH_COL], "left_anti"
            )
        wf = Window.partitionBy(BUCKET_COL, HASH_COL).orderBy(
            F.col("extracted_at").asc_nulls_last(), F.col("run_id").asc_nulls_last()
        )
        first = (
            staged.withColumn("_rn", F.row_number().over(wf))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if ckpt_run is not None:
            first = base.unionByName(first, allowMissingColumns=True)
        return first

    def _ckpt_path(self, table: str, run_id: str) -> str:
        return f"{self.root}/ckpt/{table}/asof_run={run_id}"

    def list_checkpoints(self, table: str) -> list[str]:
        path = f"{self.root}/ckpt/{table}"
        if not self._exists(path):
            return []
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return sorted(
            f.getPath().getName().split("=", 1)[1]
            for f in fs.listStatus(hpath)
            if f.isDirectory() and f.getPath().getName().startswith("asof_run=")
        )

    def checkpoint_asof(self, table: str, run_id: str, key_cols: list[str]) -> None:
        """Persist the dedup state as of ``run_id`` so later
        :meth:`gold_asof` reads replay only the bronze delta past it —
        run every K ingests to keep time-travel O(delta) instead of
        O(bronze history), and BEFORE :meth:`vacuum_bronze` tightens the
        retention window so snapshots stay reachable after the covered
        runs are deleted.

        The artifact is the first-occurrence frame (content-hash-unique
        rows with first-run lineage), NOT the gold snapshot: gold alone
        forgets superseded hashes, so a hash re-appearing in the delta
        would replay as new and steal latest-per-key wins it should not
        have. Size is O(unique content ≤ run) — silver-scale, not
        bronze-scale. Idempotent: rewriting the same run's checkpoint
        overwrites it. Builds incrementally from the nearest earlier
        checkpoint via :meth:`_first_asof`.
        """
        self._first_asof(table, run_id, key_cols).write.mode("overwrite").parquet(
            self._ckpt_path(table, run_id)
        )

    # -------------------------------------------------------- maintenance

    def compact_silver(self, table: str, buckets: list[int] | None = None) -> None:
        """Small-file maintenance: every :meth:`persist` (and every
        streaming micro-batch through ``stream_into_store``) APPENDS one
        file per touched bucket to silver, so after N runs a bucket holds
        up to N files and scan cost is dominated by file opens, not bytes.
        Rewrites the selected bucket partitions as one file each; contents
        are byte-for-byte the same rows (pure rewrite, no dedup, no
        reorder semantics — silver's row set is already hash-unique).

        ``localCheckpoint`` materializes the rows BEFORE the overwrite —
        Spark refuses to overwrite a path its plan still reads, and the
        checkpoint also removes the re-read-during-delete race. At 100 TB
        compact in bucket slices (``buckets=[...]``) so one slice fits the
        cluster's storage memory; like the gold refresh, the dynamic
        partition overwrite is not atomic, and a crash mid-commit is
        repaired by :meth:`rebuild_silver` from immutable bronze.

        Single-writer assumption: do not compact concurrently with a
        ``persist`` to the same table.
        """
        silver = self.read("silver", table)
        if buckets is not None:
            silver = silver.filter(F.col(BUCKET_COL).isin(buckets))
        snap = silver.repartition(F.col(BUCKET_COL)).localCheckpoint(eager=True)
        snap.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(BUCKET_COL).parquet(self._path("silver", table))

    def cluster_silver(
        self, table: str, sort_cols: list[str], buckets: list[int] | None = None
    ) -> None:
        """Data-skipping maintenance: rewrite silver buckets SORTED on
        ``sort_cols`` so parquet row-group min/max statistics become
        tight, disjoint ranges — a range predicate on the sort key then
        prunes most row groups at scan time (the poor man's Z-order; for
        one dominant predicate column a plain sort is optimal).

        Same mechanics and single-writer contract as
        :meth:`compact_silver` (bucket-sliced dynamic overwrite,
        localCheckpoint before the rewrite, crash repaired by
        :meth:`rebuild_silver`), plus ``sortWithinPartitions`` — each
        bucket stays one file, rows unchanged, order now useful. Run it
        after compaction cadence on cold buckets; at 100 TB the rewrite
        is the price of every later scan skipping ~(1 - selectivity) of
        the bytes.
        """
        silver = self.read("silver", table)
        if buckets is not None:
            silver = silver.filter(F.col(BUCKET_COL).isin(buckets))
        snap = (
            silver.repartition(F.col(BUCKET_COL))
            .sortWithinPartitions(BUCKET_COL, *sort_cols)
            .localCheckpoint(eager=True)
        )
        snap.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(BUCKET_COL).parquet(self._path("silver", table))

    def vacuum_bronze(self, table: str, keep_runs: int) -> list[str]:
        """Bronze retention: drop the oldest run partitions beyond the
        newest ``keep_runs``. Returns the run_ids removed.

        Bronze grows one immutable partition per ingest forever; this is
        the retention knob. THE TRADE-OFF IS EXPLICIT: bronze is the only
        non-recomputable layer — vacuumed runs can no longer feed
        :meth:`rebuild_silver` / :meth:`rebuild_gold`, so the recompute
        horizon shrinks to the retained window (vacuum only after
        downstream layers are verified, e.g. post-compaction). run_ids
        sort lexicographically == chronologically for both producers
        (``run_YYYYMMDD…`` pipeline ids and zero-padded ``batch_%08d``
        streaming ids). Deletion is per-partition directory removal —
        O(removed runs), no data rewrite.
        """
        path = self._path("bronze", table)
        if not self._exists(path):
            return []
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(hconf)
        runs = sorted(
            f.getPath().getName().split("=", 1)[1]
            for f in fs.listStatus(hpath)
            if f.isDirectory() and f.getPath().getName().startswith("run_id=")
        )
        drop = runs[: max(len(runs) - keep_runs, 0)]
        for rid in drop:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/run_id={rid}"), True)
        return drop

    def maybe_compact(
        self, table: str, max_files_per_bucket: int = 4, buckets: list[int] | None = None
    ) -> bool:
        """Stats-driven compaction: rewrite silver only when fragmentation
        crosses the threshold (avg files per touched bucket >
        ``max_files_per_bucket``). Returns whether a rewrite ran.

        The policy knob a scheduler calls after every ingest: cheap
        metadata check (one count job over file names) when healthy, the
        full :meth:`compact_silver` only when the small-file tax is real —
        so continuous ingest amortizes rewrite cost against actual
        fragmentation instead of a blind cadence.
        """
        path = self._path("silver", table)
        if not self._exists(path):
            return False
        df = self.read("silver", table)
        if buckets is not None:
            df = df.filter(F.col(BUCKET_COL).isin(buckets))
        row = (
            df.select(F.col(BUCKET_COL), F.input_file_name().alias("_f"))
            .agg(
                F.countDistinct("_f").alias("files"),
                F.countDistinct(F.col(BUCKET_COL)).alias("parts"),
            )
            .collect()[0]
        )
        if row["parts"] == 0 or row["files"] <= max_files_per_bucket * row["parts"]:
            return False
        self.compact_silver(table, buckets=buckets)
        return True

    def zorder_silver(
        self,
        table: str,
        zorder_cols: list[str],
        buckets: list[int] | None = None,
        bits: int = 16,
    ) -> None:
        """Multi-column clustering: rewrite silver buckets ordered along a
        Z-curve over ``zorder_cols`` (the lakehouse OPTIMIZE ZORDER
        pattern, public knowledge) so range predicates on ANY of the
        columns prune row groups/pages — a plain sort optimizes one
        column's locality at the expense of the others.

        Key construction is pure expression work: each column is mapped to
        a ``bits``-bit rank bucket via ``percent_rank`` PARTITIONED BY the
        store bucket (rank-based, so skewed value distributions still
        spread; per-bucket ranks keep the window parallel — pruning is
        per-file, so each bucket only needs internally consistent
        scaling), then the buckets' bits are interleaved
        (:func:`zorder_key`). Mechanics and single-writer contract as
        :meth:`cluster_silver`.
        """
        from pyspark.sql import Window

        silver = self.read("silver", table)
        if buckets is not None:
            silver = silver.filter(F.col(BUCKET_COL).isin(buckets))
        ranked = []
        for c in zorder_cols:
            w = Window.partitionBy(BUCKET_COL).orderBy(F.col(c).asc_nulls_first())
            pr = F.percent_rank().over(w)
            ranked.append(
                F.least(
                    F.floor(pr * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
                )
            )
        z = zorder_key(ranked, bits=bits)
        snap = (
            silver.withColumn("_z", z)
            .repartition(F.col(BUCKET_COL))
            .sortWithinPartitions(BUCKET_COL, "_z")
            .drop("_z")
            .localCheckpoint(eager=True)
        )
        snap.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(BUCKET_COL).parquet(self._path("silver", table))

    def rebuild_silver(
        self, table: str, buckets: list[int] | None = None, key_cols: list[str] | None = None
    ) -> None:
        """Recovery path: recompute silver for ``buckets`` (default ALL)
        from immutable bronze — the union of every run's drop, deduped to
        the EARLIEST occurrence of each content hash (matching the persist
        path, whose anti-join keeps the first run's copy and drops later
        replays). Closes the durability story: bronze is the append-only
        source of truth; silver and gold are both pure recomputations
        (this method, then :meth:`rebuild_gold`), so the non-atomic
        dynamic-overwrite windows anywhere above bronze are always
        repairable. Cost is O(bronze history of the selected buckets).

        ``key_cols`` must match the values used by :meth:`persist` so the
        recomputed ``_kb`` agrees with the existing layout.
        """
        if key_cols is None:
            raise ValueError("rebuild_silver needs the table's key_cols")
        bronze = self.read("bronze", table)
        staged = bronze.withColumn(BUCKET_COL, _key_bucket(key_cols, self.n_buckets))
        if buckets is not None:
            staged = staged.filter(F.col(BUCKET_COL).isin(buckets))
        from pyspark.sql import Window

        w = Window.partitionBy(BUCKET_COL, HASH_COL).orderBy(
            F.col("extracted_at").asc_nulls_last(), F.col("run_id").asc_nulls_last()
        )
        first = (
            staged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .repartition(F.col(BUCKET_COL))
            .localCheckpoint(eager=True)
        )
        first.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(BUCKET_COL).parquet(self._path("silver", table))

    def stats(self, table: str) -> DataFrame:
        """Operational per-layer summary — rows, files, partitions — the
        numbers that drive maintenance decisions (files ≫ partitions in
        silver → :meth:`compact_silver`; bronze partitions = runs kept).
        One count job per existing layer; no data columns are read beyond
        the partition key, so at scale this is footer/metadata-bound.
        """
        out = []
        for layer, part_col in (("bronze", "run_id"), ("silver", BUCKET_COL), ("gold", BUCKET_COL)):
            path = self._path(layer, table)
            if not self._exists(path):
                continue
            row = (
                self.read(layer, table)
                # project first: input_file_name() is non-deterministic and
                # may not appear directly inside an aggregate
                .select(F.col(part_col), F.input_file_name().alias("_f"))
                .agg(
                    F.count("*").alias("n"),
                    F.countDistinct("_f").alias("f"),
                    F.countDistinct(F.col(part_col)).alias("p"),
                )
                .collect()[0]
            )
            out.append((layer, row["n"], row["f"], row["p"]))
        return self.spark.createDataFrame(
            out, "layer string, n_rows long, n_files long, n_partitions long"
        )

    # ------------------------------------------------- distinct sketches

    def _kmv_path(self, table: str, value_col: str) -> str:
        return f"{self.root}/stats/{table}_kmv_{value_col}"

    def update_kmv(
        self,
        table: str,
        batch_df: DataFrame,
        value_col: str,
        group_cols: list[str],
        k: int = 32,
    ) -> None:
        """Fold a batch into the persisted KMV distinct sketch for
        ``(table, value_col)`` — continuous distinct-count monitoring
        without ever rescanning history.

        The state is a few hundred bytes per group (k 8-byte hashes), so
        each update is O(batch) + a tiny merge; the union-then-re-minimize
        merge is exact (:func:`operators.curation.kmv_merge`), so the
        resulting sketch is identical to one built over all batches at
        once regardless of arrival order. Swap is write-tmp-then-rename —
        a reader never sees a half-written sketch; single writer is the
        caller's contract (holds inside foreachBatch by construction).
        """
        from activecampaign_api_data_pipeline_spark.operators.curation import (
            kmv_merge,
            kmv_state,
        )

        path = self._kmv_path(table, value_col)
        new = kmv_state(batch_df, value_col, group_cols, k)
        if self._exists(path):
            old = self.spark.read.parquet(path)
            merged = kmv_merge(old, new, group_cols, k)
        else:
            merged = new
        tmp = path + "__tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        src = jvm.org.apache.hadoop.fs.Path(tmp)
        dst = jvm.org.apache.hadoop.fs.Path(path)
        fs = dst.getFileSystem(hconf)
        if fs.exists(dst):
            fs.delete(dst, True)
        fs.rename(src, dst)

    def kmv_stats(self, table: str, value_col: str, k: int = 32) -> DataFrame:
        """Distinct-count estimates from the persisted sketch."""
        from activecampaign_api_data_pipeline_spark.operators.curation import kmv_estimate

        return kmv_estimate(
            self.spark.read.parquet(self._kmv_path(table, value_col)), k
        )

    # --------------------------------------------------------------- reads

    def read(self, layer: str, table: str) -> DataFrame:
        """mergeSchema: runs may add columns (API payload drift — the
        reference keeps every field, U1 ``pd.concat`` alignment); files
        written before a column existed read it as NULL."""
        return self.spark.read.option("mergeSchema", "true").parquet(
            self._path(layer, table)
        )

    def read_delta(self, table: str, run_id: str) -> DataFrame:
        """One run's delta = the bronze run partition (partition-pruned)."""
        return self.read("bronze", table).filter(F.col("run_id") == run_id)

    def read_best(self, table: str) -> DataFrame:
        """Gold if present else silver (reference ``_read_best_table`` :1000-1008)."""
        for layer in ("gold", "silver"):
            if self._exists(self._path(layer, table)):
                return self.read(layer, table).drop(BUCKET_COL)
        raise FileNotFoundError(f"{table}: no gold or silver layer in {self.root}")

    # ------------------------------------------------- state checkpoint (K3)

    @property
    def _state_path(self) -> str:
        return f"{self.root}/state.json"

    def load_state(self) -> dict:
        """Reference ``load_json`` of state.json (:70-74, :1557-1559)."""
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {}

    def save_state(self, state: dict) -> None:
        """Atomic-rename write, advanced only after a successful run (:1696-1700)."""
        os.makedirs(self.root, exist_ok=True)
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(tmp, self._state_path)


def zorder_key(bucketed: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of the given integer bucket
    columns into one Z-curve value (Morton order, public knowledge) —
    pure shift/and/or arithmetic, whole-stage-codegen'd.

    Bit b of column i lands at output position ``b * n_cols + i``, so
    sorting by the result alternates locality between the columns: a
    range predicate on ANY input column maps to O(few) contiguous runs
    of the curve instead of a full scan.
    """
    n = len(bucketed)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(bucketed):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def max_id_watermark(df: DataFrame, id_col: str) -> int | None:
    """A4/T1: high-watermark over a monotone key (reference :266, :1697-1698)."""
    row = df.agg(F.max(F.col(id_col).cast("long")).alias("m")).collect()[0]
    return row["m"]


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed+sorted catalog table for co-located joins.

    Two tables bucketed the same way on their join key hash-join WITHOUT a
    shuffle (no Exchange in the plan) — the pre-partitioning strategy for
    repeatedly-joined 100 TB fact tables. Requires the session catalog
    (``saveAsTable``); plain parquet paths cannot carry bucket metadata.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_digests(df: DataFrame, path: str, key_col: str, text_col: str) -> None:
    """K4 per-entity text sink: one directory per key holding its digest text

    (reference writes ``contact_<id>.txt`` per contact, :1684-1692).
    """
    df.select(F.col(key_col), F.col(text_col).alias("value")).write.mode(
        "overwrite"
    ).partitionBy(key_col).text(path)
