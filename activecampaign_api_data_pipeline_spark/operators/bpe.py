"""Byte-pair-encoding tokenizer training + application, Spark-first.

The real tokenizer-training shape a 100 TB corpus pipeline needs
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public literature): iterate K times, each
round (1) count adjacent-symbol pairs corpus-wide, (2) take the argmax
pair, (3) merge it everywhere. ``staged_r10.text_bpe_pairs`` computes
round 1's count table; this module runs the LOOP and applies the
learned merges.

Distribution strategy — the standard one for corpus-scale BPE:

- Train on the WORD-FREQUENCY table, not the corpus. The fact stream
  collapses to (distinct word, count) in one map-side-combinable
  aggregate; every later step touches only that table (distinct words
  are bounded in the tens of millions even at 100 TB — the Heaps'-law
  compression every fast BPE trainer exploits).
- Each merge round is ONE map-side-combinable pair aggregate over the
  word table + ONE bounded driver scalar (the argmax row — a collect of
  exactly one row, the same bounded-scalar pattern as the ANN candidate
  push) + ONE map-only string rewrite. K rounds = K small shuffles of
  pair-count partials; text never shuffles.
- Lineage is cut each round (``localCheckpoint``) so round K's plan
  does not replay rounds 1..K-1 — the PageRank discipline.

Symbol-sequence representation: a word's symbols are joined with TWO
spaces and padded with one (``' h  e  y '``). A pair (l, r) then merges
via plain ``replace(s, ' l  r ', ' lr ')`` — the double-space interior
makes adjacent occurrences share the boundary space, so one
left-to-right non-overlapping replace implements exactly BPE's greedy
merge scan (``' a  a  a '`` → ``' aa  a '``), and the single-space
frame prevents cross-symbol false matches (``' xa  b '`` never matches
``' a  b '``). Identical plain-``replace`` semantics in Spark and
DuckDB make the trainer oracle-exact.

Tokenization convention matches ``text_bpe_pairs``: lowercase, split on
``[^a-z0-9]+``, words of length ≥ 2 (so symbols are ``[a-z0-9]+`` and
the replace patterns never need escaping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bpe_word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the one aggregate that ever sees
    the text. Map-side combinable; output is Heaps'-law small."""
    return (
        docs.select(
            F.explode(F.split(F.lower(text_col), r"[^a-z0-9]+")).alias("word")
        )
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _spaced(word) -> F.Column:
    """``'hey'`` → ``' h  e  y '`` (see module docstring for why)."""
    return F.concat(
        F.lit(" "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length(word)),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ),
            "  ",
        ),
        F.lit(" "),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency — the argmax
    input for one merge round. Pure JVM (transform/sequence/explode).

    Words fully merged to ONE symbol are filtered BEFORE the pair
    expansion: they contribute no pairs, and Spark's ``sequence(1, 0)``
    generates a DESCENDING ``[1, 0]`` (unlike DuckDB's empty list), so
    an unguarded transform would index past the array — a crash that
    only appears once the merge count is high enough to collapse some
    word entirely (caught at K=16 on the real corpus; K=4 never gets
    there)."""
    return (
        state.withColumn("t", F.split(F.trim(F.col("s")), "  "))
        .filter(F.size("t") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " j -> struct(element_at(t, j) AS lhs,"
                    "             element_at(t, j + 1) AS rhs))"
                )
            ).alias("p"),
        )
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("cnt").alias("c"))
    )


def _greedy_disjoint(rows, m: int) -> list:
    """Driver-side selection for one BATCHED merge round: walk the pair
    candidates in the sequential trainer's exact order (count desc,
    lexicographic) and accept up to ``m`` whose symbols neither touch
    any accepted pair's symbols NOR its merged output (the merged-output
    check blocks intra-round chaining — a pair consuming a symbol that
    only exists after another accepted merge would see counts the
    pre-round aggregate never measured). Under this rule the accepted
    replaces commute and each accepted pair's count is unchanged by the
    others, which is exactly the regime where batched == sequential."""
    used: set[str] = set()
    out = []
    for b in rows:
        syms = {b["lhs"], b["rhs"], b["lhs"] + b["rhs"]}
        if syms & used:
            continue
        out.append(b)
        used |= syms
        if len(out) == m:
            break
    return out


def bpe_train(
    words: DataFrame, n_merges: int, batch_merges: int = 1
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` merges from a (word, cnt) table. Returns the
    merge list (step/lhs/rhs/merged/n, deterministic count-desc +
    lexicographic tiebreak) and the final symbol state (word, cnt, s).

    Driver-bounded loop: K is the vocabulary budget (a constant like
    30k in production, pinned small in tests) — each round costs one
    pair aggregate, one bounded collect, one map-only rewrite.

    ``batch_merges > 1`` is the production-throughput flag: each round
    collects the top candidate pairs (a bounded ``4 * batch_merges``-row
    scalar) and applies every NON-CONFLICTING prefix pair in one rewrite
    (:func:`_greedy_disjoint`), so a 30k-vocabulary budget costs
    ~30k/M pair aggregates instead of 30k. Where the selected merges
    don't interact, the learned merge list is IDENTICAL to the
    sequential trainer's (test-pinned); where they would interact, the
    conflict rule defers the later pair to the next round rather than
    merging it against stale counts — the standard batched-BPE
    approximation, biased only in ROUND grouping, never in pair counts.
    """
    state = words.withColumn("s", _spaced("word")).localCheckpoint(eager=True)
    merges: list[dict] = []
    while len(merges) < n_merges:
        m = min(batch_merges, n_merges - len(merges))
        cand = (
            _pair_counts(state)
            .orderBy(F.col("c").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(max(4 * m, 1))
            .collect()
        )
        accepted = _greedy_disjoint(cand, m)
        if not accepted:
            break
        s = F.col("s")
        for b in accepted:
            merges.append(
                {
                    "step": len(merges) + 1,
                    "lhs": b["lhs"],
                    "rhs": b["rhs"],
                    "merged": b["lhs"] + b["rhs"],
                    "n": b["c"],
                }
            )
            s = F.replace(
                s,
                F.lit(f" {b['lhs']}  {b['rhs']} "),
                F.lit(f" {b['lhs']}{b['rhs']} "),
            )
        state = state.withColumn("s", s).localCheckpoint(eager=True)
    return merges, state


def bpe_apply(
    words: DataFrame, merges: list[dict], chunk_size: int = 256
) -> DataFrame:
    """Tokenize a (word, ...) frame with learned merges: fold the K
    replaces in training order (BPE application IS replaying the merge
    history) and return the frame with a ``tokens`` array column.
    Map-only — no shuffle, no Python.

    The replace chain is CHUNKED every ``chunk_size`` merges with a
    lineage cut between chunks: a production vocabulary (K ≈ 30k) as
    ONE nested expression tree is a Catalyst analysis/codegen bomb (the
    repo's round-2 lesson — inline HOF literals cost ~9 s of analysis
    per plan), while ~256-deep chains analyze in milliseconds and the
    checkpoint materializes each chunk once. Small K (every
    oracle-paired query) stays a single chunk — byte-identical to the
    unchunked path."""
    out = words
    s = _spaced("word")
    for i, m in enumerate(merges):
        s = F.replace(
            s, F.lit(f" {m['lhs']}  {m['rhs']} "), F.lit(f" {m['lhs']}{m['rhs']} ")
        )
        if (i + 1) % chunk_size == 0 and (i + 1) < len(merges):
            out = out.withColumn("_bpe_s", s).localCheckpoint(eager=True)
            s = F.col("_bpe_s")
    return out.withColumn("tokens", F.split(F.trim(s), "  ")).drop("_bpe_s")
