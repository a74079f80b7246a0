"""Sequence packing — assign every document's tokens to fixed-capacity
training sequences ("pack and split"): tokens are laid out in deterministic
doc_id order and cut into sequences of exactly ``seq_len`` tokens;
a document straddling a boundary is split across the adjacent sequences.

The core is a GLOBAL prefix sum of token counts. A naive
``Window.orderBy(doc_id)`` with no partition key would pull every row into
ONE task — the classic global-window scale trap — so this implements the
distributed two-pass prefix sum:

1. range-repartition by doc_id (cluster-ordered partitions),
2. per-partition token totals → collected (one tiny row per partition) →
   exclusive prefix offsets, rejoined via a broadcast map,
3. per-partition running sum (window PARTITIONED by the range bucket —
   parallel) + the partition's offset = the exact global prefix.

Driver traffic is O(partitions), never O(rows). The DuckDB oracle computes
the same packing with a single global window — the independent formulation
the distributed one must reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_token_offsets(
    df: DataFrame, id_col: str = "doc_id", count_col: str = "n_tokens"
) -> DataFrame:
    """Attach ``tok_before`` — the exact number of tokens in all documents
    with a smaller id — via the distributed two-pass prefix sum."""
    parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    ranged = df.repartitionByRange(parts, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # pass 1: per-partition totals + min id (to order the partitions)
    psums = ranged.groupBy("_pid").agg(
        F.sum(count_col).alias("_psum"), F.min(id_col).alias("_pmin")
    ).collect()  # O(partitions) rows — the only driver traffic
    offsets: dict[int, int] = {}
    running = 0
    for r in sorted(psums, key=lambda r: (r["_pmin"] is None, r["_pmin"])):
        offsets[r["_pid"]] = running
        running += int(r["_psum"] or 0)
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    # pass 2: parallel within-partition running sums + the offset.
    # Explicit ROWS frame: the default RANGE frame makes duplicate ids
    # PEERS sharing one cumulative value → overlapping token intervals;
    # ROWS assigns disjoint offsets (matching the oracle's ROWS BETWEEN).
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_local_cum", F.sum(count_col).over(w))
        .withColumn(
            "tok_before",
            (omap[F.col("_pid")] + F.col("_local_cum") - F.col(count_col)).cast(
                "long"
            ),
        )
        .drop("_pid", "_local_cum")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
) -> DataFrame:
    """(seq_id, doc_id, doc_tok_start, doc_tok_end, n_toks) — one row per
    (document, sequence) segment. Every sequence except the last carries
    exactly ``seq_len`` tokens; documents are never reordered and split
    only at sequence boundaries. Zero-token documents are dropped (they
    occupy no sequence space)."""
    with_off = global_token_offsets(df, id_col, count_col).where(
        F.col(count_col) > 0
    )
    n = F.col(count_col).cast("long")
    before = F.col("tok_before")
    first_seq = F.floor(before / seq_len)
    last_seq = F.floor((before + n - 1) / seq_len)
    exploded = with_off.select(
        F.col(id_col),
        before.alias("_b"),
        n.alias("_n"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    s = F.col("seq_id")
    start = F.greatest(F.lit(0), s * seq_len - F.col("_b"))
    end = F.least(F.col("_n"), (s + 1) * seq_len - F.col("_b"))
    return exploded.select(
        "seq_id",
        F.col(id_col),
        start.cast("long").alias("doc_tok_start"),
        end.cast("long").alias("doc_tok_end"),
        (end - start).cast("long").alias("n_toks"),
    )
