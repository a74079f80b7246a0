"""Streaming incremental curation — documents arrive as a stream and are
admitted into the curated corpus micro-batch by micro-batch, against an
on-disk curation index that grows with each epoch.

Shape (the 100 TB ingest path): the corpus itself is never re-read. Each
micro-batch runs ``incremental_curate`` against the index (md5
fingerprints + shingle table + LSH banded-signature table of everything
exact-curated so far — the band table is what keeps each epoch's MinHash
work O(|batch|)), writes the admitted rows to a per-epoch sink directory,
and appends the batch's own index rows as a new epoch partition. All per-epoch writes use
``overwrite`` into an ``epoch=<id>`` subdirectory AND each batch reads
the index excluding its own epoch (a failed attempt's partial index
writes must not feed the retry — see ``admit_epoch``), so a foreachBatch
retry of the same epoch is idempotent — the streaming analog of the
pipeline's per-stage manifest resume (pipeline.py) and the count-
conservation discipline of streaming_route.

Ordering contract: micro-batches must arrive with ascending doc ids
(append-only, same contract as batch ``incremental_curate``; the file
source's timestamp ordering provides this for append-only ingest dirs).
``validate_ids=True`` makes a violation a loud per-batch error.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_FPS = "fingerprints"
_SH = "shingles"
_BANDS = "bands"


def seed_curation_index(
    curated: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    impl: str = "expr",
) -> None:
    """Write the batch-built index of an EXISTING corpus as epoch 'seed'
    partitions — the bootstrap before streaming ingest starts. ``curated``
    is the exact-curated set (near-dup stage INPUT; tombstone contract,
    see incremental_curate). ``k``/``bands`` must match the values later
    passed to the stream (band_sig is a function of them)."""
    from otlp_wire_spark.operators.curate import curation_index

    fps, sh, bt = curation_index(curated, id_col, text_col, n, k, bands, impl)
    fps.write.mode("overwrite").parquet(os.path.join(index_dir, _FPS, "epoch=seed"))
    sh.write.mode("overwrite").parquet(os.path.join(index_dir, _SH, "epoch=seed"))
    bt.write.mode("overwrite").parquet(
        os.path.join(index_dir, _BANDS, "epoch=seed")
    )


def _dir_has_data(
    spark: SparkSession, path: str, exclude_epochs: tuple[str, ...] = ()
) -> bool:
    """Existence probe through the Hadoop FileSystem API — ``os.path``
    only sees the driver-local filesystem, and the 100 TB ingest shape
    implies HDFS/S3 paths where a local check silently reports 'no index'
    and the stream would re-admit duplicates of the whole seeded corpus.

    True only if at least one COMMITTED data file exists under ``path`` —
    hidden entries (``_temporary``, ``_SUCCESS``, dotfiles) don't count.
    A first-epoch attempt killed mid index write leaves only
    ``epoch=0/_temporary/`` task files; counting those as data would make
    the retry's parquet read fail schema inference (no committed footers)
    on every attempt — the exact wedge the epoch-exclusion retry contract
    exists to prevent.

    ``exclude_epochs`` drops files under those ``epoch=<x>/`` partitions
    from the decision: a retry must decide 'does band data exist?' on the
    index AS THE RETRY SEES IT — counting the failed attempt's own
    partitions would turn 'no band index yet' (→ derive/backfill) into
    'band index present but empty after exclusion' (→ silently no corpus
    buckets, every seed near-dup admitted)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return False
    skip = {f"epoch={e}" for e in exclude_epochs}
    root = fs.getFileStatus(p).getPath().toUri().getPath()
    it = fs.listFiles(p, True)  # recursive; files only
    while it.hasNext():
        f = it.next().getPath().toUri().getPath()
        rel = f[len(root):].lstrip("/")
        # any hidden path segment (Spark/Hadoop convention) ⇒ uncommitted
        # or metadata-only — skip
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
            continue
        if rel.split("/", 1)[0] in skip:
            continue
        return True
    return False


def _read_index(
    spark: SparkSession, index_dir: str, exclude_epoch: str | None = None
) -> tuple[DataFrame, DataFrame, "DataFrame | None"]:
    """All epoch partitions of the index; typed empties when none exist yet
    (first batch of a fresh corpus).

    ``exclude_epoch`` drops that one epoch partition — the retry-idempotency
    keystone: a foreachBatch retry of epoch E re-reads the index AFTER a
    failed attempt may already have written ``epoch=E`` rows. Without the
    exclusion the batch sees its own fingerprints: ``validate_ids=True``
    then raises on every retry (the stream wedges), and with it off every
    doc anti-joins against itself and the epoch is rewritten EMPTY. The
    epoch partition column is read via partition discovery and compared as
    a string (epoch values mix 'seed' with numeric ids).

    Third return: the banded-signature table, or ``None`` when the index
    (as this epoch sees it, post-exclusion) predates the band layout —
    shingle epochs exist but no band partitions. The caller then derives
    corpus bands from the shingle index and BACKFILLS them as a committed
    partition (admit_epoch), so the upgrade happens exactly once. An
    empty DataFrame would be WRONG there: it would silently claim 'no
    corpus buckets' and admit every near-dup of the seeded corpus."""
    fps_dir = os.path.join(index_dir, _FPS)
    sh_dir = os.path.join(index_dir, _SH)
    bands_dir = os.path.join(index_dir, _BANDS)
    # the current epoch's own partitions are suspect on retry — including
    # its band BACKFILL partition (see admit_epoch), which a failed
    # attempt may have committed partially; a half-covered band index
    # silently admits near-dups, so the retry re-derives + overwrites it
    excl: tuple[str, ...] = (
        ()
        if exclude_epoch is None
        else (exclude_epoch, f"backfill-{exclude_epoch}")
    )

    def _load(path: str, schema: str, has_data: bool) -> DataFrame:
        # has_data is the probe result computed ONCE below — re-probing
        # here would double the recursive LIST walks per micro-batch on
        # object stores, whose cost grows with every committed epoch
        if not has_data:
            return spark.createDataFrame([], schema)
        df = spark.read.option("basePath", path).parquet(path)
        if excl:
            df = df.where(~F.col("epoch").cast("string").isin(*excl))
        return df.drop("epoch")

    # all decided on the index AS THIS EPOCH SEES IT (post-exclusion):
    # a failed attempt's own epoch=N / backfill-N files must not flip
    # 'no band layout yet' (→ None → derive) into 'bands present' (→ an
    # empty table that claims no corpus buckets). Exactly one probe per
    # index directory per epoch.
    have_fps = _dir_has_data(spark, fps_dir, excl)
    have_sh = _dir_has_data(spark, sh_dir, excl)
    have_bands = _dir_has_data(spark, bands_dir, excl)
    return (
        _load(fps_dir, "fp string", have_fps),
        _load(sh_dir, "id long, sh array<string>", have_sh),
        _load(bands_dir, "id long, band int, band_sig string", have_bands)
        if (have_bands or not have_sh)
        else None,
    )


def admit_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    admitted_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    min_tokens: int = 3,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    bucket_cap: int = 1000,
    validate_ids: bool = True,
) -> None:
    """One micro-batch admission — the foreachBatch body, module-level so
    retry idempotency is directly testable. RETRY CONTRACT: the index is
    read EXCLUDING this epoch's own partitions, because a prior failed
    attempt of the same epoch may have written ``epoch=<id>`` index rows
    before dying pre-checkpoint-commit; seeing them would make the batch
    collide with itself (validate_ids raises forever / the epoch rewrites
    empty — see _read_index). All four epoch-keyed writes (admitted docs,
    fingerprints, shingles, bands) then epoch-overwrite, so a re-run
    converges to the identical committed state; the one non-epoch write —
    the band BACKFILL partition for a pre-band-layout index — has its own
    exclude-then-overwrite protocol (below) and is likewise idempotent."""
    from otlp_wire_spark.operators.curate import incremental_curate

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    fps, sh, bt = _read_index(spark, index_dir, exclude_epoch=str(epoch_id))
    if bt is None:
        # bt None ⟺ the index this epoch sees has shingle epochs but no
        # band partitions (_read_index) — the pre-band-layout upgrade.
        # Derive the corpus band
        # table from the shingle index ONCE and commit it as a backfill
        # partition. Writing only this epoch's band additions would leave
        # the bands dir half-covered — the NEXT epoch would see band data,
        # trust it as the complete corpus band index, and silently admit
        # near-dups of every pre-upgrade doc. The backfill is epoch-keyed
        # (backfill-<id>) and read back from its committed files, so a
        # retry of this epoch excludes + re-derives + overwrites it
        # (idempotent, same as the epoch's own writes).
        from otlp_wire_spark.operators.dedup import band_table_from_shingles

        backfill_dir = os.path.join(
            index_dir, _BANDS, f"epoch=backfill-{epoch_id}"
        )
        band_table_from_shingles(sh.select("id", "sh"), k, bands).write.mode(
            "overwrite"
        ).parquet(backfill_dir)
        bt = spark.read.parquet(backfill_dir)
    admitted, add_fps, add_sh, add_bands = incremental_curate(
        batch_df, fps, sh, id_col, text_col,
        langs, min_quality, min_tokens,
        k, bands, n, threshold, bucket_cap,
        validate_ids=validate_ids, with_index_additions=True,
        existing_bands=bt,
    )
    admitted.write.mode("overwrite").parquet(
        os.path.join(admitted_dir, f"epoch={epoch_id}")
    )
    # index additions AFTER the admitted write: a retry that died
    # between the two writes re-runs the whole epoch and overwrites
    # both — never a half-indexed epoch feeding the next batch,
    # because the next batch only starts after this epoch commits
    add_fps.write.mode("overwrite").parquet(
        os.path.join(index_dir, _FPS, f"epoch={epoch_id}")
    )
    add_sh.write.mode("overwrite").parquet(
        os.path.join(index_dir, _SH, f"epoch={epoch_id}")
    )
    add_bands.write.mode("overwrite").parquet(
        os.path.join(index_dir, _BANDS, f"epoch={epoch_id}")
    )


def streaming_incremental_curate(
    docs_stream: DataFrame,
    index_dir: str,
    admitted_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    min_tokens: int = 3,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    bucket_cap: int = 1000,
    validate_ids: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """Admit a document stream into the curated corpus. Per micro-batch:
    read index → incremental_curate → write admitted rows to
    ``admitted_dir/epoch=<id>`` → append the batch's index rows as
    ``index_dir/{fingerprints,shingles}/epoch=<id>``. Epoch-keyed
    overwrites make retries idempotent (see ``admit_epoch`` for the
    retry contract); the checkpoint makes the whole ingest resumable."""

    def _admit(batch_df: DataFrame, epoch_id: int) -> None:
        admit_epoch(
            batch_df, epoch_id, index_dir, admitted_dir,
            id_col, text_col, langs, min_quality, min_tokens,
            k, bands, n, threshold, bucket_cap, validate_ids,
        )

    writer = (
        docs_stream.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
