"""Streaming incremental curation: per-micro-batch admission against the
growing on-disk index, pinned to the same batch-equivalence spec as
incremental_curate — and idempotent on re-run from the checkpoint."""

from __future__ import annotations

import glob
import os
import time

import pyspark.sql.functions as F

from otlp_wire_spark.operators.curate import curate
from otlp_wire_spark.streaming.curate_stream import (
    admit_epoch,
    seed_curation_index,
    streaming_incremental_curate,
)
from test_incremental import _corpus, _full_batch_admitted, _sentence

_SCHEMA = "doc_id long, text string"


def _batch2_rows(new_rows):
    """Second micro-batch (ids 200+): planted dups vs the seed corpus AND
    vs batch 1 — the cross-epoch index-growth cases."""
    f1 = new_rows[3][1]   # batch-1 fresh text (id 103)
    f3 = new_rows[8][1]   # batch-1 fresh long text (id 108)
    return [
        (200, f1),                                  # exact dup of b1 admitted
        (201, f3 + " appended extra words"),        # near-dup of b1 doc
        (202, _sentence(9)),                        # exact dup of seed corpus
        (203, "the green light blinks over a far hill and the night is long"),
        (204, "a quiet rain falls on the tin roof and the fire burns low"),
    ]


def test_streaming_admission_equals_batch_and_resumes(spark, tmp_path_factory):
    old_rows, new_rows = _corpus()
    b2 = _batch2_rows(new_rows)
    src = str(tmp_path_factory.mktemp("cur_src"))
    index_dir = str(tmp_path_factory.mktemp("cur_idx"))
    admitted_dir = str(tmp_path_factory.mktemp("cur_adm"))
    ckpt = str(tmp_path_factory.mktemp("cur_ckpt"))

    old = spark.createDataFrame(old_rows, _SCHEMA)
    seed_curation_index(curate(old), index_dir)

    # two ingest files with ascending ids; mtime gap pins file-source order
    spark.createDataFrame(new_rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.2)
    spark.createDataFrame(b2, _SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_incremental_curate(
        stream, index_dir, admitted_dir, ckpt, bucket_cap=10_000_000
    )
    q.awaitTermination(180)

    epochs = glob.glob(os.path.join(admitted_dir, "epoch=*"))
    assert len(epochs) >= 2, "expected one epoch per ingest file"
    admitted = spark.read.parquet(os.path.join(admitted_dir, "epoch=*"))
    got = {r.doc_id for r in admitted.select("doc_id").collect()}

    both = spark.createDataFrame(old_rows + new_rows + b2, _SCHEMA)
    want = {
        r.doc_id
        for r in _full_batch_admitted(spark, both).select("doc_id").collect()
        if r.doc_id >= 100
    }
    assert got == want
    # cross-epoch classes actually exercised
    assert 200 not in got      # exact dup of a batch-1 admission
    assert 201 not in got      # near-dup of a batch-1 doc
    assert 202 not in got      # exact dup of the seed corpus
    assert {203, 204}.issubset(got)

    # resume: same checkpoint, no new files → no new epochs, same output
    q2 = streaming_incremental_curate(
        stream, index_dir, admitted_dir, ckpt, bucket_cap=10_000_000
    )
    q2.awaitTermination(120)
    admitted2 = spark.read.parquet(os.path.join(admitted_dir, "epoch=*"))
    got2 = {r.doc_id for r in admitted2.select("doc_id").collect()}
    assert got2 == got
    assert len(glob.glob(os.path.join(admitted_dir, "epoch=*"))) == len(epochs)


def test_epoch_retry_after_partial_index_write_is_idempotent(
    spark, tmp_path_factory
):
    """The crash window that used to wedge or empty the stream: an attempt
    of epoch E dies AFTER writing its index epoch but BEFORE the checkpoint
    commits, so the retry of E reads an index that already contains E's own
    fingerprint/shingle rows. The retry must (a) not raise the append-only
    id check against the batch's own ids, (b) re-admit the identical row
    set — never an empty epoch — and (c) leave index epochs identical to a
    single clean run."""
    old_rows, new_rows = _corpus()
    index_dir = str(tmp_path_factory.mktemp("rt_idx"))
    admitted_dir = str(tmp_path_factory.mktemp("rt_adm"))

    old = spark.createDataFrame(old_rows, _SCHEMA)
    seed_curation_index(curate(old), index_dir)
    batch = spark.createDataFrame(new_rows, _SCHEMA)

    # attempt 1 runs to completion — equivalent to dying exactly after the
    # last index write, one instant before the checkpoint commit
    admit_epoch(batch, 0, index_dir, admitted_dir, bucket_cap=10_000_000)
    first = {
        r.doc_id
        for r in spark.read.parquet(
            os.path.join(admitted_dir, "epoch=0")
        ).select("doc_id").collect()
    }
    assert first, "fixture must admit some rows"

    # attempt 2 = the foreachBatch retry of the SAME epoch (validate_ids
    # defaults True: without self-epoch exclusion this raises)
    admit_epoch(batch, 0, index_dir, admitted_dir, bucket_cap=10_000_000)
    second = {
        r.doc_id
        for r in spark.read.parquet(
            os.path.join(admitted_dir, "epoch=0")
        ).select("doc_id").collect()
    }
    assert second == first  # not empty, not different

    # index converged: exactly the seed + epoch-0 partitions, and epoch-0's
    # fingerprints cover the batch's exact-curated set both times
    fps = spark.read.option(
        "basePath", os.path.join(index_dir, "fingerprints")
    ).parquet(os.path.join(index_dir, "fingerprints"))
    assert {r.epoch for r in fps.select("epoch").distinct().collect()} == {
        "seed", "0"
    }


def test_first_epoch_retry_after_mid_write_crash_unseeded(
    spark, tmp_path_factory
):
    """The OTHER crash window: an UNSEEDED stream's very first epoch dies
    mid index write — only uncommitted ``_temporary/`` task files exist
    under ``epoch=0``. The retry's index probe must treat that as 'no
    index yet' (hidden entries are not committed data); counting them
    would send spark.read.parquet into an un-inferable directory and
    raise on every retry, permanently wedging the stream."""
    _, new_rows = _corpus()
    index_dir = str(tmp_path_factory.mktemp("mw_idx"))
    admitted_dir = str(tmp_path_factory.mktemp("mw_adm"))

    # simulate the killed attempt: uncommitted task files only
    for sub in ("fingerprints", "shingles"):
        tmp = os.path.join(
            index_dir, sub, "epoch=0", "_temporary", "0", "task_0"
        )
        os.makedirs(tmp)
        with open(os.path.join(tmp, "part-00000.parquet"), "wb") as f:
            f.write(b"\x00not a committed footer")

    from otlp_wire_spark.streaming.curate_stream import _read_index

    fps, sh, bt = _read_index(spark, index_dir)
    assert fps.count() == 0 and sh.count() == 0  # typed empties, no raise
    assert bt is not None and bt.count() == 0  # no shingle data ⇒ empty bands OK

    # the retry itself admits normally against the empty index
    batch = spark.createDataFrame(new_rows, _SCHEMA)
    admit_epoch(batch, 0, index_dir, admitted_dir, bucket_cap=10_000_000)
    admitted = spark.read.parquet(os.path.join(admitted_dir, "epoch=0"))
    assert admitted.count() > 0

    # and once committed data exists, the probe sees it again
    fps2, _sh2, bt2 = _read_index(spark, index_dir)
    assert fps2.count() > 0
    assert bt2 is not None and bt2.count() > 0  # epoch-0 band rows committed


def test_read_index_pre_band_layout_falls_back_to_none(
    spark, tmp_path_factory
):
    """An index written by a pre-band deployment (shingle epochs exist,
    no bands dir) must yield bands=None — incremental_curate then derives
    corpus bands from the shingle index. An empty band table here would
    silently claim 'no corpus buckets' and admit every near-dup of the
    seeded corpus."""
    old_rows, new_rows = _corpus()
    index_dir = str(tmp_path_factory.mktemp("legacy_idx"))
    seed_curation_index(curate(spark.createDataFrame(old_rows, _SCHEMA)), index_dir)
    import shutil

    shutil.rmtree(os.path.join(index_dir, "bands"))

    from otlp_wire_spark.streaming.curate_stream import _read_index

    fps, sh, bt = _read_index(spark, index_dir)
    assert sh.count() > 0 and bt is None

    # admission against the legacy index still drops cross-boundary
    # near-dups (the fallback derivation path)
    admitted_dir = str(tmp_path_factory.mktemp("legacy_adm"))
    batch = spark.createDataFrame(new_rows, _SCHEMA)
    admit_epoch(batch, 0, index_dir, admitted_dir, bucket_cap=10_000_000)
    got = {
        r.doc_id
        for r in spark.read.parquet(
            os.path.join(admitted_dir, "epoch=0")
        ).select("doc_id").collect()
    }
    both = spark.createDataFrame(old_rows + new_rows, _SCHEMA)
    want = {
        r.doc_id
        for r in _full_batch_admitted(spark, both).select("doc_id").collect()
        if r.doc_id >= 100
    }
    assert got == want  # fallback path still batch-equivalent
    assert {101, 105, 109} - got, "fixture must drop a near-dup"

    # the upgrade epoch must BACKFILL the derived corpus bands as a
    # committed partition — writing only its own band additions would
    # leave the bands dir half-covered, and the NEXT epoch (seeing band
    # data, trusting it as complete) would silently admit near-dups of
    # every pre-upgrade doc:
    assert glob.glob(
        os.path.join(index_dir, "bands", "epoch=backfill-0", "*.parquet")
    ), "upgrade epoch must commit the corpus band backfill"

    # epoch 1 against the upgraded index: a planted near-dup of a SEED
    # corpus doc (id 300 vs seed id 0) is the regression trigger — with
    # a half-covered band index its seed bucket-mate is invisible
    b2 = [
        (300, old_rows[0][1] + " extra tail"),  # near-dup of seed doc 0
        (301, "nine grey geese cross the pale sky before the early frost"),
    ]
    admit_epoch(
        spark.createDataFrame(b2, _SCHEMA), 1, index_dir, admitted_dir,
        bucket_cap=10_000_000,
    )
    got2 = {
        r.doc_id
        for r in spark.read.parquet(
            os.path.join(admitted_dir, "epoch=1")
        ).select("doc_id").collect()
    }
    everything = spark.createDataFrame(old_rows + new_rows + b2, _SCHEMA)
    want2 = {
        r.doc_id
        for r in _full_batch_admitted(spark, everything)
        .select("doc_id").collect()
        if r.doc_id >= 300
    }
    assert got2 == want2
    assert 300 not in got2, "seed near-dup must be rejected post-upgrade"
    assert 301 in got2


def test_read_index_probes_each_dir_exactly_once(spark, tmp_path, monkeypatch):
    """_read_index issues ONE _dir_has_data probe per index directory —
    each probe is a full recursive LIST of a directory whose file count
    grows with every committed epoch, so re-probing inside _load would
    double per-epoch planning cost on object stores."""
    import otlp_wire_spark.streaming.curate_stream as cs

    index_dir = str(tmp_path / "index")
    seed_curation_index(
        curate(spark.createDataFrame(
            [(i, _sentence(i)) for i in range(8)], "doc_id long, text string"
        )),
        index_dir,
    )
    calls: list[str] = []
    real = cs._dir_has_data

    def counting(spark_, path, exclude_epochs=()):
        calls.append(path)
        return real(spark_, path, exclude_epochs)

    monkeypatch.setattr(cs, "_dir_has_data", counting)
    fps, sh, bt = cs._read_index(spark, index_dir)
    assert bt is not None and fps.count() > 0 and sh.count() > 0
    assert len(calls) == len(set(calls)) == 3, calls
