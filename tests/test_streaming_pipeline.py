"""Composed streaming curation pipeline (streaming/pipeline.py): the
full readStream → exact dedup → near-dup gate → windowed agg → serving
chain equals its batch composition, survives a checkpoint restart
mid-stream (restart ≡ continuation), and every per-epoch sink write is
replay-idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from hawk_pack_spark.streaming.pipeline import (
    StreamingCurationPipeline,
    canonical_text,
    start_curation_pipeline,
)

_SCHEMA = "doc_id long, text string, source string, n_chars int"


def _mkdocs(spark):
    rows = []
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "Sphinx of black quartz, judge my vow",
        "Pack my box with five dozen liquor jugs",
        "How vexingly quick daft zebras jump",
    ]
    for i in range(40):
        t = texts[i % 4] + f" variant {i // 4}"
        rows.append((i, t, "web" if i % 2 else "books", len(t)))
    # replays: same record (same doc_id) re-sent later
    replays = [rows[3], rows[7]]
    # exact copies under new ids
    copies = [(100 + i, rows[i][1], rows[i][2], rows[i][3]) for i in (0, 5)]
    # near-dups under new ids: case/punctuation mangled
    nd = [
        (200, rows[1][1].upper() + "!!", rows[1][2], rows[1][3] + 2),
        (201, "  " + rows[2][1].replace(" ", "  ") + ".", rows[2][2], rows[2][3]),
    ]
    b0 = rows[:20]
    b1 = rows[20:] + replays
    b2 = copies + nd
    return b0, b1, b2


def _batch_expected(spark, all_rows):
    """The batch composition: distinct records per doc_id, then min
    doc_id per canonical key."""
    df = spark.createDataFrame(all_rows, _SCHEMA).dropDuplicates(["doc_id"])
    canon = df.withColumn("canon", canonical_text(F.col("text")))
    best = canon.groupBy("canon").agg(F.min("doc_id").alias("doc_id"))
    return canon.join(best, ["canon", "doc_id"], "inner").drop("canon")


def _write_files(spark, tmp_path, batches, start=0):
    import os

    for i, b in enumerate(batches, start=start):
        spark.createDataFrame(b, _SCHEMA).coalesce(1).write.parquet(
            str(tmp_path / f"src/b{i}")
        )
        # pin mtimes a minute apart: FileStreamSource orders epochs by
        # modification time, and the first-arrival-wins near-dup gate
        # matches the batch oracle's MIN(doc_id) only when smaller ids
        # arrive in earlier epochs (ADVICE r11 — order by construction,
        # not write-timing)
        for root, _dirs, files in os.walk(str(tmp_path / f"src/b{i}")):
            for f_ in files:
                os.utime(os.path.join(root, f_), (1704067200 + 60 * i,) * 2)


def test_pipeline_equals_batch_composition(spark, tmp_path):
    b0, b1, b2 = _mkdocs(spark)
    _write_files(spark, tmp_path, [b0, b1, b2])
    q, pipe = start_curation_pipeline(
        spark,
        str(tmp_path / "src/*"),
        _SCHEMA,
        store_dir=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300)
    got = sorted(map(tuple, pipe.accepted().select(
        "doc_id", "text", "source", "n_chars").collect()))
    want = sorted(map(tuple, _batch_expected(spark, b0 + b1 + b2).select(
        "doc_id", "text", "source", "n_chars").collect()))
    assert got == want
    # replays and copies rejected: no accepted doc_id >= 100
    assert all(r[0] < 100 for r in got)
    # serving readout consistent with the accepted log
    serve = pipe.serve().collect()
    acc = pipe.accepted()
    n_acc = acc.count()
    assert sum(r["n_docs"] for r in serve) == n_acc
    by_key = {(r["day_id"], r["source"]): r for r in serve}
    for (d, s), r in by_key.items():
        grp = [
            a for a in acc.collect()
            if a["doc_id"] // 1440 == d and a["source"] == s
        ]
        best = max(grp, key=lambda a: (a["n_chars"], -a["doc_id"]))
        assert r["top_doc_id"] == best["doc_id"]
        assert r["sum_chars"] == sum(a["n_chars"] for a in grp)


def test_pipeline_checkpoint_restart_is_continuation(spark, tmp_path):
    b0, b1, b2 = _mkdocs(spark)
    # run 1: only b0 exists; stream drains it and stops
    _write_files(spark, tmp_path, [b0])
    q, pipe = start_curation_pipeline(
        spark, str(tmp_path / "src/*"), _SCHEMA,
        store_dir=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300)
    n_first = pipe.accepted().count()
    assert n_first > 0
    # process "dies"; b1/b2 arrive; a FRESH pipeline + query on the SAME
    # checkpoint and store resumes — b0 must not be reprocessed
    _write_files(spark, tmp_path, [b1, b2], start=1)
    q2, pipe2 = start_curation_pipeline(
        spark, str(tmp_path / "src/*"), _SCHEMA,
        store_dir=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q2.awaitTermination(300)
    got = sorted(map(tuple, pipe2.accepted().select(
        "doc_id", "text", "source", "n_chars").collect()))
    want = sorted(map(tuple, _batch_expected(spark, b0 + b1 + b2).select(
        "doc_id", "text", "source", "n_chars").collect()))
    assert got == want


def test_pipeline_epoch_replay_is_idempotent(spark, tmp_path):
    """An at-least-once redelivery of the SAME epoch must not
    double-count: per-epoch sinks are overwrites keyed by epoch id."""
    b0, _, _ = _mkdocs(spark)
    pipe = StreamingCurationPipeline(spark, str(tmp_path / "store"))
    df = spark.createDataFrame(b0, _SCHEMA)
    pipe.ingest_batch(df, 0)
    once = sorted(map(tuple, pipe.accepted().collect()))
    agg_once = sorted(map(tuple, pipe.serve().collect()))
    pipe.ingest_batch(df, 0)  # replay of epoch 0
    assert sorted(map(tuple, pipe.accepted().collect())) == once
    assert sorted(map(tuple, pipe.serve().collect())) == agg_once


def test_seen_store_read_failure_is_loud(spark, tmp_path):
    """A transient/corrupt seen-store read must FAIL the batch, not
    silently bypass the near-dup gate (ADVICE r11: only the
    first-epoch path-missing case may return None)."""
    import pytest

    from hawk_pack_spark.streaming.pipeline import StreamingCurationPipeline

    pipe = StreamingCurationPipeline(spark, str(tmp_path / "store"))
    # missing store: first epoch passes the gate open
    assert pipe._seen_keys(exclude_epoch=0) is None
    # corrupt store (unreadable garbage where parquet should be):
    # the read must raise, not return None
    seen = tmp_path / "store" / "seen" / "epoch=0"
    seen.mkdir(parents=True)
    (seen / "part-00000.parquet").write_bytes(b"not parquet at all")
    with pytest.raises(Exception):
        df = pipe._seen_keys(exclude_epoch=1)
        assert df is not None
        df.collect()
