import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from cardinality_estimation_evaluation_framework_spark.operators import aggregate as agg
from cardinality_estimation_evaluation_framework_spark.plans.checkpoint import (
    CheckpointedSketchBuild,
)
from cardinality_estimation_evaluation_framework_spark.sketches.hll import HllKernel
from cardinality_estimation_evaluation_framework_spark.streaming.stream_sketch import (
    StreamingSketch,
    run_stream_to_memory,
    windowed_event_counts,
)


def test_checkpointed_build_matches_direct(spark, tmp_path):
    df = spark.range(100_000).select(F.col("id").alias("item"))
    kernel = HllKernel(p=12, seed=5)
    build = CheckpointedSketchBuild(
        df, kernel, str(tmp_path), "run1", n_buckets=8, buckets_per_job=4
    ).run()
    assert build.is_complete()
    direct = agg.sketch(df, kernel)
    assert (build.result()["registers"] == direct["registers"]).all()
    lineage = build.lineage().toPandas()
    assert set(lineage["bucket"]) == set(range(8))
    assert lineage["rows"].sum() == 100_000
    assert (lineage["wall_ms"] >= 0).all()


def test_checkpoint_resume_after_failure(spark, tmp_path):
    df = spark.range(50_000).select(F.col("id").alias("item"))
    kernel = HllKernel(p=11, seed=6)
    # first run dies after 4 of 8 buckets
    b1 = CheckpointedSketchBuild(
        df, kernel, str(tmp_path), "run2", n_buckets=8, buckets_per_job=2
    ).run(fail_after_buckets=4)
    assert not b1.is_complete()
    done_before = b1.completed_buckets()
    assert len(done_before) == 4
    # resume in a NEW build object (fresh process semantics)
    b2 = CheckpointedSketchBuild(
        df, kernel, str(tmp_path), "run2", n_buckets=8, buckets_per_job=2
    ).run()
    assert b2.is_complete()
    # resume must not have reprocessed completed buckets
    lineage = b2.lineage().toPandas()
    assert len(lineage) == 8  # one row per bucket, no duplicates
    direct = agg.sketch(df, kernel)
    assert (b2.result()["registers"] == direct["registers"]).all()


def test_checkpoint_rerun_is_noop(spark, tmp_path):
    df = spark.range(10_000).select(F.col("id").alias("item"))
    kernel = HllKernel(p=10, seed=7)
    b = CheckpointedSketchBuild(df, kernel, str(tmp_path), "run3", n_buckets=4).run()
    lineage_count = b.lineage().count()
    b.run()  # no missing buckets → nothing written
    assert b.lineage().count() == lineage_count


def test_streaming_sketch_matches_batch(spark, tmp_path):
    src = tmp_path / "stream_src"
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    os.makedirs(src)
    # three incremental files
    for i in range(3):
        spark.range(i * 10_000, (i + 1) * 10_000).select(
            F.col("id").alias("item")
        ).write.mode("overwrite").parquet(str(src / f"part{i}"))
    kernel = HllKernel(p=12, seed=9)
    ss = StreamingSketch(kernel, str(state))
    stream = (
        spark.readStream.schema("item long").parquet(str(src / "part*"))
    )
    q = ss.start(stream, str(ckpt), trigger_once=True)
    q.awaitTermination(120)
    merged = ss.current_state()
    batch = agg.sketch(
        spark.range(30_000).select(F.col("id").alias("item")), kernel
    )
    assert (merged["registers"] == batch["registers"]).all()


def test_stateful_grouped_sketch_stream(spark, tmp_path):
    from cardinality_estimation_evaluation_framework_spark.streaming.stream_sketch import (
        stateful_grouped_sketch_stream,
    )

    src = tmp_path / "st_src"
    os.makedirs(src)
    # two batches arriving over time for two sources
    spark.range(20_000).select(
        (F.col("id") % 2).cast("string").alias("source"), F.col("id").alias("item")
    ).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema("source string, item long").parquet(str(src / "b*"))
    kernel = HllKernel(p=12, seed=4)
    aggd = stateful_grouped_sketch_stream(stream, kernel, "source", "item")
    q = (
        aggd.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_sketch")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second file arrives; state must accumulate
        spark.range(20_000, 40_000).select(
            (F.col("id") % 2).cast("string").alias("source"), F.col("id").alias("item")
        ).write.parquet(str(src / "b1"))
        q.processAllAvailable()
        out = spark.sql(
            "SELECT source, max(rows_seen) rows_seen, max_by(estimate, rows_seen) estimate "
            "FROM stateful_sketch GROUP BY source"
        ).collect()
        by_src = {r["source"]: r for r in out}
        for s in ("0", "1"):
            assert by_src[s]["rows_seen"] == 20_000
            assert abs(by_src[s]["estimate"] - 20_000) / 20_000 < 0.05
    finally:
        q.stop()


def test_windowed_event_counts_streaming(spark, sf_dir, tmp_path):
    # readStream needs a directory source
    ev_dir = tmp_path / "events_src"
    os.makedirs(ev_dir)
    shutil.copy(f"{sf_dir}/events.parquet", ev_dir / "events.parquet")
    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(ev_schema).parquet(str(ev_dir))
    aggd = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = run_stream_to_memory(spark, aggd, "wincounts")
    out = spark.sql("SELECT * FROM wincounts")
    try:
        rows = out.collect()
        assert len(rows) > 0
        batch = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n_events"))
        )
        assert len(rows) == batch.count()
    finally:
        q.stop()


def test_streaming_exact_dedup(spark, tmp_path):
    """First-seen docs are emitted exactly once across micro-batches; later
    duplicates only bump the state counter — the streaming twin of
    dedup.dedup_exact."""
    from cardinality_estimation_evaluation_framework_spark.streaming.stream_sketch import (
        streaming_exact_dedup,
    )

    src = tmp_path / "dd_src"
    os.makedirs(src)
    rows0 = [(str(i), f"doc text {i % 50}") for i in range(100)]  # 50 distinct texts
    spark.createDataFrame(rows0, "doc_id string, text string").write.parquet(
        str(src / "b0"))
    stream = spark.readStream.schema("doc_id string, text string").parquet(
        str(src / "b*"))
    dedup_stream = streaming_exact_dedup(stream)
    q = (
        dedup_stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .option("checkpointLocation", str(tmp_path / "dd_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        out0 = spark.sql("SELECT * FROM stream_dedup").collect()
        assert len(out0) == 50  # one row per distinct fingerprint
        # min STRING id wins (same ordering contract as batch dedup_exact)
        expected_first = {
            f"doc text {k}": min(str(k), str(50 + k)) for k in range(50)
        }
        got_first = {}
        for r in out0:
            got_first[r["fingerprint"]] = r["doc_id"]
        assert sorted(got_first.values()) == sorted(expected_first.values())
        # batch 2: all duplicates of batch 1 plus 10 new texts
        rows1 = [(str(1000 + i), f"doc text {i % 60}") for i in range(120)]
        spark.createDataFrame(rows1, "doc_id string, text string").write.parquet(
            str(src / "b1"))
        q.processAllAvailable()
        out1 = spark.sql("SELECT * FROM stream_dedup").collect()
        # only the 10 genuinely-new fingerprints (i%60 in 50..59) are added
        assert len(out1) == 60
        new_rows = [r for r in out1 if int(r["doc_id"]) >= 1000]
        assert len(new_rows) == 10
    finally:
        q.stop()


def test_windowed_sketch_stream(spark, tmp_path):
    """Per-window HLL estimates accumulate across micro-batches; a second
    batch for the same window updates it rather than double-counting."""
    from datetime import datetime, timezone

    from cardinality_estimation_evaluation_framework_spark.streaming.stream_sketch import (
        windowed_sketch_stream,
    )

    src = tmp_path / "ws_src"
    os.makedirs(src)
    h0 = datetime(2024, 1, 1, 10, 0, tzinfo=timezone.utc)
    h1 = datetime(2024, 1, 1, 11, 0, tzinfo=timezone.utc)
    rows0 = [(h0, i) for i in range(3000)] + [(h1, i) for i in range(1000)]
    spark.createDataFrame(rows0, "ts timestamp, item long").write.parquet(
        str(src / "b0"))
    stream = spark.readStream.schema("ts timestamp, item long").parquet(
        str(src / "b*"))
    kernel = HllKernel(p=14, seed=8)  # p=14: linear counting covers n=6000 exactly-ish
    q = (
        windowed_sketch_stream(stream, kernel, window="1 hour", watermark="2 hours")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("windowed_sketch")
        .option("checkpointLocation", str(tmp_path / "ws_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: window h0 gets 3000 MORE distinct ids (3000..5999)
        rows1 = [(h0, 3000 + i) for i in range(3000)]
        spark.createDataFrame(rows1, "ts timestamp, item long").write.parquet(
            str(src / "b1"))
        q.processAllAvailable()
        latest = {
            r["win_start"]: (r["estimate"], r["rows_seen"])
            for r in spark.sql(
                "SELECT win_start, max_by(estimate, rows_seen) estimate, "
                "max(rows_seen) rows_seen FROM windowed_sketch GROUP BY win_start"
            ).collect()
        }
        h0_naive = h0.replace(tzinfo=None)
        h1_naive = h1.replace(tzinfo=None)
        est_h0, n_h0 = latest[h0_naive]
        est_h1, n_h1 = latest[h1_naive]
        assert n_h0 == 6000 and n_h1 == 1000
        assert abs(est_h0 - 6000) / 6000 < 0.10
        assert abs(est_h1 - 1000) / 1000 < 0.10
    finally:
        q.stop()


def test_streaming_heavy_hitters(spark, tmp_path):
    """Skewed stream across three files: the streaming CM+candidates
    operator must surface the true heavy items with CM's no-undercount
    property (est >= true count), matching the batch exact top-k set."""
    from cardinality_estimation_evaluation_framework_spark.streaming.stream_sketch import (
        StreamingHeavyHitters,
    )

    src = tmp_path / "hh_src"
    os.makedirs(src)
    # heavy items 0..4 appear 2000x each (spread over files), tail unique
    for i in range(3):
        heavy = spark.range(5 * 2000).select(
            (F.col("id") % 5).alias("item"))
        tail = spark.range(10_000).select(
            (F.col("id") + 1_000_000 * (i + 1)).alias("item"))
        heavy.union(tail).write.parquet(str(src / f"f{i}"))

    hh = StreamingHeavyHitters(str(tmp_path / "hh_state"), width=4096,
                               depth=4, seed=3, per_batch_candidates=64)
    stream = spark.readStream.schema("item long").parquet(str(src / "f*"))
    q = hh.start(stream, str(tmp_path / "hh_ckpt"), trigger_once=True)
    q.awaitTermination(180)

    top = hh.top_k(5)
    assert sorted(item for item, _ in top) == [0, 1, 2, 3, 4]
    for item, est in top:
        assert est >= 3 * 2000  # CM never undercounts the true 6000


def test_streaming_quantile_sketches_match_batch(spark, tmp_path):
    """StreamingSketch is kernel-agnostic: KLL and t-digest stream builds
    answer within the rank-error bound AND agree with a batch build over
    the same data. (Exact state equality is NOT the contract here — both
    kernels' compaction depends on merge topology, which legitimately
    differs between epoch-merge and partition-tree-merge; the agreement
    bound is the invariant both sides guarantee.)"""
    from cardinality_estimation_evaluation_framework_spark.sketches.kll import (
        KllKernel,
    )
    from cardinality_estimation_evaluation_framework_spark.sketches.tdigest import (
        TDigestKernel,
    )

    src = tmp_path / "q_src"
    os.makedirs(src)
    for i in range(3):
        spark.range(i * 20_000, (i + 1) * 20_000).select(
            (F.col("id") % 9973).cast("double").alias("item")
        ).write.parquet(str(src / f"p{i}"))
    whole = spark.range(60_000).select(
        (F.col("id") % 9973).cast("double").alias("item"))

    for kernel in (KllKernel(k=200, seed=5), TDigestKernel(delta=100)):
        name = kernel.spec()["type"]
        ss = StreamingSketch(kernel, str(tmp_path / f"st_{name}"), col="item")
        stream = spark.readStream.schema("item double").parquet(str(src / "p*"))
        q = ss.start(stream, str(tmp_path / f"ck_{name}"), trigger_once=True)
        q.awaitTermination(180)
        est = kernel.quantile(ss.current_state(), [0.1, 0.5, 0.9])
        batch_est = kernel.quantile(
            agg.sketch(whole, kernel, col="item"), [0.1, 0.5, 0.9])
        for qq, v, bv in zip([0.1, 0.5, 0.9], est, batch_est):
            # true data is uniform over [0, 9973)
            assert abs(v / 9973 - qq) < 0.05, (name, qq, v)
            # stream build agrees with the batch build over the same data
            assert abs(v - bv) / 9973 < 0.05, (name, qq, v, bv)


def test_streaming_winnow_near_dup_matches_batch(spark, tmp_path):
    """Shared-fingerprint events across micro-batches == the batch kept
    self-join triple set (under-cap fps), including cross-batch pairs;
    aggregating events per pair reproduces winnow_near_dup_pairs. A
    saturated fingerprint (tiny cap) stops emitting and keeps O(1) state."""
    import random

    from cardinality_estimation_evaluation_framework_spark.operators import (
        dedup as dedup_ops,
        text as text_ops,
    )
    from cardinality_estimation_evaluation_framework_spark.streaming.stream_sketch import (
        streaming_winnow_near_dup,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(150)]
    mk = lambda: " ".join(rng.choice(vocab) for _ in range(30))  # noqa: E731
    base = [mk() for _ in range(8)]
    # batch 0: originals; batch 1: near-dups of them (cross-batch pairs)
    rows0 = [(f"a{i}", base[i]) for i in range(8)]
    rows1 = [(f"b{i}", base[i] + " tail bit") for i in range(8)]
    rows1 += [(f"c{i}", mk()) for i in range(4)]
    src = tmp_path / "wn_src"
    os.makedirs(src)
    spark.createDataFrame(rows0, "doc_id string, text string").write.parquet(
        str(src / "b0"))
    stream = spark.readStream.schema("doc_id string, text string").parquet(
        str(src / "b*"))
    q = (
        streaming_winnow_near_dup(stream, k=3, w=4)
        .writeStream.outputMode("append").format("memory")
        .queryName("wn_stream")
        .option("checkpointLocation", str(tmp_path / "wn_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows1, "doc_id string, text string").write.parquet(
            str(src / "b1"))
        q.processAllAvailable()
        got = {(r["fp"], r["doc_a"], r["doc_b"])
               for r in spark.sql("SELECT * FROM wn_stream").collect()}
    finally:
        q.stop()
    all_df = spark.createDataFrame(
        rows0 + rows1, "doc_id string, text string")
    fps = [(r["doc_id"], r["fp"]) for r in
           text_ops.winnow_fingerprints(all_df, k=3, w=4)
           .select("doc_id", "fp").distinct().collect()]
    by_fp: dict = {}
    for d, f in fps:
        by_fp.setdefault(f, set()).add(d)
    want = {(f, a, b) for f, ds in by_fp.items()
            for a in ds for b in ds if a < b}
    assert got == want and got  # includes cross-batch (a_i, b_i) pairs
    # event counts per pair == batch n_shared
    from collections import Counter
    per_pair = Counter((a, b) for _, a, b in got)
    batch_pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in
                   dedup_ops.winnow_near_dup_pairs(
                       all_df, k=3, w=4, min_shared=1).collect()}
    assert dict(per_pair) == batch_pairs

    # saturation: cap=2, three identical docs in one fp bucket -> the
    # third arrival pushes past cap, fp saturates, no further emits
    src2 = tmp_path / "wn_src2"
    os.makedirs(src2)
    same = "alpha beta gamma delta epsilon zeta"
    spark.createDataFrame(
        [("x1", same), ("x2", same)], "doc_id string, text string"
    ).write.parquet(str(src2 / "b0"))
    stream2 = spark.readStream.schema("doc_id string, text string").parquet(
        str(src2 / "b*"))
    q2 = (
        streaming_winnow_near_dup(stream2, k=3, w=4, max_bucket_size=2)
        .writeStream.outputMode("append").format("memory")
        .queryName("wn_stream2")
        .option("checkpointLocation", str(tmp_path / "wn_ck2"))
        .start()
    )
    try:
        q2.processAllAvailable()
        n0 = spark.sql("SELECT count(*) c FROM wn_stream2").collect()[0]["c"]
        assert n0 > 0  # x1-x2 pairs emitted while under cap
        spark.createDataFrame(
            [("x3", same), ("x4", same)], "doc_id string, text string"
        ).write.parquet(str(src2 / "b1"))
        q2.processAllAvailable()
        n1 = spark.sql("SELECT count(*) c FROM wn_stream2").collect()[0]["c"]
        assert n1 == n0  # saturated: x3/x4 add nothing
    finally:
        q2.stop()
