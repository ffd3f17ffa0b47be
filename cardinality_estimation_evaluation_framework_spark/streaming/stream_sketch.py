"""Streaming sketch aggregation.

The reference is batch-only (SURVEY §2.i) — streaming is an engine
extension: because every sketch state is a small associative monoid, a
stream build is just ``foreachBatch``: per micro-batch, the same
partial+tree-merge pipeline produces one batch-state, which merges into a
running state persisted next to the streaming checkpoint. Exactly-once:
the state file is written under the epoch id and the latest epoch wins —
replaying a batch overwrites the same epoch file with identical content
(merges are idempotent-safe because the running state is rebuilt from
epoch 0..k files, each of which is derived from a deterministic batch).

Also provides the built-in watermark + tumbling-window aggregation over the
events stream (late-data semantics come from Spark itself).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from cardinality_estimation_evaluation_framework_spark.operators import aggregate as agg
from cardinality_estimation_evaluation_framework_spark.sketches.base import (
    SketchKernel,
    State,
)


class StreamingSketch:
    """Incremental sketch over a file stream via foreachBatch."""

    def __init__(self, kernel: SketchKernel, state_dir: str, col: str = "item"):
        self.kernel = kernel
        self.state_dir = state_dir
        self.col = col
        os.makedirs(state_dir, exist_ok=True)

    def _epoch_path(self, epoch_id: int) -> str:
        return os.path.join(self.state_dir, f"epoch_{epoch_id:012d}.bin")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        state = agg.sketch(batch_df, self.kernel, col=self.col)
        with open(self._epoch_path(epoch_id), "wb") as fh:
            fh.write(self.kernel.pack(state))

    def current_state(self) -> State:
        paths = sorted(
            p for p in os.listdir(self.state_dir)
            if p.startswith("epoch_") and p.endswith(".bin")
        )
        packed = []
        for p in paths:
            with open(os.path.join(self.state_dir, p), "rb") as fh:
                packed.append(fh.read())
        if not packed:
            return self.kernel.empty()
        return self.kernel.unpack(self.kernel.merge_packed(packed))

    def start(self, stream_df: DataFrame, checkpoint_dir: str, trigger_once: bool = False):
        writer = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class StreamingHeavyHitters(StreamingSketch):
    """Streaming top-k heavy hitters: count-min + per-batch candidates.

    Streaming twin of ``frequency_ops.heavy_hitters_countmin``, built on
    StreamingSketch's epoch discipline (replays overwrite the same epoch
    file with identical content). Per micro-batch: (a) the batch's
    count-min partial is packed under the epoch id (inherited); (b) the
    batch's exact top-``per_batch_candidates`` items land in an epoch
    candidate file. ``top_k`` merges all epoch CM states (counter-add
    monoid) and point-estimates the union of candidates.

    Guarantees: count-min never undercounts, so every reported count is an
    upper bound within eps*N of truth. The candidate set is a recall
    heuristic — an item is considered iff it was ever batch-locally
    frequent; with candidates >> k and steady-ish streams the true top-k
    are all captured (pytest pins a skewed-stream case). State is O(KB)
    per epoch regardless of stream size.
    """

    def __init__(self, state_dir: str, width: int = 8192, depth: int = 4,
                 seed: int = 0, col: str = "item",
                 per_batch_candidates: int = 256):
        from cardinality_estimation_evaluation_framework_spark.sketches.countmin import (
            CountMinKernel,
        )

        super().__init__(
            CountMinKernel(width=width, depth=depth, seed=seed),
            state_dir, col)
        self.per_batch_candidates = per_batch_candidates

    def _cand_path(self, epoch_id: int) -> str:
        return os.path.join(self.state_dir, f"epoch_{epoch_id:012d}.npy")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # the batch is consumed twice (CM build + candidate top-N): cache
        # it for the duration of this synchronous call so the source files
        # are scanned once per trigger
        batch_df = batch_df.persist()
        try:
            super().process_batch(batch_df, epoch_id)
            top = (
                batch_df.groupBy(self.col)
                .agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc(self.col))
                .limit(self.per_batch_candidates)
                .collect()
            )
        finally:
            batch_df.unpersist()
        cands = np.array([int(r[0]) for r in top], dtype=np.int64)
        np.save(self._cand_path(epoch_id), cands)

    def top_k(self, k: int = 20) -> list[tuple[int, int]]:
        """[(item, est_count)] sorted by est DESC, item ASC."""
        cands: list[np.ndarray] = []
        for p in sorted(os.listdir(self.state_dir)):
            # mirror current_state()'s epoch_ prefix check so a stray .npy
            # in the directory is never treated as a candidate array
            if p.startswith("epoch_") and p.endswith(".npy"):
                cands.append(np.load(os.path.join(self.state_dir, p)))
        if not cands:
            return []
        items = np.unique(np.concatenate(cands))
        est = self.kernel.query(self.current_state(), items)
        order = np.lexsort((items, -est))[:k]
        return [(int(items[i]), int(est[i])) for i in order]


def stateful_grouped_sketch_stream(
    stream_df: DataFrame,
    kernel: SketchKernel,
    key_col: str,
    item_col: str = "item",
):
    """Per-key incremental sketches as STREAMING STATE
    (``applyInPandasWithState``): the group state is the packed sketch;
    each micro-batch folds its rows into the state and emits the current
    estimate. State size is O(m) per key regardless of stream length —
    exactly why sketches are the right streaming aggregate.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.exists:
            st = kernel.unpack(bytes(state.get[0]))
            n = int(state.get[1])
        else:
            st = kernel.empty()
            n = 0
        for pdf in pdfs:
            vals = pdf[item_col].to_numpy(dtype=np.int64, na_value=0)
            kernel.update(st, vals)
            n += len(vals)
        state.update((kernel.pack(st), n))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "estimate": [float(kernel.estimate(st)[0])],
                "rows_seen": [n],
            }
        )

    proj = stream_df.select(key_col, F.col(item_col).cast("long").alias(item_col))
    return proj.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, estimate double, rows_seen long",
        stateStructType="sketch binary, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts by event_type — the
    streaming twin of q_events_hourly."""
    # parquet timestamps may arrive as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    w = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w, F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )


def run_stream_to_memory(spark: SparkSession, agg_df: DataFrame, name: str):
    """Drive a streaming agg synchronously for tests/smoke (memory sink)."""
    q = (
        agg_df.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming exact dedup: emit only FIRST-SEEN documents.

    LLM-pipeline shape: an unbounded ingest stream where exact duplicates
    (same normalized text) must be dropped across the whole stream history.
    Keyed stateful dedup via ``applyInPandasWithState``:

    - key = md5 fingerprint of normalized text (the same fingerprint as the
      batch operator with_fingerprint, so batch and stream agree);
    - state per fingerprint = (first doc_id, n_seen);
    - a batch's rows for an unseen fingerprint emit exactly one row (the
      min doc_id in that batch — deterministic); later arrivals only bump
      the duplicate counter.

    State is O(1) per distinct document; Spark shards the fingerprint key
    space across executors, so the dedup table scales horizontally — the
    streaming twin of dedup.dedup_exact.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    fingerprint = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    )

    def update(key, pdfs, state):
        if state.exists:
            first_id, n_seen = state.get
            is_new = False
        else:
            first_id, n_seen = None, 0
            is_new = True
        batch_ids = []
        for pdf in pdfs:
            batch_ids.extend(pdf[id_col].astype(str).tolist())
        if not batch_ids:
            return
        if first_id is None:
            first_id = min(batch_ids)
        n_seen += len(batch_ids)
        state.update((first_id, n_seen))
        if is_new:
            yield pd.DataFrame(
                {
                    "fingerprint": [key[0]],
                    id_col: [first_id],
                    "n_dups_so_far": [n_seen],
                }
            )

    keyed = stream_df.select(
        fingerprint.alias("fingerprint"),
        F.col(id_col).cast("string").alias(id_col),
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType=f"fingerprint string, {id_col} string, n_dups_so_far long",
        stateStructType="first_id string, n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_sketch_stream(
    stream_df: DataFrame,
    kernel: SketchKernel,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    item_col: str = "item",
):
    """Per-event-time-window distinct estimates as STREAMING STATE.

    groupBy(window(ts)) + ``applyInPandasWithState`` with an O(m) packed
    sketch per window; the watermark sets an event-time timeout so closed
    windows emit a FINAL row and their state is garbage-collected — the
    sketch twin of a watermarked windowed count. Late rows inside the
    watermark keep updating their window's sketch; rows later than the
    watermark are dropped by Spark upstream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window).alias("win"),
            F.col(item_col).cast("long").alias(item_col),
            F.col(ts_col),  # keep the watermarked column in the plan —
            # event-time timeout requires it to survive to the stateful op
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            item_col,
            ts_col,
        )
    )

    def update(key, pdfs, state):
        win_start, win_end = key
        if state.hasTimedOut:
            st = kernel.unpack(bytes(state.get[0]))
            n = int(state.get[1])
            state.remove()
            yield pd.DataFrame(
                {
                    "win_start": [win_start],
                    "win_end": [win_end],
                    "estimate": [float(kernel.estimate(st)[0])],
                    "rows_seen": [n],
                    "final": [True],
                }
            )
            return
        if state.exists:
            st = kernel.unpack(bytes(state.get[0]))
            n = int(state.get[1])
        else:
            st = kernel.empty()
            n = 0
        for pdf in pdfs:
            vals = pdf[item_col].to_numpy(dtype=np.int64, na_value=0)
            kernel.update(st, vals)
            n += len(vals)
        state.update((kernel.pack(st), n))
        # GC when the watermark passes the window end
        state.setTimeoutTimestamp(int(win_end.timestamp() * 1000))
        yield pd.DataFrame(
            {
                "win_start": [win_start],
                "win_end": [win_end],
                "estimate": [float(kernel.estimate(st)[0])],
                "rows_seen": [n],
                "final": [False],
            }
        )

    return src.groupBy("win_start", "win_end").applyInPandasWithState(
        update,
        outputStructType=(
            "win_start timestamp, win_end timestamp, estimate double, "
            "rows_seen long, final boolean"
        ),
        stateStructType="sketch binary, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_winnow_near_dup(
    stream_df: DataFrame,
    k: int = 3,
    w: int = 4,
    max_bucket_size: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming MOSS near-dup: emit (doc_a, doc_b, fp) shared-fingerprint
    EVENTS as documents arrive — the streaming twin of
    ``dedup.winnow_near_dup_pairs`` (consumers count events per pair and
    keep pairs with >= min_shared, exactly the batch HAVING).

    Shape: each row's distinct fingerprint set is computed ROW-LOCALLY
    (``text.winnow_fp_array`` — no cross-row distinct, which Structured
    Streaming forbids), exploded to (fp, doc_id) events, and keyed by fp
    into ``applyInPandasWithState``. State per fingerprint = the doc_ids
    seen (sorted, bounded), so a new doc pairs against the full stream
    history at O(|bucket|) cost with no rescan of old data.

    Cap semantics differ from batch BY NECESSITY and are documented: the
    batch ``_cap_hot_buckets`` drops an over-cap bucket RETROSPECTIVELY
    (it sees final bucket sizes); a stream cannot. Here a fingerprint
    SATURATES when its stored membership would exceed ``max_bucket_size``:
    from then on it emits nothing and stores nothing (state stays O(cap)
    per fp), but pairs already emitted stand. For every fingerprint whose
    lifetime membership stays <= cap — i.e. all of them under the batch
    cap — the emitted event set equals the batch kept self-join exactly
    (pinned in test_checkpoint_streaming).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from cardinality_estimation_evaluation_framework_spark.operators.text import (
        winnow_fp_array,
    )

    events = stream_df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.explode(winnow_fp_array(text_col, k=k, w=w)).alias("fp"),
    )

    def update(key, pdfs, state):
        if state.exists:
            stored, saturated = list(state.get[0]), bool(state.get[1])
        else:
            stored, saturated = [], False
        batch_ids: set[str] = set()
        for pdf in pdfs:
            batch_ids.update(pdf["doc_id"].astype(str).tolist())
        new_ids = sorted(batch_ids.difference(stored))
        if not new_ids:
            return
        if saturated or len(stored) + len(new_ids) > max_bucket_size:
            # over cap: saturate — emit nothing more for this fp, keep no
            # membership (state is O(1) from here on)
            state.update(([], True))
            return
        pairs_a, pairs_b = [], []
        for i, nid in enumerate(new_ids):
            for old in stored:  # new x history
                a, b = (old, nid) if old < nid else (nid, old)
                pairs_a.append(a)
                pairs_b.append(b)
            for nid2 in new_ids[i + 1:]:  # new x new (same batch)
                pairs_a.append(nid)
                pairs_b.append(nid2)
        state.update((sorted(stored + new_ids), False))
        if pairs_a:
            yield pd.DataFrame(
                {"fp": key[0], "doc_a": pairs_a, "doc_b": pairs_b}
            )

    return events.groupBy("fp").applyInPandasWithState(
        update,
        outputStructType="fp long, doc_a string, doc_b string",
        stateStructType="ids array<string>, saturated boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
