"""Structured Streaming parity: the same transformations run as a
real streaming query (memory sink) must agree with their batch twins.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


def _batch_events(spark):
    return load_table(spark, SF, "events")


def test_tumbling_counts_stream_matches_batch(spark):
    stream = jobs.events_stream(spark, SF)
    jobs.run_to_memory(jobs.tumbling_counts(stream), "tumbling_out", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in jobs.tumbling_counts(_batch_events(spark)).collect()
    }
    assert got == want
    assert len(got) > 0


def test_session_counts_stream_matches_batch(spark):
    stream = jobs.events_stream(spark, SF)
    jobs.run_to_memory(jobs.session_counts(stream), "session_out", "complete")
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM session_out").collect()
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in jobs.session_counts(_batch_events(spark)).collect()
    )
    assert got == want
    assert len(got) > 0


def test_sliding_window_stream_matches_batch(spark):
    from pyspark.sql import functions as F

    def sliding(df):
        return (
            df.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )

    stream = jobs.events_stream(spark, SF)
    jobs.run_to_memory(sliding(stream), "sliding_out", "complete")
    got = {
        (r["ws"], r["n"]) for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    want = {(r["ws"], r["n"]) for r in sliding(_batch_events(spark)).collect()}
    assert got == want
    assert len(got) > 0


def test_dedup_stream_first_per_key(spark):
    stream = jobs.events_stream(spark, SF)
    jobs.run_to_memory(jobs.dedup_stream(stream), "dedup_out", "append")
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").collect()[0]["n"]
    distinct_keys = (
        _batch_events(spark).select("user_id", "event_type").distinct().count()
    )
    assert n == distinct_keys


def test_stream_stream_interval_join_matches_batch(spark):
    from pyspark.sql import functions as F

    stream = jobs.events_stream(spark, SF)
    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream.filter(F.col("event_type") == "click")
    joined = jobs.purchase_click_interval_join(purchases, clicks)
    jobs.run_to_memory(joined, "ssj_out", "append")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    batch = _batch_events(spark)
    bp = jobs.purchase_click_interval_join(
        batch.filter(F.col("event_type") == "purchase"),
        batch.filter(F.col("event_type") == "click"),
    )
    want = {(r["purchase_id"], r["click_id"]) for r in bp.collect()}
    assert got == want
    assert len(got) > 0


def test_watermark_finalizes_windows_once(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): batch 1 = the RECENT
    half (advances the watermark to max(ts)−1h), batch 2 = the OLD
    half arriving late.

    Spark's watermark contract: data older than the watermark *may*
    be dropped; what IS guaranteed (and asserted here) is that
    (a) append mode only emits FINALIZED windows (window end ≤ final
    watermark — the trailing hour never appears), and (b) each window
    is emitted exactly once — late arrivals can't resurrect or
    duplicate an already-finalized window."""
    from pyspark.sql import functions as F

    events = load_table(spark, SF, "events")
    mid = events.agg(F.expr("percentile(cast(ts as double), 0.5)")).collect()[0][0]
    recent = events.filter(F.col("ts").cast("double") >= mid)
    old = events.filter(F.col("ts").cast("double") < mid)

    src = tmp_path / "src"
    src.mkdir()
    # lexicographic file order drives processing order
    recent.coalesce(1).write.parquet(str(tmp_path / "a"))
    old.coalesce(1).write.parquet(str(tmp_path / "b"))
    import os
    import shutil
    import time as _time

    for i, d in enumerate(["a", "b"]):
        part = next((tmp_path / d).glob("part-*.parquet"))
        dst = src / f"{i:02d}.parquet"
        shutil.copy(part, dst)
        # the file source orders batches by MODIFICATION TIME, not
        # name — pin mtimes so the recent-data file is batch 1
        os.utime(dst, (_time.time() - 1000 + i * 500,) * 2)

    schema = events.schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    out = spark.sql(
        "SELECT window.start AS ws, window.end AS we, n FROM late_out"
    ).collect()
    assert out, "no windows emitted"
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    import datetime

    final_watermark = max_ts - datetime.timedelta(hours=1)
    # (a) only finalized windows: every emitted window closed at or
    # before the final watermark — the trailing hour never appears
    assert all(r["we"] <= final_watermark for r in out), "unfinalized window emitted"
    # (b) exactly-once per window: late arrivals never duplicate
    starts = [r["ws"] for r in out]
    assert len(starts) == len(set(starts)), "window emitted twice"


def test_cdc_foreach_batch_counts(spark):
    stream = jobs.events_stream(spark, SF)
    updates: list = []
    with tempfile.TemporaryDirectory() as ckpt:
        q = jobs.cdc_foreach_batch(stream, updates, ckpt)
        q.processAllAvailable()
        q.stop()
    assert updates, "no micro-batches processed"
    total_changes = sum(n for _, n in updates)
    # single-batch file source: every event is first_seen or a change
    batch = _batch_events(spark)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    expected = (
        batch.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNull() | (F.col("value") != F.col("prev")))
        .count()
    )
    assert total_changes == expected


def test_corpus_ingest_stream_matches_batch(spark):
    """Streaming quality-gate + PII redaction agrees with the batch
    twin on every surviving document."""
    stream = jobs.document_ingest_stream(spark, SF)
    jobs.run_to_memory(jobs.corpus_ingest(stream), "corpus_ingest_out", "append")
    got = {
        (r["doc_id"], r["text"], r["lang"])
        for r in spark.sql("SELECT * FROM corpus_ingest_out").collect()
    }
    batch = load_table(spark, SF, "documents")
    want = {
        (r["doc_id"], r["text"], r["lang"])
        for r in jobs.corpus_ingest(batch).collect()
    }
    assert got == want
    assert len(got) > 0


def test_incremental_dedup_sink_cross_batch(spark, tmp_path):
    """Streaming corpus-store ingest: batch B's near-dup of a doc that
    arrived (unique) in batch A is detected — the store grew between
    micro-batches. Exact dups of the pre-existing corpus are caught,
    and only unique docs are appended to the store."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiki_data_pipeline_spark.operators import dedup as DD

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
        "lima mike november oscar papa quebec romeo sierra tango uniform "
        "victor whiskey xray yankee zulu one two three four five six seven"
    )
    novel = (
        "streaming ingest pipeline writes canonical content into the store "
        "and every later delta is deduplicated against what already arrived "
        "including documents accepted only minutes earlier in prior batches"
    )
    store = str(tmp_path / "store")
    DD.write_minhash_index(
        spark.createDataFrame([(2, base)], "doc_id long, text string"), store
    )

    src = tmp_path / "src"
    src.mkdir()

    def _write(name, rows, mtime):
        t = pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string())}
        )
        p = str(src / name)
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    # batch A: one exact dup of the corpus, one novel doc
    _write("a.parquet", [(13, base.upper()), (11, novel)], 1_000_000_000)
    # batch B: near-dup of batch A's novel doc + a fresh one
    _write(
        "b.parquet",
        [(21, novel.replace("minutes", "seconds")),
         (23, "totally fresh unrelated text about broadcast joins and shuffles here")],
        1_000_000_100,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    beats: list = []
    q = jobs.incremental_dedup_sink(
        stream, store, beats, str(tmp_path / "ckpt"), threshold=0.3
    )
    q.awaitTermination(120)

    decisions = {
        r["doc_id"]: (r["status"], r["matched_id"])
        for r in spark.read.parquet(store + "/_decisions").collect()
    }
    assert decisions[13] == ("exact_dup", 2)
    assert decisions[11] == ("unique", None)
    assert decisions[21] == ("near_dup", 11), "store did not grow between batches"
    assert decisions[23] == ("unique", None)
    assert len(beats) == 2 and all(n == 2 for _, n in beats)
    stored = {
        r["id"] for r in spark.read.parquet(store + "/_fingerprints").collect()
    }
    assert stored == {2, 11, 23}, "store must hold only canonical docs"


def test_incremental_dedup_sink_store_stays_canonical(spark, tmp_path):
    """Within one micro-batch: two copies of the same novel text must
    yield ONE store entry (min-id survivor), and a re-crawled id with
    revised text must not create a second store row under that id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiki_data_pipeline_spark.operators import dedup as DD

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
        "lima mike november oscar papa quebec romeo sierra tango uniform"
    )
    novel = (
        "one micro batch carrying two identical copies of novel text must "
        "store exactly one canonical survivor for later deduplication work"
    )
    store = str(tmp_path / "store")
    DD.write_minhash_index(
        spark.createDataFrame([(2, base)], "doc_id long, text string"), store
    )

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        (33, novel),                        # within-batch dup (higher id)
        (31, novel),                        # survivor (min id)
        (2, base.replace("tango", "x")),    # re-crawled id, revised text
    ]
    t = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )
    pq.write_table(t, str(src / "b.parquet"))

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    beats: list = []
    q = jobs.incremental_dedup_sink(stream, store, beats, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    stored = [r["id"] for r in spark.read.parquet(store + "/_fingerprints").collect()]
    assert sorted(stored) == [2, 31], stored  # one survivor, no dup id 2
    # the index side must agree with the fingerprint side
    idx_ids = {r["id"] for r in spark.read.parquet(store).collect()}
    assert idx_ids == {2, 31}


def test_takedown_sink_hides_ids_and_replays_idempotently(spark, tmp_path):
    """Streaming takedowns: ids deleted in micro-batch A are hidden
    from serving before batch B is processed; re-running the stream
    with a fresh checkpoint (worst-case full replay) leaves results
    unchanged — duplicate tombstones are semantically one."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiki_data_pipeline_spark.operators import dedup as DD
    from tiki_data_pipeline_spark.sources.files import store_tombstones

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(8)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "store")
    DD.write_minhash_index(docs, store)

    src = tmp_path / "src"
    src.mkdir()

    def _write(name, ids, mtime):
        p = str(src / name)
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), p)
        os.utime(p, (mtime, mtime))

    _write("a.parquet", [3], 1_000_000_000)
    _write("b.parquet", [5, 3], 1_000_000_100)  # 3 re-requested: no-op

    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    acks: list = []
    q = jobs.takedown_sink(stream, store, acks, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert [n for _, n in acks] == [1, 2]

    batch = spark.createDataFrame(
        [(103, docs.collect()[3]["text"]), (105, docs.collect()[5]["text"]),
         (106, docs.collect()[6]["text"])],
        "doc_id long, text string",
    )
    st = {
        r["doc_id"]: r["status"]
        for r in DD.incremental_dedup_status(spark, store, batch).collect()
    }
    assert st == {103: "unique", 105: "unique", 106: "exact_dup"}

    # full replay (fresh checkpoint, same source): same end state
    acks2: list = []
    q2 = jobs.takedown_sink(stream, store, acks2, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    st2 = {
        r["doc_id"]: r["status"]
        for r in DD.incremental_dedup_status(spark, store, batch).collect()
    }
    assert st2 == st
    assert store_tombstones(spark, store).count() == 2  # still {3, 5}
