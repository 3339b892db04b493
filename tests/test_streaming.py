"""Stream-batch parity + stateful-op tests (SURVEY.md §5 strategy #4).

Each streaming job runs to completion on the events file via the memory
sink and is compared against the batch query that pins its semantics."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from data_engineering_zoomcamp_projects_spark.catalog import load_table
from data_engineering_zoomcamp_projects_spark.streaming import jobs


def _rows(df, cols):
    return sorted(tuple(str(x) for x in r) for r in df.select(*cols).collect())


def test_stream_batch_parity_tumbling(spark, sf_dir):
    ev_stream = jobs.load_events_stream(spark, sf_dir)
    jobs.run_to_memory(jobs.tumbling_counts(ev_stream), "t_tumbling")
    got = spark.table("t_tumbling")

    ev_batch = load_table(spark, sf_dir, "events")
    want = (
        ev_batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
    cols = ["window_start", "window_end", "event_type", "n", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_batch_parity_session(spark, sf_dir):
    ev_stream = jobs.load_events_stream(spark, sf_dir)
    jobs.run_to_memory(jobs.session_counts(ev_stream), "t_session")
    got = spark.table("t_session")

    ev_batch = load_table(spark, sf_dir, "events")
    want = (
        ev_batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup_within_watermark(spark, sf_dir):
    ev_stream = jobs.load_events_stream(spark, sf_dir)
    deduped = jobs.dedup_events(ev_stream)
    jobs.run_to_memory(deduped.select("event_id"), "t_dedup", output_mode="append")
    got = spark.table("t_dedup")
    n_batch = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got.count() == n_batch
    assert got.distinct().count() == n_batch


def test_stateful_running_totals(spark, sf_dir):
    ev_stream = jobs.load_events_stream(spark, sf_dir)
    jobs.run_to_memory(
        jobs.running_user_totals(ev_stream), "t_state", output_mode="update"
    )
    got = spark.table("t_state")
    # one batch -> one update row per user with that user's full totals
    ev_batch = load_table(spark, sf_dir, "events")
    want = ev_batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    got_counts = {r["user_id"]: r["n_events"] for r in got.collect()}
    for r in want.collect():
        assert got_counts[r["user_id"]] == r["n_events"]


def test_foreach_batch_sink(spark, sf_dir):
    ev_stream = jobs.load_events_stream(spark, sf_dir)
    with tempfile.TemporaryDirectory() as d:
        out, ckpt = f"{d}/out", f"{d}/ckpt"
        jobs.sink_foreach_batch_parquet(
            ev_stream.select("event_id", "ts", "event_type"), out, ckpt
        )
        written = spark.read.parquet(out)
        n = load_table(spark, sf_dir, "events").count()
        assert written.count() == n
        assert "_epoch" in written.columns


def test_sliding_stream_smoke(spark, sf_dir):
    ev_stream = jobs.load_events_stream(spark, sf_dir)
    jobs.run_to_memory(jobs.sliding_counts(ev_stream), "t_sliding")
    got = spark.table("t_sliding")
    # every event lands in exactly 4 sliding windows
    total = got.agg(F.sum("n")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == 4 * n_events


def test_stream_stream_join_parity(spark, sf_dir):
    ev_stream = jobs.load_events_stream(spark, sf_dir)
    jobs.run_to_memory(
        jobs.purchase_view_stream_join(ev_stream), "t_ssjoin", output_mode="append"
    )
    got = spark.table("t_ssjoin")

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    want = purchases.join(
        views,
        F.expr(
            "user_id = v_user AND "
            "view_ts BETWEEN purchase_ts - INTERVAL 1 HOUR AND purchase_ts"
        ),
    ).select("event_id", "user_id", "purchase_ts", "view_ts")
    cols = ["event_id", "user_id", "purchase_ts", "view_ts"]
    assert _rows(got, cols) == _rows(want, cols)


def test_foreach_batch_checkpoint_no_reprocess(spark, sf_dir, tmp_path):
    """Exactly-once via checkpoint: re-starting the same stream over the
    same source with the same checkpoint reprocesses nothing."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ev = jobs.load_events_stream(spark, sf_dir).select("event_id")
    jobs.sink_foreach_batch_parquet(ev, out, ckpt)
    n_first = spark.read.parquet(out).count()
    # second run, same checkpoint: no new input -> no new rows
    ev2 = jobs.load_events_stream(spark, sf_dir).select("event_id")
    jobs.sink_foreach_batch_parquet(ev2, out, ckpt)
    assert spark.read.parquet(out).count() == n_first


def _write_event_file(spark, dir_, name, rows):
    """One parquet file of events with ts in raw NANOS (the on-disk
    layout load_events_stream expects). rows: (event_id, iso_ts,
    user_id, event_type)."""
    import os
    import time

    data = [
        (eid, _nanos(ts), uid, etype, 1.0, "{}") for eid, ts, uid, etype in rows
    ]
    df = spark.createDataFrame(data, schema=jobs.EVENTS_FILE_SCHEMA)
    tmp = f"{dir_}/_stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    os.replace(f"{tmp}/{part}", f"{dir_}/{name}")
    import shutil as _sh

    _sh.rmtree(tmp)
    time.sleep(1.05)  # distinct modification times -> deterministic pickup order


def _nanos(iso: str) -> int:
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000_000)


def test_dedup_late_data_semantics(spark, tmp_path):
    """dropDuplicatesWithinWatermark late-data case (beyond parity): a
    duplicate id arriving in a later batch within the watermark delay is
    dropped; a row older than the advanced watermark is dropped as late;
    fresh ids pass."""
    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    _write_event_file(
        spark, src, "f1.parquet",
        [(1, "2024-01-01 10:00:00", 7, "view"),
         (2, "2024-01-01 10:05:00", 7, "view")],
    )
    _write_event_file(
        spark, src, "f2.parquet",
        [(1, "2024-01-01 10:06:00", 7, "view"),     # dup within watermark
         (3, "2024-01-01 10:30:00", 8, "click")],
    )
    _write_event_file(
        spark, src, "f3.parquet",
        [(4, "2024-01-01 12:00:00", 9, "view"),      # advances watermark to 11:50
         (5, "2024-01-01 09:00:00", 9, "view")],     # far below watermark -> late
    )
    ev = jobs.load_events_stream(
        spark, src, glob="*.parquet", max_files_per_trigger=1
    )
    deduped = jobs.dedup_events(ev, watermark="10 minutes")
    jobs.run_to_memory(
        deduped.select("event_id"), "t_dedup_late", output_mode="append"
    )
    got = sorted(r["event_id"] for r in spark.table("t_dedup_late").collect())
    assert got == [1, 2, 3, 4]


def test_foreach_batch_kill_resume_no_duplicates(spark, tmp_path):
    """Checkpoint recovery: stop the query, new data arrives, a NEW
    query resumes from the same checkpoint — every source row is
    written exactly once and resumed epochs don't collide with
    pre-kill epochs."""
    import os

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    _write_event_file(
        spark, src, "f1.parquet",
        [(1, "2024-01-01 10:00:00", 7, "view"),
         (2, "2024-01-01 10:05:00", 7, "view")],
    )
    ev = jobs.load_events_stream(spark, src, glob="*.parquet")
    jobs.sink_foreach_batch_parquet(ev.select("event_id"), out, ckpt)  # then "kill"
    first = spark.read.parquet(out)
    assert sorted(r["event_id"] for r in first.collect()) == [1, 2]
    epochs_before = {r["_epoch"] for r in first.select("_epoch").distinct().collect()}

    _write_event_file(
        spark, src, "f2.parquet",
        [(3, "2024-01-01 10:10:00", 8, "view")],
    )
    ev2 = jobs.load_events_stream(spark, src, glob="*.parquet")
    jobs.sink_foreach_batch_parquet(ev2.select("event_id"), out, ckpt)  # resume
    res = spark.read.parquet(out)
    assert sorted(r["event_id"] for r in res.collect()) == [1, 2, 3]
    epochs_after = {r["_epoch"] for r in res.select("_epoch").distinct().collect()}
    assert len(epochs_after - epochs_before) == 1  # resumed epoch advanced, no reuse


def _require_tws(spark):
    """transformWithStateInPandas needs the protobuf python package
    (state-server wire protocol) and the RocksDB state store; skip
    where unavailable (see COVERAGE.md 'Unobtainable dependencies')."""
    import pytest

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("protobuf not installed: transformWithStateInPandas "
                    "state server cannot start in this environment")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def test_transform_with_state_running_totals(spark, sf_dir):
    """Spark 4 transformWithStateInPandas parity: one batch -> one
    update row per user carrying that user's full totals (same contract
    as the applyInPandasWithState twin)."""
    _require_tws(spark)
    ev_stream = jobs.load_events_stream(spark, sf_dir)
    jobs.run_to_memory(
        jobs.running_user_totals_tws(ev_stream), "t_tws", output_mode="update"
    )
    got = {r["user_id"]: r["n_events"] for r in spark.table("t_tws").collect()}
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got and all(got[r["user_id"]] == r["n"] for r in want)


def test_transform_with_state_accumulates_across_batches(spark, tmp_path):
    """State must persist across micro-batches: two files, one batch
    each — the second update row per user reflects BOTH batches."""
    import os

    _require_tws(spark)

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_event_file(
        spark, src, "f1.parquet",
        [(1, "2024-01-01 10:00:00", 7, "view"),
         (2, "2024-01-01 10:05:00", 7, "view")],
    )
    _write_event_file(
        spark, src, "f2.parquet",
        [(3, "2024-01-01 10:10:00", 7, "view")],
    )
    ev = jobs.load_events_stream(spark, src, glob="*.parquet", max_files_per_trigger=1)
    jobs.run_to_memory(
        jobs.running_user_totals_tws(ev), "t_tws_multi", output_mode="update"
    )
    rows = sorted(
        (r["n_events"] for r in spark.table("t_tws_multi").collect())
    )
    assert rows == [2, 3]  # after batch 1: 2 events; after batch 2: 3 total


def test_stream_static_enrichment_parity(spark, sf_dir):
    """Stream-static join parity: enriching the event stream with the
    customer dim must equal the same join in batch; unmatched users
    survive with null segment (left join)."""
    ev_stream = jobs.load_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer")
    jobs.run_to_memory(
        jobs.enrich_events_with_dim(ev_stream, dim), "t_enrich", output_mode="append"
    )
    got = spark.table("t_enrich")

    ev = load_table(spark, sf_dir, "events")
    want = jobs.enrich_events_with_dim(ev, dim)
    cols = ["event_id", "user_id", "event_type", "segment", "nation_key"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() == ev.count()  # left join never drops events


def test_max_files_per_trigger_paces_microbatches(spark, tmp_path):
    """Backpressure: maxFilesPerTrigger=1 over a 4-file backlog must
    process in 4 micro-batches, oldest files first — the pacing
    contract a production backlog reprocess relies on."""
    import time

    from pyspark.sql import functions as F

    from data_engineering_zoomcamp_projects_spark.streaming.jobs import (
        load_events_stream,
    )

    src = tmp_path / "events_backlog"
    src.mkdir()
    # file-stream sources list FILES under the dir (no recursion):
    # stage each single-file write, then move the part file in flat
    for i in range(4):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(
            [(i * 10 + j, i, float(j), "view", "{}") for j in range(5)],
            "event_id long, user_id long, value double, event_type string, props string",
        ).withColumn(
            "ts", F.timestamp_micros(F.lit(1_700_000_000_000_000 + i))
        ).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        part.rename(src / f"f{i}.parquet")
        time.sleep(0.05)  # distinct modification times -> stable order

    stream = load_events_stream(
        spark, str(src), glob="*.parquet", max_files_per_trigger=1
    )
    batches = []

    def sink(df, epoch_id):
        batches.append(df.count())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    non_empty = [b for b in batches if b > 0]
    assert len(non_empty) == 4, batches
    assert all(b == 5 for b in non_empty), batches


def test_ingest_neardup_matches_oracle_and_batch_replay(spark, sf_dir):
    """Driver-twin differential for stream_live_ingest_neardup at BOTH
    small SFs, plus a pure-batch replay of the same three-stage keep
    policy (sequential minhash_lsh_pairs/_between over static frames) —
    pinning that the streaming execution (arrival order, foreachBatch
    survivor accumulation, the eager decision checkpoint) changes
    nothing vs running the batches by hand."""
    from data_engineering_zoomcamp_projects_spark.llm.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_between,
    )
    from data_engineering_zoomcamp_projects_spark.catalog import load_table
    from data_engineering_zoomcamp_projects_spark.streaming.jobs import (
        INGEST_N_BATCHES,
        _ingest_neardup_oracle_sql,
        stream_live_ingest_neardup,
    )

    from .oracle import compare, run_oracle

    sf_df = None
    for d in {sf_dir, "/root/testdata/sf0.01"}:
        df = stream_live_ingest_neardup(spark, d)
        problems = compare(df, run_oracle(_ingest_neardup_oracle_sql(), d), "ingest")
        assert not problems, "\n".join(problems)
        if d == sf_dir:
            sf_df = df  # reuse below — the pipeline is the suite's priciest

    got = {
        r["doc_id"]: (r["batch_idx"], r["kept"]) for r in sf_df.collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    surv = None
    expect = {}
    for k in range(INGEST_N_BATCHES):
        bdf = docs.filter(F.col("doc_id") % INGEST_N_BATCHES == k)
        dup = minhash_lsh_pairs(bdf).select(F.col("doc_b").alias("doc_id"))
        if surv is not None:
            dup = dup.unionByName(
                minhash_lsh_pairs_between(bdf, surv).select(
                    F.col("new_doc").alias("doc_id")
                )
            )
        dup_ids = {r["doc_id"] for r in dup.collect()}
        kept = bdf.join(
            spark.createDataFrame([(i,) for i in dup_ids] or [(-1,)], "doc_id long"),
            "doc_id",
            "left_anti",
        )
        for r in bdf.select("doc_id").collect():
            expect[r["doc_id"]] = (k, 0 if r["doc_id"] in dup_ids else 1)
        surv = kept if surv is None else surv.unionByName(kept)
    assert got == expect


def test_stream_index_append_equals_batch_append(spark, sf_dir):
    """r12: the streaming index-append's union over micro-batches must
    equal the one-shot batch append row-for-row (per-row map-side
    assignment is order-independent) — the batch/stream parity pin
    that justifies the shared oracle, plus a multi-batch execution
    check (every arrival file produced at least one delta row, so the
    stream really ran more than one micro-batch)."""
    from data_engineering_zoomcamp_projects_spark.llm.similarity import (
        sim_index_append,
    )
    from data_engineering_zoomcamp_projects_spark.streaming.jobs import (
        IDX_APPEND_N_BATCHES,
        stream_live_index_append,
    )

    epochs: list = []
    streamed = stream_live_index_append(spark, sf_dir, _epoch_log=epochs).collect()
    batch = sim_index_append(spark, sf_dir).collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    # one foreachBatch call per arrival file — the row union alone
    # cannot distinguish one micro-batch from three (r12 review)
    assert len(epochs) == IDX_APPEND_N_BATCHES, epochs
