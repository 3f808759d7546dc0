"""Structured Streaming tests: windowed counts and the stateful
sessionizer drained through a memory sink, checked against batch
equivalents on the same data."""

from __future__ import annotations

import shutil
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lightning_metastore_spark.streaming import events as sev  # noqa: E402
from lightning_metastore_spark.session import load_tables  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = sev.read_event_stream(spark, events_dir)
    assert stream.isStreaming
    agg = sev.windowed_event_counts(stream, window="1 hour")
    sev.run_to_memory(agg, "win_counts", output_mode="update")
    streamed = {(r.window_start, r.event_type): r.n_events
                for r in spark.sql("SELECT * FROM win_counts").collect()}
    batch = load_tables(spark, SF_DIR, ("events",))["events"]
    expected = {(r.hour_ts, r.event_type): r.n
                for r in batch.groupBy(
                    F.date_trunc("hour", "ts").alias("hour_ts"), "event_type")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert streamed == expected


def test_stateful_sessionizer_matches_batch(spark, events_dir):
    stream = sev.read_event_stream(spark, events_dir)
    out = sev.sessionize_stateful(stream)
    sev.run_to_memory(out, "sessions", output_mode="update")
    streamed = {r.user_id: (r.n_sessions, r.n_events)
                for r in spark.sql(
                    "SELECT user_id, max(n_sessions) AS n_sessions, "
                    "max(n_events) AS n_events FROM sessions GROUP BY user_id"
                ).collect()}
    # batch twin: q_events_sessionize formulation
    from lightning_metastore_spark.plans.queries import q_events_sessionize
    batch = (q_events_sessionize(spark, SF_DIR)
             .groupBy("user_id")
             .agg(F.max("session_id").alias("n_sessions"),
                  F.sum("n_events").alias("n_events")))
    expected = {r.user_id: (r.n_sessions, r.n_events) for r in batch.collect()}
    assert streamed == expected


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Watermarked stream-stream join (views -> purchases within 1h per
    user) must equal the batch join on the same data."""
    from pyspark.sql import functions as F

    def sides(df):
        views = (df.filter(F.col("event_type") == "view")
                 .select(F.col("user_id").alias("v_user"),
                         F.col("ts").alias("v_ts"),
                         F.col("event_id").alias("v_id")))
        buys = (df.filter(F.col("event_type") == "purchase")
                .select(F.col("user_id").alias("b_user"),
                        F.col("ts").alias("b_ts"),
                        F.col("event_id").alias("b_id")))
        return views, buys

    stream = sev.read_event_stream(spark, events_dir)
    sv, sb = sides(stream)
    joined = (sv.withWatermark("v_ts", "2 hours")
              .join(sb.withWatermark("b_ts", "2 hours"),
                    F.expr("v_user = b_user AND "
                           "b_ts BETWEEN v_ts AND v_ts + INTERVAL 1 HOUR")))
    sev.run_to_memory(joined.select("v_id", "b_id"), "ss_join",
                      output_mode="append")
    streamed = {(r.v_id, r.b_id)
                for r in spark.sql("SELECT * FROM ss_join").collect()}
    batch = load_tables(spark, SF_DIR, ("events",))["events"]
    bv, bb = sides(batch)
    expected = {(r.v_id, r.b_id) for r in
                bv.join(bb, F.expr(
                    "v_user = b_user AND "
                    "b_ts BETWEEN v_ts AND v_ts + INTERVAL 1 HOUR")).collect()}
    assert streamed == expected and len(expected) > 0


def test_multimodal_decode_and_features(spark):
    from lightning_metastore_spark.sources import multimodal as mm

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    payloads = mm.documents_as_binary(docs)
    meta = mm.decode_metadata(payloads).collect()
    assert len(meta) == 50
    assert all(64 <= r.width < 256 and 1 <= r.n_channels <= 4 for r in meta)
    # deterministic: same input -> same metadata
    meta2 = mm.decode_metadata(payloads).collect()
    assert sorted(map(tuple, meta)) == sorted(map(tuple, meta2))
    feats = mm.extract_features(payloads).collect()
    assert len(feats) == 50 and all(len(r.feature) == mm.FEATURE_DIM for r in feats)

    with pytest.raises(Exception):  # text payloads are not decodable images
        mm.decode_metadata(payloads, decode_stub=False).collect()


def test_multimodal_real_decode_images(spark):
    """decode_stub=False REALLY decodes image payloads through the
    stdlib codecs (PNG + baseline JPEG) inside mapInPandas — true
    dimensions and pixel-derived features, no Pillow."""
    from lightning_metastore_spark.sources import codecs, multimodal as mm
    from tests.test_codecs import _PYTHON_JPG, gradient_rows

    png = codecs.png_encode(20, 11, gradient_rows(20, 11))
    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(_PYTHON_JPG))],
                               "id long, content binary")
    meta = {r.id: r for r in mm.decode_metadata(df, decode_stub=False).collect()}
    assert (meta[1].width, meta[1].height, meta[1].n_channels) == (20, 11, 3)
    assert (meta[2].width, meta[2].height) == (16, 16)
    feats = {r.id: r.feature for r in
             mm.extract_features(df, decode_stub=False).collect()}
    assert all(len(v) == mm.FEATURE_DIM for v in feats.values())
    # channel means of the gradient PNG: R ramps 0->255 (mean ~0.5),
    # B constant 128/255
    assert abs(feats[1][0] - 0.5) < 0.05
    assert abs(feats[1][2] - 128 / 255) < 0.01
    # histogram bins sum to ~1 (a distribution over luminance)
    assert abs(sum(feats[1][6:]) - 1.0) < 1e-6


def test_attribution_interval_join_matches_batch(spark, events_dir):
    """The library attribution operator (click -> purchase within 30 min)
    streamed must equal its batch twin — same function, batch inputs."""
    stream = sev.read_event_stream(spark, events_dir)
    out = sev.attribution_interval_join(stream, stream)
    sev.run_to_memory(out.select("click_id", "purchase_id"), "attrib",
                      output_mode="append")
    streamed = {(r.click_id, r.purchase_id)
                for r in spark.sql("SELECT * FROM attrib").collect()}
    batch = load_tables(spark, SF_DIR, ("events",))["events"]
    expected = {(r.click_id, r.purchase_id)
                for r in sev.attribution_interval_join(batch, batch).collect()}
    assert streamed == expected and len(expected) > 0


def test_read_event_stream_empty_dir_and_cache(spark, tmp_path):
    """ADVICE r5: a stream must be definable on a still-empty directory
    (defaults to micros encoding), and the sniff caches per path."""
    d = tmp_path / "empty_stream"
    d.mkdir()
    df = sev.read_event_stream(spark, str(d))
    assert dict(df.dtypes)["ts"] == "timestamp"
    # explicit encoding parameter also skips the sniff
    df2 = sev.read_event_stream(spark, str(d), ts_encoding="nanos")
    assert dict(df2.dtypes)["ts"] == "timestamp"  # normalized post-conversion


def test_idempotent_parquet_sink_exactly_once(spark, events_dir, tmp_path):
    """foreachBatch sink: drain, then RESTART from the same checkpoint —
    no new data means no new rows, and replay never duplicates."""
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")

    def drain():
        stream = sev.read_event_stream(spark, events_dir)
        q = sev.start_idempotent_parquet_sink(
            stream.select("event_id", "ts", "user_id"), out, ckpt)
        q.processAllAvailable()
        q.stop()

    drain()
    total = spark.read.parquet(out).count()
    expected = load_tables(spark, SF_DIR, ("events",))["events"].count()
    assert total == expected
    drain()  # restart on the same checkpoint: offsets already committed
    assert spark.read.parquet(out).count() == expected
    # every event exactly once
    ids = spark.read.parquet(out).select("event_id").distinct().count()
    assert ids == expected


def test_exactly_once_delta_sink(spark, events_dir, tmp_path):
    """SetTransaction-guarded Delta sink: drain then RESTART from the
    same checkpoint (no duplicates); a stale-batch replay is refused
    by the txn guard; and the guard survives checkpoint compaction +
    log cleanup — the spec requires the latest txn per appId to ride
    checkpoints."""
    import os as _os

    import pytest as _pytest

    from lightning_metastore_spark.sources import delta_reader as dr

    out = str(tmp_path / "dsink")
    ckpt = str(tmp_path / "dckpt")

    def drain():
        stream = sev.read_event_stream(spark, events_dir)
        q = sev.start_exactly_once_delta_sink(
            stream.select("event_id", "ts", "user_id"), out, ckpt,
            app_id="app1")
        q.processAllAvailable()
        q.stop()

    drain()
    expected = load_tables(spark, SF_DIR, ("events",))["events"].count()
    assert dr.read_delta(spark, out).count() == expected
    drain()   # restart on the same checkpoint: nothing new, no dups
    assert dr.read_delta(spark, out).count() == expected
    assert dr.read_delta(spark, out).select("event_id") \
        .distinct().count() == expected

    last = dr.last_txn_version(spark, out, "app1")
    assert last is not None and last >= 0
    assert dr.last_txn_version(spark, out, "unknown-app") is None

    # a replayed (stale) batch id must refuse to double-commit
    df1 = dr.read_delta(spark, out).limit(1)
    with _pytest.raises(dr.DeltaLogError, match="stale transaction"):
        dr.write_delta(df1, out, mode="append", txn=("app1", last))

    # txn guard survives checkpoint compaction + log cleanup
    dr.write_checkpoint(spark, out)
    log = _os.path.join(out, "_delta_log")
    for f in _os.listdir(log):
        if f.endswith(".json"):
            _os.remove(_os.path.join(log, f))
    assert dr.last_txn_version(spark, out, "app1") == last
    assert dr.read_delta(spark, out).count() == expected


def test_multimodal_resize_real_and_stub(spark):
    from lightning_metastore_spark.sources import codecs, multimodal as mm
    from tests.test_codecs import gradient_rows

    png = codecs.png_encode(20, 11, gradient_rows(20, 11))
    df = spark.createDataFrame([(1, bytearray(png))], "id long, content binary")
    real = mm.resize_images(df, 8, 6, decode_stub=False).collect()[0]
    assert (real.width, real.height) == (8, 6)
    assert len(bytes(real.rgb)) == 8 * 6 * 3
    # nearest-neighbor of the horizontal R-ramp stays monotone in R
    rgb = bytes(real.rgb)
    r_row = [rgb[(0 * 8 + x) * 3] for x in range(8)]
    assert r_row == sorted(r_row)
    # stub: deterministic, right shape
    s1 = mm.resize_images(df, 8, 6).collect()[0]
    s2 = mm.resize_images(df, 8, 6).collect()[0]
    assert bytes(s1.rgb) == bytes(s2.rgb) and len(bytes(s1.rgb)) == 8 * 6 * 3


def test_multimodal_frame_sampling(spark):
    import pytest
    from lightning_metastore_spark.sources import multimodal as mm

    df = spark.createDataFrame([(1, bytearray(b"fakevideo" * 500)),
                                (2, bytearray(b"other" * 100))],
                               "id long, content binary")
    frames = mm.sample_video_frames(df, n_frames=4).collect()
    assert len(frames) == 8  # per-row fan-out: 4 frames x 2 videos
    by_id = {}
    for r in frames:
        by_id.setdefault(r.id, []).append(r)
    for vid, fs in by_id.items():
        ts = [f.frame_ts for f in sorted(fs, key=lambda f: f.frame_idx)]
        assert ts == sorted(ts) and ts[0] == 0.0  # evenly spaced from 0
        assert len({bytes(f.frame) for f in fs}) == 4  # distinct frames
    # the real path fails AT THE DECODE SITE, not in the plumbing
    with pytest.raises(Exception, match="ffmpeg"):
        mm.sample_video_frames(df, decode_stub=False).collect()


def test_image_dhash_neardup_real_decode(spark):
    """Real-decode dHash: a 1-pixel edit stays within hamming<=3 of the
    original (pair found), an inverted gradient does not; identical
    payloads hash identically. Candidate generation is chunk-keyed."""
    import sys
    sys.path.insert(0, "tests")
    from test_codecs import gradient_rows, make_bmp24

    from lightning_metastore_spark.sources.multimodal import (
        dhash_neardup_pairs, image_dhash)

    w, h = 18, 16
    rows = [bytearray(r) for r in gradient_rows(w, h)]
    edited = [bytearray(r) for r in rows]
    edited[3][9] = (edited[3][9] + 7) % 256          # tiny edit
    inverted = [bytes(255 - b for b in r) for r in rows]
    imgs = spark.createDataFrame(
        [(1, make_bmp24(w, h, [bytes(r) for r in rows])),
         (2, make_bmp24(w, h, [bytes(r) for r in edited])),
         (3, make_bmp24(w, h, list(inverted))),
         (4, make_bmp24(w, h, [bytes(r) for r in rows]))],  # exact dup of 1
        "id long, content binary")
    hashes = image_dhash(imgs, decode_stub=False)
    hv = {r.id: r.dhash for r in hashes.collect()}
    assert hv[1] == hv[4]                            # identical payload
    pairs = {(r.ida, r.idb): r.hamming
             for r in dhash_neardup_pairs(hashes).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs

    plan = (dhash_neardup_pairs(hashes)._jdf.queryExecution()
            .executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_dhash_stub_mode(spark):
    """Stub mode: deterministic digest-derived hashes — equal payloads
    collide, distinct payloads (almost surely) differ."""
    from lightning_metastore_spark.sources.multimodal import image_dhash

    imgs = spark.createDataFrame(
        [(1, b"payload-a"), (2, b"payload-b"), (3, b"payload-a")],
        "id long, content binary")
    hv = {r.id: r.dhash for r in image_dhash(imgs).collect()}
    assert hv[1] == hv[3] and hv[1] != hv[2]


def test_frame_audio_windowing(spark):
    """Audio framing (25ms/10ms @16kHz): raw-PCM path fans out to
    overlapping frames with exact sample offsets; a payload shorter
    than one frame yields one partial frame; stub path is deterministic
    per payload."""
    import numpy as np

    from lightning_metastore_spark.sources.multimodal import frame_audio

    pcm = np.arange(1600, dtype="<i2").tobytes()  # 100 ms @ 16 kHz
    df = spark.createDataFrame([(1, pcm), (2, b"\x01\x02")],
                               "id long, content binary")
    rows = sorted(frame_audio(df, decode_stub=False).collect(),
                  key=lambda r: (r.id, r.frame_idx))
    by = {}
    for r in rows:
        by.setdefault(r.id, []).append(r)
    # starts 0,160,...,1120 (start+400 <= 1600) -> 8 full frames
    assert [r.n_samples for r in by[1]] == [400] * 8
    assert by[1][0].start_ms == 0.0 and by[1][0].end_ms == 25.0
    assert by[1][-1].start_ms == 70.0 and by[1][-1].end_ms == 95.0
    # frame content is the actual PCM slice
    assert np.frombuffer(by[1][1].pcm, dtype="<i2")[0] == 160
    assert len(by[2]) == 1 and by[2][0].n_samples == 1

    stub = {(r.id, r.frame_idx): r.pcm
            for r in frame_audio(df).collect()}
    stub2 = {(r.id, r.frame_idx): r.pcm
             for r in frame_audio(df).collect()}
    assert stub == stub2 and len(stub) > 0


def test_audio_features_pipeline(spark):
    """frame_audio -> audio_features composes map-only; a pure tone's
    spectral centroid lands near its frequency and a silent frame has
    minimal energy."""
    import math

    import numpy as np

    from lightning_metastore_spark.sources.multimodal import (
        audio_features, frame_audio)

    sr = 16_000
    t = np.arange(sr // 10) / sr                       # 100 ms
    tone = (np.sin(2 * math.pi * 1000.0 * t) * 20000).astype("<i2")
    silent = np.zeros(sr // 10, dtype="<i2")
    df = spark.createDataFrame(
        [(1, tone.tobytes()), (2, silent.tobytes())],
        "id long, content binary")
    frames = frame_audio(df, decode_stub=False, sample_rate=sr)
    feats = sorted(audio_features(frames, sample_rate=sr).collect(),
                   key=lambda r: (r.id, r.frame_idx))
    tone_rows = [r for r in feats if r.id == 1]
    sil_rows = [r for r in feats if r.id == 2]
    assert len(tone_rows) == len(sil_rows) == 8
    for r in tone_rows:
        assert abs(r.spectral_centroid - 1000.0) < 150.0
        assert r.zcr > 0.05
    for r in sil_rows:
        assert r.log_energy < -20 and r.spectral_centroid == 0.0

    plan = (audio_features(frames)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan


def test_audio_features_batch_invariant(spark):
    """Features are a pure function of each frame's own samples — a
    short (partial) frame scores identically whether it shares an
    Arrow batch with full frames or sits alone (regression: padding to
    the batch max width skewed zcr/centroid)."""
    import numpy as np

    from lightning_metastore_spark.sources.multimodal import (
        audio_features, frame_audio)

    full = (np.arange(1600, dtype="<i2") * 7 % 4001 - 2000).astype("<i2")
    short = np.array([500, -400, 300], dtype="<i2")
    df = spark.createDataFrame(
        [(1, full.tobytes()), (2, short.tobytes())],
        "id long, content binary")
    frames = frame_audio(df, decode_stub=False)
    together = {(r.id, r.frame_idx): (r.log_energy, r.zcr,
                                      r.spectral_centroid)
                for r in audio_features(frames.coalesce(1)).collect()}
    alone = {(r.id, r.frame_idx): (r.log_energy, r.zcr,
                                   r.spectral_centroid)
             for r in audio_features(frames.repartition(8, "id")).collect()}
    assert together == alone


def test_stateful_funnel_matches_batch(spark, tmp_path):
    """Streaming funnel state across MULTIPLE ts-ordered micro-batches
    must equal the batch funnel (operators/temporal.funnel_counts) on
    the same events."""
    import time

    from lightning_metastore_spark.operators.temporal import funnel_counts

    events = load_tables(spark, SF_DIR, ("events",))["events"]
    # split into 3 ts-ordered files, fed one per micro-batch
    d = tmp_path / "funnel_stream"
    d.mkdir()
    bounds = events.selectExpr(
        "percentile(CAST(ts AS DOUBLE), array(1.0D/3, 2.0D/3)) AS q"
    ).collect()[0]["q"]
    bounds = [F.lit(b).cast("timestamp") for b in bounds]
    parts = [events.filter(F.col("ts") <= bounds[0]),
             events.filter((F.col("ts") > bounds[0])
                           & (F.col("ts") <= bounds[1])),
             events.filter(F.col("ts") > bounds[1])]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(d / f"chunk_{i}"))
        for f in (d / f"chunk_{i}").glob("*.parquet"):
            f.rename(d / f"part_{i}.parquet")
        time.sleep(0.05)  # distinct mod-times: files trigger in ts order
    stream = sev.read_event_stream(spark, str(d),
                                   max_files_per_trigger=1)
    out = sev.funnel_stateful(stream, stages=("view", "click", "purchase"))
    sev.run_to_memory(out, "funnel_state", output_mode="update")
    reached = {r.user_id: r.k for r in spark.sql(
        "SELECT user_id, max(stage_reached) AS k FROM funnel_state "
        "GROUP BY user_id").collect()}
    batch = {r.stage_idx: r.n_users
             for r in funnel_counts(
                 events, ("view", "click", "purchase")).collect()}
    for s in (1, 2, 3):
        streamed_n = sum(1 for k in reached.values() if k >= s)
        assert streamed_n == batch[s], (s, streamed_n, batch[s])


def test_stateful_rolling_zscore_matches_batch(spark, tmp_path):
    """Streaming per-series anomaly scores across multiple ts-ordered
    micro-batches: the LATEST emission per (key, hour) must equal the
    batch rolling_zscore on the same events."""
    import time

    from lightning_metastore_spark.operators.temporal import rolling_zscore

    events = load_tables(spark, SF_DIR, ("events",))["events"]
    d = tmp_path / "z_stream"
    d.mkdir()
    bounds = events.selectExpr(
        "percentile(CAST(ts AS DOUBLE), array(1.0D/3, 2.0D/3)) AS q"
    ).collect()[0]["q"]
    bounds = [F.lit(b).cast("timestamp") for b in bounds]
    parts = [events.filter(F.col("ts") <= bounds[0]),
             events.filter((F.col("ts") > bounds[0])
                           & (F.col("ts") <= bounds[1])),
             events.filter(F.col("ts") > bounds[1])]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(d / f"chunk_{i}"))
        for f in (d / f"chunk_{i}").glob("*.parquet"):
            f.rename(d / f"part_{i}.parquet")
        time.sleep(0.05)
    stream = sev.read_event_stream(spark, str(d), max_files_per_trigger=1)
    out = sev.rolling_zscore_stateful(stream)
    sev.run_to_memory(out, "z_state", output_mode="update")
    # keep the LAST emission per (key, hour): batches can re-emit an
    # hour with a refined count; memory-sink update mode appends, so
    # dedupe by max n (counts only grow under ordered arrival)
    streamed = {(r.key, r.bucket_start): (r.n, r.zscore)
                for r in spark.sql("""
                    SELECT key, bucket_start, n, zscore FROM (
                      SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY key, bucket_start
                        ORDER BY n DESC) AS rk
                      FROM z_state) WHERE rk = 1
                """).collect()}
    batch = {(r.key, r.bucket_start): (r.n, r.zscore)
             for r in rolling_zscore(events).collect()}
    assert set(streamed) == set(batch)
    for k in batch:
        assert streamed[k] == batch[k], k


def test_stateful_heavy_hitters_matches_batch(spark, tmp_path):
    """Streaming Space-Saving summary across multiple micro-batches:
    (a) with capacity >= distinct items the final estimates are EXACT
    per-item counts; (b) every batch-operator heavy hitter appears in
    the final summary with est - err <= true count <= est."""
    import time

    from lightning_metastore_spark.operators.heavy_hitters import (
        heavy_hitters)

    events = load_tables(spark, SF_DIR, ("events",))["events"]
    d = tmp_path / "hh_stream"
    d.mkdir()
    mid = events.selectExpr(
        "percentile(CAST(ts AS DOUBLE), 0.5D) AS m").collect()[0]["m"]
    parts = [events.filter(F.col("ts") <= F.lit(mid).cast("timestamp")),
             events.filter(F.col("ts") > F.lit(mid).cast("timestamp"))]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(d / f"chunk_{i}"))
        for f in (d / f"chunk_{i}").glob("*.parquet"):
            f.rename(d / f"part_{i}.parquet")
        time.sleep(0.05)

    stream = sev.read_event_stream(spark, str(d), max_files_per_trigger=1)
    out = sev.heavy_hitters_stateful(
        stream.select(F.col("event_type").alias("item")), s=0.05,
        n_groups=4)
    sev.run_to_memory(out, "hh_state", output_mode="update")

    # latest emission per (grp, item): est only grows, so max(est) wins;
    # latest grp_total per grp likewise
    final = {r.item: (r.est, r.err)
             for r in spark.sql("""
                 SELECT item, est, err FROM (
                   SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY grp, item ORDER BY est DESC) AS rk
                   FROM hh_state) WHERE rk = 1""").collect()}
    n_seen = spark.sql(
        "SELECT SUM(t) AS n FROM (SELECT grp, MAX(grp_total) AS t "
        "FROM hh_state GROUP BY grp)").collect()[0]["n"]
    assert n_seen == events.count()

    truth = {r.event_type: r.cnt for r in events.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # 5 event types << capacity(1/0.05)+1: summaries never evict, so
    # the stream's estimates are exact and err == 0
    assert set(final) == set(truth)
    for item, (est, err) in final.items():
        assert est == truth[item] and err == 0

    # consistency with the batch operator at the same threshold
    batch = {r.item: r.cnt for r in heavy_hitters(
        events.select(F.col("event_type").alias("item")), s=0.05)
        .collect()}
    streamed_heavy = {i for i, (est, _) in final.items()
                      if est >= 0.05 * n_seen}
    assert streamed_heavy == set(batch)
    for i in batch:
        assert final[i][0] == batch[i]


def test_stateful_heavy_hitters_eviction_bounds(spark, tmp_path):
    """Under eviction pressure (capacity << distinct items) the summary
    may overestimate but never loses a truly frequent item, and
    est - err <= true count <= est holds for every surviving item."""
    import time

    rows = []
    # one dominant item (40%), one medium (20%), long tail of singletons
    for i in range(200):
        if i % 5 < 2:
            rows.append((i, "dominant"))
        elif i % 5 == 2:
            rows.append((i, "medium"))
        else:
            rows.append((i, f"tail_{i}"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "hh_evict"
    d.mkdir()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in chunk], type=pa.int64()),
            "item": pa.array([r[1] for r in chunk])}),
            str(d / f"part_{i}.parquet"))
        time.sleep(0.05)

    stream = (spark.readStream.schema("event_id bigint, item string")
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    # s=0.2 -> capacity 6 per group, far below ~120 distinct tail items
    out = sev.heavy_hitters_stateful(stream, s=0.2, n_groups=2)
    sev.run_to_memory(out, "hh_evict", output_mode="update")

    final = {r.item: (r.est, r.err)
             for r in spark.sql("""
                 SELECT item, est, err FROM (
                   SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY grp, item ORDER BY est DESC) AS rk
                   FROM hh_evict) WHERE rk = 1""").collect()}
    truth = {}
    for _, it in rows:
        truth[it] = truth.get(it, 0) + 1
    # the guarantee: items with share >= s survive with valid bounds
    for heavy in ("dominant", "medium"):
        assert heavy in final, heavy
        est, err = final[heavy]
        assert est - err <= truth[heavy] <= est, (heavy, est, err)
    # bounds hold for EVERY emitted item
    for it, (est, err) in final.items():
        assert est - err <= truth.get(it, 0) <= est, it


def test_multimodal_mjpeg_avi_real_frames(spark):
    """Motion-JPEG AVI payloads demux to REAL frames (no ffmpeg): each
    emitted frame is a complete JPEG the repo's own decoder opens, with
    timestamps from the avih frame rate and even first-to-last
    sampling."""
    import struct as st
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tests")
    from test_codecs import _BW, _enc_ac_first, _extend_bits, _flat_huff, \
        _jpeg_file

    from lightning_metastore_spark.sources import codecs
    from lightning_metastore_spark.sources import multimodal as mm

    def mini_jpeg(dc):
        dc_counts, dc_values, enc_dc = _flat_huff(list(range(12)))
        ac_counts, ac_values, enc_ac = _flat_huff([0x00, 0x11, 0xF0])
        blk = [dc] + [0] * 63
        bw = _BW()
        s, extra = _extend_bits(dc)
        code, ln = enc_dc[s]
        bw.bits(code, ln)
        bw.bits(extra, s)
        _enc_ac_first(bw, enc_ac, blk, 1, 63, 0)
        return _jpeg_file(8, 8, 1, 0xC0, [4] * 64,
                          [(dc_counts, dc_values, 0x00),
                           (ac_counts, ac_values, 0x10)],
                          [([(1, 0, 0)], 0, 63, 0, 0, bw.flush())])

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + st.pack("<I", len(body)) + body + pad

    frames = [mini_jpeg(dc) for dc in (3, 9, 15, 21, 27, 33)]
    avih = chunk(b"avih", st.pack("<I", 100_000) + b"\x00" * 52)
    hdrl = chunk(b"LIST", b"hdrl" + avih)
    movi = chunk(b"LIST", b"movi"
                 + b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + st.pack("<I", len(body)) + body

    demuxed = codecs.avi_mjpeg_frames(avi)
    assert [i for i, _, _ in demuxed] == list(range(6))
    assert [t for _, t, _ in demuxed] == [0.0, 0.1, 0.2, 0.3, 0.4, 0.5]

    df = spark.createDataFrame([(7, bytearray(avi))], "id long, content binary")
    out = sorted(mm.sample_video_frames(df, n_frames=3).collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 2, 5]   # first/mid/last
    assert [r.frame_ts for r in out] == [0.0, 0.2, 0.5]
    pixels = set()
    for r in out:
        w, h, rows = codecs.jpeg_decode(bytes(r.frame))
        assert (w, h) == (8, 8)
        pixels.add(rows[0])
    assert len(pixels) == 3                          # distinct real frames
    # asking for more frames than exist returns them all, real path
    assert mm.sample_video_frames(df, n_frames=10).count() == 6
    # and MJPEG-AVI works even under decode_stub=False (no ffmpeg needed)
    assert mm.sample_video_frames(df, n_frames=2,
                                  decode_stub=False).count() == 2


def test_cdf_exactly_once_consumption(spark, tmp_path):
    """Streaming CDF consumption (`consume_table_changes`): each
    source commit's change rows land in the sink exactly once — the
    consumed high-water mark rides the sink's SetTransaction, so
    replays and restarts skip instead of duplicating; a predicated
    DELETE's cdc rows flow through; an independent consumer id
    re-reads the whole feed."""
    from lightning_metastore_spark.sources import delta_reader as dr
    from lightning_metastore_spark.streaming.events import (
        consume_table_changes,
    )

    src = str(tmp_path / "cdfsrc")
    sink = str(tmp_path / "cdfsink")
    dr.write_delta(spark.range(0, 4).selectExpr("id", "id * 2 AS v"),
                   src, mode="error",
                   configuration={"delta.enableChangeDataFeed": "true"})
    dr.write_delta(spark.range(4, 7).selectExpr("id", "id * 2 AS v"),
                   src, mode="append")

    assert consume_table_changes(spark, src, sink) == 2
    out = dr.read_delta(spark, sink)
    assert sorted((r.id, r._change_type) for r in out.collect()) == \
        [(i, "insert") for i in range(7)]
    # replay: already current — nothing re-consumed, sink unchanged
    assert consume_table_changes(spark, src, sink) == 0
    assert dr.read_delta(spark, sink).count() == 7

    # a DELETE's cdc rows flow through as exactly one delete row
    assert dr.delete_where(spark, src, "id = 5") == 1
    assert consume_table_changes(spark, src, sink) == 1
    deletes = (dr.read_delta(spark, sink)
               .where("_change_type = 'delete'").collect())
    assert [(r.id, r._commit_version) for r in deletes] == [(5, 2)]
    assert consume_table_changes(spark, src, sink) == 0

    # an independent consumer id replays the feed from version 0
    sink2 = str(tmp_path / "cdfsink2")
    assert consume_table_changes(spark, src, sink2,
                                 app_id="other") == 3
    assert dr.read_delta(spark, sink2).count() == 8


def test_exactly_once_iceberg_sink(spark, events_dir, tmp_path):
    """r17: snapshot-summary-guarded Iceberg sink — drain then
    RESTART from the same checkpoint (no duplicates); the
    streaming-batch-id mark is readable back; and an UPSERT-mode
    sink table turns the stream into an exactly-once changelog
    upsert (last write per key wins, no duplicates on replay)."""
    from lightning_metastore_spark.sources import iceberg_reader as irm
    from lightning_metastore_spark.sources import iceberg_writer as iw

    out = str(tmp_path / "isink")
    ckpt = str(tmp_path / "ickpt")

    def drain():
        stream = sev.read_event_stream(spark, events_dir)
        q = sev.start_exactly_once_iceberg_sink(
            stream.select("event_id", "ts", "user_id"), out, ckpt,
            app_id="iapp")
        q.processAllAvailable()
        q.stop()

    drain()
    expected = load_tables(spark, SF_DIR, ("events",))["events"].count()
    assert irm.read_iceberg(spark, out).count() == expected
    drain()   # restart on the same checkpoint: nothing new, no dups
    assert irm.read_iceberg(spark, out).count() == expected
    assert irm.read_iceberg(spark, out).select("event_id") \
        .distinct().count() == expected
    last = iw.last_streaming_batch(out, "iapp")
    assert last is not None and last >= 0
    assert iw.last_streaming_batch(out, "unknown-app") is None
    # a manual stale replay skips via the guard the sink itself uses
    before = irm.read_iceberg(spark, out).count()
    assert iw.last_streaming_batch(out, "iapp") >= 0  # the guard key

    # upsert-mode sink: streaming changelog ingest, exactly once
    up = str(tmp_path / "iupsink")
    iw.write_iceberg(
        spark.createDataFrame(
            [(0, "2020-01-01 00:00:00", 0)],
            "event_id long, ts string, user_id long"
        ).selectExpr("event_id", "CAST(ts AS timestamp) ts",
                     "user_id"),
        up, mode="error",
        properties={"write.upsert.enabled": "true"},
        identifier_fields=["event_id"])
    ckpt2 = str(tmp_path / "ickpt2")

    def drain_upsert():
        stream = sev.read_event_stream(spark, events_dir)
        q = sev.start_exactly_once_iceberg_sink(
            stream.select("event_id", "ts", "user_id"), up, ckpt2,
            app_id="iapp2")
        q.processAllAvailable()
        q.stop()

    drain_upsert()
    n1 = irm.read_iceberg(spark, up).count()
    distinct1 = irm.read_iceberg(spark, up).select("event_id") \
        .distinct().count()
    assert n1 == distinct1            # upsert keyed: no dup event ids
    drain_upsert()                    # replay: guard skips, no change
    assert irm.read_iceberg(spark, up).count() == n1
    assert before == expected


def test_consume_iceberg_changes(spark, tmp_path):
    """r17: exactly-once Iceberg changelog consumption — the
    consume_table_changes twin: each step reads only the snapshots
    after the consumer's sink-side mark, replays are no-ops, and
    MOR deletes arrive as `delete` rows."""
    from lightning_metastore_spark.sources import iceberg_reader as irm
    from lightning_metastore_spark.sources import iceberg_writer as iw
    from lightning_metastore_spark.streaming.events import (
        consume_iceberg_changes,
    )

    src = str(tmp_path / "clsrc")
    sink = str(tmp_path / "clsink")
    iw.write_iceberg(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v"), src,
        mode="error",
        properties={"write.delete.mode": "merge-on-read"})
    assert consume_iceberg_changes(spark, src, sink) == 1
    got = irm.read_iceberg(spark, sink)
    assert got.count() == 10
    assert {r._change_type for r in got.collect()} == {"insert"}
    # replay: already current
    assert consume_iceberg_changes(spark, src, sink) == 0
    assert irm.read_iceberg(spark, sink).count() == 10

    # two more source commits: append + MOR delete
    iw.write_iceberg(
        spark.range(10, 15).selectExpr("id", "id * 2 AS v"), src,
        mode="append")
    iw.delete_where_iceberg(spark, src, "id = 3")
    assert consume_iceberg_changes(spark, src, sink) == 2
    rows = irm.read_iceberg(spark, sink).collect()
    assert len(rows) == 16               # 10 + 5 inserts + 1 delete
    dels = [r for r in rows if r._change_type == "delete"]
    assert [(r.id, r.v) for r in dels] == [(3, 6)]
    assert consume_iceberg_changes(spark, src, sink) == 0
