from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from scabillmatch_spark.io.sources import read_table
from scabillmatch_spark.operators import multimodal
from scabillmatch_spark.streaming import events as SE


def test_stream_tumbling_equals_batch(spark, sf_small):
    stream = SE.read_events_stream(spark, sf_small)
    streamed = SE.run_available_now(SE.tumbling_counts(stream)).collect()
    batch = SE.tumbling_counts(read_table(spark, sf_small, "events")).collect()
    key = lambda r: (r.hour, r.event_type)
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(streamed) > 0


def test_stream_dedup(spark, sf_small):
    stream = SE.read_events_stream(spark, sf_small)
    out = SE.run_available_now(SE.dedup_events(stream), output_mode="append")
    n_stream = out.count()
    n_batch = read_table(spark, sf_small, "events").dropDuplicates(["event_id"]).count()
    assert n_stream == n_batch


def test_session_windows_batch(spark, sf_small):
    ev = read_table(spark, sf_small, "events")
    sess = SE.session_windows(ev).collect()
    assert len(sess) > 0
    assert all(r.n_events >= 1 for r in sess)


def test_image_metadata(spark, sf_small):
    docs = read_table(spark, sf_small, "documents")
    media = multimodal.documents_as_media(docs)
    meta = multimodal.extract_image_metadata(media)
    rows = meta.collect()
    assert len(rows) == docs.count()
    # deterministic: recompute one sha1 locally
    sample_doc = docs.filter(F.col("doc_id") == rows[0].media_id).first()
    assert rows[0].sha1 == hashlib.sha1(sample_doc.text.encode()).hexdigest()
    assert all(64 <= r.width < 256 and r.n_bytes > 0 for r in rows)


def test_resize_and_frames(spark, sf_small):
    docs = read_table(spark, sf_small, "documents").limit(50)
    media = multimodal.documents_as_media(docs)
    resized = multimodal.resize_images(media, max_side=100).collect()
    assert all(max(r.width, r.height) <= 100 for r in resized)
    frames = multimodal.sample_video_frames(media, every_n=10)
    assert frames.count() >= 50  # at least one frame per doc
    assert frames.groupBy("media_id").count().filter("count < 1").count() == 0

def test_stateful_running_totals(spark, sf_small):
    stream = SE.read_events_stream(spark, sf_small)
    out = SE.run_available_now(SE.running_user_totals(stream), output_mode="update")
    got = {r.user_id: (r.n_events, r.total_value) for r in out.collect()}
    batch = read_table(spark, sf_small, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("t")
    )
    want = {r.user_id: (r.n, r.t) for r in batch.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6


def test_stream_to_parquet_sink(spark, sf_small, tmp_path):
    stream = SE.read_events_stream(spark, sf_small)
    out = str(tmp_path / "sink")
    SE.stream_to_parquet(SE.dedup_events(stream), out, str(tmp_path / "ckpt"))
    written = spark.read.parquet(out)
    assert written.count() == read_table(spark, sf_small, "events").count()
    assert "event_id" in written.columns
