from __future__ import annotations

import hashlib

import pytest
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


def test_stream_interval_join_equals_batch(spark, sf_small):
    """Stream-stream interval join over bounded input == batch range join
    (the module's shared batch/stream design rule)."""
    stream = SE.read_events_stream(spark, sf_small)
    got = SE.run_available_now(
        SE.interval_join(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "click"),
            lag_minutes=15,
        ),
        "append",
    )
    ev = read_table(spark, sf_small, "events")
    want = SE.interval_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        lag_minutes=15,
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_to_parquet_sink(spark, sf_small, tmp_path):
    stream = SE.read_events_stream(spark, sf_small)
    out = str(tmp_path / "sink")
    SE.stream_to_parquet(SE.dedup_events(stream), out, str(tmp_path / "ckpt"))
    written = spark.read.parquet(out)
    assert written.count() == read_table(spark, sf_small, "events").count()
    assert "event_id" in written.columns


def _bmp24(pixels):
    """Minimal 24-bit uncompressed BMP encoder for test fixtures
    (numpy HxWx3 RGB, bottom-up rows, 4-byte padding per spec)."""
    import struct

    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    raster = b""
    for row in pixels[::-1]:
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        raster += line + b"\x00" * (stride - len(line))
    off = 54
    header = b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + dib + raster


def test_real_image_codecs(spark):
    import numpy as np

    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)  # 4x2 RGB
    ppm = b"P6 4 2 255\n" + px.tobytes()
    gray = np.arange(8, dtype=np.uint8).reshape(2, 4, 1) * 30
    pgm = multimodal.encode_pnm(gray)
    bmp = _bmp24(px)
    media = spark.createDataFrame(
        [(1, "image", bytearray(ppm), "image/x-portable-pixmap"),
         (2, "image", bytearray(pgm), "image/x-portable-graymap"),
         (3, "image", bytearray(bmp), "image/bmp")],
        multimodal.MEDIA_SCHEMA,
    )
    # deterministic_fake=False: every payload must take the REAL decode path
    rows = {r.media_id: r for r in
            multimodal.extract_image_metadata(media, deterministic_fake=False).collect()}
    assert (rows[1].width, rows[1].height) == (4, 2)
    assert rows[1].mean_px == float(px.mean())
    assert (rows[2].width, rows[2].height) == (4, 2)
    assert (rows[3].width, rows[3].height) == (4, 2)
    assert rows[3].mean_px == float(px.mean())  # BMP roundtrips BGR->RGB

    # real nearest-neighbor resize re-encodes as PNM with capped side
    resized = {r.media_id: r for r in
               multimodal.resize_images(media, max_side=2, deterministic_fake=False).collect()}
    assert (resized[1].width, resized[1].height) == (2, 1)
    redecoded = multimodal.decode_image(bytes(resized[1].payload))
    assert redecoded is not None and redecoded[0] == 2


def test_real_frame_sampling_and_wav(spark):
    import io as _io
    import wave as _wave

    import numpy as np

    frame = b"P5 2 2 255\n" + bytes(range(4))
    stream = frame * 25  # 25-frame concatenated-PNM "video"
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(np.arange(-100, 100, dtype="<i2").tobytes())
    wav = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "video", bytearray(stream), "video/x-pnm"),
         (2, "audio", bytearray(wav), "audio/wav")],
        multimodal.MEDIA_SCHEMA,
    )
    frames = multimodal.sample_video_frames(
        media.filter("media_id = 1"), every_n=10, deterministic_fake=False
    ).collect()
    assert sorted(r.frame_idx for r in frames) == [0, 10, 20]
    import hashlib as _hl
    assert all(r.frame_sha1 == _hl.sha1(frame).hexdigest() for r in frames)

    audio = multimodal.extract_audio_metadata(
        media.filter("media_id = 2"), deterministic_fake=False
    ).first()
    assert (audio.n_channels, audio.sample_rate) == (2, 16000)
    assert audio.n_frames == 100  # 200 samples / 2 channels
    assert audio.duration_s == 100 / 16000
    samples = np.arange(-100, 100, dtype=np.float64)
    assert abs(audio.rms - float(np.sqrt(np.mean(samples ** 2)))) < 1e-9


def test_transform_with_state_running_totals(spark, sf_small):
    """transformWithStateInPandas twin must produce the same final state as
    the applyInPandasWithState form and the batch groupBy. Needs
    google.protobuf at runtime (the API's JVM<->Python state channel) —
    skipped where absent (this container; see running_user_totals_tws)."""
    pytest.importorskip("google.protobuf.descriptor")
    stream = SE.read_events_stream(spark, sf_small)
    out = SE.run_available_now(
        SE.running_user_totals_tws(stream), output_mode="update"
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in out.collect()}
    batch = read_table(spark, sf_small, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("t")
    )
    want = {r.user_id: (r.n, r.t) for r in batch.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6


def test_wav_audio_stats_query_matches_oracle(spark):
    """r13 query pre-validation (the established pre-build pattern): the
    unregistered q_media_wav_audio_stats — REAL stdlib-wave decode of
    in-plan-constructed PCM payloads — matches its DuckDB oracle, which
    recomputes channels/rate/frames/duration/RMS straight from the md5
    hex. Typed-exact at sf0.001; also verified at sf0.01 out-of-band
    (PLANS.md round 11)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entrymod.q_media_wav_audio_stats(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert len(rows) == 500
    res = compare_typed(df, rows, con, entrymod._media_wav_audio_stats_oracle())
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res
