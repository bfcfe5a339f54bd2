"""Structured Streaming upgrade + multimodal plumbing + grouped-apply
escape hatch."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataengineering_spark.catalog import SCHEMAS, read_table
from dataengineering_spark.functions.multimodal import (
    MEDIA_TYPE_OF_FORMAT,
    attach_media_meta,
    decode_images,
    frame_sample_plan,
    media_budget_partitions,
)
from dataengineering_spark.functions.udf_registry import grouped_apply, transform_batches
from dataengineering_spark.streaming.structured import (
    file_stream,
    run_foreach_batch,
    sessionized,
    windowed_counts,
)
from tests.conftest import SF_SMOKE


# --- Structured Streaming ---------------------------------------------------

def test_file_stream_foreach_batch_end_to_end(spark, tmp_path):
    """readStream over a file dir → foreachBatch multi-sink → results
    equal the batch computation; re-running with the same checkpoint
    is a no-op (exactly-once per epoch)."""
    src_dir = str(tmp_path / "in")
    read_table(spark, "events", SF_SMOKE).drop("ts").write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def batch_fn(df, epoch_id):
        (
            df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("append")
            .parquet(out_dir)
        )

    q = run_foreach_batch(
        file_stream(spark, src_dir, schema), batch_fn, ckpt, trigger_once=True
    )
    q.awaitTermination(120)
    got = {
        r.event_type: r.n
        for r in spark.read.parquet(out_dir).groupBy("event_type").agg(F.sum("n").alias("n")).collect()
    }
    want = {
        r.event_type: r.n
        for r in spark.read.parquet(src_dir).groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want

    # same checkpoint → backlog already processed → no new rows
    n_before = spark.read.parquet(out_dir).count()
    q2 = run_foreach_batch(
        file_stream(spark, src_dir, schema), batch_fn, ckpt, trigger_once=True
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n_before


def test_windowed_counts_batch_equivalence(spark):
    ev = read_table(spark, "events", SF_SMOKE)
    win = windowed_counts(ev, window="1 hour")
    manual = ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    j = win.join(manual, ["window_start", "event_type"], "full").filter(
        win.n.isNull() | manual.n.isNull() | (win.n != manual.n)
    )
    assert j.count() == 0


def test_sliding_window_covers_each_event_twice(spark):
    ev = read_table(spark, "events", SF_SMOKE)
    sliding = windowed_counts(ev, window="2 hours", slide="1 hour")
    total = sliding.agg(F.sum("n")).collect()[0][0]
    assert total == 2 * ev.count()  # every event in exactly 2 windows


def test_sessionized_gap_semantics(spark):
    """Session windows vs a hand-built gaps-and-islands computation."""
    ev = read_table(spark, "events", SF_SMOKE)
    sess = sessionized(ev, gap="30 minutes")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTES"))
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    manual = gaps.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events")
    )
    j = sess.join(manual, ["user_id", "session_start"], "full").filter(
        sess.n_events.isNull()
        | manual.n_events.isNull()
        | (sess.n_events != manual.n_events)
    )
    assert j.count() == 0


# --- multimodal -------------------------------------------------------------

@pytest.fixture
def media(spark):
    docs = read_table(spark, "documents", SF_SMOKE)
    # synthesize payloads: PNG magic + text bytes (deterministic fake)
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(bytes.fromhex("89504e470d0a1a0a")), F.encode("text", "UTF-8")
        ).alias("payload"),
    )


def test_attach_media_meta_sniffs_format(spark, media):
    out = attach_media_meta(media)
    metas = out.select("media_meta.*").collect()
    assert all(m.format == "png" for m in metas)
    assert all(m.n_bytes > 8 for m in metas)


def test_decode_images_rejects_torn_png(spark, media):
    # the media fixture's payloads carry the PNG magic but no valid
    # chunk structure — the real decoder must refuse, not fabricate
    with pytest.raises(Exception, match="IHDR|ValueError|Error"):
        decode_images(media).collect()


def test_decode_images_non_png_needs_pillow(spark):
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("pillow installed; gate not reachable")
    spark_df = spark.createDataFrame(
        [(1, bytes.fromhex("ffd8ff") + b"\x00" * 32)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="pillow"):
        decode_images(spark_df).collect()


def test_decode_images_real_png_default_decoder(spark):
    """REAL decode path, no injection: solid + gradient PNGs through
    every scanline filter type, means checked against direct pixel
    math."""
    import zlib

    from dataengineering_spark.functions.multimodal import (
        PNG_SIGNATURE,
        make_solid_png,
        decode_png,
    )

    # gradient image, rows encoded with filters 1..4 to exercise the
    # unfilter paths: pixel (x, y) = (x*7 % 256, y*11 % 256, (x+y) % 256)
    w, h = 16, 4
    rows = [
        [((x * 7) % 256, (y * 11) % 256, (x + y) % 256) for x in range(w)]
        for y in range(h)
    ]

    def flat(r):
        return [c for px in r for c in px]

    raw = b""
    prev = [0] * (w * 3)
    for y, ftype in zip(range(h), (1, 2, 3, 4)):
        line = flat(rows[y])
        enc = bytearray()
        for i in range(w * 3):
            a = line[i - 3] if i >= 3 else 0
            up = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (a + up) >> 1
            else:
                pa, pb, pc = abs(up - c), abs(a - c), abs(a + up - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
            enc.append((line[i] - pred) & 0xFF)
        raw += bytes([ftype]) + bytes(enc)
        prev = line

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    import struct

    gradient_png = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    # direct check of the decoder on the filtered gradient
    d = decode_png(gradient_png)
    n = w * h
    exp_r = sum(px[0] for r in rows for px in r) / n
    exp_g = sum(px[1] for r in rows for px in r) / n
    exp_b = sum(px[2] for r in rows for px in r) / n
    assert (d["width"], d["height"]) == (w, h)
    assert d["feature"] == [exp_r, exp_g, exp_b]
    assert d["mean_luma"] == 0.299 * exp_r + 0.587 * exp_g + 0.114 * exp_b

    # end-to-end through Spark with the DEFAULT decoder
    df = spark.createDataFrame(
        [(1, make_solid_png(5, 3, (10, 20, 30))), (2, gradient_png)],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in decode_images(df).collect()}
    assert (out[1].width, out[1].height) == (5, 3)
    assert out[1].mean_luma == 0.299 * 10 + 0.587 * 20 + 0.114 * 30
    assert (out[2].width, out[2].height) == (w, h)


def test_decode_images_with_injected_decoder(spark, media):
    """The production plug-point: deterministic fake decoder exercises
    the full Arrow batch path and schema contract."""

    def fake_decoder(payload: bytes) -> dict:
        return {
            "width": len(payload) % 640,
            "height": 480,
            "mean_luma": (payload[8] if len(payload) > 8 else 0) / 255.0,
            "feature": [float(len(payload)), float(payload[-1])],
        }

    out = decode_images(media, decoder=fake_decoder)
    rows = out.collect()
    assert len(rows) == media.count()
    assert all(r.height == 480 and len(r.feature) == 2 for r in rows)
    assert out.schema["feature"].dataType.simpleString() == "array<float>"


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame([(1, 3500), (2, 900)], "doc_id long, duration_ms long")
    plan = frame_sample_plan(vids, every_ms=1000)
    got = {(r.doc_id, r.frame_ts_ms) for r in plan.collect()}
    assert got == {(1, 0), (1, 1000), (1, 2000), (1, 3000), (2, 0)}


def test_media_budget_partitions(spark, media):
    sized = media.withColumn("n_bytes", F.octet_length("payload"))
    out = media_budget_partitions(sized, "n_bytes", target_bytes=4096)
    # ~50 docs * ~300B → a handful of 4KB partitions, not 1, not 1000
    n = out.rdd.getNumPartitions()
    assert 1 < n < 100


# --- grouped apply escape hatch --------------------------------------------

def test_grouped_apply_contract(spark):
    ev = read_table(spark, "events", SF_SMOKE)

    def spread(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "spread": [float(pdf["value"].max() - pdf["value"].min())],
            }
        )

    out = grouped_apply(ev, ["event_type"], spread, "event_type string, spread double")
    rows = {r.event_type: r.spread for r in out.collect()}
    want = {
        r.event_type: r.spread
        for r in ev.groupBy("event_type")
        .agg((F.max("value") - F.min("value")).alias("spread"))
        .collect()
    }
    assert rows == want


def test_transform_batches(spark):
    ev = read_table(spark, "events", SF_SMOKE)

    def enrich(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "double_value": pdf["value"] * 2}
        )

    out = transform_batches(ev, enrich, "event_id long, double_value double")
    assert out.count() == ev.count()
    r = out.orderBy("event_id").first()
    src = ev.orderBy("event_id").first()
    assert r.double_value == src.value * 2


def test_sniff_format_matrix(spark):
    """Every known magic-byte signature classifies to the right
    (format, media_type); junk stays unknown."""
    payloads = {
        "png": bytes.fromhex("89504e470d0a1a0a") + b"x" * 8,
        "jpeg": bytes.fromhex("ffd8ffe0") + b"x" * 8,
        "gif": b"GIF89a" + b"x" * 8,
        "webp": b"RIFF\x10\x00\x00\x00WEBPVP8 ",
        "wav": b"RIFF\x10\x00\x00\x00WAVEfmt ",
        "avi": b"RIFF\x10\x00\x00\x00AVI LIST",
        "mp3": b"ID3\x04\x00" + b"x" * 8,
        "flac": b"fLaC\x00\x00\x00\x22" + b"x" * 4,
        "ogg": b"OggS\x00\x02" + b"x" * 8,
        "mp4": b"\x00\x00\x00\x20ftypisom" + b"x" * 4,
        "webm": bytes.fromhex("1a45dfa3") + b"x" * 8,
        "unknown": b"plain text, no magic",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in payloads.items()], "expected string, payload binary"
    )
    got = {
        r.expected: (r.format, r.media_type)
        for r in attach_media_meta(df).select("expected", "media_meta.*").collect()
    }
    for fmt, (sniffed, mtype) in got.items():
        assert sniffed == fmt, (fmt, sniffed)
        want_type = MEDIA_TYPE_OF_FORMAT.get(fmt, "unknown")
        assert mtype == want_type, (fmt, mtype)


# --- container duration parsing --------------------------------------------

def _wav_bytes(byte_rate=16000, data_size=32000, extra_chunk=False):
    fmt_body = (
        (1).to_bytes(2, "little")          # PCM
        + (1).to_bytes(2, "little")        # mono
        + (byte_rate // 2).to_bytes(4, "little")  # sample rate (16-bit)
        + byte_rate.to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
    if extra_chunk:
        info = b"INFOdemo"
        chunks += b"LIST" + len(info).to_bytes(4, "little") + info
    chunks += b"data" + data_size.to_bytes(4, "little") + b"\x00" * 64
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _mp4_bytes(timescale=600, duration=1200, version=0):
    if version == 0:
        body = bytes([0, 0, 0, 0]) + b"\x00" * 8 + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big") + b"\x00" * 80
    else:
        body = bytes([1, 0, 0, 0]) + b"\x00" * 16 + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big") + b"\x00" * 76
    mvhd = (8 + len(body)).to_bytes(4, "big") + b"mvhd" + body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"isom" + b"\x00" * 4
    return ftyp + moov


def test_parse_wav_duration_canonical_and_chunked():
    from dataengineering_spark.functions.multimodal import parse_wav_duration

    assert parse_wav_duration(_wav_bytes()) == 2000
    assert parse_wav_duration(_wav_bytes(extra_chunk=True)) == 2000
    assert parse_wav_duration(b"RIFFxxxxNOPE") is None


def test_parse_mp4_duration_both_versions():
    from dataengineering_spark.functions.multimodal import parse_mp4_duration

    assert parse_mp4_duration(_mp4_bytes(version=0)) == 2000
    assert parse_mp4_duration(_mp4_bytes(timescale=1000, duration=1500, version=1)) == 1500
    assert parse_mp4_duration(b"\x00" * 32) is None


def test_wav_duration_expression_matches_parser(spark):
    from dataengineering_spark.functions.multimodal import wav_duration_ms

    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes())), (2, bytearray(_mp4_bytes()))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.d for r in df.select("doc_id", wav_duration_ms("payload").alias("d")).collect()}
    assert got == {1: 2000, 2: None}  # canonical WAV engine-side; mp4 null


def test_media_durations_mapinpandas(spark):
    from dataengineering_spark.functions.multimodal import media_durations

    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes())),
            (2, bytearray(_mp4_bytes(timescale=90000, duration=90000 * 3))),
            (3, bytearray(b"\x89PNG\r\n\x1a\x0a" + b"x" * 16)),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: (r.format, r.duration_ms) for r in media_durations(df).collect()}
    assert rows[1] == ("wav", 2000)
    assert rows[2] == ("mp4", 3000)
    assert rows[3] == ("png", None)


def test_unfilter_numpy_matches_and_beats_bytewise():
    """The vectorized unfilter must be byte-identical to the per-byte
    reference on a large mixed-filter image, and markedly faster (the
    round-2 finding: three nested Python loops per image)."""
    import time
    import zlib

    import numpy as np

    from dataengineering_spark.functions.multimodal import _unfilter_scanlines

    def unfilter_reference(raw, h, stride, channels):
        prev = bytearray(stride)
        rows = []
        p = 0
        for _ in range(h):
            ftype = raw[p]
            p += 1
            line = bytearray(raw[p : p + stride])
            p += stride
            if ftype == 1:
                for i in range(channels, stride):
                    line[i] = (line[i] + line[i - channels]) & 0xFF
            elif ftype == 2:
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ftype == 3:
                for i in range(stride):
                    a = line[i - channels] if i >= channels else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:
                for i in range(stride):
                    a = line[i - channels] if i >= channels else 0
                    c = prev[i - channels] if i >= channels else 0
                    up = prev[i]
                    pa, pb, pc = abs(up - c), abs(a - c), abs(a + up - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
            rows.append(bytes(line))
            prev = line
        return rows

    w, h, channels = 256, 200, 3
    stride = w * channels
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(h, stride), dtype=np.uint8)
    # deterministic pseudo-image with structure (so filters matter)
    pixels = np.cumsum(pixels, axis=1, dtype=np.int64).astype(np.uint8)

    def encode(ftypes):
        raw = bytearray()
        prevrow = [0] * stride
        for y in range(h):
            ft = ftypes[y % len(ftypes)]
            line = pixels[y].tolist()
            enc = bytearray([ft])
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                up = prevrow[i]
                c = prevrow[i - channels] if i >= channels else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = up
                elif ft == 3:
                    pred = (a + up) >> 1
                else:
                    pa, pb, pc = abs(up - c), abs(a - c), abs(a + up - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                enc.append((line[i] - pred) & 0xFF)
            raw += enc
            prevrow = line
        return bytes(raw)

    # byte-identity on every filter type, including the sequential ones
    raw_mixed = encode((0, 1, 2, 3, 4))
    got = _unfilter_scanlines(raw_mixed, h, stride, channels)
    assert [bytes(r) for r in got] == unfilter_reference(
        raw_mixed, h, stride, channels
    )

    # perf on the vectorizable filters (None/Sub/Up — what our own
    # encoder and Up/Sub-heavy real encoders emit): Average and Paeth
    # carry a true per-pixel dependency and cannot vectorize in
    # numpy, so the mixed case above is identity-checked only.
    raw_vec = encode((0, 1, 2))
    t0 = time.perf_counter()
    ref = unfilter_reference(raw_vec, h, stride, channels)
    t_ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = _unfilter_scanlines(raw_vec, h, stride, channels)
    t_new = time.perf_counter() - t0
    assert [bytes(r) for r in got] == ref
    # measured ~5x; demand 2.5x to stay robust under CI noise
    assert t_new * 2.5 < t_ref, (t_new, t_ref)


def test_decode_png_vectorized_speedup_end_to_end():
    """Whole-decode speedup on the production-shaped payload (our
    encoder emits filter-0 scanlines): the old per-byte unfilter +
    per-byte channel-sum loops are replaced by numpy, so decode cost
    per image drops by an order of magnitude."""
    import time

    from dataengineering_spark.functions.multimodal import (
        decode_png,
        make_solid_png,
    )

    payload = make_solid_png(512, 256, (13, 77, 201))

    def decode_old_style(b):
        """The round-2 per-byte decode loop, kept here as the baseline."""
        import zlib

        # parse chunks exactly like decode_png
        pos, idat = 8, b""
        w = h = None
        bb = bytes(payload)
        while pos + 8 <= len(bb):
            ln = int.from_bytes(bb[pos : pos + 4], "big")
            typ = bb[pos + 4 : pos + 8]
            data = bb[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if typ == b"IHDR":
                w = int.from_bytes(data[0:4], "big")
                h = int.from_bytes(data[4:8], "big")
            elif typ == b"IDAT":
                idat += data
        raw = zlib.decompress(idat)
        stride = w * 3
        sums = [0, 0, 0]
        p = 0
        prev = bytearray(stride)
        for _ in range(h):
            p += 1  # filter type 0
            line = bytearray(raw[p : p + stride])
            p += stride
            for i in range(0, stride, 3):
                sums[0] += line[i]
                sums[1] += line[i + 1]
                sums[2] += line[i + 2]
            prev = line
        n = w * h
        return [s / n for s in sums]

    t0 = time.perf_counter()
    old_means = decode_old_style(payload)
    t_old = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = decode_png(payload)
    t_new = time.perf_counter() - t0
    assert d["feature"] == old_means == [13.0, 77.0, 201.0]
    # measured ~25x; demand 5x to stay robust under CI noise
    assert t_new * 5 < t_old, (t_new, t_old)


def test_jpeg_dimension_parse():
    """Marker walk: dims from SOF0 behind APP segments; progressive
    SOF2 accepted; DHT-before-SOF skipped; truncated/non-JPEG -> None."""
    from dataengineering_spark.functions.multimodal import (
        make_test_jpeg,
        parse_jpeg_dimensions,
        parse_png_dimensions,
        make_solid_png,
    )

    assert parse_jpeg_dimensions(make_test_jpeg(640, 480)) == (640, 480)
    assert parse_jpeg_dimensions(make_test_jpeg(1, 65535)) == (1, 65535)

    # SOF2 (progressive) + a DHT segment before it
    j = make_test_jpeg(320, 200)
    dht = b"\xff\xc4" + (2 + 3).to_bytes(2, "big") + b"\x00\x01\x02"
    progressive = j[:2] + dht + j[2:].replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert parse_jpeg_dimensions(progressive) == (320, 200)

    assert parse_jpeg_dimensions(b"\xff\xd8\xff\xe0") is None  # truncated
    assert parse_jpeg_dimensions(b"not a jpeg") is None
    # scan before any SOF
    sos_first = j[:2] + b"\xff\xda\x00\x02" + j[2:]
    assert parse_jpeg_dimensions(sos_first) is None

    assert parse_png_dimensions(make_solid_png(12, 34, (0, 0, 0))) == (12, 34)
    assert parse_png_dimensions(b"\x89PNG") is None


def test_pcm_features_decode_known_samples(spark):
    """Real PCM decode: features computed distributed must equal the
    pure-Python reference on known int16 samples, including a
    non-canonical layout (LIST chunk before data) and a null payload."""
    from dataengineering_spark.functions.multimodal import (
        make_test_wav,
        pcm_features,
    )

    s1 = [0, 1000, -1000, 2000, -2000, 30000]  # 4 sign changes
    s2 = [5, 5, 5, 5]  # constant, no crossings
    wav1 = make_test_wav(s1)
    wav2 = make_test_wav(s2)
    # splice a LIST chunk between fmt and data to make wav3 non-canonical
    wav3 = wav1[:36] + b"LIST" + (4).to_bytes(4, "little") + b"INFO" + wav1[36:]
    df = spark.createDataFrame(
        [(1, bytearray(wav1)), (2, bytearray(wav2)), (3, bytearray(wav3)), (4, None)],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in pcm_features(df).collect()}

    def ref(samples):
        n = len(samples)
        ss = sum(x * x for x in samples)
        zc = sum(1 for a, b in zip(samples, samples[1:]) if a * b < 0)
        return n, max(abs(x) for x in samples), zc, int((ss / n) ** 0.5 * 1000)

    for doc, samples in ((1, s1), (2, s2), (3, s1)):
        n, peak, zc, rms = ref(samples)
        r = got[doc]
        assert (r.n_samples, r.peak_abs, r.zero_crossings, r.rms_milli) == (
            n, peak, zc, rms,
        ), doc
    assert got[4].n_samples == 0 and got[4].rms_milli == 0
