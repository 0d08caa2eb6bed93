"""Sources (GTFS CSV/zip, rt decode, file as-of pairing), streaming
(file source + foreachBatch merge), sinks (partitioned statistics), and
multimodal plumbing."""

from __future__ import annotations

import datetime as dt
import os
import zipfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark import schemas as S
from dystonse_gtfs_data_spark.operators.multimodal import (
    decode_and_featurize_images,
    sample_audio_features,
    video_decode_stub,
)
from dystonse_gtfs_data_spark.sources.demo import build_schedule
from dystonse_gtfs_data_spark.sources.gtfs import derive_route_variants, read_gtfs
from dystonse_gtfs_data_spark.sources.rt import (
    decode_feed_messages,
    fake_decoder,
    list_feed_files,
    protobuf_decoder,
)
from dystonse_gtfs_data_spark.sources.sinks import (
    load_statistics,
    merge_statistics,
    save_statistics,
)
from dystonse_gtfs_data_spark.streaming.pipeline import (
    apply_retention,
    start_records_stream,
)

GTFS_CSV = {
    "agency": "agency_id,agency_name\na1,Demo Transit\n",
    "routes": "route_id,agency_id,route_short_name,route_type\nr1,a1,R1,3\nr2,a1,R2,0\n",
    "stops": "stop_id,stop_name,stop_lat,stop_lon\ns0,Alpha,53.0,8.8\ns1,Beta,53.001,8.8\n",
    "trips": "trip_id,route_id,service_id,trip_headsign\nta,r1,svc,Down\ntb,r1,svc,Down\ntc,r1,svc,Up\n",
    "stop_times": (
        "trip_id,stop_sequence,stop_id,arrival_time,departure_time\n"
        "ta,1,s0,28770,28800\nta,2,s1,29070,29100\n"
        "tb,1,s0,30570,30600\ntb,2,s1,30870,30900\n"  # same pattern as ta
        "tc,1,s1,28770,28800\ntc,2,s0,29070,29100\n"  # reversed → new variant
    ),
    "calendar": (
        "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\n"
        "svc,true,true,true,true,true,false,false,2024-01-01,2024-12-31\n"
    ),
}


@pytest.fixture()
def gtfs_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    for name, content in GTFS_CSV.items():
        (d / f"{name}.txt").write_text(content)
    return str(d)


class TestGtfsSource:
    def test_read_dir_and_derive_variants(self, spark, gtfs_dir):
        tables = read_gtfs(spark, gtfs_dir)
        assert tables["routes"].count() == 2
        trips = {r["trip_id"]: r["route_variant"] for r in tables["trips"].collect()}
        # ta and tb share a stop pattern → same variant; tc differs
        assert trips["ta"] == trips["tb"] != trips["tc"]
        # schema'd read: ints are ints
        st = tables["stop_times"].schema
        assert str(st["stop_sequence"].dataType) == "IntegerType()"

    def test_read_zip(self, spark, gtfs_dir, tmp_path):
        zpath = str(tmp_path / "feed.zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            for name in GTFS_CSV:
                zf.write(os.path.join(gtfs_dir, f"{name}.txt"), f"{name}.txt")
        tables = read_gtfs(spark, zpath)
        assert tables["trips"].count() == 3

    def test_explicit_variants_respected(self, spark):
        sched = build_schedule(spark)
        trips = {r["trip_id"]: r["route_variant"] for r in sched["trips"].collect()}
        assert trips == {"t_long": 101, "t_short": 201, "t_sub": 102}
        # re-derivation groups by pattern: t_long ≠ t_sub (sub-trip differs)
        derived = derive_route_variants(sched["trips"], sched["stop_times"])
        dmap = {r["trip_id"]: r["route_variant"] for r in derived.collect()}
        assert dmap["t_long"] != dmap["t_sub"]


class TestRtSource:
    @staticmethod
    def _write_feed(path, rows):
        header = "trip_id,start_date,start_time,route_id,stop_id,stop_sequence,arrival_delay,departure_delay"
        path.write_text("\n".join([header] + rows))

    def test_decode_and_asof_pairing(self, spark, tmp_path):
        rt_dir = tmp_path / "rt"
        sched_dir = tmp_path / "sched"
        rt_dir.mkdir()
        sched_dir.mkdir()
        (sched_dir / "gtfs-2024-01-01.zip").write_bytes(b"x")
        (sched_dir / "gtfs-2024-01-03.zip").write_bytes(b"x")
        self._write_feed(
            rt_dir / "feed-2024-01-02T08-00-00.csv",
            ["t_long,20240102,08:00:00,r1,s0,1,60,66"],
        )
        self._write_feed(
            rt_dir / "feed-2024-01-04T09-30-00.csv",
            ["t_long,20240104,08:00:00,r1,s1,2,120,", "t_x,,,,s9,9,,"],
        )

        paired = list_feed_files(spark, str(rt_dir), str(sched_dir)).collect()
        by_file = {os.path.basename(r["rt_file"]): os.path.basename(r["schedule_file"]) for r in paired}
        # as-of: each rt file pairs with the newest schedule dated <= it
        assert by_file["feed-2024-01-02T08-00-00.csv"] == "gtfs-2024-01-01.zip"
        assert by_file["feed-2024-01-04T09-30-00.csv"] == "gtfs-2024-01-03.zip"

        files = spark.read.format("binaryFile").load(str(rt_dir))
        updates = decode_feed_messages(files, fake_decoder).collect()
        assert len(updates) == 3
        first = [u for u in updates if u["trip_id"] == "t_long" and u["stop_sequence"] == 1][0]
        # header timestamp from the filename, not mtime
        assert first["header_timestamp"] == dt.datetime(2024, 1, 2, 8, 0, 0)
        nulls = [u for u in updates if u["trip_id"] == "t_x"][0]
        assert nulls["arrival_delay"] is None and nulls["start_time"] is None

    def test_protobuf_decoder_is_gated(self):
        with pytest.raises(NotImplementedError):
            protobuf_decoder(b"\x00")


class TestStreaming:
    def test_stream_matches_batch(self, spark, tmp_path):
        from dystonse_gtfs_data_spark.operators.records import build_records, merge_records
        from dystonse_gtfs_data_spark.sources.demo import build_rt_updates

        sched = build_schedule(spark)
        rt = build_rt_updates(spark)
        land = str(tmp_path / "landing")
        rt.write.parquet(land)

        collected = []

        def sink(df, epoch_id):
            collected.append(df.collect())

        q = start_records_stream(
            spark,
            land,
            sched["trips"],
            sched["stop_times"],
            source="stream",
            sink=sink,
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(120)
        stream_rows = {
            (r["trip_id"], r["stop_sequence"]): r["delay_arrival"]
            for batch in collected
            for r in batch
        }
        batch_df = build_records(rt, sched["trips"], sched["stop_times"], source="stream")
        batch_rows = {
            (r["trip_id"], r["stop_sequence"]): r["delay_arrival"]
            for r in merge_records(batch_df.limit(0), batch_df, key=S.RECORDS_KEY).collect()
        }
        assert stream_rows == batch_rows  # batch/stream parity

    def test_retention(self, spark):
        now = dt.datetime(2024, 1, 2, 12, 0, 0)
        rows = [
            # started 2024-01-02 08:00 → kept
            ("s", 1, "x", 1, "r1", "t1", dt.date(2024, 1, 2), 28800, None, None, 3, 1, 10, None, "f_new"),
            # started 2024-01-01 08:00 → > 12 h old → dropped
            ("s", 1, "x", 1, "r1", "t2", dt.date(2024, 1, 1), 28800, None, None, 3, 1, 10, None, "f_new"),
            # schedule-origin from an outdated schedule → dropped
            ("s", 1, "x", 1, "r1", "t3", dt.date(2024, 1, 2), 28800, None, None, 3, 2, 10, None, "f_old"),
        ]
        preds = spark.createDataFrame(rows, S.PREDICTIONS)
        kept = apply_retention(preds, now, current_schedule_file="f_new").collect()
        assert {r["trip_id"] for r in kept} == {"t1"}


class TestSinks:
    def test_partitioned_roundtrip_and_merge(self, spark, tmp_path):
        stats = spark.createDataFrame(
            [
                ("specific", "r1", 101, 0, 5, None, None, None, 12, 1, 0.0,
                 [{"x": 0.0, "y": 0.0}, {"x": 60.0, "y": 1.0}], 0, 42),
                ("default", None, None, None, None, None, 3, "middle", 3, 1, None,
                 [{"x": 0.0, "y": 0.0}, {"x": 60.0, "y": 1.0}], 3, 99),
            ],
            S.DELAY_CURVES,
        )
        p1 = str(tmp_path / "stats_a")
        p2 = str(tmp_path / "stats_b")
        save_statistics(stats, p1)
        save_statistics(stats, p2)
        loaded = load_statistics(spark, p1)
        assert loaded.count() == 2
        # partition pruning path: scope+route_id are partition columns
        assert loaded.filter((F.col("scope") == "specific") & (F.col("route_id") == "r1")).count() == 1
        merged = merge_statistics(p1, p2, spark)
        assert merged.filter(F.col("scope") == "specific").count() == 1
        assert merged.filter(F.col("scope") == "default").count() == 1


class TestMultimodal:
    def test_image_plumbing(self, spark):
        rows = [(i, bytes(range(i % 7, i % 7 + 192 if i % 3 else 10)), None) for i in range(1, 9)]
        assets = spark.createDataFrame(rows, "asset_id long, content binary, meta struct<width:int,height:int,channels:int,format:string>")
        out = decode_and_featurize_images(assets).collect()
        assert len(out) == 8
        for r in out:
            assert r["width"] == 8 and r["height"] == 8
            assert len(r["thumbnail"]) == 4 * 4 * 3
            assert 0.0 <= r["mean_intensity"] <= 255.0

    def test_image_average_hash(self, spark):
        """Identical blobs collide, different blobs (generically) don't,
        and the bit math matches a hand fold in exact integers."""
        import numpy as np

        from dystonse_gtfs_data_spark.operators.multimodal import (
            image_average_hash,
            image_phash_dup_groups,
        )

        blob_a = bytes((i * 7) % 256 for i in range(192))
        blob_b = bytes((i * 11 + 3) % 256 for i in range(192))
        assets = spark.createDataFrame(
            [(1, blob_a), (2, blob_b), (3, blob_a)],
            "asset_id long, content binary",
        )
        out = {r["asset_id"]: (r["phash_hi"], r["phash_lo"]) for r in image_average_hash(assets).collect()}
        assert out[1] == out[3] != out[2]
        b = np.frombuffer(blob_a, dtype=np.uint8).astype(int)
        gs = b.reshape(-1, 3).sum(axis=1)
        bits = [1 if g * 64 > gs.sum() else 0 for g in gs]
        assert out[1][1] == sum(bit << p for p, bit in enumerate(bits[:32]))
        assert out[1][0] == sum(bit << p for p, bit in enumerate(bits[32:]))
        groups = image_phash_dup_groups(assets).collect()
        assert sorted(r["asset_id"] for r in groups) == [1, 3]
        assert all(r["group_size"] == 2 for r in groups)

    def test_audio_plumbing(self, spark):
        assets = spark.createDataFrame(
            [(1, bytes(1600)), (2, bytes(320))], "asset_id long, content binary"
        )
        out = {r["asset_id"]: r for r in sample_audio_features(assets).collect()}
        assert out[1]["n_frames"] == 10
        assert len(out[1]["rms"]) == 10
        assert out[2]["n_frames"] == 2

    def test_video_stub_raises(self):
        with pytest.raises(NotImplementedError):
            video_decode_stub(b"")

    def test_video_frame_sampling(self, spark):
        from dystonse_gtfs_data_spark.operators.multimodal import (
            sample_video_frames,
        )

        # 5 frames (960 bytes) and 1 frame (short blob padded)
        assets = spark.createDataFrame(
            [(1, bytes(range(256)) * 4), (2, bytes(range(10)))],
            "asset_id long, content binary",
        )
        rows = sample_video_frames(assets, stride=2).collect()
        by_asset = {}
        for r in rows:
            by_asset.setdefault(r["asset_id"], []).append(r)
        # 1024 bytes → 5 frames → sampled frame_idx 0, 2, 4
        assert sorted(r["frame_idx"] for r in by_asset[1]) == [0, 2, 4]
        assert all(r["n_frames"] == 5 for r in by_asset[1])
        # short blob → one zero-padded frame
        assert [r["frame_idx"] for r in by_asset[2]] == [0]
        assert by_asset[2][0]["mean_intensity"] == pytest.approx(
            sum(range(10)) / 192.0
        )

    def test_synthetic_image_blob_matches_formula(self, spark):
        from dystonse_gtfs_data_spark.operators.multimodal import (
            synthetic_image_assets,
        )

        docs = spark.createDataFrame([(0,), (7,), (499,)], "doc_id long")
        rows = {r["asset_id"]: r for r in synthetic_image_assets(docs).collect()}
        for doc_id in (0, 7, 499):
            blob = bytes(rows[doc_id]["content"])
            assert len(blob) == 192
            assert blob == bytes((doc_id * 31 + i * 7) % 256 for i in range(192))

    def test_synthetic_audio_blob_matches_formula(self, spark):
        from dystonse_gtfs_data_spark.operators.multimodal import (
            synthetic_audio_assets,
        )

        docs = spark.createDataFrame([(3,), (42,)], "doc_id long")
        rows = {r["asset_id"]: r for r in synthetic_audio_assets(docs).collect()}
        for doc_id in (3, 42):
            blob = bytes(rows[doc_id]["content"])
            assert len(blob) == 320
            assert blob == bytes(
                255 if (doc_id * 7 + i * 13) % 3 == 0 else 0 for i in range(320)
            )

    def test_audio_rms_quantization_bit_exact_for_all_k(self):
        """The audio_rms catalog oracle claims round(rms*1e4) agrees between
        the float32 numpy kernel and DuckDB's double sqrt for every possible
        ones-count k in a 160-sample frame.  Prove it exhaustively."""
        import duckdb

        ks = list(range(161))
        db = dict(
            duckdb.sql(
                "SELECT i, CAST(round(CAST(sqrt(i / 160.0) AS REAL) * 10000) "
                "AS BIGINT) FROM range(0, 161) t(i)"
            ).fetchall()
        )
        for k in ks:
            frame = np.zeros(160, dtype=np.float32)
            frame[:k] = 1.0
            rms32 = np.sqrt((frame**2).mean())  # float32 end-to-end
            assert int(np.round(np.float64(rms32) * 10000)) == db[k], k


class TestWireCodec:
    """S2: the dependency-free GTFS-rt protobuf wire decoder, exercised on
    real FeedMessage bytes (reference input path:
    src/importer/per_schedule_importer.rs:96-117)."""

    def test_known_bytes_decode(self):
        # Hand-assembled FeedMessage: header(version "2.0") + one entity
        # with trip_id "t1", stop_seq 5, arrival delay -1 (10-byte varint).
        from dystonse_gtfs_data_spark.sources.rt import wire_decoder

        header = b"\x0a\x03" + b"2.0"                       # field 1 len 3
        trip = b"\x0a\x02" + b"t1"                          # trip_id
        arrival = b"\x08" + b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"  # delay=-1
        stu = b"\x08\x05" + b"\x12\x0b" + arrival            # seq=5, arrival (11 bytes)
        tu = b"\x0a" + bytes([len(trip)]) + trip + b"\x12" + bytes([len(stu)]) + stu
        entity = b"\x0a\x010" + b"\x1a" + bytes([len(tu)]) + tu
        msg = b"\x0a" + bytes([len(header)]) + header + b"\x12" + bytes([len(entity)]) + entity

        rows = wire_decoder(msg)
        assert rows == [
            {
                "trip_id": "t1",
                "start_date": None,
                "start_time": None,
                "route_id": None,
                "stop_sequence": 5,
                "stop_id": None,
                "arrival_delay": -1,
                "departure_delay": None,
            }
        ]

    def test_encode_decode_roundtrip(self):
        from dystonse_gtfs_data_spark.sources.rt import (
            encode_feed_message,
            wire_decoder,
        )

        rows = [
            {
                "trip_id": "t_long",
                "start_date": "20240101",
                "start_time": "08:00:00",
                "route_id": "r1",
                "stop_id": "s0",
                "stop_sequence": 1,
                "arrival_delay": -13,
                "departure_delay": 300,
            },
            {
                "trip_id": "t_short",
                "start_date": None,
                "start_time": "25:00:00",
                "route_id": None,
                "stop_id": None,
                "stop_sequence": 999,  # 2-byte varint
                "arrival_delay": None,
                "departure_delay": -100000,
            },
        ]
        assert wire_decoder(encode_feed_message(rows, header_timestamp=1704096000)) == rows

    def test_distributed_decode_of_binary_feeds(self, spark, tmp_path):
        from dystonse_gtfs_data_spark.sources.demo import write_rt_feed_files
        from dystonse_gtfs_data_spark.sources.rt import decode_feed_messages

        paths = write_rt_feed_files(str(tmp_path))
        assert len(paths) == 2  # f1 + f2 feeds
        files = spark.read.format("binaryFile").load(str(tmp_path))
        updates = decode_feed_messages(files).collect()  # DEFAULT decoder = wire
        assert len(updates) == 8  # every demo update row survives the wire
        by_key = {(u["trip_id"], u["stop_sequence"]): u for u in updates}
        assert by_key[("t_long", 4)]["arrival_delay"] == -13
        assert by_key[("t_long", 4)]["start_time"] is None
        assert by_key[("t_short", 1)]["start_time"] == "25:00:00"
        # filename timestamp drives header_timestamp: duplicate update in
        # f2 carries the newer header
        assert by_key[("t_long", 1)]["header_timestamp"] == dt.datetime(2024, 1, 1, 8, 35)

    def test_malformed_file_quarantined(self, spark, tmp_path):
        from dystonse_gtfs_data_spark.sources.demo import write_rt_feed_files
        from dystonse_gtfs_data_spark.sources.rt import (
            decode_feed_messages,
            failed_feed_files,
        )

        write_rt_feed_files(str(tmp_path))
        bad = tmp_path / "bad-2024-01-01T09-00-00.pb"
        bad.write_bytes(b"\x12\xff\xff")  # truncated varint / length
        files = spark.read.format("binaryFile").load(str(tmp_path))
        decoded = decode_feed_messages(files)
        failed = failed_feed_files(files, decoded).collect()
        assert [os.path.basename(r["path"]) for r in failed] == [bad.name]


class TestWireStreaming:
    def test_wire_feed_stream_matches_batch_decode(self, spark, tmp_path):
        """S2×T1/T2: streaming the binary feeds through the wire decoder
        (availableNow drain) produces exactly the batch decode rows."""
        from dystonse_gtfs_data_spark.sources.demo import write_rt_feed_files
        from dystonse_gtfs_data_spark.sources.rt import decode_feed_messages
        from dystonse_gtfs_data_spark.streaming.pipeline import stream_wire_feeds

        feed_dir = tmp_path / "feeds"
        feed_dir.mkdir()
        write_rt_feed_files(str(feed_dir))

        collected = []

        def sink(df, epoch_id):
            collected.extend(df.collect())

        q = (
            stream_wire_feeds(spark, str(feed_dir))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        batch = decode_feed_messages(
            spark.read.format("binaryFile").load(str(feed_dir))
        ).collect()
        key = lambda r: (r["trip_id"], r["stop_sequence"], r["header_timestamp"])
        assert sorted(map(key, collected)) == sorted(map(key, batch))
        assert len(collected) == 8


class TestWireCodecProperties:
    def test_roundtrip_property(self):
        """Encode→decode is the identity for arbitrary well-formed update
        rows (hypothesis): unicode ids, negative/large delays, missing
        optionals, large stop sequences."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from dystonse_gtfs_data_spark.sources.rt import (
            encode_feed_message,
            wire_decoder,
        )

        text = st.text(min_size=1, max_size=20).filter(lambda s: s.strip())
        opt_text = st.none() | text
        row = st.fixed_dictionaries(
            {
                "trip_id": text,
                "start_date": opt_text,
                "start_time": opt_text,
                "route_id": opt_text,
                "stop_id": opt_text,
                "stop_sequence": st.none() | st.integers(0, 2**31 - 1),
                "arrival_delay": st.none() | st.integers(-(2**31), 2**31 - 1),
                "departure_delay": st.none() | st.integers(-(2**31), 2**31 - 1),
            }
        )

        @settings(max_examples=200, deadline=None)
        @given(st.lists(row, min_size=0, max_size=8))
        def roundtrip(rows):
            assert wire_decoder(encode_feed_message(rows)) == rows

        roundtrip()


class TestJsonlSource:
    def test_read_and_quarantine(self, spark, tmp_path):
        from dystonse_gtfs_data_spark.sources.jsonl import (
            jsonl_quarantine_split,
            read_documents_jsonl,
        )

        p = tmp_path / "corpus.jsonl"
        p.write_text(
            '{"doc_id": 1, "lang": "en", "source": "web", "n_chars": 5, "text": "hello"}\n'
            "this line is not json at all\n"
            '{"doc_id": 2, "lang": "de", "source": "web", "n_chars": 4, "text": "hallo"}\n'
            '{"doc_id": 3, "broken": \n'
        )
        clean, bad = jsonl_quarantine_split(
            read_documents_jsonl(spark, str(p))
        )
        rows = {r["doc_id"]: r for r in clean.collect()}
        assert set(rows) == {1, 2}
        assert rows[1]["text"] == "hello" and rows[2]["lang"] == "de"
        bad_lines = [r["raw_line"] for r in bad.collect()]
        assert len(bad_lines) == 2
        assert any("not json" in line for line in bad_lines)

    def test_roundtrip_preserves_every_field(self, spark, tmp_path):
        from dystonse_gtfs_data_spark.sources.jsonl import (
            read_documents_jsonl,
            write_documents_jsonl,
        )
        from dystonse_gtfs_data_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id", "lang", "source", "n_chars", "text"
        )
        path = str(tmp_path / "stage")
        write_documents_jsonl(docs, path)
        back = read_documents_jsonl(spark, path).drop("_corrupt")
        assert back.count() == docs.count()
        # exact set equality of full rows
        assert back.exceptAll(docs).count() == 0
        assert docs.exceptAll(back).count() == 0


class TestTarShards:
    def test_sample_grouping_and_multimodal_stitch(self, spark, tmp_path):
        import io
        import tarfile

        import numpy as np

        from dystonse_gtfs_data_spark.operators.multimodal import (
            decode_and_featurize_images,
            png_image_decode,
        )
        from dystonse_gtfs_data_spark.operators.render import encode_png_rgba
        from dystonse_gtfs_data_spark.sources.shards import read_tar_shards

        rng = np.random.default_rng(9)
        shard = tmp_path / "shard-000000.tar"
        with tarfile.open(shard, "w") as tf:
            for i in range(3):
                img = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
                png = encode_png_rgba(img.tobytes(), 4, 4)
                meta = f'{{"label": {i}}}'.encode()
                for name, data in ((f"{i:06d}.png", png), (f"{i:06d}.json", meta)):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        samples = read_tar_shards(spark, str(tmp_path))
        rows = samples.collect()
        assert len(rows) == 3
        assert all(set(r["members"]) == {"png", "json"} for r in rows)
        # stitch: shard samples → the real PNG kernel → features
        from pyspark.sql import functions as F

        assets = samples.select(
            F.col("sample_key").cast("long").alias("asset_id"),
            F.element_at("members", "png").alias("content"),
        )
        feats = decode_and_featurize_images(assets, decode=png_image_decode).collect()
        assert len(feats) == 3
        assert all((r["width"], r["height"]) == (4, 4) for r in feats)

    def test_deterministic_write_sharding(self, spark, tmp_path):
        import os

        from dystonse_gtfs_data_spark.sources.shards import write_tar_shards

        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(2500)], ["doc_id", "text"]
        )
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        write_tar_shards(docs, p1, samples_per_shard=1000)
        write_tar_shards(docs, p2, samples_per_shard=1000)
        names = sorted(os.listdir(p1))
        assert names == ["shard-000000.tar", "shard-000001.tar", "shard-000002.tar"]
        for n in names:  # byte-identical re-staging (mtime pinned to 0)
            assert open(os.path.join(p1, n), "rb").read() == open(
                os.path.join(p2, n), "rb"
            ).read()

    def test_distributed_writer_matches_staging_bytes(self, spark, tmp_path):
        import os

        from dystonse_gtfs_data_spark.sources.shards import (
            write_tar_shards,
            write_tar_shards_distributed,
        )

        docs = spark.createDataFrame(
            [(i, f"text {i}", f"m{i}") for i in range(2500)],
            ["doc_id", "text", "meta"],
        ).repartition(8)  # >1 input partition, shards span partitions
        members = {"txt": "text", "json": "meta"}
        p1, p2, p3 = (str(tmp_path / d) for d in ("stage", "dist", "dist2"))
        write_tar_shards(docs, p1, members_from=members, samples_per_shard=1000)
        m1 = write_tar_shards_distributed(
            docs, p2, members_from=members, samples_per_shard=1000
        )
        m2 = write_tar_shards_distributed(
            docs, p3, members_from=members, samples_per_shard=1000
        )
        names = sorted(os.listdir(p1))
        assert names == ["shard-000000.tar", "shard-000001.tar", "shard-000002.tar"]
        assert sorted(os.listdir(p2)) == names
        # manifest: one row per shard with the right sample counts
        assert [(os.path.basename(f), n) for f, n in m1] == [
            ("shard-000000.tar", 1000),
            ("shard-000001.tar", 1000),
            ("shard-000002.tar", 500),
        ]
        assert [n for _, n in m2] == [n for _, n in m1]
        for n in names:  # executor-side bytes == staging bytes == re-run bytes
            b1 = open(os.path.join(p1, n), "rb").read()
            assert open(os.path.join(p2, n), "rb").read() == b1
            assert open(os.path.join(p3, n), "rb").read() == b1
        # attempt-unique temps were all published via rename — none linger
        assert not [f for f in os.listdir(p2) if ".attempt-" in f]
        assert not [f for f in os.listdir(p3) if ".attempt-" in f]

    def test_split_reader_quarantine_is_countable(self, spark, tmp_path):
        from dystonse_gtfs_data_spark.sources.jsonl import (
            read_documents_jsonl_split,
        )

        p = tmp_path / "corpus.jsonl"
        p.write_text(
            '{"doc_id": 1, "lang": "en", "source": "web", "n_chars": 2, "text": "hi"}\n'
            "\n"  # blank separator lines are SKIPPED (json-reader parity),
            "   \n"  # not surfaced as phantom all-null CLEAN documents
            "not json {{{\n"
            '{"doc_id": "NaN", "lang": "de", "source": "web", "n_chars": 1, "text": "a"}\n'
            '{"doc_id": 2, "lang": "fr", "source": "web", "n_chars": 2, "text": "ab"}\n'
        )
        clean, bad = read_documents_jsonl_split(spark, str(p))
        assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
        # the verdict's "done" bar: a direct count on the quarantine
        # frame (the json-reader path raises QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        assert bad.count() == 2
        raws = {r["raw_line"] for r in bad.collect()}
        assert "not json {{{" in raws  # unparseable line kept verbatim
        assert any('"NaN"' in r for r in raws)  # partial-cast line too

    def test_gzipped_jsonl_reads_transparently(self, spark, tmp_path):
        # docstring claim, tested: Spark's json reader decompresses .gz
        import gzip

        from dystonse_gtfs_data_spark.sources.jsonl import (
            jsonl_quarantine_split,
            read_documents_jsonl,
        )

        p = tmp_path / "corpus.jsonl.gz"
        with gzip.open(p, "wt") as fh:
            fh.write(
                '{"doc_id": 7, "lang": "en", "source": "web", "n_chars": 2, "text": "hi"}\n'
            )
        clean, bad = jsonl_quarantine_split(
            read_documents_jsonl(spark, str(p))
        )
        assert [r["doc_id"] for r in clean.collect()] == [7]
        # count() would prune the plan down to the corrupt-only column
        # (QUERY_ONLY_CORRUPT_RECORD_COLUMN); collect keeps doc_id referenced
        assert bad.collect() == []
