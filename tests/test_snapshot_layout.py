"""corpus_diff / skipping_stats / ann_recall semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.snapshot import corpus_diff


class TestCorpusDiff:
    def test_four_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "text"]
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "c CHANGED"), (4, "d")], ["doc_id", "text"]
        )
        out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
        assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    def test_fingerprints_not_text_cross_shuffle(self, spark):
        # the join schema must carry only (id, fp) — no text column
        old = spark.createDataFrame([(1, "x" * 10)], ["doc_id", "text"])
        new = spark.createDataFrame([(1, "x" * 10)], ["doc_id", "text"])
        df = corpus_diff(old, new)
        assert set(df.columns) == {"doc_id", "status"}
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        # the full-outer join inputs project fingerprints, not text
        assert "fp_old" in plan and "fp_new" in plan


class TestSkippingStats:
    def test_clustered_key_skips_files(self, spark):
        from dystonse_gtfs_data_spark.sources.layout import skipping_stats

        # key == stat: a perfectly clustered layout; predicate covers
        # the first 1/16 of the value range → ~4 of 64 files hit
        df = spark.createDataFrame(
            [(i, i) for i in range(6400)], ["k", "v"]
        )
        out = skipping_stats(
            df,
            F.col("k"),
            "v",
            F.lit(0),
            F.lit(399),
            layout_name="clustered",
        ).collect()[0]
        assert out["layout"] == "clustered"
        assert out["n_files"] == 64
        assert out["files_hit"] <= 5
        assert out["rows_in_hit_files"] >= 400

    def test_shuffled_key_hits_everything(self, spark):
        from dystonse_gtfs_data_spark.sources.layout import skipping_stats

        # key decorrelated from stat: every file spans the whole range
        df = spark.createDataFrame(
            [((i * 2654435761) % 6400, i) for i in range(6400)], ["k", "v"]
        )
        out = skipping_stats(
            df, F.col("k"), "v", F.lit(0), F.lit(399)
        ).collect()[0]
        assert out["files_hit"] == out["n_files"]


class TestAnnRecall:
    def test_recall_bounds_and_zero_when_exact(self, spark, sf_dir):
        from dystonse_gtfs_data_spark import queries as Q

        rows = Q.REGISTRY["ann_recall"].fn(spark, sf_dir).collect()
        assert len(rows) == 5
        for r in rows:
            assert 0.0 <= r["recall"] <= 1.0


class TestBoilerplateLines:
    def test_frequent_lines_dropped_order_preserved(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            boilerplate_line_removal,
        )

        banner = "accept our cookies"
        docs = spark.createDataFrame(
            [
                (1, f"{banner}\nalpha one\nbeta two"),
                (2, f"gamma three\n{banner}\ndelta four"),
                (3, f"epsilon five\nzeta six\n{banner}"),
                (4, banner),  # nothing but boilerplate → drops out
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r
            for r in boilerplate_line_removal(docs, max_df=2).collect()
        }
        assert set(out) == {1, 2, 3}
        assert out[1]["clean_text"] == "alpha one\nbeta two"
        assert out[2]["clean_text"] == "gamma three\ndelta four"
        assert out[3]["clean_text"] == "epsilon five\nzeta six"
        assert all(
            (r["n_kept"], r["n_removed"]) == (2, 1) for r in out.values()
        )

    def test_threshold_is_strict(self, spark):
        # a line in exactly max_df docs is NOT boilerplate
        from dystonse_gtfs_data_spark.operators.dedup import (
            boilerplate_line_removal,
        )

        docs = spark.createDataFrame(
            [(1, "shared\nuniq a"), (2, "shared\nuniq b")], ["doc_id", "text"]
        )
        out = boilerplate_line_removal(docs, max_df=2).collect()
        assert all(r["n_removed"] == 0 for r in out)


class TestScaleShapes:
    def test_boilerplate_plan_no_cartesian(self, spark, sf_dir):
        from dystonse_gtfs_data_spark import queries as Q
        from tests.test_plans import formatted_plan

        df = Q.REGISTRY["boilerplate_lines"].fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan
        assert "pythonudf" not in plan.lower(), plan

    def test_corpus_diff_bucketed_runs_exchange_free(
        self, spark, sf_dir, tmp_path_factory
    ):
        # the docstring's 100 TB claim, proven: both snapshots bucketed
        # by the id → the full-outer fingerprint join needs ZERO Exchange
        from dystonse_gtfs_data_spark.operators.snapshot import corpus_diff
        from dystonse_gtfs_data_spark.sources.bucketed import (
            read_table,
            write_bucketed,
        )
        from dystonse_gtfs_data_spark.sources.tables import load_table
        from tests.test_plans import formatted_plan, shuffle_count

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        write_bucketed(docs, "b_snap_a", ["doc_id"], num_buckets=8)
        write_bucketed(docs.limit(400), "b_snap_b", ["doc_id"], num_buckets=8)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = corpus_diff(
                read_table(spark, "b_snap_a"), read_table(spark, "b_snap_b")
            )
            plan = formatted_plan(out)
            assert shuffle_count(out) == 0, plan
            assert out.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS b_snap_a")
            spark.sql("DROP TABLE IF EXISTS b_snap_b")


class TestModelScoring:
    def test_fake_model_closed_form(self, spark):
        import pandas as pd

        from dystonse_gtfs_data_spark.operators.scoring import (
            FAKE_MODEL_W,
            fake_quality_model,
            score_documents,
        )

        text = "alpha beta gamma"
        b, w1, w2, w3 = FAKE_MODEL_W
        z = b + w1 * 16.0 + w2 * 3.0 + w3 * (16.0 / 3.0)
        expect = z / (1.0 + abs(z))
        assert float(fake_quality_model(pd.Series([text])).iloc[0]) == expect
        docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = score_documents(docs).collect()
        assert out[0]["model_score"] == expect

    def test_kernel_is_pluggable(self, spark):
        import pandas as pd

        from dystonse_gtfs_data_spark.operators.scoring import score_documents

        docs = spark.createDataFrame(
            [(1, "aa"), (2, "bbbb")], ["doc_id", "text"]
        )
        out = score_documents(
            docs, kernel=lambda s: s.str.len() * 2.0
        ).collect()
        assert {r["doc_id"]: r["model_score"] for r in out} == {1: 4.0, 2: 8.0}


class TestCompaction:
    def _shred(self, spark, tmp_path, n=600, files=40):
        import pyspark.sql.functions as F

        path = str(tmp_path / "frag")
        spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        ).repartition(files).write.parquet(path)
        return path

    def test_compaction_preserves_content_and_shrinks_files(
        self, spark, tmp_path
    ):
        from dystonse_gtfs_data_spark.sources.layout import (
            compact_parquet_dir,
        )

        path = self._shred(spark, tmp_path)
        before = sorted(
            tuple(r) for r in spark.read.parquet(path).collect()
        )
        stats = compact_parquet_dir(
            spark, path, target_file_bytes=1 << 30, sort_within=["g", "k"]
        )
        after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
        assert after == before
        assert stats["files_after"] < stats["files_before"]
        assert stats["rows"] == len(before)
        import os

        assert not os.path.exists(path + ".compacting")
        assert not os.path.exists(path + ".old")

    def test_compaction_sorted_files_have_tight_footer_ranges(
        self, spark, tmp_path
    ):
        import os

        import pyarrow.parquet as pq

        from dystonse_gtfs_data_spark.sources.layout import (
            compact_parquet_dir,
        )

        path = self._shred(spark, tmp_path)
        # force several output files, range-partitioned by g
        compact_parquet_dir(
            spark, path, target_file_bytes=4096, sort_within=["g", "k"]
        )
        ranges = []
        for root, _d, names in os.walk(path):
            for n in names:
                if n.endswith(".parquet"):
                    md = pq.ParquetFile(os.path.join(root, n)).metadata
                    if md.num_rows == 0:
                        continue
                    names = [c.name for c in md.schema.to_arrow_schema()]
                    col = md.row_group(0).column(names.index("g"))
                    st = col.statistics
                    ranges.append((st.min, st.max))
        assert len(ranges) > 1
        # range partitioning: file g-ranges may touch at boundaries but
        # never strictly interleave
        ranges.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert lo2 >= lo1 and hi1 <= lo2 + 1

    def test_compaction_recovers_table_stranded_in_old(self, spark, tmp_path):
        # crash window: after rename(path -> .old), before
        # rename(.compacting -> path).  The next call must RESTORE the
        # table from '.old', not treat the missing path as fatal (and
        # the blind .old cleanup must never delete the sole copy).
        import os
        import shutil

        from dystonse_gtfs_data_spark.sources.layout import (
            compact_parquet_dir,
        )

        path = self._shred(spark, tmp_path, n=50, files=5)
        os.rename(path, path + ".old")  # simulate the crash state
        assert not os.path.exists(path)
        stats = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
        assert stats["rows"] == 50
        assert spark.read.parquet(path).count() == 50
        assert not os.path.exists(path + ".old")

    def test_compaction_cleans_stale_staging_dirs(self, spark, tmp_path):
        import os

        from dystonse_gtfs_data_spark.sources.layout import (
            compact_parquet_dir,
        )

        path = self._shred(spark, tmp_path, n=50, files=5)
        os.makedirs(path + ".compacting/junk")  # crashed prior run
        os.makedirs(path + ".old/junk")
        stats = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
        assert stats["rows"] == 50
        assert not os.path.exists(path + ".compacting")
        assert not os.path.exists(path + ".old")
