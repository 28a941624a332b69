"""Measured scale-up probe: run representative operators at 1x and
10x data and report the wall-clock ratio — the local evidence for the
"would this survive 100x?" question SCALE.md argues structurally.

10x tables are synthesized from sf0.1 by unioning 10 id-shifted
copies (events: user_id and event_id shifted so BOTH key cardinality
and per-key row count grow ~3.2x/3.2x — pure duplication would only
stress one axis; documents: doc_id shifted, text salted with the copy
index so dedup families don't collapse to one giant component).
Staged parquet lives under /tmp and is reused across runs; pass
CLEAN=1 to delete and regenerate.

A LINEAR operator should show ratio ~<= 12 (10x data + constant
overheads); a quadratic candidate generator or an unpartitioned sort
shows far worse. Timings are best-of-3 per scale, warm JVM.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE = "/tmp/keenwa_scale_10x"
COPIES = 10

#: (name, fn(spark, dir) -> DataFrame) — events/documents only (the
#: scaled tables); each returns a lazily-planned DF we .count()
def _probes():
    from keenwa_spark.queries import load_all

    reg = load_all()
    names = [
        "ev_sessionize",          # window chain on user_id
        "ev_type_rollup",         # low-cardinality agg
        "op_asof_attribution",    # union + carry-forward window
        "op_hypertable_rollup",   # rollup cascade
        "op_rolling_anomaly",     # RANGE-frame window
        "pl_dedup_exact",         # hash groupBy on digest
        "pl_minhash_lsh_pairs",   # banded LSH (the quadratic risk)
        "pl_lsh_verified_pairs",  # LSH + exact-Jaccard verification
        "pl_ann_ivf_topk",        # IVF train/assign/search
        "pl_pack_sequences",      # sharded cumulative packing
        "pl_chunk_pack_fused",    # fused chunk->pack, one exchange
        "pl_training_data_flow",  # gate -> dedup -> sample -> pack
        "pl_curriculum_stages",   # two-pass global rank (r6 rewrite)
        "pl_text_stats",          # pure codegen map
        "pl_lm_surprisal",        # explode + model aggs + join
        # round-7 additions
        "pl_sketch_distinct_bounds",  # HLL++ + exact distinct (oracle side)
        "pl_shard_manifest",          # hash-shard assignment + checksum agg
        # round-8 addition (documents-driven; PQ/MMR probe in
        # tools/r8_scale_probe.py — the staging here scales only
        # events/documents)
        "pl_dsir_weights",            # one-explode broadcast-model importance
    ]
    return [(n, reg[n].fn) for n in names]


def _stage(spark) -> None:
    import glob

    if os.environ.get("CLEAN") == "1" and os.path.isdir(STAGE):
        import shutil

        shutil.rmtree(STAGE)
    if glob.glob(os.path.join(STAGE, "events.parquet", "*.parquet")):
        return
    from pyspark.sql import functions as F

    from keenwa_spark.catalog import Catalog

    # micros on disk (INT96 default would re-read via the nanos path)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    Catalog(spark).register_dir(BASE)
    ev = spark.table("events")
    n_users = 1500  # > max user_id at sf0.1
    n_events = 10_000_000
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(i * n_events)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit((i % 3) * n_users)).alias("user_id"),
            "event_type", "value", "props",
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(STAGE, "events.parquet")
    )

    docs = spark.table("documents")
    n_docs = 10_000_000
    dparts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
            # salt the text per copy so near-dup graphs scale instead
            # of collapsing into one giant cross-copy component
            F.concat(F.col("text"), F.lit(f" copysalt{i}")).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(COPIES)
    ]
    dout = dparts[0]
    for p in dparts[1:]:
        dout = dout.unionByName(p)
    dout.repartition(16).write.mode("overwrite").parquet(
        os.path.join(STAGE, "documents.parquet")
    )
    # symlink the untouched small tables so the catalog finds them
    for t in (
        "region nation customer supplier part orders lineitem embeddings"
    ).split():
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(STAGE, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def _best_of(fn, spark, sf_dir, n=3) -> float:
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn(spark, sf_dir).count()
        ts.append(time.time() - t0)
    return min(ts)


def main() -> None:
    from keenwa_spark.session import get_spark

    spark = get_spark("scale_probe")
    _stage(spark)

    rows = []
    for name, fn in _probes():
        # fresh view registration per scale: ensure_views caches per dir
        t1 = _best_of(fn, spark, BASE)
        spark._keenwa_views_dir = None  # force re-register
        t10 = _best_of(fn, spark, STAGE)
        spark._keenwa_views_dir = None
        rows.append((name, t1, t10, t10 / t1 if t1 > 0 else float("inf")))
        print(f"{name}: 1x {t1:.2f}s  10x {t10:.2f}s  ratio {t10 / t1:.1f}")

    print("\n| query | 1x (s) | 10x (s) | ratio |")
    print("|---|---|---|---|")
    for name, t1, t10, r in rows:
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {r:.1f} |")


if __name__ == "__main__":
    main()
