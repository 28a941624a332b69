"""Round-8 10x scale probes for the round-7 operator families
(VERDICT r07 next-round item 6): the three operators that landed in r7
had structural scale arguments but no measured 10x row in SCALE.md.

1. **Blocked fuzzy linkage, degenerate shared-prefix block** —
   synthesize a registry where a viral name family shares ONE 4-char
   prefix block (the adversarial input `max_block` exists for: uncapped,
   that block alone joins quadratically). Probe at 1x and 10x with
   max_block=1000 and check (a) wall ratio stays ~linear, (b) the
   output is exactly one row per distinct dirty (id, name) — the cap
   drops candidates, never dirty spine rows.

2. **PageRank `exact_fold=False`** (the at-scale hub-safe path: plain
   partial-aggregated SUM instead of the sorted-fold collect_list) —
   run the registry's customer->supplier purchase graph at 1x and a
   10x id-shifted union, and verify the False path against the
   exact_fold=True path ON THE SAME 10x GRAPH within float tolerance
   (True is the bit-exact oracle-checked path; False may differ only
   in summation order, i.e. last-ulp).

3. **Duplicated-span statistics on the duplicate-content twin** — the
   10x staging (id-shifted document copies, per-copy salt word) makes
   every interior width-gram occur >= 10 times across copies: the
   exact stress the map-side-combinable gram groupBy (deliberately not
   a gram-keyed window) is designed for. Probe wall at 1x vs 10x.

Prints the SCALE.md rows (wall, ratio, plan exchange/python counts).
Reuses the staged 10x parquet of tools/scale_probe.py for documents.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _time(build) -> tuple[float, int]:
    """Best-of-3 wall of count() on a FRESHLY BUILT plan each run —
    re-counting one DataFrame lets runs 2-3 skip every stage via
    shuffle-file reuse and report pure overhead."""
    best, n = float("inf"), 0
    for _ in range(3):
        t0 = time.time()
        n = build().count()
        best = min(best, time.time() - t0)
    return best, n


def _plan_counts(df) -> str:
    from keenwa_spark.plans import summarize

    df.count()
    s = summarize(df)
    return (
        f"exch={s.exchanges} bhj={s.broadcast_joins} smj={s.sort_merge_joins}"
        f" nlj={s.nested_loop_joins} cart={s.cartesian_products}"
        f" py={s.python_evals}"
    )


def _linkage_frames(spark, k: int):
    """50k*k benign rows (varied prefix blocks) + 20k*k viral rows all
    sharing the 'aaaa' prefix block; clean mirrors dirty with the
    benign names intact so matches exist."""
    benign = spark.range(50_000 * k).select(
        F.col("id").alias("rid"),
        F.format_string("%07dnm person", F.col("id")).alias("name"),
    )
    viral = spark.range(20_000 * k).select(
        (F.col("id") + 10_000_000).alias("rid"),
        F.format_string("aaaa viral %d", F.col("id") % 97).alias("name"),
    )
    clean = benign.unionByName(viral)
    # dirty: drop one mid-name char so levenshtein = 1 within the block
    dirty = clean.select(
        (F.col("rid") + 50_000_000).alias("rid"),
        F.expr(
            "concat(substring(name, 1, 5), substring(name, 7, length(name)))"
        ).alias("name"),
    )
    return dirty, clean


def probe_linkage(spark) -> None:
    from keenwa_spark.pipeline.linkage import fuzzy_link

    print("## linkage (degenerate shared-prefix block, max_block=1000)")
    for k in (1, 10):
        dirty, clean = _linkage_frames(spark, k)
        def build():
            return fuzzy_link(
                dirty, clean, dirty_id="rid", dirty_name="name",
                clean_id="rid", clean_name="name", max_block=1_000,
            )

        out = build()
        wall, n = _time(build)
        spine = dirty.select(
            F.col("rid"), F.trim(F.lower(F.col("name"))).alias("nm")
        ).where(F.col("nm").isNotNull()).distinct().count()
        ok = "ok" if n == spine else f"SPINE MISMATCH {n} != {spine}"
        print(f"{k}x: wall {wall:.2f}s rows {n} (spine {ok}) [{_plan_counts(out)}]")


def _purchase_edges(spark, copies: int):
    from keenwa_spark.queries import ensure_views

    ensure_views(spark, BASE)
    o, li = spark.table("orders"), spark.table("lineitem")
    base = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk")
    )
    parts = [
        base.select(
            F.concat(F.lit("c"), (F.col("ck") + 1_000_000 * i).cast("string")).alias("src"),
            F.concat(F.lit("s"), (F.col("sk") + 1_000_000 * i).cast("string")).alias("dst"),
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def probe_pagerank(spark) -> None:
    from keenwa_spark.pipeline.clustering import pagerank

    print("## pagerank exact_fold=False (hub-safe at-scale path)")
    for k in (1, 10):
        edges = _purchase_edges(spark, k).localCheckpoint(eager=True)
        fast = pagerank(edges, n_iter=5, exact_fold=False)
        wall, n = _time(lambda: pagerank(edges, n_iter=5, exact_fold=False))
        print(f"{k}x: wall {wall:.2f}s nodes {n} [{_plan_counts(fast)}]")
        if k == 10:
            exact = pagerank(edges, n_iter=5, exact_fold=True)
            diff = (
                fast.alias("f")
                .join(exact.alias("e"), "node")
                .select(
                    F.max(
                        F.abs(F.col("f.rank") - F.col("e.rank"))
                        / F.greatest(F.abs(F.col("e.rank")), F.lit(1e-300))
                    ).alias("m")
                )
                .collect()[0]["m"]
            )
            verdict = "ok" if diff < 1e-9 else "TOLERANCE EXCEEDED"
            print(f"10x exact_fold False-vs-True max rel diff {diff:.3e} ({verdict})")


def probe_dup_spans(spark) -> None:
    from keenwa_spark.pipeline.dedup import duplicated_spans
    from tools.scale_probe import STAGE, _stage

    _stage(spark)
    print("## duplicated_spans (duplicate-content 10x twin)")
    for label, d in (("1x", BASE), ("10x", STAGE)):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        out = duplicated_spans(docs)
        wall, n = _time(lambda: duplicated_spans(
            spark.read.parquet(os.path.join(d, "documents.parquet"))))
        print(f"{label}: wall {wall:.2f}s rows {n} [{_plan_counts(out)}]")


def probe_dsir(spark) -> None:
    from keenwa_spark.pipeline.dsir import dsir_weights
    from tools.scale_probe import STAGE, _stage

    _stage(spark)
    print("## dsir_weights (hashed-ngram importance, 10x documents)")
    for label, d in (("1x", BASE), ("10x", STAGE)):
        def build():
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            return dsir_weights(docs, F.expr("lang = 'en'"))

        out = build()
        wall, n = _time(build)
        print(f"{label}: wall {wall:.2f}s rows {n} [{_plan_counts(out)}]")


def probe_pq(spark) -> None:
    from keenwa_spark.queries import ensure_views
    from keenwa_spark.pipeline.pq import pq_search

    ensure_views(spark, BASE)
    emb1 = spark.table("embeddings").localCheckpoint(eager=True)
    parts = [
        emb1.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(10)
    ]
    emb10 = parts[0]
    for p in parts[1:]:
        emb10 = emb10.unionByName(p)
    emb10 = emb10.localCheckpoint(eager=True)
    print("## pq_search refine=50 (10x embeddings; train stays bounded)")
    for label, e in (("1x", emb1), ("10x", emb10)):
        def build():
            return pq_search(
                e, e.filter("vec_id < 10"), m=4, k_codes=8, topk=5, refine=50
            )

        out = build()
        wall, n = _time(build)
        print(f"{label}: wall {wall:.2f}s rows {n} [{_plan_counts(out)}]")


def main() -> None:
    from keenwa_spark.session import get_spark

    spark = get_spark("r8_scale_probe")
    probe_linkage(spark)
    probe_pagerank(spark)
    probe_dup_spans(spark)
    probe_dsir(spark)
    probe_pq(spark)


# guard LAST so every probe is defined when run as a script (ADVICE
# r08: the guard previously sat before probe_dsir/probe_pq and the
# shipped entrypoint NameError'd after the first three probes)
if __name__ == "__main__":
    main()
