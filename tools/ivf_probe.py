"""Phase-level timing for the IVF pipeline at sf0.1 — which pass is
slow: train, corpus assignment, or probe+score?  Compares assignment
backends: (a) broadcast-cells HOF map (current), (b) r2-style
crossJoin+window, (c) crossJoin + min_by groupBy, (d) numpy
mapInPandas with sequential-over-dims fold."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from keenwa_spark.pipeline.ivf import _CELL_DISTS, _as_vecs, _train, _with_cells
from keenwa_spark.session import get_spark

spark = get_spark("ivf_probe")
emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
emb.count()  # warm

n_rows = emb.count()
dim = len(emb.select("embedding").head()[0])
print(f"## corpus: {n_rows} rows, dim {dim}")


def t(tag, thunk, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        r = thunk()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"## {tag}: best {best:.3f}s")
    return r


cents = t("train(k=8, iters=2)", lambda: _train(emb, 8, 2, "vec_id", "embedding"))

vecs = _as_vecs(emb, "vec_id", "embedding")

# (a) current broadcast-cells HOF assignment
t(
    "assign_bcast_cells",
    lambda: _with_cells(vecs, cents)
    .select("vid", F.expr(f"array_min({_CELL_DISTS}).cid").alias("cid"))
    .groupBy("cid")
    .count()
    .collect(),
)

# (b) r2-style: crossJoin 8-row centroid DF + window argmin
cdf = spark.createDataFrame(cents, "cid INT, cv ARRAY<DOUBLE>")
_SQDIST = (
    "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
)
w = Window.partitionBy("vid").orderBy(F.col("dist").asc(), F.col("cid").asc())
t(
    "assign_crossjoin_window",
    lambda: vecs.crossJoin(F.broadcast(cdf))
    .withColumn("dist", F.expr(_SQDIST))
    .withColumn("rn", F.row_number().over(w))
    .filter(F.col("rn") == 1)
    .groupBy("cid")
    .count()
    .collect(),
)

# (c) crossJoin + min_by partial agg (no window sort)
t(
    "assign_crossjoin_minby",
    lambda: vecs.crossJoin(F.broadcast(cdf))
    .withColumn("dist", F.expr(_SQDIST))
    .groupBy("vid")
    .agg(F.min(F.struct("dist", "cid"))["cid"].alias("cid"))
    .groupBy("cid")
    .count()
    .collect(),
)

# (d) numpy mapInPandas, sequential fold over dims (bit-exact order)
import numpy as np
import pandas as pd

c_ids = np.array([c[0] for c in cents], dtype=np.int32)
c_mat = np.array([c[1] for c in cents], dtype=np.float64)


def assign_np(batches):
    for pdf in batches:
        X = np.array(pdf["v"].tolist(), dtype=np.float64)  # (n, dim)
        n, d = X.shape
        k = c_mat.shape[0]
        acc = np.zeros((n, k), dtype=np.float64)
        for j in range(d):  # sequential over dims == SQL fold order
            diff = X[:, j : j + 1] - c_mat[:, j][None, :]
            acc = acc + diff * diff
        best = np.argmin(acc, axis=1)  # first occurrence = lowest cid
        yield pd.DataFrame({"vid": pdf["vid"], "cid": c_ids[best]})


t(
    "assign_numpy_mapinpandas",
    lambda: vecs.mapInPandas(assign_np, "vid BIGINT, cid INT")
    .groupBy("cid")
    .count()
    .collect(),
)

# full search with current implementation, for reference
from keenwa_spark.pipeline.ivf import ivf_search

t("full ivf_search (current)", lambda: ivf_search(emb, emb.filter("vec_id < 10"), k=5).count())
