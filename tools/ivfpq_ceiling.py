"""Information-theoretic ceiling study for IVF-PQ unrefined recall on
the clustered fixture (VERDICT r08 next-round item 4 asked for a
recall@5 floor >= 0.5 unrefined at m=8/k_codes=64; this study shows
that exact config CAPS at ~0.40 on this fixture NO MATTER how well the
codebooks are trained, and that the floor is reachable one step up the
bit budget).

Pure-numpy IVFADC simulation on the same mixture-of-Gaussians data as
pipeline/fixtures.make_clustered_embeddings (same seed/params), with
UNRESTRICTED k-means quality (as many Lloyd iterations as asked, not
the engine's deterministic 2) — i.e. an upper bound on what the
engine's deterministic trainer could ever reach:

    m=8  k=64  (48 bits): 0.35-0.40  <- more iterations do NOT help
    m=8  k=256 (64 bits): 0.54
    m=16 k=64  (96 bits): 0.51-0.58

Why: the fixture's within-cluster noise is ISOTROPIC (0.35/sqrt(dim)
per dim), so residuals after the coarse quantizer are iid Gaussian —
a rotation (OPQ) cannot help, and recall is set purely by the
quantizer's rate: 6 bits per 8-dim subspace (0.75 bits/dim) leaves
per-subspace quantization MSE comparable to the distance gaps between
rank-5 and rank-20 neighbors. Doubling the per-dim rate (m=16, 1.5
bits/dim) lifts the ceiling past 0.5 — and the ENGINE hits 0.510
there with its deterministic 2-iteration trainer (tests/test_recall.py
TestIvfPqRecall), vs 0.300 for plain (non-residual) PQ at the same
bit budget.

Run: python tools/ivfpq_ceiling.py
"""

from __future__ import annotations

import numpy as np

N, DIM, N_CLUSTERS, NOISE, SEED = 2000, 64, 20, 0.35, 7
NQ, K = 20, 5


def fixture(anisotropy: float = 0.0, shared_basis: bool = False):
    """Same generator as pipeline/fixtures.make_clustered_embeddings
    (anisotropy=0 is bit-identical to the original isotropic study)."""
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(N) % N_CLUSTERS
    z = rng.standard_normal((N, DIM))
    if anisotropy > 0:
        kappa = 4.0 ** anisotropy * 4.0
        scales = kappa ** (-np.arange(DIM) / (DIM - 1))
        scales *= np.sqrt(DIM / (scales**2).sum())
        if shared_basis:
            q, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
            z = (z * scales) @ q.T
        else:
            for c in range(N_CLUSTERS):
                q, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
                mask = labels == c
                z[mask] = (z[mask] * scales) @ q.T
    pts = centers[labels] + NOISE * z / np.sqrt(DIM)
    return np.float32(pts).astype(np.float64)


def opq_rotation(R: np.ndarray, m: int) -> np.ndarray:
    """OPQ parametric init: eigen-decompose the residual covariance and
    allocate components to the m subspaces balancing the log-variance
    product (Ge et al. 2013's eigenvalue-allocation). Returns the
    rotation Q (rows = new basis)."""
    cov = np.cov((R - R.mean(0)).T)
    w, V = np.linalg.eigh(cov)
    w, V = w[::-1], V[:, ::-1]
    d = DIM // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    load = np.zeros(m)
    for j in range(DIM):
        cand = [i for i in range(m) if len(buckets[i]) < d]
        i = min(cand, key=lambda i: load[i])
        buckets[i].append(j)
        load[i] += np.log(max(w[j], 1e-12))
    perm = [j for b in buckets for j in b]
    return V[:, perm].T


def kmeans(X, k, iters):
    C = X[:k].copy()  # same deterministic init family as the engine
    for _ in range(iters):
        a = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1)
        C = np.array(
            [X[a == j].mean(0) if (a == j).any() else C[j] for j in range(len(C))]
        )
    return C


def run(X, truth, k_cells, nprobe, m, k_codes, c_iters, p_iters, rotate=False):
    C = kmeans(X, k_cells, c_iters)
    a = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1)
    R = X - C[a]
    Q = opq_rotation(R, m) if rotate else None
    if rotate:
        R = R @ Q.T
    d = DIM // m
    books = [kmeans(R[:, s * d : (s + 1) * d], k_codes, p_iters) for s in range(m)]
    codes = np.stack(
        [
            np.argmin(
                ((R[:, None, s * d : (s + 1) * d] - books[s][None]) ** 2).sum(-1),
                axis=1,
            )
            for s in range(m)
        ],
        1,
    )
    hits = 0
    for qi in range(NQ):
        cells = np.argsort(((C - X[qi]) ** 2).sum(-1), kind="stable")[:nprobe]
        cand = np.where(np.isin(a, cells))[0]
        cand = cand[cand != qi]
        qd = np.empty(len(cand))
        for ci, cix in enumerate(cand):
            qr = X[qi] - C[a[cix]]
            if rotate:
                qr = qr @ Q.T
            s_ = 0.0
            for s in range(m):
                s_ += ((qr[s * d : (s + 1) * d] - books[s][codes[cix, s]]) ** 2).sum()
            qd[ci] = s_
        top = cand[np.argsort(qd, kind="stable")[:K]]
        hits += len(set(top) & truth[qi])
    return hits / (NQ * K)


def main() -> None:
    X = fixture()
    d2 = ((X[:NQ, None, :] - X[None, :, :]) ** 2).sum(-1)
    for i in range(NQ):
        d2[i, i] = np.inf
    truth = [set(np.argsort(d2[i], kind="stable")[:K]) for i in range(NQ)]
    grid = [
        (20, 2, 8, 64, 2, 2),
        (20, 2, 8, 64, 2, 10),   # better PQ training: no lift
        (20, 2, 8, 64, 10, 10),  # better coarse too: no lift
        (20, 4, 8, 64, 10, 10),  # more probes: no lift (pruning isn't the limit)
        (20, 2, 8, 256, 2, 10),  # +2 bits/subspace: past 0.5
        (20, 2, 16, 64, 2, 2),   # engine's deterministic iters, m=16: past 0.5
        (20, 2, 16, 64, 2, 10),
    ]
    for kc, npb, m, k, ci, pi in grid:
        r = run(X, truth, kc, npb, m, k, ci, pi)
        print(
            f"k_cells={kc} nprobe={npb} m={m} k={k} "
            f"coarse_iters={ci} pq_iters={pi}: recall@5 {r:.3f}"
        )

    # Anisotropic variants + OPQ-rotation study (VERDICT r09 item 6).
    # Measured (engine-equivalent 2-iteration training, k_cells=20,
    # nprobe=2):
    #   per-cluster bases aniso=1: m=8 0.51 (vs isotropic 0.40),
    #     m=16 0.62 (vs 0.51); OPQ rotation: 0.43 / 0.60 — NO lift
    #   shared basis    aniso=1: m=8 0.56, m=16 0.67; rotation
    #     0.37 / 0.49 — NO lift either
    # Anisotropy RAISES plain recall (noise energy concentrates into
    # fewer directions -> effective noise dimension drops -> smaller
    # quantization error relative to neighbor gaps), and a single
    # global rotation cannot align 20 per-cluster bases (and even on
    # the shared basis, eigen-ordering the coordinates degrades the
    # deterministic first-k-points k-means init more than decorrelation
    # helps at this rate). The engine reproduces these numbers exactly
    # (tests/test_recall.py TestIvfPqAnisotropic) — shipping without
    # OPQ is justified on both fixture families, not only the
    # isotropic one.
    print()
    for shared in (False, True):
        X = fixture(anisotropy=1.0, shared_basis=shared)
        d2 = ((X[:NQ, None, :] - X[None, :, :]) ** 2).sum(-1)
        for i in range(NQ):
            d2[i, i] = np.inf
        tr = [set(np.argsort(d2[i], kind="stable")[:K]) for i in range(NQ)]
        for m in (8, 16):
            plain = run(X, tr, 20, 2, m, 64, 2, 2)
            rot = run(X, tr, 20, 2, m, 64, 2, 2, rotate=True)
            print(
                f"aniso=1.0 shared_basis={shared} m={m} k=64: "
                f"recall@5 {plain:.3f}  opq-rotated {rot:.3f}"
            )


# ---------------------------------------------------------------------------
# Round-11 (VERDICT r10 item 5): PER-CELL OPQ — the honest residual gap
# named by the r10 anisotropy study. Fits one rotation per coarse cell
# on that cell's residuals (the thing a global rotation provably can't
# do for 20 per-cluster bases), and, for completeness, per-cell
# CODEBOOKS (LOPQ's other half). Queries are HELD OUT (fresh draws
# from the same mixture; truth = exact L2 over the corpus) so none of
# the numbers can lean on train-set memorization.
# ---------------------------------------------------------------------------


def make_heldout_queries(anisotropy: float, n_queries: int = 20):
    """Fresh query draws from the same mixture as fixture() (same
    centers — the center stream replays SEED — new noise from an
    independent stream)."""
    rng0 = np.random.default_rng(SEED)
    centers = rng0.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rng = np.random.default_rng(SEED + 999)
    labels = rng.integers(0, N_CLUSTERS, n_queries)
    z = rng.standard_normal((n_queries, DIM))
    if anisotropy > 0:
        kappa = 4.0 ** anisotropy * 4.0
        scales = kappa ** (-np.arange(DIM) / (DIM - 1))
        scales *= np.sqrt(DIM / (scales**2).sum())
        q, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
        z = (z * scales) @ q.T
    return centers[labels] + NOISE * z / np.sqrt(DIM)


def run_percell(X, queries, truth, k_cells, nprobe, m, k_codes, c_iters,
                p_iters, rotate="none", local_books=False):
    """IVFADC with optional per-cell rotation and/or per-cell books.
    rotate: 'none' | 'global' | 'percell'."""
    C = kmeans(X, k_cells, c_iters)
    a = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1)
    R = X - C[a]
    d = DIM // m
    Qs = None
    if rotate == "global":
        Q = opq_rotation(R, m)
        R = R @ Q.T
        Qs = [Q] * k_cells
    elif rotate == "percell":
        Qs = []
        for c in range(k_cells):
            mask = a == c
            Qc = opq_rotation(R[mask], m) if mask.sum() > DIM else np.eye(DIM)
            Qs.append(Qc)
            R[mask] = R[mask] @ Qc.T
    if local_books:
        books, codes = {}, np.zeros((len(X), m), dtype=int)
        for c in range(k_cells):
            idx = np.where(a == c)[0]
            Rc = R[idx]
            bc = [kmeans(Rc[:, s * d:(s + 1) * d], min(k_codes, len(Rc)),
                         p_iters) for s in range(m)]
            books[c] = bc
            for s in range(m):
                codes[idx, s] = np.argmin(
                    ((Rc[:, None, s * d:(s + 1) * d] - bc[s][None]) ** 2).sum(-1),
                    axis=1)
    else:
        shared = [kmeans(R[:, s * d:(s + 1) * d], k_codes, p_iters)
                  for s in range(m)]
        books = {c: shared for c in range(k_cells)}
        codes = np.stack([
            np.argmin(((R[:, None, s * d:(s + 1) * d] - shared[s][None]) ** 2)
                      .sum(-1), axis=1)
            for s in range(m)], 1)
    hits = 0
    for qi in range(len(queries)):
        cells = np.argsort(((C - queries[qi]) ** 2).sum(-1), kind="stable")[:nprobe]
        cand = np.where(np.isin(a, cells))[0]
        qd = np.empty(len(cand))
        for ci, cix in enumerate(cand):
            c = a[cix]
            qr = queries[qi] - C[c]
            if Qs is not None:
                qr = qr @ Qs[c].T
            s_ = 0.0
            for s in range(m):
                s_ += ((qr[s * d:(s + 1) * d] - books[c][s][codes[cix, s]]) ** 2).sum()
            qd[ci] = s_
        top = cand[np.argsort(qd, kind="stable")[:K]]
        hits += len(set(top) & truth[qi])
    return hits / (len(queries) * K)


def main_r11() -> None:
    """Per-cell study, held-out queries. Measured (this exact script):

      fixture     m   plain  globalrot  percellrot  localbooks  lopq
      percluster   8  0.350  0.330      0.320       0.580       0.510
      percluster  16  0.480  0.540      0.510       0.750       0.710
      shared       8  0.410  0.330      0.280       0.540       0.560
      shared      16  0.640  0.510      0.510       0.810       0.740
      isotropic    8  0.380  0.370      0.430       0.490       0.480
      isotropic   16  0.580  0.550      0.560       0.720       0.750

    VERDICT: per-cell ROTATION rejected (it degrades recall on every
    fixture/m combination, same failure mode as the global rotation —
    the eigen-permuted coordinates break the deterministic first-k
    k-means init harder than decorrelation helps at these rates).
    Per-cell CODEBOOKS (no rotation) ADOPTED: +0.13..+0.27 recall@5 on
    every fixture, held-out-verified — state cost k_cells x m x
    k_codes x d floats, still a broadcast-sized model
    (pipeline/pq.py local_books=True)."""
    for aniso, shared_basis, tag in [
        (1.0, False, "percluster"), (1.0, True, "shared"), (0.0, False, "isotropic"),
    ]:
        X = fixture(anisotropy=aniso, shared_basis=shared_basis)
        Q = make_heldout_queries(aniso)
        d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        truth = [set(np.argsort(d2[i], kind="stable")[:K]) for i in range(len(Q))]
        for m in (8, 16):
            base = run_percell(X, Q, truth, 20, 2, m, 64, 2, 2)
            grot = run_percell(X, Q, truth, 20, 2, m, 64, 2, 2, rotate="global")
            prot = run_percell(X, Q, truth, 20, 2, m, 64, 2, 2, rotate="percell")
            lbk = run_percell(X, Q, truth, 20, 2, m, 64, 2, 2, local_books=True)
            lopq = run_percell(X, Q, truth, 20, 2, m, 64, 2, 2,
                               rotate="percell", local_books=True)
            print(f"{tag:10s} m={m:2d} held-out: plain {base:.3f} "
                  f"globalrot {grot:.3f} percellrot {prot:.3f} "
                  f"localbooks {lbk:.3f} lopq {lopq:.3f}")


if __name__ == "__main__":
    main()
    print()
    main_r11()
