"""Distributed k-means over an embedding column — integer-exact fixed point.

The classic Ray Data iterative-ML shape: the (small) centroid matrix is
broadcast per iteration with ``ray.put``; every batch computes assignments
and emits per-cluster partial sums (a k-row combiner output per batch); the
driver reduces the tiny partials into the next centroid matrix. The corpus
is never collected; per-iteration exchange is k × num_batches small rows.

Determinism discipline (same as functions/graph.pagerank): all distances
and centroid updates are int64 arithmetic on embeddings quantized ONCE to
``scale`` micro-units of their unit-normalized form —
``q = round(x / |x| * scale)`` per row (row-local, parallelism-safe).
Assignments maximize the exact integer dot product with first-max (lowest
cluster id) tie break; centroid update is floor(sum // count). Results are
bit-identical at any parallelism and to the single-process oracle
(pipelines/oracle_dump.kmeans_expected), which is what upgrades the driver
check to rows+schema+hash despite the iterative, non-SQL shape.

Scale notes: the quantized projection is materialized once (int64 columns;
at cluster scale you would write it as a parquet/Lance projection instead)
and each iteration is one map_batches pass over it. Empty clusters keep
their previous centroid (deterministic, no re-seeding randomness).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _quantize_rows(emb: np.ndarray, scale: int) -> np.ndarray:
    n = np.linalg.norm(emb, axis=1, keepdims=True)
    n = np.where(n == 0, 1.0, n)
    return np.round(emb / n * scale).astype(np.int64)


def _qx_matrix(col) -> np.ndarray:
    """(n, d) int64 matrix from a list<int64> column via the flat Arrow
    buffer — no per-row Python lists (the knn_int8 lesson). Rows are
    uniform-length by construction (_quantize_rows)."""
    import pyarrow.compute as _pc

    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), np.int64)
    flat = _pc.list_flatten(arr).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    return flat.reshape(n, -1)


def kmeans_seeds(rows: List[dict], k: int, scale: int) -> np.ndarray:
    """Deterministic init: the k sampled rows with the smallest
    (hash, vec_id) order keys, quantized. ``rows`` come from a
    hash-sample (similarity._hash_sample ordering contract)."""
    emb = np.array([list(r["embedding"]) for r in rows[:k]],
                   dtype=np.float64)
    return _quantize_rows(emb, scale)


def _quantize_ds(ds: "ray.data.Dataset", scale: int) -> "ray.data.Dataset":
    """Materialized (vec_id, qx) projection — quantization is row-local so
    this is parallelism-safe; at cluster scale write it as a parquet/Lance
    projection instead of materializing in the object store."""
    from .similarity import _to_matrix

    def quant(batch: pa.Table) -> pa.Table:
        emb = _to_matrix(batch["embedding"])
        qx = _quantize_rows(emb, scale)
        return pa.table({
            "vec_id": pa.compute.cast(batch["vec_id"], pa.int64()),
            "qx": pa.array(list(qx), pa.list_(pa.int64())),
        })

    return ds.map_batches(quant, batch_format="pyarrow").materialize()


def kmeans_int(ds: "ray.data.Dataset", k: int = 8, iters: int = 5,
               scale: int = 1 << 20, sample_size: int = 2048
               ) -> "ray.data.Dataset":
    """Lloyd iterations with integer-exact arithmetic; returns the final
    assignment table (vec_id, cluster: int64), deterministic at any
    parallelism. See module docstring for the exchange shape."""
    from .similarity import _hash_sample_rows

    qds = _quantize_ds(ds, scale)

    seeds = _hash_sample_rows(ds, max(k, min(sample_size, 4 * k)))
    cent = kmeans_seeds(seeds, k, scale)
    cent = _lloyd(qds, cent, iters)

    ref = ray.put(cent)

    def finalize(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        qx = _qx_matrix(batch["qx"])
        assign = np.argmax(qx @ c.T, axis=1) if len(qx) else \
            np.array([], np.int64)
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(assign.astype(np.int64), pa.int64())})

    return qds.map_batches(finalize, batch_format="pyarrow")


def _lloyd(qds: "ray.data.Dataset", cent: np.ndarray,
           iters: int) -> np.ndarray:
    """The broadcast-centroids / combiner-partials Lloyd loop over a
    quantized projection. Returns the final centroid matrix."""
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            qx = _qx_matrix(batch["qx"])
            if len(qx) == 0:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "count": pa.array([], pa.int64()),
                    "vecsum": pa.array([], pa.list_(pa.int64()))})
            scores = qx @ c.T  # exact int64
            assign = np.argmax(scores, axis=1)  # first max = lowest id
            counts = np.bincount(assign, minlength=len(c))
            sums = np.zeros((len(c), qx.shape[1]), np.int64)
            np.add.at(sums, assign, qx)
            nz = np.flatnonzero(counts)
            return pa.table({
                "cluster": pa.array(nz.astype(np.int64), pa.int64()),
                "count": pa.array(counts[nz].astype(np.int64), pa.int64()),
                "vecsum": pa.array(list(sums[nz]), pa.list_(pa.int64()))})

        rows = qds.map_batches(partial, batch_format="pyarrow").take_all()
        tot_count = np.zeros(len(cent), np.int64)
        tot_sum = np.zeros_like(cent)
        for r in rows:
            ci = int(r["cluster"])
            tot_count[ci] += int(r["count"])
            tot_sum[ci] += np.asarray(r["vecsum"], dtype=np.int64)
        new_cent = cent.copy()
        nz = tot_count > 0
        new_cent[nz] = tot_sum[nz] // tot_count[nz, None]
        cent = new_cent
    return cent


def kmeans_int_reference(vec_ids: List[int], embs: List[List[float]],
                         seed_rows: List[dict], k: int = 8, iters: int = 5,
                         scale: int = 1 << 20) -> List[Tuple[int, int]]:
    """Single-process twin of kmeans_int (same integer arithmetic, plain
    numpy loop) — the oracle-dump side."""
    emb = np.array(embs, dtype=np.float64)
    qx = _quantize_rows(emb, scale)
    cent = kmeans_seeds(seed_rows, k, scale)
    for _ in range(iters):
        scores = qx @ cent.T
        assign = np.argmax(scores, axis=1)
        counts = np.bincount(assign, minlength=len(cent))
        sums = np.zeros((len(cent), qx.shape[1]), np.int64)
        np.add.at(sums, assign, qx)
        new_cent = cent.copy()
        nz = counts > 0
        new_cent[nz] = sums[nz] // counts[nz, None]
        cent = new_cent
    assign = np.argmax(qx @ cent.T, axis=1)
    return list(zip([int(v) for v in vec_ids],
                    [int(a) for a in assign]))


def _greedy_keep(vids: np.ndarray, qx: np.ndarray,
                 tau_scaled: int) -> np.ndarray:
    """SemDeDup's within-cluster keep rule, made deterministic: visit the
    cluster's rows in ascending vec_id and keep a row iff its exact integer
    dot product with every already-kept row is below ``tau_scaled``
    (cos >= tau  <=>  <qi,qj> >= tau*scale^2 on the unit-quantized rows).
    Greedy maximal-independent-set in a fixed total order — the same answer
    at any parallelism because the whole cluster is in one map_groups call.
    Returns keep flags aligned with the input order."""
    order = np.argsort(vids, kind="stable")
    n = len(vids)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    d = qx.shape[1]
    m = int(np.abs(qx).max()) if qx.size else 0
    if n <= 8192 and d * m * m < (1 << 53):
        # float64 BLAS gram is EXACT here: every product and partial sum
        # is an integer below 2^53, so dgemm's summation order cannot
        # change the value — the greedy walk then scans a boolean matrix.
        dup = (qx.astype(np.float64) @ qx.astype(np.float64).T) \
            >= float(tau_scaled)
        kept: List[int] = []
        for i in order:
            if kept and dup[i, kept].any():
                continue
            keep[i] = True
            kept.append(i)
        return keep
    # big/overflow-risk clusters: exact int64 dots against a PREALLOCATED
    # kept buffer (no per-iteration fancy-index copy of the kept matrix)
    buf = np.empty((n, d), np.int64)
    nk = 0
    for i in order:
        if nk and bool(np.any(buf[:nk] @ qx[i] >= tau_scaled)):
            continue
        keep[i] = True
        buf[nk] = qx[i]
        nk += 1
    return keep


def semdedup_int(ds: "ray.data.Dataset", k: int = 8, iters: int = 5,
                 tau_micro: int = 400_000, scale: int = 1 << 20,
                 sample_size: int = 2048) -> "ray.data.Dataset":
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding column, then drop
    within-cluster semantic duplicates — rows whose cosine similarity to an
    already-kept row of the same cluster is >= tau. Returns
    (vec_id, cluster, keep) with keep in {0,1}; a training-data pipeline
    filters on keep=1.

    Plan: the Lloyd loop is the shared broadcast-centroid/combiner shape
    (_lloyd); the keep pass is ONE groupby(cluster).map_groups over the
    quantized projection — each cluster's pairwise check is local to its
    group task (the paper's within-cluster O(c^2) scan). Scale note: k must
    grow with corpus size so E[c]=n/k stays bounded (SemDeDup uses k≈10^5
    at web scale); skewed clusters are the operator's inherent hot-key risk
    and would be salted by splitting on a secondary LSH bit at 100 TB.

    Determinism: same integer discipline as kmeans_int — quantize once,
    int64 dots, first-max assignment, ascending-vec_id greedy keep — so the
    single-process oracle dump (semdedup_reference) matches bit-for-bit.
    """
    from .similarity import _hash_sample_rows

    tau_scaled = (int(tau_micro) * scale * scale) // 1_000_000

    qds = _quantize_ds(ds, scale)
    seeds = _hash_sample_rows(ds, max(k, min(sample_size, 4 * k)))
    cent = _lloyd(qds, kmeans_seeds(seeds, k, scale), iters)
    ref = ray.put(cent)

    def assign(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        qx = _qx_matrix(batch["qx"])
        a = np.argmax(qx @ c.T, axis=1) if len(qx) else np.array([], np.int64)
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
            "qx": batch["qx"]})

    def cluster_keep(g: pa.Table) -> pa.Table:
        vids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qx = _qx_matrix(g["qx"])
        keep = _greedy_keep(vids, qx, tau_scaled)
        return pa.table({
            "vec_id": pa.array(vids, pa.int64()),
            "cluster": g["cluster"],
            "keep": pa.array(keep.astype(np.int64), pa.int64())})

    return qds.map_batches(assign, batch_format="pyarrow") \
        .groupby("cluster").map_groups(cluster_keep, batch_format="pyarrow")


def semdedup_reference(vec_ids: List[int], embs: List[List[float]],
                       seed_rows: List[dict], k: int = 8, iters: int = 5,
                       tau_micro: int = 400_000, scale: int = 1 << 20
                       ) -> List[Tuple[int, int, int]]:
    """Single-process twin of semdedup_int: plain numpy Lloyd + a dict of
    per-cluster row lists + the same ascending-vec_id greedy keep. The
    oracle-dump side."""
    tau_scaled = (int(tau_micro) * scale * scale) // 1_000_000
    emb = np.array(embs, dtype=np.float64)
    qx = _quantize_rows(emb, scale)
    cent = kmeans_seeds(seed_rows, k, scale)
    for _ in range(iters):
        a = np.argmax(qx @ cent.T, axis=1)
        counts = np.bincount(a, minlength=len(cent))
        sums = np.zeros((len(cent), qx.shape[1]), np.int64)
        np.add.at(sums, a, qx)
        new_cent = cent.copy()
        nz = counts > 0
        new_cent[nz] = sums[nz] // counts[nz, None]
        cent = new_cent
    assign = np.argmax(qx @ cent.T, axis=1)
    vids = np.asarray([int(v) for v in vec_ids], dtype=np.int64)
    out: List[Tuple[int, int, int]] = []
    for ci in range(len(cent)):
        idx = np.flatnonzero(assign == ci)
        if len(idx) == 0:
            continue
        keep = _greedy_keep(vids[idx], qx[idx], tau_scaled)
        out.extend((int(vids[i]), ci, int(kf))
                   for i, kf in zip(idx, keep))
    return out


def pca_project_int(ds: "ray.data.Dataset", k: int = 4,
                    scale: int = 1 << 20) -> "ray.data.Dataset":
    """Distributed PCA projection of the embedding column — the
    dimensionality-reduction step ANN/semantic-dedup pipelines run before
    indexing. Combiner shape: every batch emits ONE tiny partial
    (count, sum qx (d,), qx^T qx (d,d)) of exact int64 sums over the
    unit-quantized rows; the driver reduces the d^2-sized partials and
    eigendecomposes the exact integer scatter matrix
    n*S - s s^T (centering without division, so the matrix is identical
    at any parallelism). Top-k eigenvectors (sign-fixed: largest-|v|
    component positive, ties to the lowest index) broadcast once; each
    row projects as round(1e6 * ((n*qx - s) @ V) / (n*scale)) — a
    row-local float64 op, deterministic everywhere. Returns
    (vec_id, pc0..pc{k-1}) int64 micro-unit coordinates (flat scalar
    columns — hashable by the driver gate and SQL-friendly).

    Scale notes: the only driver-side data is num_batches tiny (d^2+d+1)
    partials; the corpus streams. d=64, |qx| <= scale=2^20, n <= 2^30
    keeps every integer below 2^63."""
    qds = _quantize_ds(ds, scale)

    def partial(batch: pa.Table) -> pa.Table:
        qx = _qx_matrix(batch["qx"])
        if len(qx) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.int64())),
                             "ss": pa.array([], pa.list_(pa.int64()))})
        s = qx.sum(axis=0)
        ss = qx.T @ qx  # exact int64
        return pa.table({
            "n": pa.array([len(qx)], pa.int64()),
            "s": pa.array([list(s)], pa.list_(pa.int64())),
            "ss": pa.array([list(ss.reshape(-1))], pa.list_(pa.int64()))})

    rows = qds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in rows)
    if n == 0:
        raise ValueError("pca_project_int: empty input")
    d = len(rows[0]["s"])
    s = np.zeros(d, np.int64)
    ss = np.zeros((d, d), np.int64)
    for r in rows:
        s += np.asarray(r["s"], dtype=np.int64)
        ss += np.asarray(r["ss"], dtype=np.int64).reshape(d, d)
    V = _pca_eigvecs(n, s, ss, k)

    ref = ray.put((np.int64(n), s, V))

    def project(batch: pa.Table, _ref=ref) -> pa.Table:
        n_, s_, v = ray.get(_ref)
        qx = _qx_matrix(batch["qx"])
        cols = {"vec_id": batch["vec_id"]}
        if len(qx) == 0:
            for j in range(k):
                cols[f"pc{j}"] = pa.array([], pa.int64())
            return pa.table(cols)
        centered = (int(n_) * qx - s_).astype(np.float64)
        pm = np.round((centered @ v) * 1e6 / (float(n_) * scale)) \
            .astype(np.int64)
        for j in range(k):
            cols[f"pc{j}"] = pa.array(pm[:, j], pa.int64())
        return pa.table(cols)

    return qds.map_batches(project, batch_format="pyarrow")


def _pca_eigvecs(n: int, s: np.ndarray, ss: np.ndarray,
                 k: int) -> np.ndarray:
    """Top-k eigenvectors (d, k) of the exact integer scatter matrix
    n*SS - s s^T, descending eigenvalue, deterministic sign."""
    scatter = (np.int64(n) * ss - np.outer(s, s)).astype(np.float64)
    w, v = np.linalg.eigh(scatter)
    top = np.argsort(w)[::-1][:k]
    V = v[:, top]
    for j in range(V.shape[1]):
        i = int(np.argmax(np.abs(V[:, j])))
        if V[i, j] < 0:
            V[:, j] = -V[:, j]
    return V


def pca_project_reference(vec_ids, embs, k: int = 4,
                          scale: int = 1 << 20):
    """Single-process twin of pca_project_int (same integer scatter, same
    eigh, same rounding) — the oracle-dump side."""
    qx = _quantize_rows(np.array(embs, dtype=np.float64), scale)
    n = len(qx)
    s = qx.sum(axis=0)
    ss = qx.T @ qx
    V = _pca_eigvecs(n, s, ss, k)
    centered = (np.int64(n) * qx - s).astype(np.float64)
    pm = np.round((centered @ V) * 1e6 / (float(n) * scale)) \
        .astype(np.int64)
    return [(int(v), [int(x) for x in row])
            for v, row in zip(vec_ids, pm)]
