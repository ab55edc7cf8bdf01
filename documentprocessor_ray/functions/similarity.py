"""Approximate / exact nearest-neighbor search over an embedding column.

Input shape: ``embeddings(vec_id: int64, embedding: list<float>, label)``.

- ``knn_bruteforce`` — exact cosine top-k: the (small) query matrix is
  broadcast once with ``ray.put``; every batch computes one vectorized
  (Q, d) x (d, B) matmul and emits its LOCAL top-k per query (a k*Q-row
  partial), so the final global top-k reduce touches only
  num_batches * Q * k tiny rows — a classic partial-aggregate pattern; the
  full corpus is never collected anywhere.
- ``knn_ivf`` — IVF-flat scale path: deterministic k-means centroids are fit
  on a driver-side sample, broadcast, each row is assigned to its nearest
  centroid (one batch pass), and queries probe only the ``nprobe`` closest
  lists. At 10^12 rows the assignment doubles as the partitioning key for a
  Lance/parquet layout so probes become partition-pruned reads.

Similarity values are rounded to 6 decimals and ties broken by vec_id so
results are stable across summation orders (and match the DuckDB oracle).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _to_matrix(col: pa.ChunkedArray) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1, n)


def _query_matrix(ds: "ray.data.Dataset", n_queries: int):
    """First n_queries by vec_id (deterministic); tiny filtered pull. The
    filter is an Arrow expression (pushed into the scan), not a Python
    row lambda."""
    q = ds.filter(expr=f"vec_id < {int(n_queries)}").take_all()
    q.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    qm = _normalize(np.array([list(r["embedding"]) for r in q], dtype=np.float64))
    return qids, qm


def knn_bruteforce(ds: "ray.data.Dataset", n_queries: int = 4, k: int = 10) -> pa.Table:
    """Exact top-k cosine neighbors (excluding self) for the first n_queries
    vectors. Returns (qid, vec_id, rank, sim) ordered by (qid, rank)."""
    qids, qm = _query_matrix(ds, n_queries)
    shared = ray.put((qids, qm))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(shared)
        emb = _normalize(_to_matrix(batch["embedding"].combine_chunks()))
        vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        sims = np.round(q_mat @ emb.T, 6)  # (Q, B)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = vids != q_ids[qi]
            v, s = vids[mask], sims[qi][mask]
            if len(v) > k:
                # partial top-k: order by (-sim, vec_id) for deterministic ties
                idx = np.lexsort((v, -s))[:k]
            else:
                idx = np.lexsort((v, -s))
            out_q.extend([int(q_ids[qi])] * len(idx))
            out_v.extend(int(x) for x in v[idx])
            out_s.extend(float(x) for x in s[idx])
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=1024)

    def global_topk(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: (-r["sim"], r["vec_id"]))[:k]
        return pa.table({
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "sim": pa.array([r["sim"] for r in rows], pa.float64()),
        })

    return partials.groupby("qid").map_groups(global_topk, batch_format="pyarrow")


def knn_int8(ds: "ray.data.Dataset", n_queries: int = 8,
             k: int = 10) -> "ray.data.Dataset":
    """Int8-quantized exact top-k by dot product — the 4x-memory scale path
    for embedding search (quantize once, integer arithmetic after).

    Quantization is EXACT-reproducible: q = floor(x/maxabs*127 + 0.5)
    evaluated in float64 in that operation order, where maxabs is the global
    max |component| (a one-pass distributed max broadcast as one scalar).
    Scores are int64 dot products — associative, so local-top-k partials +
    a tiny global reduce give bit-stable results at any parallelism, and
    the DuckDB twin replays the identical expression (list_dot_product over
    integral doubles is exact below 2^53). Returns
    (qid, vec_id, rank, score) with (score desc, vec_id) tiebreak."""
    def block_absmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty block: identity for the max reduce
            return pa.table({"m": pa.array([0.0], pa.float64())})
        m = np.abs(np.array(batch["embedding"].to_pylist(),
                            dtype=np.float32)).max()
        return pa.table({"m": pa.array([float(m)], pa.float64())})

    # all-zero corpus: quantize with divisor 1.0 (everything maps to 0)
    # rather than dividing by 0; the DuckDB twin mirrors this fallback
    maxabs = ds.map_batches(block_absmax, batch_format="pyarrow").max("m")
    if not maxabs:
        maxabs = 1.0

    def _quant(m32: np.ndarray) -> np.ndarray:
        return np.floor(m32.astype(np.float64) / maxabs * 127 + 0.5) \
            .astype(np.int64)

    q = ds.filter(expr=f"vec_id < {int(n_queries)}").take_all()
    q.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    qm = _quant(np.array([list(r["embedding"]) for r in q],
                         dtype=np.float32))
    shared = ray.put((qids, qm))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(shared)
        emb = _quant(np.array(batch["embedding"].to_pylist(),
                              dtype=np.float32))
        vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        scores = q_mat @ emb.T  # (Q, B) int64
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = vids != q_ids[qi]
            v, s = vids[mask], scores[qi][mask]
            idx = np.lexsort((v, -s))[:k]
            out_q.extend([int(q_ids[qi])] * len(idx))
            out_v.extend(int(x) for x in v[idx])
            out_s.extend(int(x) for x in s[idx])
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.int64()),
        })

    partials = ds.map_batches(local_topk, batch_format="pyarrow",
                              batch_size=1024)

    def global_topk(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(),
                      key=lambda r: (-r["score"], r["vec_id"]))[:k]
        return pa.table({
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
            "score": pa.array([r["score"] for r in rows], pa.int64()),
        })

    return partials.groupby("qid").map_groups(global_topk,
                                              batch_format="pyarrow")


# --- IVF-flat ---

def _kmeans_fit(sample: np.ndarray, n_lists: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Deterministic Lloyd iterations on normalized vectors (cosine ~ L2)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IvfAssigner:
    """Stateful stage: centroid matrix deserialized once per actor."""

    def __init__(self, centroids_ref):
        self.cent = ray.get(centroids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_to_matrix(batch["embedding"].combine_chunks()))
        lists = np.argmax(emb @ self.cent.T, axis=1).astype(np.int64)
        return batch.append_column("list_id", pa.array(lists, pa.int64()))


def knn_ivf(ds: "ray.data.Dataset", n_queries: int = 4, k: int = 10,
            n_lists: int = 16, nprobe: int = 4, sample_size: int = 2048,
            concurrency: Optional[int] = None) -> pa.Table:
    """IVF-flat approximate top-k: probe the nprobe nearest centroid lists.

    Returns the same (qid, vec_id, rank, sim) shape as knn_bruteforce;
    approximate (recall < 1 when a true neighbor lives outside the probed
    lists), so it carries a rows-only check rather than a SQL oracle.
    """
    sample = _normalize(_to_matrix(
        pa.chunked_array([pa.array(
            [r["embedding"] for r in ds.take(sample_size)])])))
    cent = _kmeans_fit(sample, n_lists)
    cent_ref = ray.put(cent)

    assigned = ds.map_batches(
        IvfAssigner, fn_constructor_kwargs={"centroids_ref": cent_ref},
        batch_format="pyarrow", concurrency=concurrency or 4,
    )

    qids, qm = _query_matrix(ds, n_queries)
    probe_lists = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probes = {int(q): set(int(x) for x in probe_lists[i]) for i, q in enumerate(qids)}
    shared = ray.put((qids, qm, probes))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, probe = ray.get(shared)
        emb = _normalize(_to_matrix(batch["embedding"].combine_chunks()))
        vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        lst = np.asarray(batch["list_id"].to_pylist(), dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            qid = int(q_ids[qi])
            mask = np.isin(lst, list(probe[qid])) & (vids != qid)
            if not mask.any():
                continue
            v = vids[mask]
            s = np.round(q_mat[qi] @ emb[mask].T, 6)
            idx = np.lexsort((v, -s))[:k]
            out_q.extend([qid] * len(idx))
            out_v.extend(int(x) for x in v[idx])
            out_s.extend(float(x) for x in s[idx])
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = assigned.map_batches(local_topk, batch_format="pyarrow", batch_size=1024)

    def global_topk(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: (-r["sim"], r["vec_id"]))[:k]
        return pa.table({
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "sim": pa.array([r["sim"] for r in rows], pa.float64()),
        })

    return partials.groupby("qid").map_groups(global_topk, batch_format="pyarrow")
