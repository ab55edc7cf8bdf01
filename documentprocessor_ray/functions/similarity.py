"""Approximate / exact nearest-neighbor search over an embedding column.

Input shape: ``embeddings(vec_id: int64, embedding: list<float>, label)``.

- ``knn_bruteforce`` — exact cosine top-k: the (small) query matrix is
  broadcast once with ``ray.put``; every batch computes one vectorized
  (Q, d) x (d, B) matmul and emits its LOCAL top-k per query (a k*Q-row
  partial), so the final global top-k reduce touches only
  num_batches * Q * k tiny rows — a classic partial-aggregate pattern; the
  full corpus is never collected anywhere.
- ``knn_ivf`` — IVF-flat scale path: deterministic k-means centroids are fit
  on a distributed hash-sample, broadcast, each row is assigned to its
  nearest centroid on an actor pool, and the assignment is MATERIALIZED as
  a ``list_id=``-partitioned parquet layout (``build_ivf_index``). Queries
  then read ONLY the ``nprobe`` probed list directories — partition-pruned
  I/O, not a full-corpus scan with a mask: at 10^12 rows a probe touches
  nprobe/n_lists of the bytes.

Similarity values are rounded to 6 decimals and ties broken by vec_id so
results are stable across summation orders (and match the DuckDB oracle).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    """Arrow ``list<float>`` -> (B, d) float64 matrix via the flat values
    buffer (list_flatten -> to_numpy -> reshape) — no per-row Python, no
    to_pylist. Assumes fixed-dimension embeddings (an IVF/brute-force
    precondition anyway)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    return flat.reshape(n, -1)


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
        m = np.abs(pc.list_flatten(
            batch["embedding"].combine_chunks()).to_numpy(
                zero_copy_only=False).astype(np.float32)).max()
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
        # _to_matrix reads the flat float32 buffer and widens to float64 —
        # value-identical to the old to_pylist round-trip, zero-copy read
        emb = _quant(_to_matrix(batch["embedding"]))
        vids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
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


def bitext_mine(ds: "ray.data.Dataset", src_label: int = 0,
                tgt_label: int = 1, batch_size: int = 1024
                ) -> "ray.data.Dataset":
    """Margin-based bitext mining (the parallel-corpus mining step of a
    multilingual training pipeline, cf. Artetxe & Schwenk's margin
    criterion): for every source-side vector (label == src_label) find the
    best and second-best target-side matches (label == tgt_label) by dot
    product, and report the absolute margin best - second.

    Scoring is the EXACT int8 path of knn_int8 (global maxabs broadcast,
    float64-deterministic quantization, int64 dots), so the whole result —
    best id, both scores, margin — is integer-exact and carries a DuckDB
    twin. The source side is broadcast once via ray.put (in bitext mining
    the query side is the smaller corpus); target batches each emit a
    2-rows-per-anchor partial top-2, reduced associatively per anchor.
    Output: (qid, best_vec_id, best_score, second_score, margin)."""
    def block_absmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"m": pa.array([0.0], pa.float64())})
        m = np.abs(pc.list_flatten(
            batch["embedding"].combine_chunks()).to_numpy(
                zero_copy_only=False).astype(np.float32)).max()
        return pa.table({"m": pa.array([float(m)], pa.float64())})

    maxabs = ds.map_batches(block_absmax, batch_format="pyarrow").max("m")
    if not maxabs:
        maxabs = 1.0

    def _quant(m32: np.ndarray) -> np.ndarray:
        return np.floor(m32.astype(np.float64) / maxabs * 127 + 0.5) \
            .astype(np.int64)

    src = ds.filter(expr=f"label == {int(src_label)}").take_all()
    src.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in src], dtype=np.int64)
    qm = _quant(np.array([list(r["embedding"]) for r in src],
                         dtype=np.float32))
    shared = ray.put((qids, qm))

    def local_top2(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(shared)
        emb = _quant(np.array(batch["embedding"].to_pylist(),
                              dtype=np.float32))
        vids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        scores = q_mat @ emb.T  # (Q, B) int64
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            s = scores[qi]
            take = min(2, len(vids))
            idx = np.lexsort((vids, -s))[:take]
            out_q.extend([int(q_ids[qi])] * take)
            out_v.extend(int(x) for x in vids[idx])
            out_s.extend(int(x) for x in s[idx])
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.int64()),
        })

    partials = ds.filter(expr=f"label == {int(tgt_label)}") \
        .map_batches(local_top2, batch_format="pyarrow",
                     batch_size=batch_size)

    def finish(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(),
                      key=lambda r: (-r["score"], r["vec_id"]))[:2]
        if len(rows) < 2:
            return pa.table({
                "qid": pa.array([], pa.int64()),
                "best_vec_id": pa.array([], pa.int64()),
                "best_score": pa.array([], pa.int64()),
                "second_score": pa.array([], pa.int64()),
                "margin": pa.array([], pa.int64())})
        best, second = rows
        return pa.table({
            "qid": pa.array([best["qid"]], pa.int64()),
            "best_vec_id": pa.array([best["vec_id"]], pa.int64()),
            "best_score": pa.array([best["score"]], pa.int64()),
            "second_score": pa.array([second["score"]], pa.int64()),
            "margin": pa.array([best["score"] - second["score"]],
                               pa.int64())})

    return partials.groupby("qid").map_groups(finish,
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
        # round before argmax so the assignment is reproducible across
        # batch layouts (same 1e-6 quantization the sim outputs use) —
        # this is what lets the single-process oracle dump replay it
        lists = np.argmax(np.round(emb @ self.cent.T, 6),
                          axis=1).astype(np.int64)
        return batch.append_column("list_id", pa.array(lists, pa.int64()))


def _hash_sample_rows(ds: "ray.data.Dataset", sample_size: int) -> list:
    """Deterministic DISTRIBUTED sample: keep rows whose multiplicative
    vec_id hash falls under a threshold sized from the row count
    (metadata-cheap on a parquet read), then truncate to exactly
    sample_size in (hash, vec_id) order. Unlike ds.take(n) this draws from
    the whole corpus, not the first blocks, and only ~sample_size rows ever
    reach the driver."""
    total = max(1, ds.count())
    if total <= sample_size:
        thresh = np.uint64(1) << np.uint64(32)
    else:
        frac = min(1.0, sample_size * 1.3 / total)
        thresh = np.uint64(int((1 << 32) * frac))

    def keep(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = (vid * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        mask = h < thresh
        out = batch.filter(pa.array(mask))
        return out.append_column(
            "_h", pa.array(h[mask].astype(np.int64), pa.int64()))

    rows = ds.map_batches(keep, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["_h"], r["vec_id"]))
    return rows[:sample_size]


def _hash_sample(ds: "ray.data.Dataset", sample_size: int) -> np.ndarray:
    rows = _hash_sample_rows(ds, sample_size)
    return _normalize(np.array([list(r["embedding"]) for r in rows],
                               dtype=np.float64))


def build_ivf_index(ds: "ray.data.Dataset", index_dir: str,
                    n_lists: int = 16, sample_size: int = 2048,
                    iters: int = 10, seed: int = 11,
                    concurrency: Optional[int] = None) -> np.ndarray:
    """Fit centroids (deterministic k-means on a distributed hash-sample),
    assign every row its nearest list on the actor pool, and write the
    assignment as a ``list_id=``-partitioned parquet layout under
    ``index_dir/lists`` plus ``centroids.npy`` — the build-once side of
    IVF. Idempotent via a _COMPLETE marker; returns the centroid matrix.

    At Lance/production scale this layout is the table's partitioning key;
    here it is hive-partitioned parquet with identical pruning semantics."""
    marker = os.path.join(index_dir, "_COMPLETE")
    cent_path = os.path.join(index_dir, "centroids.npy")
    params = f"n_lists={n_lists},sample={sample_size},iters={iters}," \
             f"seed={seed}"
    if os.path.exists(marker) and os.path.exists(cent_path):
        with open(marker) as f:
            if f.read() == params:
                return np.load(cent_path)
    if os.path.isdir(index_dir):
        import shutil
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    sample = _hash_sample(ds, sample_size)
    cent = _kmeans_fit(sample, n_lists, iters, seed)
    cent_ref = ray.put(cent)
    # autoscaling (1, 4), NOT a fixed 4: a fixed-size pool reserves
    # every CPU of a 4-CPU session up front and the upstream read /
    # downstream write starve — the documented actor-pool deadlock
    # (hung the full suite at TestKnnRecall whenever the /tmp index
    # cache was cold). min=1 leaves headroom; the pool still grows to
    # 4 when CPUs are free.
    assigned = ds.map_batches(
        IvfAssigner, fn_constructor_kwargs={"centroids_ref": cent_ref},
        batch_format="pyarrow", concurrency=concurrency or (1, 4),
    )

    def dup_lid(batch: pa.Table) -> pa.Table:
        # keep the list id INSIDE the files too ("lid"): partition_cols
        # strips "list_id" into the path, and the pruned query reads an
        # explicit probed-file list (no hive re-inference), so rows need
        # their list id as a regular column
        return batch.append_column("lid", batch["list_id"])

    assigned.map_batches(dup_lid, batch_format="pyarrow") \
        .write_parquet(os.path.join(index_dir, "lists"),
                       partition_cols=["list_id"])
    np.save(cent_path, cent)
    with open(marker, "w") as f:
        f.write(params)
    return cent


def ivf_probe_dirs(index_dir: str, cent: np.ndarray, qm: np.ndarray,
                   nprobe: int
                   ) -> Tuple[Dict[int, str], List[str], np.ndarray]:
    """The union of per-query probe lists -> existing partition directories.
    Returns ({list_id: dir}, all_dirs, probe_lists) so callers (and the
    pruned-read pytest) see exactly which fraction of the layout a probe
    touches, and the probe-selection rule lives in ONE place."""
    lists_root = os.path.join(index_dir, "lists")
    all_dirs = sorted(d for d in os.listdir(lists_root)
                      if d.startswith("list_id="))
    probe_lists = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    wanted = sorted(set(int(x) for x in probe_lists.ravel()))
    probed = {}
    for l in wanted:
        d = os.path.join(lists_root, f"list_id={l}")
        if os.path.isdir(d):
            probed[l] = d
    return probed, [os.path.join(lists_root, d) for d in all_dirs], \
        probe_lists


def knn_ivf(ds: "ray.data.Dataset", n_queries: int = 4, k: int = 10,
            n_lists: int = 16, nprobe: int = 4, sample_size: int = 2048,
            concurrency: Optional[int] = None,
            index_dir: Optional[str] = None,
            return_probes: bool = False):
    """IVF-flat approximate top-k with PARTITION-PRUNED probes: the list
    assignment is materialized once as a list_id-partitioned layout
    (build_ivf_index, reused across calls via ``index_dir``), and each
    query run reads only the probed list directories — I/O proportional to
    nprobe/n_lists of the corpus, not a full scan.

    Returns the same (qid, vec_id, rank, sim) shape as knn_bruteforce;
    approximate (recall < 1 when a true neighbor lives outside the probed
    lists), so it carries a rows-only check rather than a SQL oracle.
    With ``return_probes=True`` also returns (probed_dirs, all_dirs)."""
    import tempfile

    qids, qm = _query_matrix(ds, n_queries)
    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="dpray_ivf_")
    cent = build_ivf_index(ds, index_dir, n_lists=n_lists,
                           sample_size=sample_size, concurrency=concurrency)
    probed, all_dirs, probe_lists = ivf_probe_dirs(index_dir, cent, qm,
                                                    nprobe)
    probes = {int(q): set(int(x) for x in probe_lists[i])
              for i, q in enumerate(qids)}
    shared = ray.put((qids, qm, probes))

    # read ONLY the probed partitions' files — ONE datasource over the
    # explicit probed-file list (I/O = nprobe/n_lists of the layout); rows
    # carry their list id as the in-file "lid" column
    files: List[str] = []
    for d in probed.values():
        for root, _, names in os.walk(d):
            files.extend(os.path.join(root, f) for f in sorted(names)
                         if f.endswith(".parquet"))
    if not files:
        empty = pa.table({"qid": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        out = ray.data.from_arrow(empty)
        return (out, probed, all_dirs) if return_probes else out
    assigned = ray.data.read_parquet(files)

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, probe = ray.get(shared)
        emb = _normalize(_to_matrix(batch["embedding"]))
        vids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lst = batch["lid"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
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

    partials = assigned.map_batches(local_topk, batch_format="pyarrow",
                                    batch_size=1024)

    def global_topk(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: (-r["sim"], r["vec_id"]))[:k]
        return pa.table({
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "sim": pa.array([r["sim"] for r in rows], pa.float64()),
        })

    out = partials.groupby("qid").map_groups(global_topk,
                                             batch_format="pyarrow")
    return (out, probed, all_dirs) if return_probes else out


# --- Product Quantization (PQ / asymmetric-distance top-k) ---
#
# The compressed-domain scale path: vectors are encoded ONCE into m uint8
# centroid codes (64-dim float32 -> 8 bytes here, a 32x reduction), and
# query scans touch ONLY the code table — at 10^12 rows the ADC pass reads
# m bytes/vector instead of 4d, and the codebooks (m * ksub * dsub floats)
# ride along as one small broadcast. Reference surface: PQ for ANN is
# public literature (Jegou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011); the reference repo has no ANN at all, so
# this is a training-data-pipeline addition like knn_ivf/knn_int8.
#
# Everything is quantized to 1e-6 before any argmin/ordering so the
# distributed run and the flat single-process oracle replay agree bitwise
# regardless of batch layout.

def _pq_fit(sample: np.ndarray, m: int, ksub: int, iters: int = 10,
            seed: int = 13) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means -> (m, ksub, dsub)
    codebooks. L2 assignments on the raw subvectors; empty cells keep
    their previous centroid (same convention as _kmeans_fit)."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        sub = sample[:, s * dsub:(s + 1) * dsub]
        idx = rng.choice(n, size=min(ksub, n), replace=False)
        cent = sub[np.sort(idx)].copy()
        for _ in range(iters):
            d2 = np.round(
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cent.T)
                + (cent * cent).sum(axis=1), 6)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s, :len(cent)] = cent
        if len(cent) < ksub:  # tiny-sample degenerate case
            books[s, len(cent):] = cent[-1]
    return books


def pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(N, d) -> (N, m) uint8 codes; pure, shared with the oracle replay.
    Distances quantized to 1e-6 before argmin so GEMM blocking noise can
    never flip an assignment between batch layouts."""
    n = len(mat)
    m, ksub, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for s in range(m):
        sub = mat[:, s * dsub:(s + 1) * dsub]
        cent = books[s]
        d2 = np.round(
            (sub * sub).sum(axis=1, keepdims=True)
            - 2.0 * (sub @ cent.T)
            + (cent * cent).sum(axis=1), 6)
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_adc_scores(q: np.ndarray, books: np.ndarray,
                  codes: np.ndarray) -> np.ndarray:
    """Asymmetric inner-product scores for ONE query against (N, m) codes:
    LUT[s, j] = round(q_s . c_sj, 6); score = round(sum_s LUT[s, code_s], 6).
    Elementwise adds over the fixed subspace order — bit-stable at any
    batch layout. Pure, shared with the oracle replay."""
    m, ksub, dsub = books.shape
    lut = np.round(
        np.einsum("skd,sd->sk", books, q.reshape(m, dsub)), 6)
    acc = np.zeros(len(codes), dtype=np.float64)
    for s in range(m):
        acc += lut[s][codes[:, s]]
    return np.round(acc, 6)


class PqEncoder:
    """Actor-pool stage: codebooks deserialized once per actor; each batch
    is encoded to its (vec_id, code list<uint8>) rows."""

    def __init__(self, books_ref):
        self.books = ray.get(books_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_to_matrix(batch["embedding"].combine_chunks()))
        codes = pq_encode(mat, self.books)
        n, m = codes.shape
        col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32),
                     pa.int32()),
            pa.array(codes.ravel(), pa.uint8()))
        return pa.table({
            "vec_id": pc.cast(batch["vec_id"], pa.int64()),
            "code": col,
        })


def knn_pq(ds: "ray.data.Dataset", n_queries: int = 4, k: int = 10,
           m: int = 8, ksub: int = 16, sample_size: int = 2048,
           iters: int = 10, seed: int = 13,
           concurrency: Optional[int] = None) -> "ray.data.Dataset":
    """PQ approximate top-k: codebooks fit on the distributed hash-sample,
    the corpus encoded ONCE into m-byte codes on an actor pool
    (materialized — the compressed table IS the reusable index), and the
    per-query ADC pass scans codes only: one LUT gather + m adds per row,
    never the float embeddings. Partial top-k per block, tiny global
    reduce. Returns (qid, vec_id, rank, score) ordered by (qid, rank);
    approximate, so its gate is the flat single-process replay dump plus a
    recall-vs-bruteforce pytest."""
    qids, qm = _query_matrix(ds, n_queries)
    sample = _hash_sample(ds, sample_size)
    books = _pq_fit(sample, m, ksub, iters, seed)
    books_ref = ray.put(books)

    codes_ds = ds.map_batches(
        PqEncoder, fn_constructor_kwargs={"books_ref": books_ref},
        batch_format="pyarrow", concurrency=concurrency or (1, 4)).materialize()

    shared = ray.put((qids, qm, books))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, bks = ray.get(shared)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(batch["code"].combine_chunks()) \
            .to_numpy(zero_copy_only=False)
        codes = flat.reshape(len(vids), -1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            qid = int(q_ids[qi])
            s = pq_adc_scores(q_mat[qi], bks, codes)
            mask = vids != qid
            v, sv = vids[mask], s[mask]
            idx = np.lexsort((v, -sv))[:k]
            out_q.extend([qid] * len(idx))
            out_v.extend(int(x) for x in v[idx])
            out_s.extend(float(x) for x in sv[idx])
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    partials = codes_ds.map_batches(local_topk, batch_format="pyarrow",
                                    batch_size=1024)

    def global_topk(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(),
                      key=lambda r: (-r["score"], r["vec_id"]))[:k]
        return pa.table({
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "score": pa.array([r["score"] for r in rows], pa.float64()),
        })

    return partials.groupby("qid").map_groups(global_topk,
                                              batch_format="pyarrow")


# --- IVF-PQ (pruned partition reads + residual-PQ compressed scan) ---

class IvfPqEncoder:
    """Actor-pool stage: centroids + codebooks deserialized once per actor.
    Each batch is assigned its nearest IVF list and its RESIDUAL
    (x - centroid) is PQ-encoded — the FAISS IVFADC layout (Jegou et al.
    2011 §V): the index stores m uint8 codes per vector inside a
    list_id-partitioned layout, so a probe reads nprobe/n_lists of the
    bytes AND each byte read is 32x smaller than the float vector."""

    def __init__(self, shared_ref):
        self.cent, self.books = ray.get(shared_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_to_matrix(batch["embedding"].combine_chunks()))
        # same 1e-6 pre-argmax quantization as IvfAssigner: assignment is
        # reproducible across batch layouts, so the flat replay matches
        lists = np.argmax(np.round(emb @ self.cent.T, 6),
                          axis=1).astype(np.int64)
        codes = pq_encode(emb - self.cent[lists], self.books)
        n, m = codes.shape
        col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32),
                     pa.int32()),
            pa.array(codes.ravel(), pa.uint8()))
        return pa.table({
            "vec_id": pc.cast(batch["vec_id"], pa.int64()),
            "lid": pa.array(lists, pa.int64()),
            "code": col,
            "list_id": pa.array(lists, pa.int64()),
        })


def build_ivfpq_index(ds: "ray.data.Dataset", index_dir: str,
                      n_lists: int = 16, m: int = 8, ksub: int = 16,
                      sample_size: int = 2048, iters: int = 10,
                      concurrency: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Fit IVF centroids on the distributed hash-sample, fit residual PQ
    codebooks on the SAME sample's residuals, then encode every row on an
    actor pool and write (vec_id, lid, code) as a list_id-partitioned
    parquet layout under ``index_dir/lists`` — build once, probe many.
    Idempotent via a _COMPLETE marker; returns (centroids, codebooks)."""
    marker = os.path.join(index_dir, "_COMPLETE")
    cent_path = os.path.join(index_dir, "centroids.npy")
    books_path = os.path.join(index_dir, "books.npy")
    params = f"n_lists={n_lists},m={m},ksub={ksub},sample={sample_size}," \
             f"iters={iters}"
    if os.path.exists(marker) and os.path.exists(cent_path) \
            and os.path.exists(books_path):
        with open(marker) as f:
            if f.read() == params:  # reuse only a same-geometry index
                return np.load(cent_path), np.load(books_path)
    # stale or differently-parameterized layout: wipe it — write_parquet
    # APPENDS files, so rebuilding into a dirty dir would double rows
    if os.path.isdir(index_dir):
        import shutil
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    sample = _hash_sample(ds, sample_size)
    cent = _kmeans_fit(sample, n_lists, iters)
    sassign = np.argmax(np.round(sample @ cent.T, 6), axis=1)
    books = _pq_fit(sample - cent[sassign], m, ksub, iters)
    shared = ray.put((cent, books))
    ds.map_batches(
        IvfPqEncoder, fn_constructor_kwargs={"shared_ref": shared},
        batch_format="pyarrow", concurrency=concurrency or (1, 4),
    ).write_parquet(os.path.join(index_dir, "lists"),
                    partition_cols=["list_id"])
    np.save(cent_path, cent)
    np.save(books_path, books)
    with open(marker, "w") as f:
        f.write(params)
    return cent, books


def knn_ivfpq(ds: "ray.data.Dataset", n_queries: int = 4, k: int = 10,
              n_lists: int = 16, nprobe: int = 4, m: int = 8,
              ksub: int = 16, sample_size: int = 2048,
              concurrency: Optional[int] = None,
              index_dir: Optional[str] = None,
              return_probes: bool = False):
    """IVF-PQ approximate top-k — the production ANN composition: the
    query reads ONLY the probed list partitions (I/O ~ nprobe/n_lists of
    the layout, via the same explicit probed-file read as knn_ivf) and
    those bytes are m-uint8 PQ codes, not float vectors. Scores are
    score(q, x) = round(q·c_list, 6) + ADC(q, residual codes), each term
    1e-6-quantized inside shared pure kernels so the flat replay
    (oracle_dump.knn_ivfpq_expected) matches bit-for-bit.

    Returns (qid, vec_id, rank, score) ordered by (qid, rank); approximate
    on two axes (probe recall + PQ distortion), gated by the replay dump
    plus recall/pruned-read pytests."""
    import tempfile

    qids, qm = _query_matrix(ds, n_queries)
    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="dpray_ivfpq_")
    cent, books = build_ivfpq_index(
        ds, index_dir, n_lists=n_lists, m=m, ksub=ksub,
        sample_size=sample_size, concurrency=concurrency)
    probed, all_dirs, probe_lists = ivf_probe_dirs(index_dir, cent, qm,
                                                    nprobe)
    probes = {int(q): set(int(x) for x in probe_lists[i])
              for i, q in enumerate(qids)}
    qdotc = np.round(qm @ cent.T, 6)
    shared = ray.put((qids, qm, books, probes, qdotc))

    files: List[str] = []
    for d in probed.values():
        for root, _, names in os.walk(d):
            files.extend(os.path.join(root, f) for f in sorted(names)
                         if f.endswith(".parquet"))
    if not files:
        empty = pa.table({"qid": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        out = ray.data.from_arrow(empty)
        return (out, probed, all_dirs) if return_probes else out
    codes_ds = ray.data.read_parquet(files)

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, bks, probe, qd = ray.get(shared)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lid = batch["lid"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(batch["code"].combine_chunks()) \
            .to_numpy(zero_copy_only=False)
        codes = flat.reshape(len(vids), -1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            qid = int(q_ids[qi])
            mask = np.isin(lid, list(probe[qid])) & (vids != qid)
            if not mask.any():
                continue
            adc = pq_adc_scores(q_mat[qi], bks, codes[mask])
            s = np.round(qd[qi][lid[mask]] + adc, 6)
            v = vids[mask]
            idx = np.lexsort((v, -s))[:k]
            out_q.extend([qid] * len(idx))
            out_v.extend(int(x) for x in v[idx])
            out_s.extend(float(x) for x in s[idx])
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    partials = codes_ds.map_batches(local_topk, batch_format="pyarrow",
                                    batch_size=1024)

    def global_topk(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(),
                      key=lambda r: (-r["score"], r["vec_id"]))[:k]
        return pa.table({
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "score": pa.array([r["score"] for r in rows], pa.float64()),
        })

    out = partials.groupby("qid").map_groups(global_topk,
                                             batch_format="pyarrow")
    return (out, probed, all_dirs) if return_probes else out
