"""Iterative graph analytics over edge tables — the second iterative
algorithm family next to dup clustering (dedup.cluster_pairs_distributed),
built on the same ship-and-resolve exchange shape.

INTEGER-EXACT PageRank: scores are fixed-point int64 micro-units and every
step (teleport, damping, per-degree split) is integer arithmetic, so
distributed partial sums are associative and the result is BIT-IDENTICAL to
a single-machine reference regardless of bucket count, worker count, or
summation order — the same exactness discipline the SQL-gated operators use,
applied to an algorithm SQL can't express.

Scale shape per iteration: the edge table is bucketed by hash(src) ONCE and
materialized; each iteration ships only the score table (nodes, not edges)
through 2 bucketed exchanges — join scores to edges in bucket(src), emit
per-edge contributions pre-summed per (bucket, dst), then merge into the
next score table in bucket(dst). Pairs/edges never touch the driver."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sharding import auto_buckets, bucket_of_ints

SCALE = np.int64(1_000_000)  # fixed-point micro-units


def pagerank(
    edges: "ray.data.Dataset",
    damping_ppm: int = 850_000,
    n_iters: int = 10,
    num_buckets: Optional[int] = None,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    small_graph_rows: Optional[int] = 1_000_000,
) -> "ray.data.Dataset":
    """Damped PageRank over an UNDIRECTED edge table (each input row links
    both ways). Output: (node:int64, score_micro:int64) — fixed-point
    scores summing to ~n_nodes * SCALE. ``damping_ppm`` is the damping
    factor in parts-per-million (850_000 = 0.85).

    Integer recurrence (bit-stable under any distribution):
      contrib(e) = score[src] // deg[src]
      raw[dst]   = sum(contrib over in-edges)
      score'     = (SCALE - d_ppm) + (d_ppm * raw) // SCALE
    Dangling nodes (none in an undirected graph with self-loops removed)
    would keep the teleport term only."""
    nb = num_buckets or auto_buckets(None)
    d_ppm = np.int64(damping_ppm)

    if small_graph_rows:
        # count() would execute the upstream edge-extraction pipeline and
        # the algorithm below would execute it AGAIN (r4 ADVICE:
        # q_link_communities re-parsed all HTML twice) — pin the edge
        # blocks once and reuse the handle on either path
        edges = edges.materialize()
    if small_graph_rows and edges.count() <= small_graph_rows:
        # tiny-graph short-circuit (the dedup-clustering lesson: per-round
        # session overhead dwarfs the work below ~1e6 edges): the SAME
        # integer recurrence in ONE worker task — still off the driver,
        # still bit-identical to the iterative path by construction
        def one_task(b: pa.Table) -> pa.Table:
            e = np.stack([
                b[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64),
            ], axis=1)
            ref = pagerank_reference(e, damping_ppm=int(d_ppm),
                                     n_iters=n_iters)
            return pa.table({
                "node": pa.array(list(ref), pa.int64()),
                "score_micro": pa.array(list(ref.values()), pa.int64())})

        return edges.repartition(1).map_batches(
            one_task, batch_format="pyarrow", batch_size=None)

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, c])
        dst = np.concatenate([c, a])
        keep = src != dst  # drop self-loops
        src, dst = src[keep], dst[keep]
        n = len(src)
        # padded to the SAME schema the score rows use, so the per-iteration
        # union is schema-aligned (the hash_join tagging pattern)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "node": pa.nulls(n, pa.int64()),
            "score": pa.nulls(n, pa.int64()),
            "deg": pa.nulls(n, pa.int64()),
            "c": pa.nulls(n, pa.int64()),
            "pkey": pa.array(bucket_of_ints(src, nb), pa.int64())})

    # static: edges grouped by bucket(src), materialized once; the raw
    # small-path materialization is released right after so the two full
    # edge copies never stay pinned together
    E = edges.map_batches(both_dirs, batch_format="pyarrow") \
        .repartition(nb).materialize()
    edges = None

    def init_scores(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy(zero_copy_only=False)
        nodes, deg = np.unique(src, return_counts=True)
        n = len(nodes)
        return pa.table({
            "src": pa.nulls(n, pa.int64()),
            "dst": pa.nulls(n, pa.int64()),
            "node": pa.array(nodes, pa.int64()),
            "score": pa.array(np.full(n, SCALE), pa.int64()),
            "deg": pa.array(deg.astype(np.int64), pa.int64()),
            "c": pa.nulls(n, pa.int64()),
            "pkey": pa.array(bucket_of_ints(nodes, nb), pa.int64())})

    # per-bucket degree is GLOBAL degree: all of a node's out-edges live in
    # its bucket (bucketed by src = node)
    scores = E.groupby("pkey").map_groups(init_scores,
                                          batch_format="pyarrow") \
        .materialize()

    def _padded(n: int, **filled) -> dict:
        cols = {c: pa.nulls(n, pa.int64())
                for c in ("src", "dst", "node", "score", "deg", "c")}
        cols.update(filled)
        return cols

    def contribs(g: pa.Table) -> pa.Table:
        # bucket holds BOTH the score rows and edge rows for its src nodes
        is_edge = pc.is_valid(g["dst"])
        em = g.filter(is_edge)
        sm = g.filter(pc.invert(is_edge))
        if em.num_rows == 0 or sm.num_rows == 0:
            return pa.table({**_padded(0),
                             "pkey": pa.array([], pa.int64())})
        nodes = sm["node"].to_numpy(zero_copy_only=False)
        per_edge = (sm["score"].to_numpy(zero_copy_only=False)
                    // sm["deg"].to_numpy(zero_copy_only=False))
        order = np.argsort(nodes, kind="stable")
        nodes_s, pe_s = nodes[order], per_edge[order]
        src = em["src"].to_numpy(zero_copy_only=False)
        dst = em["dst"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(nodes_s, src), len(nodes_s) - 1)
        c = np.where(nodes_s[pos] == src, pe_s[pos], 0)
        t = pa.table({"dst": pa.array(dst, pa.int64()),
                      "c": pa.array(c, pa.int64())}) \
            .group_by("dst").aggregate([("c", "sum")])
        dstu = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            **_padded(t.num_rows, dst=pa.array(dstu, pa.int64()),
                      c=pc.cast(t["c_sum"], pa.int64())),
            "pkey": pa.array(bucket_of_ints(dstu, nb), pa.int64())})

    def merge_zip(g: pa.Table) -> pa.Table:
        # contribution partials (c valid) + static degree rows (node valid)
        cm = pc.is_valid(g["c"])
        ct = g.filter(cm)
        dt = g.filter(pc.invert(cm))
        t = ct.select(["dst", "c"]).group_by("dst").aggregate([("c", "sum")])
        dst = t["dst"].to_numpy(zero_copy_only=False)
        raw = t["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        new = (SCALE - d_ppm) + (d_ppm * raw) // SCALE
        dn = dt["node"].to_numpy(zero_copy_only=False)
        dg = dt["deg"].to_numpy(zero_copy_only=False)
        o = np.argsort(dn, kind="stable")
        dn_s, dg_s = dn[o], dg[o]
        if len(dn_s):
            pos = np.minimum(np.searchsorted(dn_s, dst), len(dn_s) - 1)
            deg = dg_s[pos]
        else:
            deg = np.ones(len(dst), np.int64)
        return pa.table({
            **_padded(len(dst), node=pa.array(dst, pa.int64()),
                      score=pa.array(new, pa.int64()),
                      deg=pa.array(deg, pa.int64())),
            "pkey": pa.array(bucket_of_ints(dst, nb), pa.int64())})

    for _ in range(n_iters):
        # exchange 1: scores into edge buckets (same pkey space: bucket(src))
        contrib = E.union(scores).groupby("pkey").map_groups(
            contribs, batch_format="pyarrow")
        # exchange 2: contributions + static degrees into bucket(dst=node)
        scores = contrib.union(scores).groupby("pkey").map_groups(
            merge_zip, batch_format="pyarrow") \
            .repartition(nb).materialize()

    return scores.map_batches(
        lambda b: pa.table({"node": b["node"], "score_micro": b["score"]}),
        batch_format="pyarrow")


def pagerank_reference(edges, damping_ppm=850_000, n_iters=10):
    """Single-machine integer-recurrence twin (the exactness oracle)."""
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    nodes = np.unique(src)
    idx = {int(n): i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes), np.int64)
    for s in src:
        deg[idx[int(s)]] += 1
    score = np.full(len(nodes), SCALE, np.int64)
    d = np.int64(damping_ppm)
    for _ in range(n_iters):
        contrib = np.zeros(len(nodes), np.int64)
        per = score // deg
        for s, t in zip(src, dst):
            contrib[idx[int(t)]] += per[idx[int(s)]]
        score = (SCALE - d) + (d * contrib) // SCALE
    return {int(n): int(s) for n, s in zip(nodes, score)}


def triangle_counts(
    edges: "ray.data.Dataset",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    num_buckets: Optional[int] = None,
    small_graph_rows: Optional[int] = 1_000_000,
) -> "ray.data.Dataset":
    """Per-node triangle counts over the UNDIRECTED simple graph of
    ``edges`` — the classic degree-ordered wedge algorithm (Suri &
    Vassilvitskii 2011 "Counting Triangles and the Curse of the Last
    Reducer"): orient each edge from its (degree, node)-smaller endpoint,
    so every node's out-degree is O(sqrt(m)) and wedge volume is bounded
    even on power-law graphs; a wedge (u; v1, v2) closed by an edge
    (v1, v2) is exactly one triangle. Returns (node, n_triangles) for
    nodes in >= 1 triangle; every triangle credits all three corners.

    Exchanges: one bucketed dedup of canonical edges, one bucketed degree
    count, two co-bucketed joins (degree onto each endpoint), one
    groupby(u) wedge emission, one co-bucketed wedge-close join, one
    bucketed per-node sum. Pairs never touch the driver; all counts are
    exact integers, so the result is parallelism-invariant and carries an
    exact DuckDB twin. Graphs under ``small_graph_rows`` edges run the
    same id-ordered scan in one worker task instead (chained-exchange
    overhead dominates below ~1e6 edges — the dedup-clustering lesson)."""
    from .agg import bucketed_group_sum
    from .joins import hash_join

    nb = num_buckets or auto_buckets(None)

    if small_graph_rows:
        # count() would execute the upstream edge-extraction pipeline and
        # the algorithm below would execute it AGAIN (r4 ADVICE:
        # q_link_communities re-parsed all HTML twice) — pin the edge
        # blocks once and reuse the handle on either path
        edges = edges.materialize()
    if small_graph_rows and edges.count() <= small_graph_rows:
        # tiny-graph short-circuit (the dedup-clustering lesson: chained
        # exchange overhead dwarfs the work below ~1e6 edges): the SAME
        # id-ordered wedge scan in ONE worker task — off the driver,
        # identical answer by construction (exact integer counts)
        def one_task(b: pa.Table) -> pa.Table:
            pairs = zip(
                b[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64))
            ref = triangle_counts_reference(pairs)
            nodes = sorted(ref)
            return pa.table({
                "node": pa.array(nodes, pa.int64()),
                "n_triangles": pa.array([ref[n] for n in nodes],
                                        pa.int64())})

        return edges.repartition(1).map_batches(
            one_task, batch_format="pyarrow", batch_size=None)

    def canon(b: pa.Table) -> pa.Table:
        a = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(a, c)
        hi = np.maximum(a, c)
        keep = lo != hi  # drop self-loops
        t = pa.table({"lo": pa.array(lo[keep], pa.int64()),
                      "hi": pa.array(hi[keep], pa.int64())}) \
            .group_by(["lo", "hi"]).aggregate([])
        return t.append_column("pkey", pa.array(bucket_of_ints(
            t["lo"].to_numpy(zero_copy_only=False), nb), pa.int64()))

    def dedup(g: pa.Table) -> pa.Table:
        return g.select(["lo", "hi"]).group_by(["lo", "hi"]).aggregate([])

    ded = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby("pkey").map_groups(dedup, batch_format="pyarrow") \
        .materialize()
    edges = None  # release the raw small-path materialization

    def endpoints(b: pa.Table) -> pa.Table:
        n = np.concatenate([
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False)]).astype(np.int64)
        return pa.table({"node": pa.array(n, pa.int64()),
                         "deg": pa.array(np.ones(len(n), np.int64))})

    deg = bucketed_group_sum(
        ded.map_batches(endpoints, batch_format="pyarrow"),
        "node", ["deg"]).materialize()

    edge_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def _ren(cols):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns(cols)
        return f

    j1 = hash_join(
        ded, deg.map_batches(_ren(["lo", "deg_lo"]),
                             batch_format="pyarrow"),
        on="lo", left_schema=edge_schema,
        right_schema=pa.schema([("lo", pa.int64()),
                                ("deg_lo", pa.int64())]))
    j2 = hash_join(
        j1, deg.map_batches(_ren(["hi", "deg_hi"]), batch_format="pyarrow"),
        on="hi",
        left_schema=pa.schema([("lo", pa.int64()), ("hi", pa.int64()),
                               ("deg_lo", pa.int64())]),
        right_schema=pa.schema([("hi", pa.int64()),
                                ("deg_hi", pa.int64())]))

    def orient(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        dl = b["deg_lo"].to_numpy(zero_copy_only=False)
        dh = b["deg_hi"].to_numpy(zero_copy_only=False)
        lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
        u = np.where(lo_first, lo, hi)
        v = np.where(lo_first, hi, lo)
        t = pa.table({"u": pa.array(u.astype(np.int64), pa.int64()),
                      "v": pa.array(v.astype(np.int64), pa.int64())})
        return t.append_column("pkey", pa.array(
            bucket_of_ints(u.astype(np.int64), nb), pa.int64()))

    def wedges(g: pa.Table) -> pa.Table:
        us = g["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        vs = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((vs, us))
        us, vs = us[order], vs[order]
        uniq, starts, counts = np.unique(us, return_index=True,
                                         return_counts=True)
        out_u, out_a, out_b = [], [], []
        # vectorize per distinct group SIZE: same-degree adjacency lists
        # stack into one (groups, size) matrix, pair-enumerated with one
        # triu_indices — no Python over wedges
        for s in np.unique(counts):
            if s < 2:
                continue
            sel = counts == s
            idx = starts[sel][:, None] + np.arange(s)[None, :]
            mat = vs[idx]                      # neighbors, sorted asc
            p, q = np.triu_indices(int(s), k=1)
            out_u.append(np.repeat(uniq[sel], len(p)))
            out_a.append(mat[:, p].reshape(-1))  # p<q and sorted ->
            out_b.append(mat[:, q].reshape(-1))  # (lo, hi) canonical
        if not out_u:
            z = pa.array([], pa.int64())
            return pa.table({"u": z, "lo": z, "hi": z})
        return pa.table({
            "u": pa.array(np.concatenate(out_u), pa.int64()),
            "lo": pa.array(np.concatenate(out_a), pa.int64()),
            "hi": pa.array(np.concatenate(out_b), pa.int64())})

    w = j2.map_batches(orient, batch_format="pyarrow") \
        .groupby("pkey").map_groups(wedges, batch_format="pyarrow")

    closed = hash_join(
        w, ded, on=["lo", "hi"],
        left_schema=pa.schema([("u", pa.int64()), ("lo", pa.int64()),
                               ("hi", pa.int64())]),
        right_schema=edge_schema)

    def corners(b: pa.Table) -> pa.Table:
        n = np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False)]).astype(np.int64)
        return pa.table({
            "node": pa.array(n, pa.int64()),
            "n_triangles": pa.array(np.ones(len(n), np.int64))})

    return bucketed_group_sum(
        closed.map_batches(corners, batch_format="pyarrow"),
        "node", ["n_triangles"])


def triangle_counts_reference(pairs) -> dict:
    """Single-machine twin: adjacency sets + id-ordered wedge scan."""
    adj: dict = {}
    eset = set()
    for a, b in pairs:
        a, b = int(a), int(b)
        if a == b:
            continue
        lo, hi = (a, b) if a < b else (b, a)
        if (lo, hi) in eset:
            continue
        eset.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    counts: dict = {}
    for (lo, hi) in eset:
        for w in adj[lo]:
            if w > hi and w in adj[hi]:
                for nd in (lo, hi, w):
                    counts[nd] = counts.get(nd, 0) + 1
    return counts


def kcore(
    edges: "ray.data.Dataset",
    k: int,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_rounds: int = 12,
    num_buckets: Optional[int] = None,
    small_graph_rows: Optional[int] = 1_000_000,
) -> "ray.data.Dataset":
    """k-core decomposition by iterative peeling over the UNDIRECTED simple
    graph of ``edges``: repeatedly drop every node whose induced degree is
    < k (Seidman 1983) — the link-spam / dense-community signal a crawl
    pipeline computes after PageRank. Returns (node, deg) for the
    endpoints of the surviving edge set with their induced degrees.

    Determinism contract: EXACTLY ``max_rounds`` peel rounds are defined —
    peeling is monotone (edges only leave), so once a round removes
    nothing every further round is the identity and the distributed loop
    may early-exit with the identical answer. The DuckDB twin unrolls the
    same ``max_rounds`` rounds as chained CTEs, which is what makes this
    iterative operator exactly SQL-checkable (the PageRank fixed-iteration
    lesson, see _pagerank_sql).

    Exchanges per round: one bucketed degree count over the current edge
    set + two co-bucketed semi-joins (alive set onto each endpoint); the
    edge set is re-materialized per round so each round reads blocks, not
    lineage. At 100 TB the alive set is node-sized — it stays a Dataset
    and joins by hash bucket, never a driver broadcast. Graphs under
    ``small_graph_rows`` edges run the same peel in ONE worker task
    (chained-exchange overhead dominates below ~1e6 edges — the
    dedup-clustering lesson)."""
    from .agg import bucketed_group_sum
    from .joins import hash_join

    nb = num_buckets or auto_buckets(None)

    if small_graph_rows:
        # count() would execute the upstream edge-extraction pipeline and
        # the algorithm below would execute it AGAIN (r4 ADVICE:
        # q_link_communities re-parsed all HTML twice) — pin the edge
        # blocks once and reuse the handle on either path
        edges = edges.materialize()
    if small_graph_rows and edges.count() <= small_graph_rows:
        def one_task(b: pa.Table) -> pa.Table:
            pairs = zip(
                b[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64))
            ref = kcore_reference(pairs, k, max_rounds)
            nodes = sorted(ref)
            return pa.table({
                "node": pa.array(nodes, pa.int64()),
                "deg": pa.array([ref[n] for n in nodes], pa.int64())})

        return edges.repartition(1).map_batches(
            one_task, batch_format="pyarrow", batch_size=None)

    def canon(b: pa.Table) -> pa.Table:
        a = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(a, c)
        hi = np.maximum(a, c)
        keep = lo != hi
        t = pa.table({"lo": pa.array(lo[keep], pa.int64()),
                      "hi": pa.array(hi[keep], pa.int64())}) \
            .group_by(["lo", "hi"]).aggregate([])
        return t.append_column("pkey", pa.array(bucket_of_ints(
            t["lo"].to_numpy(zero_copy_only=False), nb), pa.int64()))

    def dedup(g: pa.Table) -> pa.Table:
        return g.select(["lo", "hi"]).group_by(["lo", "hi"]).aggregate([])

    cur = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby("pkey").map_groups(dedup, batch_format="pyarrow") \
        .materialize()
    edges = None  # release the raw small-path materialization
    n_edges = cur.count()

    def endpoints(b: pa.Table) -> pa.Table:
        n = np.concatenate([
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False)]).astype(np.int64)
        return pa.table({"node": pa.array(n, pa.int64()),
                         "deg": pa.array(np.ones(len(n), np.int64))})

    edge_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    def _deg(ds_edges):
        return bucketed_group_sum(
            ds_edges.map_batches(endpoints, batch_format="pyarrow"),
            "node", ["deg"])

    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = _deg(cur)
        alive = deg.filter(expr=f"deg >= {int(k)}") \
            .select_columns(["node"])

        def _as(col):
            def f(b: pa.Table) -> pa.Table:
                return b.rename_columns([col])
            return f

        alive_schema_lo = pa.schema([("lo", pa.int64())])
        alive_schema_hi = pa.schema([("hi", pa.int64())])
        j = hash_join(
            cur, alive.map_batches(_as("lo"), batch_format="pyarrow"),
            on="lo", left_schema=edge_schema,
            right_schema=alive_schema_lo)
        nxt = hash_join(
            j, alive.map_batches(_as("hi"), batch_format="pyarrow"),
            on="hi", left_schema=edge_schema,
            right_schema=alive_schema_hi) \
            .select_columns(["lo", "hi"]).materialize()
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:  # fixpoint: further rounds are the identity
            break
        n_edges = n_next

    return _deg(cur)


def kcore_reference(pairs, k: int, max_rounds: int = 12) -> dict:
    """Single-machine twin of kcore: adjacency sets + the same fixed-round
    peel. Returns {node: induced_degree} over the surviving edges."""
    adj: dict = {}
    eset = set()
    for a, b in pairs:
        a, b = int(a), int(b)
        if a == b:
            continue
        lo, hi = (a, b) if a < b else (b, a)
        if (lo, hi) in eset:
            continue
        eset.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    for _ in range(max_rounds):
        dead = {n for n, nbrs in adj.items() if len(nbrs) < k}
        if not dead:
            break
        for n in dead:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
        for m in [m for m, nbrs in adj.items() if not nbrs]:
            del adj[m]
    return {n: len(nbrs) for n, nbrs in adj.items() if nbrs}


def label_propagation(
    edges: "ray.data.Dataset",
    n_rounds: int = 5,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    num_buckets: Optional[int] = None,
    small_graph_rows: Optional[int] = 1_000_000,
) -> "ray.data.Dataset":
    """Synchronous label-propagation community detection (Raghavan et al.
    2007, Phys. Rev. E 76) over the undirected simple graph of ``edges``:
    every node starts labeled with itself; each round every node adopts
    the most frequent label among its neighbors, ties broken by SMALLEST
    label — the deterministic synchronous variant (the classic async
    random-order LPA is irreproducible by design; fixed rounds + min-tie
    make this one bit-stable and exactly SQL-checkable as unrolled CTE
    rounds, the PageRank/kcore fixed-iteration lesson). Returns
    (node, label) after exactly ``n_rounds`` rounds.

    Scale shape per round: edges are canonicalized/deduped ONCE and
    bucketed by hash(lo); each round ships only the label table (nodes,
    not edges) through two co-bucketed joins onto the edge endpoints,
    emits 2|E| (neighbor, label) messages pre-counted per (bucket, node,
    label), and resolves the argmax-count/min-label winner inside
    bucket(node). Every node appears in some edge, so no keep-old-label
    path exists. Graphs under ``small_graph_rows`` edges run the same
    rounds in ONE worker task (chained-exchange overhead dominates below
    ~1e6 edges — the dedup-clustering lesson)."""
    from .agg import bucketed_group_sum
    from .joins import hash_join

    nb = num_buckets or auto_buckets(None)

    if small_graph_rows:
        # count() would execute the upstream edge-extraction pipeline and
        # the algorithm below would execute it AGAIN (r4 ADVICE:
        # q_link_communities re-parsed all HTML twice) — pin the edge
        # blocks once and reuse the handle on either path
        edges = edges.materialize()
    if small_graph_rows and edges.count() <= small_graph_rows:
        def one_task(b: pa.Table) -> pa.Table:
            pairs = zip(
                b[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64))
            ref = label_propagation_reference(pairs, n_rounds)
            nodes = sorted(ref)
            return pa.table({
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array([ref[n] for n in nodes], pa.int64())})

        return edges.repartition(1).map_batches(
            one_task, batch_format="pyarrow", batch_size=None)

    def canon(b: pa.Table) -> pa.Table:
        a = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(a, c)
        hi = np.maximum(a, c)
        keep = lo != hi
        t = pa.table({"lo": pa.array(lo[keep], pa.int64()),
                      "hi": pa.array(hi[keep], pa.int64())}) \
            .group_by(["lo", "hi"]).aggregate([])
        return t.append_column("pkey", pa.array(bucket_of_ints(
            t["lo"].to_numpy(zero_copy_only=False), nb), pa.int64()))

    def dedup(g: pa.Table) -> pa.Table:
        return g.select(["lo", "hi"]).group_by(["lo", "hi"]).aggregate([])

    cur = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby("pkey").map_groups(dedup, batch_format="pyarrow") \
        .materialize()
    edges = None  # release the raw small-path materialization

    def init_labels(b: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate([
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False)]).astype(np.int64))
        return pa.table({"node": pa.array(n, pa.int64()),
                         "one": pa.array(np.ones(len(n), np.int64))})

    labels = bucketed_group_sum(
        cur.map_batches(init_labels, batch_format="pyarrow"),
        "node", ["one"])

    def self_label(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "label": b["node"]})

    labels = labels.map_batches(self_label, batch_format="pyarrow") \
        .materialize()

    edge_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
    lab_lo = pa.schema([("lo", pa.int64()), ("label_lo", pa.int64())])
    lab_hi = pa.schema([("hi", pa.int64()), ("label_hi", pa.int64())])

    def _as(cols):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns(cols)
        return f

    def messages(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        ll = b["label_lo"].to_numpy(zero_copy_only=False)
        lh = b["label_hi"].to_numpy(zero_copy_only=False)
        node = np.concatenate([hi, lo]).astype(np.int64)
        lab = np.concatenate([ll, lh]).astype(np.int64)
        t = pa.table({"node": pa.array(node, pa.int64()),
                      "label": pa.array(lab, pa.int64())}) \
            .group_by(["node", "label"]).aggregate([([], "count_all")])
        return pa.table({
            "node": t["node"], "label": t["label"],
            "cnt": pc.cast(t["count_all"], pa.int64()),
            "pkey": pa.array(bucket_of_ints(
                t["node"].to_numpy(zero_copy_only=False), nb), pa.int64())})

    def winner(g: pa.Table) -> pa.Table:
        t = g.select(["node", "label", "cnt"]) \
            .group_by(["node", "label"]).aggregate([("cnt", "sum")])
        node = t["node"].to_numpy(zero_copy_only=False)
        lab = t["label"].to_numpy(zero_copy_only=False)
        cnt = t["cnt_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, -cnt, node))
        node, lab = node[order], lab[order]
        first = np.empty(len(node), bool)
        if len(node):
            first[0] = True
            first[1:] = node[1:] != node[:-1]
        return pa.table({"node": pa.array(node[first], pa.int64()),
                         "label": pa.array(lab[first], pa.int64())})

    for _ in range(n_rounds):
        j = hash_join(
            cur, labels.map_batches(_as(["lo", "label_lo"]),
                                    batch_format="pyarrow"),
            on="lo", left_schema=edge_schema, right_schema=lab_lo)
        both_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64()),
                                 ("label_lo", pa.int64())])
        j = hash_join(
            j, labels.map_batches(_as(["hi", "label_hi"]),
                                  batch_format="pyarrow"),
            on="hi", left_schema=both_schema, right_schema=lab_hi)
        labels = j.map_batches(messages, batch_format="pyarrow") \
            .groupby("pkey").map_groups(winner, batch_format="pyarrow") \
            .materialize()

    return labels


def label_propagation_reference(pairs, n_rounds: int = 5) -> dict:
    """Single-machine twin of label_propagation: adjacency sets + the same
    synchronous min-tie rounds. Returns {node: label}."""
    adj: dict = {}
    for a, b in pairs:
        a, b = int(a), int(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: n for n in adj}
    for _ in range(n_rounds):
        nxt = {}
        for n, nbrs in adj.items():
            cnt: dict = {}
            for m in nbrs:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            nxt[n] = min(cnt, key=lambda c: (-cnt[c], c))
        lab = nxt
    return lab
