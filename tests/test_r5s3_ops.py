"""Round-5 session-3 operators: columnar interchange sources (ORC /
Arrow IPC), plus the session's analytic additions."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _write_docs(tmp_path, n=20):
    import pyarrow.parquet as pq

    src = str(tmp_path / "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i}\nline2 é中 {i * 7}" for i in range(n)],
                         pa.string()),
        "lang": pa.array(["en", "de"] * (n // 2), pa.string()),
        "source": pa.array(["s0"] * n, pa.string()),
        "n_chars": pa.array([5 + i for i in range(n)], pa.int64())}), src)
    return src


class TestColumnarSources:
    @pytest.mark.parametrize("fmt", ["orc", "ipc"])
    def test_roundtrip_matches_source(self, ray_session, tmp_path, fmt):
        from documentprocessor_ray.sources.columnar import (
            read_ipc, read_orc, write_ipc_shards, write_orc_shards)

        src = _write_docs(tmp_path)
        write = write_orc_shards if fmt == "orc" else write_ipc_shards
        read = read_orc if fmt == "orc" else read_ipc
        d = write(src, str(tmp_path / fmt), num_shards=3)
        ext = ".orc" if fmt == "orc" else ".arrow"
        shards = [f for f in os.listdir(d) if f.endswith(ext)]
        assert len(shards) == 3
        rows = sorted(read(d).take_all(), key=lambda r: r["doc_id"])
        assert len(rows) == 20
        assert rows[3]["text"] == "doc 3\nline2 é中 21"
        assert rows[7]["lang"] == "de" and rows[7]["n_chars"] == 12

    def test_shards_regenerate_when_source_newer(self, tmp_path):
        import pyarrow.parquet as pq

        from documentprocessor_ray.sources.columnar import write_orc_shards

        src = _write_docs(tmp_path, n=4)
        d = write_orc_shards(src, str(tmp_path / "o"), num_shards=2)
        first = open(os.path.join(d, "shard-00000.orc"), "rb").read()
        # regenerate the source with different content, newer mtime
        os.utime(src, ns=(os.stat(src).st_mtime_ns + 10**9,) * 2)
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 2], pa.int64()),
            "text": pa.array(["XX", "YY"], pa.string())}), src)
        os.utime(src, ns=(os.stat(src).st_mtime_ns + 2 * 10**9,) * 2)
        d2 = write_orc_shards(src, str(tmp_path / "o"), num_shards=2)
        second = open(os.path.join(d2, "shard-00000.orc"), "rb").read()
        assert first != second  # stale shards were rewritten

    def test_empty_dir_rejected(self, tmp_path):
        from documentprocessor_ray.sources.columnar import read_orc

        os.makedirs(tmp_path / "empty", exist_ok=True)
        with pytest.raises(ValueError, match="no \\*\\.orc"):
            read_orc(str(tmp_path / "empty"))

    def test_bad_format_rejected(self, tmp_path):
        from documentprocessor_ray.sources.columnar import _write_shards

        with pytest.raises(ValueError, match="fmt"):
            _write_shards("x", str(tmp_path), "avro")


class TestFrequentPairs:
    def _brute(self, baskets, min_support=2):
        """Plain-Python reference: dict-count pairs over distinct baskets."""
        from collections import defaultdict
        from itertools import combinations

        dist = defaultdict(set)
        for g, i in baskets:
            dist[g].add(i)
        n = len(dist)
        pc_, ic = defaultdict(int), defaultdict(int)
        for items in dist.values():
            for i in items:
                ic[i] += 1
            for a, b in combinations(sorted(items), 2):
                pc_[(a, b)] += 1
        return sorted(
            (a, b, s, (n * s * 1_000_000) // (ic[a] * ic[b]))
            for (a, b), s in pc_.items() if s >= min_support)

    def test_matches_bruteforce(self, ray_session):
        import random

        import ray.data

        from documentprocessor_ray.functions.itemsets import frequent_pairs

        rng = random.Random(7)
        rows = []
        for g in range(120):
            for i in rng.sample(range(25), rng.randint(1, 6)):
                rows.append({"g": g, "i": i})
                if rng.random() < 0.2:  # duplicate lineitem rows
                    rows.append({"g": g, "i": i})
        ds = ray.data.from_items(rows)
        out = frequent_pairs(ds, "g", "i", min_support=2)
        got = sorted((r["part_a"], r["part_b"], r["support"],
                      r["lift_micro"]) for r in out.take_all())
        assert got == self._brute([(r["g"], r["i"]) for r in rows])
        assert len(got) > 20

    def test_min_support_filters(self, ray_session):
        import ray.data

        from documentprocessor_ray.functions.itemsets import frequent_pairs

        rows = [{"g": 0, "i": 1}, {"g": 0, "i": 2},
                {"g": 1, "i": 1}, {"g": 1, "i": 2},
                {"g": 2, "i": 1}, {"g": 2, "i": 3}]
        got = frequent_pairs(ray.data.from_items(rows), "g", "i",
                             min_support=2).take_all()
        assert [(r["part_a"], r["part_b"], r["support"]) for r in got] == \
            [(1, 2, 2)]
        # lift = 3 baskets * 2 / (3 * 2) = 1.0
        assert got[0]["lift_micro"] == 1_000_000

    def test_negative_item_rejected(self, ray_session):
        import ray.data

        from documentprocessor_ray.functions.itemsets import frequent_pairs

        ds = ray.data.from_items([{"g": 0, "i": -5}, {"g": 0, "i": 2}])
        with pytest.raises(Exception, match="item ids must be >= 0"):
            frequent_pairs(ds, "g", "i").materialize()

    def test_kernel_offset_sweep_vs_combinations(self):
        """The d-offset pair sweep == itertools.combinations on every
        basket size up to 9, including single-item and duplicate rows."""
        import numpy as np
        from itertools import combinations

        from documentprocessor_ray.functions.itemsets import (
            _basket_pairs_kernel)

        ok = np.array([0] * 9 + [1] + [2] * 3 + [2] * 3, np.int64)
        it = np.array(list(range(9)) + [4] + [7, 8, 9] + [7, 8, 9],
                      np.int64)
        a, b, c, items, icnt, nb = _basket_pairs_kernel(ok, it)
        exp = sorted(list(combinations(range(9), 2)) +
                     list(combinations([7, 8, 9], 2)))
        assert sorted(zip(a.tolist(), b.tolist())) == sorted(set(exp))
        assert nb == 3
        assert dict(zip(items.tolist(), icnt.tolist()))[7] == 2


class TestGroupedRegression:
    def test_matches_numpy_polyfit(self, ray_session):
        """slope/icept micro-ints vs np.polyfit on the same quantized data
        (tolerance 1 micro-unit for the trunc)."""
        import numpy as np

        from documentprocessor_ray.pipelines.analysis import (
            q_regr_price_qty)
        import pyarrow.parquet as pq

        got = {(r["l_returnflag"], r["l_linestatus"]):
               (r["slope_micro"], r["icept_micro"], r["n_rows"])
               for r in q_regr_price_qty("/root/testdata/sf0.001")
               .take_all()}
        t = pq.read_table("/root/testdata/sf0.001/lineitem.parquet",
                          columns=["l_returnflag", "l_linestatus",
                                   "l_quantity", "l_extendedprice"])
        df = t.to_pandas()
        df["x"] = np.floor(df.l_quantity + 0.5).astype(np.int64)
        df["y"] = np.floor(df.l_extendedprice + 0.5).astype(np.int64)
        for (rf, ls), g in df.groupby(["l_returnflag", "l_linestatus"]):
            b, a = np.polyfit(g.x.to_numpy(np.float64),
                              g.y.to_numpy(np.float64), 1)
            sm, im, n = got[(rf, ls)]
            assert n == len(g)
            assert abs(sm - b * 1e6) <= max(2, abs(b) * 1e-3 * 1e6)
            assert abs(im - a * 1e6) <= max(2, abs(a) * 1e-3 * 1e6)


class TestAcfDailyRevenue:
    def test_matches_numpy_on_series(self, ray_session):
        """The integer ACF == numpy's mean-centered autocorrelation on the
        daily series derived the same way."""
        import numpy as np
        import pyarrow.parquet as pq

        from documentprocessor_ray.pipelines.analysis import (
            q_acf_daily_revenue)

        got = {r["lag"]: r["acf_micro"]
               for r in q_acf_daily_revenue("/root/testdata/sf0.001")
               .take_all()}
        assert sorted(got) == list(range(1, 8))
        t = pq.read_table("/root/testdata/sf0.001/orders.parquet",
                          columns=["o_orderdate", "o_totalprice"])
        day = (t["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        rev = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        import collections
        daily = collections.defaultdict(int)
        for d, v in zip(day.tolist(), rev.tolist()):
            daily[d] += v
        x = np.array([v for _, v in sorted(daily.items())], np.float64)
        xc = x - x.mean()
        den = float((xc * xc).sum())
        for k in range(1, 8):
            ref = float((xc[:-k] * xc[k:]).sum()) / den
            assert abs(got[k] - ref * 1e6) <= 2, (k, got[k], ref)

    def test_acf_lag_detects_planted_period(self, ray_session):
        """Sanity on semantics: a strongly weekly series must put its max
        |acf| at lag 7 — guards against off-by-one lag alignment."""
        import numpy as np

        from documentprocessor_ray.pipelines import analysis as A

        # reuse the driver path against a synthetic orders parquet
        import pyarrow.parquet as pq
        import tempfile, os
        d = tempfile.mkdtemp()
        days = np.arange(200, dtype=np.int64)
        price = 100.0 + 50.0 * (days % 7 == 0)
        ts = (days * 86_400_000_000).astype("datetime64[us]")
        pq.write_table(pa.table({
            "o_orderdate": pa.array(ts),
            "o_totalprice": pa.array(price, pa.float64())}),
            os.path.join(d, "orders.parquet"))
        got = {r["lag"]: r["acf_micro"]
               for r in A.q_acf_daily_revenue(d).take_all()}
        assert max(got, key=lambda k: abs(got[k])) == 7
        assert got[7] > 500_000  # strong positive weekly correlation
