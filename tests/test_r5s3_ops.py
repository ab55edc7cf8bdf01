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
