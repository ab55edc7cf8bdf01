"""Oracle-dump twins (pipelines/oracle_dump.py): the driver-checkable
parquet twins for non-SQL-expressible operators.

The heavyweight equality checks (distributed query == dumped expected table)
run through scripts/check_oracle.py / the driver; here we gate the dump
machinery itself (memoization, skip env, atomicity) plus cheap end-to-end
equality on tiny inputs.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from documentprocessor_ray.pipelines import oracle_dump as OD

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _no_skip(monkeypatch):
    monkeypatch.delenv("DPRAY_SKIP_ORACLE_DUMP", raising=False)


class TestDumpMachinery:
    def test_dump_writes_and_memoizes(self, tmp_path, monkeypatch):
        monkeypatch.setattr(OD, "DUMP_DIR", str(tmp_path))
        calls = []

        def build():
            calls.append(1)
            return pa.table({"x": pa.array([1, 2], pa.int64())})

        OD.dump("t1", "fp-a", build)
        assert calls == [1]
        assert pq.read_table(OD.dump_path("t1")).num_rows == 2
        # same fingerprint: no rebuild
        OD.dump("t1", "fp-a", build)
        assert calls == [1]
        # changed fingerprint: rebuild
        OD.dump("t1", "fp-b", build)
        assert calls == [1, 1]

    def test_skip_env(self, tmp_path, monkeypatch):
        monkeypatch.setattr(OD, "DUMP_DIR", str(tmp_path))
        monkeypatch.setenv("DPRAY_SKIP_ORACLE_DUMP", "1")
        OD.dump("t2", "fp", lambda: pa.table({"x": [1]}))
        assert not os.path.exists(OD.dump_path("t2"))

    def test_file_fingerprint_changes_with_mtime(self, tmp_path):
        p = tmp_path / "f.bin"
        p.write_bytes(b"abc")
        fp1 = OD.file_fingerprint(str(p))
        os.utime(p, ns=(1, 1))
        assert OD.file_fingerprint(str(p)) != fp1

    def test_sql_for_is_read_parquet(self):
        assert "read_parquet" in OD.sql_for("langid")


class TestExpectedTables:
    def test_langid_expected_schema_and_determinism(self):
        t1 = OD.langid_expected(SF)
        t2 = OD.langid_expected(SF)
        assert t1.column_names == ["doc_id", "pred_lang"]
        assert t1.equals(t2)
        assert t1.num_rows > 0

    def test_bpe_merges_expected_matches_distributed_cache_shape(self):
        t = OD.bpe_merges_expected(SF)
        assert t.column_names == ["rank", "left", "right", "pair_count"]
        assert t.num_rows == 12

    def test_phash_expected_recovers_planted_pair(self):
        from documentprocessor_ray.pipelines.analysis import _phash_media_table

        media = _phash_media_table(30)
        t = OD.image_phash_pairs_expected(media)
        pairs = set(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
        # asset-00000 is the planted image dup (i=0 is the only i%10==0 image
        # among 30 assets with kind cycle image/audio/video)
        assert (0, 90000) in pairs
        ham = dict(zip(pairs, t["hamming"].to_pylist()))
        assert ham[(0, 90000)] == 0

    def test_extraction_oracle_rows_keep_words(self, small_corpus):
        docs_dir, media_dir = small_corpus
        rows = OD.extraction_oracle_rows(docs_dir, media_dir)
        assert rows and all("words" in r for r in rows)
        t = OD.extract_receipts_expected(docs_dir, media_dir)
        assert t.column_names == ["doc_id", "status", "n_words",
                                  "n_spans_out"]
        assert t.num_rows == len(rows)

    def test_extract_scored_expected_vendor_matches_scorer(self, small_corpus):
        from documentprocessor_ray.stages.scorer import get_scorer

        docs_dir, media_dir = small_corpus
        t = OD.extract_scored_expected(docs_dir, media_dir, "rule")
        rows = OD.extraction_oracle_rows(docs_dir, media_dir)
        scorer = get_scorer("rule")
        by_id = dict(zip(t["doc_id"].to_pylist(),
                         t["model_vendor_value"].to_pylist()))
        checked = 0
        for r in rows[:5]:
            ents = scorer.predict(r["words"]) if r["words"] else {}
            v = ents.get("vendor")
            assert by_id[r["doc_id"]] == (v["value"] if v else None)
            checked += 1
        assert checked
