"""Raw media ingestion (S1) and result sinks (S5)."""

from __future__ import annotations

import os

import pytest

import ray.data

from documentprocessor_ray.sources.media import ingest_media_dir
from documentprocessor_ray.sources.sinks import read_results, write_results


class TestIngestMedia:
    @pytest.fixture()
    def media_files(self, tmp_path):
        (tmp_path / "page-1.png").write_bytes(b"\x89PNG fake")
        (tmp_path / "clip.wav").write_bytes(b"RIFF fake")
        (tmp_path / "vid.mp4").write_bytes(b"ftyp fake")
        (tmp_path / "blob.xyz").write_bytes(b"???")
        return str(tmp_path)

    def test_kinds_and_payloads(self, ray_session, media_files):
        df = ingest_media_dir(media_files).to_pandas().set_index("asset_id")
        assert df.loc["page-1", "kind"] == "image"
        assert df.loc["clip", "kind"] == "audio"
        assert df.loc["vid", "kind"] == "video"
        assert df.loc["blob", "kind"] == "binary"
        assert bytes(df.loc["page-1", "payload"]) == b"\x89PNG fake"
        assert df.loc["vid", "meta"]["format"] == "mp4"

    def test_feeds_multimodal_stage(self, ray_session, media_files):
        from documentprocessor_ray.stages.multimodal import build_media_pipeline

        ds = ingest_media_dir(media_files)
        out = build_media_pipeline(ds, "image").to_pandas()
        # FakeCodec needs width/height meta -> null meta decodes fail IN-BAND
        assert len(out) == 1 and out.iloc[0]["error"]


class TestSinks:
    def test_parquet_roundtrip(self, ray_session, tmp_path):
        ds = ray.data.range(50)
        out = str(tmp_path / "p")
        write_results(ds, out, "parquet")
        assert read_results(out, "parquet").count() == 50
        assert len(os.listdir(out)) >= 1

    def test_json_roundtrip(self, ray_session, tmp_path):
        ds = ray.data.range(20)
        out = str(tmp_path / "j")
        write_results(ds, out, "json")
        assert read_results(out, "json").count() == 20

    def test_unknown_format(self, ray_session, tmp_path):
        with pytest.raises(ValueError):
            write_results(ray.data.range(1), str(tmp_path / "x"), "csvx")


class TestFormatSeam:
    """Lance/parquet dispatch (north-rule input is Lance; parquet is the
    sanctioned in-container fallback — the lance package is import-guarded)."""

    def test_parquet_autodetect_and_column_prune(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from documentprocessor_ray.sources.documents import read_table_auto

        p = tmp_path / "t.parquet"
        pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), p)
        ds = read_table_auto(str(p), columns=["a"])
        assert ds.schema().names == ["a"]
        assert ds.count() == 2

    def test_lance_requested_without_package(self, ray_session, tmp_path):
        from documentprocessor_ray.sources.documents import (
            lance_available, read_table_auto)

        if lance_available():
            pytest.skip("lance installed; fallback branch not reachable")
        with pytest.raises(ImportError, match="lance"):
            read_table_auto(str(tmp_path / "tbl.lance"))

    def test_lance_layout_autodetected(self, tmp_path):
        from documentprocessor_ray.sources.documents import _looks_like_lance

        d = tmp_path / "ds"
        (d / "_versions").mkdir(parents=True)
        assert _looks_like_lance(str(d))
        assert _looks_like_lance("s3://bucket/tbl.lance")
        assert not _looks_like_lance(str(tmp_path))

    def test_lance_sink_guarded(self, ray_session, tmp_path):
        from documentprocessor_ray.sources.documents import lance_available

        if lance_available():
            pytest.skip("lance installed")
        with pytest.raises(ImportError):
            write_results(ray.data.range(1), str(tmp_path / "o"), "lance")


class TestEngineSeam:
    """Injectable OCR engine (A1-A3): a user engine CLASS rides cloudpickle
    into the workers; registry names resolve worker-side for built-ins."""

    def test_registry(self):
        from documentprocessor_ray.ocr_kernel import (
            OcrKernel, get_engine, register_engine)

        assert isinstance(get_engine(), OcrKernel)
        assert isinstance(get_engine("kernel"), OcrKernel)
        with pytest.raises(ValueError):
            get_engine("paddle-not-here")

        class Fake:
            def detect_and_recognize(self, image):
                return []

        register_engine("fake", Fake)
        assert isinstance(get_engine("fake"), Fake)

    def test_custom_engine_class_through_pipeline(self, ray_session, small_corpus):
        """A custom engine object reaches the distributed span stage."""
        from documentprocessor_ray.pipelines.extract import run_extraction

        class OneWordEngine:
            def __init__(self):
                self.calls = 0

            def detect_and_recognize(self, image):
                return [{"text": "STAMP", "box": [0, 0, 10, 10],
                         "confidence": 1.0}]

        docs_dir, media_dir = small_corpus
        out = run_extraction(docs_dir, media_dir, engine=OneWordEngine,
                             batch_size=16).to_pandas()
        done = out[out["status"] == "done"]
        media_rows = done[done["n_words"] > 0]
        assert len(media_rows) > 0
        for _, row in media_rows.iterrows():
            texts = {s["text"] for s in row["spans_out"] if s["kind"] == "media"}
            assert texts == {"STAMP"}
