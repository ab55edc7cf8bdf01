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
