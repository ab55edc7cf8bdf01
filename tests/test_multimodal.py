"""Multimodal stage plumbing: schema, actor signature, determinism, and the
RealCodec stub boundary."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from documentprocessor_ray.stages.multimodal import (
    AudioFeatureStage, FakeCodec, ImageFeatureStage, RealCodec,
    VideoFrameSampleStage, build_media_pipeline, synth_media_table, _resize_nn,
)


@pytest.fixture(scope="module")
def media_ds(ray_session):
    return ray.data.from_arrow(synth_media_table(n_assets=30, seed=5))


class TestImageStage:
    def test_pipeline_schema_and_rows(self, media_ds):
        out = build_media_pipeline(media_ds, "image").to_pandas()
        assert len(out) == 10  # every 3rd asset
        assert set(out.columns) == {"asset_id", "width", "height",
                                    "mean_luma_milli", "feat", "error"}
        assert out["error"].isna().all()
        assert (out["width"] > 0).all()
        for f in out["feat"]:
            assert len(f) == 64 and abs(sum(f) - 1.0) < 1e-9

    def test_deterministic_across_runs(self, media_ds):
        a = build_media_pipeline(media_ds, "image").to_pandas().sort_values(
            "asset_id").reset_index(drop=True)
        b = build_media_pipeline(media_ds, "image").to_pandas().sort_values(
            "asset_id").reset_index(drop=True)
        assert a["mean_luma_milli"].tolist() == b["mean_luma_milli"].tolist()

    def test_real_codec_is_inband_stub(self, media_ds):
        out = build_media_pipeline(media_ds, "image", codec=RealCodec()).to_pandas()
        assert len(out) == 10
        assert out["error"].notna().all()  # stub surfaces as error rows, not a crash

    def test_resize_nn(self):
        img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1).repeat(3, axis=2)
        small = _resize_nn(img, 2, 2)
        assert small.shape == (2, 2, 3)
        assert small[0, 0, 0] == 0 and small[1, 1, 0] == 10


class TestAudioVideo:
    def test_audio_stage(self, media_ds):
        out = build_media_pipeline(media_ds, "audio").to_pandas()
        assert len(out) == 10
        assert (out["n_samples"] == 16000).all()
        assert (out["n_frames_out"] == 15).all()

    def test_video_flatmap_shape(self, media_ds):
        out = build_media_pipeline(media_ds, "video", batch_size=4).to_pandas()
        # one row per sampled frame; stride 10 over 30..120 frames
        per_asset = out.groupby("asset_id").size()
        assert len(per_asset) == 10
        assert (per_asset >= 3).all() and (per_asset <= 12).all()
        assert (out["frame_idx"] % 10 == 0).all()

    def test_fake_codec_keyed_on_payload(self):
        c = FakeCodec()
        meta = {"width": 8, "height": 8, "sample_rate": 100, "n_frames": 10}
        a = c.decode_image(b"xx", meta)
        b = c.decode_image(b"xx", meta)
        d = c.decode_image(b"yy", meta)
        assert (a == b).all() and (a != d).any()
