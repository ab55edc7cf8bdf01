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


class TestRawCodec:
    """Pure-numpy working decode path (uncompressed BMP / PCM WAV / rgb24):
    encoder -> Ray actor-pool stage -> features, no external codec libs."""

    def test_bmp_roundtrip_exact(self):
        from documentprocessor_ray.stages.multimodal import RawCodec, encode_bmp

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)  # odd w: padding path
        out = RawCodec().decode_image(encode_bmp(img), {})
        assert np.array_equal(out, img)

    def test_wav_roundtrip(self):
        from documentprocessor_ray.stages.multimodal import RawCodec, encode_wav_pcm16

        t = np.linspace(0, 1, 16000, endpoint=False)
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        out = RawCodec().decode_audio(encode_wav_pcm16(sig, 16000), {})
        assert len(out) == 16000
        assert np.abs(out - sig).max() < 1e-3  # 16-bit quantization error only

    def test_rgb24_video_stride(self):
        from documentprocessor_ray.stages.multimodal import RawCodec

        frames = np.arange(5 * 4 * 4 * 3, dtype=np.uint8).reshape(5, 4, 4, 3)
        got = RawCodec().decode_video_frames(
            frames.tobytes(), {"height": 4, "width": 4}, stride=2)
        assert len(got) == 3
        assert np.array_equal(got[0], frames[0]) and np.array_equal(got[2], frames[4])

    def test_real_decode_through_ray_stage(self, ray_session):
        """BMP/WAV assets flow through the actual actor-pool stages with
        AutoCodec — the real (non-fake) decode path runs distributed."""
        from documentprocessor_ray.stages.multimodal import (
            MEDIA_SCHEMA, AutoCodec, build_media_pipeline, encode_bmp,
            encode_wav_pcm16)

        rng = np.random.default_rng(3)
        rows = []
        for i in range(4):
            img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
            rows.append({"asset_id": f"img-{i}", "kind": "image",
                         "payload": encode_bmp(img),
                         "meta": {"format": "bmp", "width": 16, "height": 16,
                                  "sample_rate": 0, "n_frames": 0}})
            rows.append({"asset_id": f"aud-{i}", "kind": "audio",
                         "payload": encode_wav_pcm16(
                             rng.standard_normal(4096) * 0.2, 16000),
                         "meta": {"format": "wav", "width": 0, "height": 0,
                                  "sample_rate": 16000, "n_frames": 0}})
        # one unsupported compressed asset -> in-band error, not a crash
        rows.append({"asset_id": "img-png", "kind": "image", "payload": b"\x89PNG",
                     "meta": {"format": "png", "width": 8, "height": 8,
                              "sample_rate": 0, "n_frames": 0}})
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
        imgs = build_media_pipeline(ds, "image", codec=AutoCodec()).to_pandas()
        auds = build_media_pipeline(ds, "audio", codec=AutoCodec()).to_pandas()
        ok_imgs = imgs[imgs["error"].isna()]
        assert len(ok_imgs) == 4 and set(ok_imgs["width"]) == {16}
        bad = imgs[imgs["asset_id"] == "img-png"].iloc[0]
        assert "not available" in bad["error"]
        assert len(auds) == 4 and (auds["n_samples"] == 4096).all()
