"""Config loader (S4), CLI driver (S3), debug sink (S7), event log (S8)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from documentprocessor_ray.config import JobConfig, load_config, _merge
from documentprocessor_ray.stages.debug import log_event, read_events, save_page


class TestConfig:
    def test_defaults(self):
        cfg = load_config()
        assert cfg.batch_size == 64
        assert cfg.preprocess.deskew is True

    def test_yaml_recursive_merge(self, tmp_path):
        p = tmp_path / "job.yaml"
        p.write_text(
            "batch_size: 8\npreprocess:\n  deskew: false\n  contrast: linear\n")
        cfg = load_config(str(p))
        assert cfg.batch_size == 8
        assert cfg.preprocess.deskew is False
        assert cfg.preprocess.contrast == "linear"
        assert cfg.preprocess.denoise is True  # untouched default survives

    def test_cli_overrides_win(self, tmp_path):
        p = tmp_path / "job.yaml"
        p.write_text("batch_size: 8\noutput_dir: /a\n")
        cfg = load_config(str(p), overrides={"batch_size": 4, "output_dir": None})
        assert cfg.batch_size == 4
        assert cfg.output_dir == "/a"  # None override ignored

    def test_unknown_keys_rejected(self, tmp_path):
        p = tmp_path / "bad.yaml"
        p.write_text("nope: 1\n")
        with pytest.raises(ValueError, match="unknown config keys"):
            load_config(str(p))
        p.write_text("preprocess:\n  nope: 1\n")
        with pytest.raises(ValueError, match="unknown preprocess keys"):
            load_config(str(p))

    def test_merge_nested(self):
        assert _merge({"a": {"x": 1, "y": 2}, "b": 1}, {"a": {"y": 3}}) == \
            {"a": {"x": 1, "y": 3}, "b": 1}


class TestCli:
    def test_missing_dirs_exit_code(self, capsys):
        from documentprocessor_ray.run import main
        assert main([]) == 2

    def test_cli_runs_partitioned(self, ray_session, small_corpus, tmp_path):
        from documentprocessor_ray.run import main

        docs_dir, media_dir = small_corpus
        out = str(tmp_path / "out")
        rc = main(["--documents-dir", docs_dir, "--media-dir", media_dir,
                   "--output-dir", out, "--max-partitions", "1"])
        assert rc == 0
        assert os.path.isdir(os.path.join(out, "_manifest"))


class TestDebugSink:
    def test_save_page_roundtrip(self, tmp_path):
        img = np.full((20, 30), 255, dtype=np.uint8)
        words = [{"text": "HI", "box": [1, 2, 3, 4], "confidence": 0.9}]
        save_page(str(tmp_path), "ref-1", img, words)
        assert os.path.exists(tmp_path / "ref-1.pre.npz8")
        with open(tmp_path / "ref-1.words.json") as f:
            rec = json.load(f)
        assert rec["n_words"] == 1 and rec["words"][0]["text"] == "HI"

    def test_event_log(self, tmp_path):
        log_event(str(tmp_path), "batch_done", rows=5)
        log_event(str(tmp_path), "batch_done", rows=7)
        log_event(None, "ignored")  # no-op
        evts = read_events(str(tmp_path))
        assert [e["rows"] for e in evts] == [5, 7]

    def test_debug_tee_in_pipeline(self, ray_session, small_corpus, tmp_path):
        from documentprocessor_ray.pipelines.extract import run_extraction

        docs_dir, media_dir = small_corpus
        dbg = str(tmp_path / "dbg")
        log = str(tmp_path / "log")
        n = run_extraction(docs_dir, media_dir, debug_dir=dbg, log_dir=log).count()
        assert n > 0
        pages = [f for f in os.listdir(dbg) if f.endswith(".pre.npz8")]
        assert len(pages) > 0
        evts = read_events(log)
        assert sum(e["media"] for e in evts) == len(pages)

        # reference-parity step artifacts (debug_output.py:24-339): numbered
        # per-step PNGs + bbox overlay + debug_summary.json per media span
        ref = pages[0][: -len(".pre.npz8")]
        summaries = [f for f in os.listdir(dbg)
                     if f == ref + ".debug_summary.json"]
        assert summaries, os.listdir(dbg)
        with open(os.path.join(dbg, summaries[0])) as f:
            summary = json.load(f)
        assert summary["steps"][0] == "source"
        assert "preprocessed_final" in summary["steps"]
        assert summary["steps"][-1] == "ocr_bboxes"
        for fn in summary["files"]:
            assert os.path.exists(os.path.join(dbg, fn)), fn
        # the step PNGs are real PNGs (decodable by the in-repo decoder)
        from documentprocessor_ray.stages.multimodal import RealCodec

        png = next(f for f in summary["files"] if f.endswith("_source.png"))
        with open(os.path.join(dbg, png), "rb") as f:
            img = RealCodec().decode_image(f.read(), {})
        assert img.ndim == 3 and img.shape[2] == 3
