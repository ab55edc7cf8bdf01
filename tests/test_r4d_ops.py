"""Round-4d operators: WebDataset tar-shard source, interleaved
multimodal sequence packing."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["web"] * len(texts)),
        "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    p = str(tmp_path / "documents.parquet")
    pq.write_table(t, p)
    return p


class TestWdsSource:
    def test_round_trip_preserves_bytes(self, ray_session, tmp_path):
        from documentprocessor_ray.sources.wds import (
            read_wds, write_wds_shards)

        texts = ['plain', 'quote " and \\ backslash', 'newline\nin text',
                 'unicode: café 中文', 'tab\there', '']
        p = _write_docs(tmp_path, texts)
        d = write_wds_shards(p, str(tmp_path / "shards"), num_shards=3)
        got = sorted((r["doc_id"], r["text"], r["n_chars"])
                     for r in read_wds(d).take_all())
        assert got == sorted(
            (i, t, len(t)) for i, t in enumerate(texts))

    def test_shard_bytes_are_bit_reproducible(self, tmp_path):
        from documentprocessor_ray.sources.wds import write_wds_shards

        p = _write_docs(tmp_path, ["alpha", "beta", "gamma"])
        d1 = write_wds_shards(p, str(tmp_path / "a"), num_shards=2)
        d2 = write_wds_shards(p, str(tmp_path / "b"), num_shards=2)
        for f in sorted(os.listdir(d1)):
            if not f.endswith(".tar"):
                continue
            b1 = open(os.path.join(d1, f), "rb").read()
            b2 = open(os.path.join(d2, f), "rb").read()
            assert b1 == b2

    def test_parse_counts_unknown_members(self, tmp_path):
        import io
        import tarfile

        from documentprocessor_ray.sources.wds import parse_wds_bytes

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, payload in (
                    ("000000000007.txt", b"seven"),
                    ("000000000007.json",
                     b'{"doc_id":7,"source":"web","lang":"en",'
                     b'"n_chars":5}'),
                    ("000000000007.jpg", b"\xff\xd8opaque")):
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
        one = parse_wds_bytes(buf.getvalue())
        assert one["doc_id"] == [7]
        assert one["text"] == ["seven"]
        assert one["n_extra_members"] == [1]

    def test_orphan_members_emit_no_row(self, tmp_path):
        import io
        import tarfile

        from documentprocessor_ray.sources.wds import parse_wds_bytes

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            info = tarfile.TarInfo(name="000000000009.txt")
            info.size = 4
            tf.addfile(info, io.BytesIO(b"lone"))
        one = parse_wds_bytes(buf.getvalue())
        assert one["doc_id"] == []

    def test_stale_marker_regenerates(self, ray_session, tmp_path):
        import time

        from documentprocessor_ray.sources.wds import (
            read_wds, write_wds_shards)

        p = _write_docs(tmp_path, ["old text"])
        d = write_wds_shards(p, str(tmp_path / "s2"))
        assert read_wds(d).take_all()[0]["text"] == "old text"
        time.sleep(0.01)
        _write_docs(tmp_path, ["new text"])
        write_wds_shards(p, str(tmp_path / "s2"))
        assert read_wds(d).take_all()[0]["text"] == "new text"


class TestInterleavedPack:
    def _pack(self, ids, texts):
        from documentprocessor_ray.functions.interleave import (
            interleaved_pack_batch)
        b = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        return interleaved_pack_batch(b).to_pylist()

    def test_vectorized_matches_explicit_simulation(self):
        import numpy as np

        from documentprocessor_ray.functions.interleave import (
            interleaved_pack_reference)

        rng = np.random.default_rng(42)
        words = ["alpha", "b", "ccc", "dd", "e"]
        ids, texts = [], []
        for i in range(400):
            n = int(rng.integers(0, 900))
            texts.append(" ".join(rng.choice(words, n)) if n
                         else ("" if i % 2 else "  \t "))
            ids.append(i)
        got = [(r["doc_id"], r["n_seqs"], r["n_text_tokens"],
                r["n_images"], r["n_pad_tokens"])
               for r in self._pack(ids, texts)]
        assert got == interleaved_pack_reference(ids, texts)

    def test_conservation_invariant(self):
        # every started sequence is exactly L long:
        # n_seqs*L == n_text + n_images*P + n_pad
        rows = self._pack(list(range(40)),
                          [" ".join(["w"] * (13 * i)) for i in range(40)])
        for r in rows:
            assert r["n_seqs"] * 256 == (r["n_text_tokens"]
                                         + r["n_images"] * 64
                                         + r["n_pad_tokens"])

    def test_empty_doc_no_images_emits_zero_sequences(self):
        (r,) = self._pack([0], [""])  # doc_id 0 -> m=0 images
        assert r["n_seqs"] == 0 and r["n_pad_tokens"] == 0

    def test_images_only_doc(self):
        # doc_id 3 -> 3 images, no text: 3*64=192 patches fit one 256-seq
        (r,) = self._pack([3], [""])
        assert (r["n_seqs"], r["n_images"], r["n_pad_tokens"]) == (1, 3, 64)

    def test_image_defers_when_room_too_small(self):
        # doc_id 1 -> 1 image after floor(n/2) tokens; choose n so the image
        # boundary lands with <64 room: n=500 -> image after 250 tokens,
        # room = 256-250%256 = 6 < 64 -> pad 6, image starts seq 2
        (r,) = self._pack([1], [" ".join(["w"] * 500)])
        # layout: 250 text, 6 pad | 64 img + 192 text | 58 text + 198 pad
        assert r["n_seqs"] == 3
        total = r["n_text_tokens"] + r["n_images"] * 64 + r["n_pad_tokens"]
        assert total == r["n_seqs"] * 256
        assert r["n_pad_tokens"] == 6 + 198
