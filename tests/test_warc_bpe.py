"""WARC source round-trip + distributed BPE merge learning."""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from documentprocessor_ray.functions.bpe import (
    encode_word as _enc_word, learn_bpe, learn_bpe_reference, _merge_row)


def _merge_apply(word, ranks):
    return _enc_word(word, ranks)
from documentprocessor_ray.sources.warc import (
    _record_bytes, parse_warc_bytes, read_warc, write_warc_shards)

SF = "/root/testdata/sf0.001"


class TestWarcParse:
    def test_single_record_roundtrip(self):
        payload = "hello world".encode()
        rec = _record_bytes(7, "web", payload)
        out = parse_warc_bytes(rec)
        assert out["record_id"] == ["<urn:doc:00000007>"]
        assert out["warc_type"] == ["response"]
        assert out["target_uri"] == ["https://example.org/web/7"]
        assert out["payload"] == [payload]

    def test_payload_containing_blank_lines(self):
        # the reason the parser walks Content-Length instead of splitting
        # on CRLFCRLF: record boundaries may appear INSIDE a payload
        tricky = b"line1\r\n\r\nWARC/1.0\r\n\r\nline2"
        blob = _record_bytes(1, "a", tricky) + _record_bytes(2, "b", b"x")
        out = parse_warc_bytes(blob)
        assert out["payload"] == [tricky, b"x"]
        assert out["target_uri"] == ["https://example.org/a/1",
                                     "https://example.org/b/2"]

    def test_empty_payload(self):
        out = parse_warc_bytes(_record_bytes(3, "s", b""))
        assert out["payload"] == [b""]

    def test_truncated_tail_stops_cleanly(self):
        blob = _record_bytes(1, "a", b"data") + b"WARC/1.0\r\nWARC-T"
        out = parse_warc_bytes(blob)
        assert out["payload"] == [b"data"]
        assert out["n_skipped"] == 1

    def test_corrupt_record_resyncs_to_next_magic(self):
        # a record with garbage Content-Length must not take the shard
        # tail with it: the parser skips to the next WARC/1.0 magic
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: banana\r\n\r\njunk\r\n\r\n")
        blob = _record_bytes(1, "a", b"first") + bad \
            + _record_bytes(2, "b", b"second")
        out = parse_warc_bytes(blob)
        assert out["payload"] == [b"first", b"second"]
        assert out["n_skipped"] == 1

    def test_garbage_prefix_resyncs(self):
        blob = b"\x00\x01garbage" + _record_bytes(5, "s", b"ok")
        out = parse_warc_bytes(blob)
        assert out["payload"] == [b"ok"]
        assert out["n_skipped"] == 1

    def test_overrun_payload_dropped(self):
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: 99999\r\n\r\nshort")
        out = parse_warc_bytes(_record_bytes(1, "a", b"x") + rec)
        assert out["payload"] == [b"x"]
        assert out["n_skipped"] == 1


class TestWarcDistributed:
    def test_shards_deterministic_and_lossless(self, ray_session, tmp_path):
        docs = os.path.join(SF, "documents.parquet")
        d1 = write_warc_shards(docs, str(tmp_path / "w1"), num_shards=4)
        d2 = write_warc_shards(docs, str(tmp_path / "w2"), num_shards=4)
        for k in range(4):
            f = f"shard-{k:05d}.warc"
            with open(os.path.join(d1, f), "rb") as a, \
                 open(os.path.join(d2, f), "rb") as b:
                assert a.read() == b.read()

        rows = read_warc(d1).take_all()
        src = pq.read_table(docs, columns=["doc_id", "text"])
        want = {int(i): hashlib.md5((t or "").encode()).hexdigest()
                for i, t in zip(src["doc_id"].to_pylist(),
                                src["text"].to_pylist())}
        got = {int(r["record_id"].rsplit(":", 1)[-1].rstrip(">")):
               hashlib.md5(r["payload"]).hexdigest() for r in rows}
        assert got == want
        assert all(r["warc_type"] == "response" for r in rows)


class TestBpe:
    def test_merge_row(self):
        assert _merge_row(list("aabab"), "a", "b") == ["a", "ab", "ab"]
        assert _merge_row(["ab", "ab"], "ab", "ab") == ["abab"]
        assert _merge_row(list("aaa"), "a", "a") == ["aa", "a"]

    def test_reference_known_merges(self):
        # "abab" x3, "abc" x2 -> ('a','b') count 8 wins round 1;
        # round 2: ('ab','ab') 3 vs ('ab','c') 2 -> ('ab','ab')
        texts = ["abab abab abab abc abc"]
        m = learn_bpe_reference(texts, n_merges=2)
        assert m == [("a", "b", 8), ("ab", "ab", 3)]

    def test_reference_tiebreak_lexicographic(self):
        # "xy" and "ab" both occur twice -> ('a','b') wins the tie
        m = learn_bpe_reference(["xy xy ab ab"], n_merges=1)
        assert m == [("a", "b", 2)]

    def test_distributed_equals_reference_sf(self, ray_session):
        import ray.data
        docs = ray.data.read_parquet(os.path.join(SF, "documents.parquet"),
                                     columns=["doc_id", "text"])
        texts = pq.read_table(os.path.join(SF, "documents.parquet"),
                              columns=["text"])["text"].to_pylist()
        want = learn_bpe_reference(texts, n_merges=8)
        # short-circuit path (default) AND the full iterative path
        assert learn_bpe(docs, n_merges=8) == want
        assert learn_bpe(docs, n_merges=8, small_vocab_rows=None) == want

    def test_encode_word(self):
        ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "d"): 2}
        # rank order wins: 'ab' merges first, then 'ab'+'c', leftover 'd'
        assert _merge_apply("abcd", ranks) == ["abc", "d"]
        assert _merge_apply("xyz", ranks) == ["x", "y", "z"]
        assert _merge_apply("", ranks) == []

    def test_encoder_stage_matches_reference(self, ray_session):
        import re

        import ray.data

        from documentprocessor_ray.functions.bpe import BpeEncoder, encode_word
        texts = ["the cat sat", "the cat", "  ", "a mat the cat sat on"] * 3
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        merges = learn_bpe_reference(texts, n_merges=6)
        ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
        ws = re.compile(r"[\t\n\f\r ]+")

        def want(t):
            t = (t or "").strip("\t\n\f\r ").lower()
            wsp = ws.split(t) if t else []
            return sum(len(encode_word(w, ranks)) for w in wsp), len(wsp)

        for nparts in (1, 5):
            out = ray.data.from_items(rows).repartition(nparts).map_batches(
                BpeEncoder, fn_constructor_kwargs={"merges": merges},
                batch_format="pyarrow", concurrency=2).take_all()
            got = {r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
                   for r in out}
            assert got == {i: want(t) for i, t in enumerate(texts)}

    def test_distributed_parallelism_invariant(self, ray_session):
        import ray.data
        rows = [{"text": t} for t in
                ["the cat sat", "the cat", "a mat the cat sat on", ""]] * 5
        ref = learn_bpe_reference([r["text"] for r in rows], n_merges=6)
        for sv in (None, 1_000_000):
            a = learn_bpe(ray.data.from_items(rows).repartition(1),
                          n_merges=6, small_vocab_rows=sv)
            b = learn_bpe(ray.data.from_items(rows).repartition(7),
                          n_merges=6, small_vocab_rows=sv)
            assert a == b == ref
