"""Unigram-LM tokenizer (functions/unigram.py): bit-equality between the
distributed quantized-EM learn and the single-process reference at two
parallelism levels, on BOTH the short-circuit and iterative paths; Viterbi
encode properties."""

import math

import pyarrow as pa
import pytest

import ray
import ray.data

from documentprocessor_ray.functions.unigram import (
    MICRO, UNK_ILOGP, UnigramEncoder, learn_unigram,
    learn_unigram_reference, unigram_encode_reference, viterbi_encode)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps all day",
    "quick quick fox fox fox",
    "over and over and over again",
    None, "", "   \t ",
    "a dog a fox a day",
    "lazy days and quick jumps",
] * 3

KW = dict(vocab_size=24, seed_size=64, max_piece_len=4, em_iters=2)


def _rows():
    return [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]


class TestLearn:
    def test_both_paths_match_reference_at_two_parallelisms(self, ray_session):
        want = learn_unigram_reference(TEXTS, **KW)
        assert want  # non-degenerate
        for sv in (None, 1_000_000):  # iterative path, short-circuit path
            a = learn_unigram(ray.data.from_items(_rows()).repartition(1),
                              small_vocab_rows=sv, **KW)
            b = learn_unigram(ray.data.from_items(_rows()).repartition(7),
                              small_vocab_rows=sv, **KW)
            assert a == want, f"path sv={sv} repartition(1)"
            assert b == want, f"path sv={sv} repartition(7)"

    def test_probability_mass_sums_to_one(self):
        scored = learn_unigram_reference(TEXTS, **KW)
        mass = sum(math.exp(lp / MICRO) for _, lp in scored)
        assert abs(mass - 1.0) < 1e-3

    def test_single_chars_always_present(self):
        scored = learn_unigram_reference(TEXTS, **KW)
        pieces = {p for p, _ in scored}
        corpus_chars = set("".join(t for t in TEXTS if t)) - {" ", "\t"}
        assert corpus_chars <= pieces


class TestViterbi:
    TAB = {"a": -2 * MICRO, "b": -2 * MICRO, "ab": -3 * MICRO,
           "abc": -4 * MICRO, "c": -2 * MICRO}

    def test_prefers_higher_score_segmentation(self):
        # "abc" as one piece: -4; "ab"+"c": -5; "a"+"b"+"c": -6
        n, s = viterbi_encode("abc", self.TAB, 3)
        assert (n, s) == (1, -4 * MICRO)

    def test_tie_prefers_longest_piece(self):
        tab = {"a": -1 * MICRO, "aa": -2 * MICRO}
        # "aa" = -2 either way; longest-last-piece tiebreak -> 1 token
        n, _ = viterbi_encode("aa", tab, 2)
        assert n == 1

    def test_unknown_char_floor(self):
        n, s = viterbi_encode("a!b", self.TAB, 3)
        assert n == 3
        assert s == -2 * MICRO + UNK_ILOGP + -2 * MICRO


class TestEncoder:
    def test_batch_matches_reference(self):
        scored = learn_unigram_reference(TEXTS, **KW)
        enc = UnigramEncoder(scored)
        b = pa.table({
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string())})
        got = [(r["doc_id"], r["n_unigram_tokens"], r["n_words"],
                r["ilogp_sum"]) for r in enc(b).to_pylist()]
        assert got == unigram_encode_reference(
            list(range(len(TEXTS))), TEXTS, scored)

    def test_tokens_at_most_chars(self):
        scored = learn_unigram_reference(TEXTS, **KW)
        enc = UnigramEncoder(scored)
        b = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["the quick dog"], pa.string())})
        (r,) = enc(b).to_pylist()
        assert 0 < r["n_unigram_tokens"] <= len("thequickdog")
        assert r["n_words"] == 3
