"""WordPiece tokenizer (functions/wordpiece.py): bit-equality between the
distributed learn and the single-process reference at two parallelism
levels on BOTH paths; greedy longest-prefix encode properties."""

import pyarrow as pa
import pytest

import ray
import ray.data

from documentprocessor_ray.functions.wordpiece import (
    UNK, WordPieceEncoder, corpus_alphabet, corpus_alphabet_reference,
    encode_word, learn_wordpiece, learn_wordpiece_reference, wordpiece_vocab,
    wordpiece_encode_reference)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps all day",
    "quick quick fox fox fox",
    "unbelievable underdog undone",
    None, "", "   \t ",
    "a dog a fox a day",
] * 3


def _rows():
    return [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]


class TestLearn:
    def test_both_paths_match_reference_at_two_parallelisms(self, ray_session):
        want = learn_wordpiece_reference(TEXTS, n_merges=8)
        assert len(want) == 8
        for sv in (None, 1_000_000):  # iterative path, short-circuit path
            a = learn_wordpiece(ray.data.from_items(_rows()).repartition(1),
                                n_merges=8, small_vocab_rows=sv)
            b = learn_wordpiece(ray.data.from_items(_rows()).repartition(7),
                                n_merges=8, small_vocab_rows=sv)
            assert a == want, f"sv={sv} repartition(1)"
            assert b == want, f"sv={sv} repartition(7)"

    def test_objective_differs_from_bpe(self):
        # likelihood-gain argmax must not equal count argmax on this corpus
        from documentprocessor_ray.functions.bpe import learn_bpe_reference
        wp = learn_wordpiece_reference(TEXTS, n_merges=8)
        bpe = learn_bpe_reference(TEXTS, n_merges=8)
        assert [m[:2] for m in wp] != [m[:2] for m in bpe]

    def test_alphabet_matches_reference(self, ray_session):
        got = corpus_alphabet(ray.data.from_items(_rows()).repartition(5))
        assert got == corpus_alphabet_reference(TEXTS)


class TestEncode:
    VOCAB = wordpiece_vocab([("q", "u", 1), ("qu", "ick", 1),
                             ("i", "ck", 1)], list("quickbrown"))

    def test_longest_prefix_greedy(self):
        assert encode_word("quick", self.VOCAB) == ["quick"]
        assert encode_word("quickbrown", self.VOCAB) == [
            "quick", "##b", "##r", "##o", "##w", "##n"]

    def test_unk_on_unmatchable_tail(self):
        assert encode_word("quickz", self.VOCAB) == [UNK]

    def test_unk_on_overlong_word(self):
        assert encode_word("q" * 65, self.VOCAB) == [UNK]

    def test_encoder_batch_matches_reference(self):
        merges = learn_wordpiece_reference(TEXTS, n_merges=8)
        alpha = corpus_alphabet_reference(TEXTS)
        enc = WordPieceEncoder(merges, alpha)
        b = pa.table({
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string())})
        got = [(r["doc_id"], r["n_wp_tokens"], r["n_words"], r["n_unk"])
               for r in enc(b).to_pylist()]
        assert got == wordpiece_encode_reference(
            list(range(len(TEXTS))), TEXTS, merges, alpha)

    def test_no_unk_on_training_corpus(self):
        merges = learn_wordpiece_reference(TEXTS, n_merges=8)
        alpha = corpus_alphabet_reference(TEXTS)
        rows = wordpiece_encode_reference(
            list(range(len(TEXTS))), TEXTS, merges, alpha)
        assert all(r[3] == 0 for r in rows)  # full char coverage => no UNK
