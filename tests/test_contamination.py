"""Unit tests for functions/contamination.py (substring-level dedup)."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from documentprocessor_ray.functions.contamination import (
    _window_hashes, substring_dedup)


def test_window_hashes_equal_substrings_share_hashes():
    hs, off = _window_hashes(["abcdefghij", "XXabcdefghijYY", "shrt"], 5)
    a, b, c = hs[off[0]:off[1]], hs[off[1]:off[2]], hs[off[2]:off[3]]
    assert len(a) == 6 and len(b) == 10 and len(c) == 0
    assert set(a) <= set(b)  # every window of doc0 occurs inside doc1
    # windows never cross a doc boundary: the join seam "ijXX..." hash of
    # doc0+doc1 concatenation must not appear
    seam, _ = _window_hashes(["hijXX"], 5)
    assert seam[0] not in set(a) | set(b)


def test_window_hashes_empty_batch():
    hs, off = _window_hashes([], 5)
    assert len(hs) == 0 and list(off) == [0]
    hs, off = _window_hashes(["", ""], 5)
    assert len(hs) == 0 and list(off) == [0, 0, 0]


def test_substring_dedup_end_to_end(ray_session):
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog again ok",
            "the quick brown fox jumps over the lazy dog again ok",  # dup
            "completely different content with nothing shared at all",
            "prefix words then the quick brown fox jumps over the lazy dog",
            "tiny",
            "",
        ], pa.string()),
    })
    out = substring_dedup(ray.data.from_arrow(docs), k=20) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 6
    # exact duplicates: every window duplicated
    assert out.loc[0, "n_dup"] == out.loc[0, "n_kgrams"] > 0
    assert out.loc[1, "n_dup"] == out.loc[1, "n_kgrams"]
    # unique content: nothing duplicated
    assert out.loc[2, "n_dup"] == 0 and out.loc[2, "n_kgrams"] > 0
    # shared long substring: some but not all windows duplicated
    assert 0 < out.loc[3, "n_dup"] < out.loc[3, "n_kgrams"]
    # shorter than k: zero windows
    assert out.loc[4, "n_kgrams"] == 0 and out.loc[5, "n_kgrams"] == 0


def test_substring_dedup_counts_positions_not_distinct_windows(ray_session):
    # "abab...": doc0 repeats a window internally; it is duplicated across
    # docs, so EVERY position of it counts (matches the SQL twin's
    # per-position join semantics)
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["abcabcabc", "xxabcabcabcxx"], pa.string()),
    })
    out = substring_dedup(ray.data.from_arrow(docs), k=6) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc0: windows abcabc/bcabca/cabcab/abcabc -> 4 positions, all shared
    assert out.loc[0, "n_kgrams"] == 4 and out.loc[0, "n_dup"] == 4
    # doc1: 8 windows; only the 4 interior ones (no 'x') occur in doc0
    assert out.loc[1, "n_kgrams"] == 8 and out.loc[1, "n_dup"] == 4
