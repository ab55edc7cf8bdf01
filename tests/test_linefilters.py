"""Line-level filter family: Gopher rules, C4 line filtering, cross-doc
line dedup (functions/linefilters.py)."""

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from documentprocessor_ray.functions.linefilters import (
    _segsum, c4_stats_batch, gopher_stats_batch, line_dedup,
    lined_text_batch)


def _batch(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())})


class TestSegsum:
    def test_empty_segments_are_zero(self):
        v = np.array([1, 2, 3], np.int64)
        lens = np.array([0, 2, 0, 1, 0], np.int64)
        assert list(_segsum(v, lens)) == [0, 3, 0, 3, 0]

    def test_all_empty(self):
        assert list(_segsum(np.zeros(0), np.array([0, 0]))) == [0, 0]
        assert len(_segsum(np.zeros(0), np.zeros(0, np.int64))) == 0


class TestLinedDerivation:
    def test_three_token_lines_and_decorations(self):
        # doc_id 0: bullet at i=0 (0%11==0), suffix m=(0+i)%7
        out = lined_text_batch(
            _batch([(0, "a b c d e")]), decorate=True)
        lines = out["text"][0].as_py().split("\n")
        # base lines + lorem (0%97==0) + brace (0%89==0)
        assert lines[0] == "- a b c ..."   # bullet + m=0 suffix
        assert lines[1] == "d e."          # m=1 -> '.'
        assert lines[2] == "lorem ipsum dolor"
        assert lines[3] == "{ }"

    def test_undecorated(self):
        out = lined_text_batch(_batch([(0, "a b c d")]), decorate=False)
        assert out["text"][0].as_py() == "a b c\nd"

    def test_empty_doc(self):
        out = lined_text_batch(_batch([(5, "   ")]), decorate=True)
        assert out["text"][0].as_py() == ""


class TestGopherStats:
    def test_hand_computed_counts(self):
        # two lines: "- the cat sat." / "of mat ..."
        txt = "- the cat sat.\nof mat ..."
        got = gopher_stats_batch(_batch([(7, txt)])).to_pylist()[0]
        assert got["n_lines"] == 2
        assert got["n_tokens"] == 4 + 3          # '-','the','cat','sat.' | 'of','mat','...'
        assert got["sum_tok_chars"] == (1 + 3 + 3 + 4) + (2 + 3 + 3)
        assert got["n_alpha_tok"] == 5           # '-' and '...' have no letters
        assert got["n_stop8"] == 2               # 'the', 'of'
        assert got["n_bullet"] == 1
        assert got["n_ellipsis_end"] == 1
        assert got["n_ellipsis"] == 1
        assert got["keep"] == 0                  # n_tokens < 50

    def test_keep_requires_all_rules(self):
        # 60 tokens, mean len ok, 2 stop words, no symbols -> keep
        words = ["the", "with"] + ["word"] * 58
        lines = [" ".join(words[i:i + 3]) for i in range(0, 60, 3)]
        got = gopher_stats_batch(
            _batch([(1, "\n".join(lines))])).to_pylist()[0]
        assert got["n_tokens"] == 60 and got["keep"] == 1
        # same doc but only one stop word -> dropped
        words2 = ["the"] + ["word"] * 59
        lines2 = [" ".join(words2[i:i + 3]) for i in range(0, 60, 3)]
        got2 = gopher_stats_batch(
            _batch([(1, "\n".join(lines2))])).to_pylist()[0]
        assert got2["keep"] == 0

    def test_empty_doc_zero_row(self):
        got = gopher_stats_batch(_batch([(3, "")])).to_pylist()[0]
        assert got["n_lines"] == 0 and got["n_tokens"] == 0
        assert got["keep"] == 0


class TestC4Stats:
    def test_terminal_punct_and_min_words(self):
        txt = "one two three.\nshort.\nno terminal here\nfour five six!"
        got = c4_stats_batch(_batch([(2, txt)])).to_pylist()[0]
        assert got["n_lines"] == 4
        assert got["n_kept"] == 2  # line 1 and line 4
        exp = hashlib.md5("one two three.\nfour five six!".encode()) \
            .hexdigest()
        assert got["clean_md5"] == exp
        assert got["keep_doc"] == 0  # n_kept < 3

    def test_lorem_and_brace_flags(self):
        txt = "aaa bbb ccc.\nhas lorem ipsum inside.\nxx { yy zz."
        got = c4_stats_batch(_batch([(2, txt)])).to_pylist()[0]
        assert got["has_lorem"] == 1 and got["has_brace"] == 1
        assert got["keep_doc"] == 0

    def test_empty_doc(self):
        got = c4_stats_batch(_batch([(2, "")])).to_pylist()[0]
        assert got["n_kept"] == 0
        assert got["clean_md5"] == hashlib.md5(b"").hexdigest()


class TestLineDedup:
    def _ds(self, rows, blocks=None):
        ds = ray.data.from_arrow(_batch(rows))
        if blocks:
            ds = ds.repartition(blocks)
        return ds

    def test_cross_doc_lines_dropped_everywhere(self, ray_session):
        rows = [
            (1, "shared line\nunique one"),
            (2, "shared line\nunique two"),
            (3, "only here\nalso only here"),
        ]
        got = {r["doc_id"]: r for r in
               line_dedup(self._ds(rows)).take_all()}
        assert got[1]["n_dropped"] == 1 and got[2]["n_dropped"] == 1
        assert got[3]["n_dropped"] == 0
        assert got[1]["clean_md5"] == \
            hashlib.md5(b"unique one").hexdigest()
        assert got[3]["clean_md5"] == \
            hashlib.md5(b"only here\nalso only here").hexdigest()

    def test_within_doc_repeat_is_not_a_dup(self, ray_session):
        rows = [(1, "same\nsame\nother")]
        got = line_dedup(self._ds(rows)).take_all()[0]
        assert got["n_dropped"] == 0 and got["n_lines"] == 3

    def test_empty_doc_emits_row(self, ray_session):
        rows = [(9, ""), (1, "a line")]
        got = {r["doc_id"]: r for r in
               line_dedup(self._ds(rows)).take_all()}
        assert got[9]["n_lines"] == 0
        assert got[9]["clean_md5"] == hashlib.md5(b"").hexdigest()

    def test_parallelism_invariant(self, ray_session):
        rows = [(i, f"common line\ndoc {i} text") for i in range(20)]
        a = sorted(map(tuple, (
            (r["doc_id"], r["n_lines"], r["n_dropped"], r["clean_md5"])
            for r in line_dedup(self._ds(rows, blocks=1)).take_all())))
        b = sorted(map(tuple, (
            (r["doc_id"], r["n_lines"], r["n_dropped"], r["clean_md5"])
            for r in line_dedup(self._ds(rows, blocks=8)).take_all())))
        assert a == b
        assert all(t[2] == 1 for t in a)  # 'common line' dropped from all


class TestQueriesVsDuckdb:
    def test_all_three_match_twins_at_sf0001(self, ray_session):
        import duckdb

        from documentprocessor_ray.pipelines.analysis import (
            ORACLE_SQL, QUERIES)

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{sf}/documents.parquet')")
        for name in ["gopher_rules", "c4_rules", "line_dedup"]:
            mine = QUERIES[name](sf).to_pandas()
            exp = con.execute(ORACLE_SQL[name]).df()
            mine = mine[sorted(mine.columns)] \
                .sort_values("doc_id").reset_index(drop=True)
            exp = exp[sorted(exp.columns)] \
                .sort_values("doc_id").reset_index(drop=True)
            assert list(mine.columns) == list(exp.columns), name
            for c in mine.columns:
                assert list(mine[c]) == list(exp[c]), f"{name}.{c}"
