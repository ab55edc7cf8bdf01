"""Property tests for the round-4b pure kernels: SemDeDup's greedy keep,
the VP8L prefix-code machinery, the corpus-LM references, and the
triangle-count reference — all Ray-free."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


class TestGreedyKeep:
    @given(st.integers(2, 24), st.integers(2, 6), st.integers(0, 2**31))
    @settings(max_examples=40, deadline=None)
    def test_maximal_independent_set(self, n, d, seed):
        from documentprocessor_ray.functions.clustering import (
            _greedy_keep, _quantize_rows)

        rng = np.random.default_rng(seed)
        scale = 1 << 20
        tau_scaled = (400_000 * scale * scale) // 1_000_000
        qx = _quantize_rows(rng.normal(size=(n, d)), scale)
        vids = rng.permutation(n * 3)[:n].astype(np.int64)
        keep = _greedy_keep(vids, qx, tau_scaled)
        kept = np.flatnonzero(keep)
        # independence: no kept pair is tau-close
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                assert int(qx[kept[i]] @ qx[kept[j]]) < tau_scaled
        # maximality + witness order: every dropped row has a kept
        # witness with SMALLER vec_id
        for i in np.flatnonzero(~keep):
            assert any(int(qx[i] @ qx[k]) >= tau_scaled
                       and vids[k] < vids[i] for k in kept)

    @given(st.integers(0, 2**31))
    @settings(max_examples=20, deadline=None)
    def test_row_order_invariant(self, seed):
        """The keep decision depends on vec_id order, not input layout."""
        from documentprocessor_ray.functions.clustering import (
            _greedy_keep, _quantize_rows)

        rng = np.random.default_rng(seed)
        scale = 1 << 20
        tau = (400_000 * scale * scale) // 1_000_000
        qx = _quantize_rows(rng.normal(size=(12, 4)), scale)
        vids = np.arange(12, dtype=np.int64)
        base = {int(v): bool(k)
                for v, k in zip(vids, _greedy_keep(vids, qx, tau))}
        perm = rng.permutation(12)
        got = {int(v): bool(k) for v, k in
               zip(vids[perm], _greedy_keep(vids[perm], qx[perm], tau))}
        assert got == base


class TestVp8lPrefix:
    def test_copy_val_len_sym_roundtrip(self):
        from documentprocessor_ray.stages.multimodal import (
            _LsbReader, _LsbWriter, _vp8l_copy_val, _vp8l_len_sym)

        for length in range(1, 25):
            sym, extra_bits, extra = _vp8l_len_sym(length)
            bw = _LsbWriter()
            bw.put(extra, extra_bits)
            br = _LsbReader(bw.getvalue() or b"\x00")
            assert _vp8l_copy_val(sym, br) == length

    @given(st.lists(st.integers(0, 0), min_size=2, max_size=2))
    @settings(max_examples=1, deadline=None)
    def test_fixed_green_layout_is_complete(self, _):
        """Kraft sum of the encoder's fixed green/distance layouts == 1."""
        for cache in (0, 2, 16, 2048):
            galph = 280 + cache
            n8 = 512 - galph
            assert n8 * 2**-8 + (galph - n8) * 2**-9 == 1.0
        assert 24 * 2**-5 + 16 * 2**-6 == 1.0

    def test_canonical_table_prefix_free(self):
        from documentprocessor_ray.stages.multimodal import _vp8l_table

        lengths = [0] * 280
        for s in range(232):
            lengths[s] = 8
        for s in range(232, 280):
            lengths[s] = 9
        table = _vp8l_table(lengths)
        assert len(table) == 280
        codes = sorted((ln, code) for (ln, code) in table)
        # prefix-freedom: no code is a prefix of a longer one
        seen = set()
        for ln, code in codes:
            for sl, sc in seen:
                assert code >> (ln - sl) != sc
            seen.add((ln, code))


class TestWebpRoundTripProperty:
    @given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**31),
           st.booleans(), st.sampled_from([0, 3, 6]), st.booleans())
    @settings(max_examples=15, deadline=None)
    def test_exact(self, h, w, seed, sg, cache, rle):
        from documentprocessor_ray.stages.multimodal import (
            _webp_decode, encode_webp_lossless)

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = _webp_decode(encode_webp_lossless(
            img, subtract_green=sg, cache_bits=cache, rle=rle))
        assert (out == img).all()


class TestCorpusLmReferences:
    @given(st.lists(st.text(alphabet="ab cd", max_size=30),
                    min_size=2, max_size=8))
    @settings(max_examples=25, deadline=None)
    def test_identical_docs_score_identically(self, texts):
        from documentprocessor_ray.functions.textstats import (
            bigram_surprisal_reference)

        texts = texts + [texts[0]]  # force a duplicate pair
        rows = {r[0]: r[1:] for r in bigram_surprisal_reference(
            list(range(len(texts))), texts)}
        if 0 in rows:
            assert rows[len(texts) - 1] == rows[0]

    @given(st.lists(st.text(alphabet="xy z", min_size=3, max_size=20),
                    min_size=2, max_size=6),
           st.lists(st.booleans(), min_size=2, max_size=6))
    @settings(max_examples=25, deadline=None)
    def test_dsir_token_counts(self, texts, flags):
        from documentprocessor_ray.functions.textstats import (
            dsir_logweight_reference)

        flags = (flags * 6)[:len(texts)]
        if not any(flags):
            flags[0] = True
        rows = dsir_logweight_reference(
            list(range(len(texts))), texts, [int(f) for f in flags])
        for did, n_tok, _ in rows:
            toks = [t for t in texts[did].lower().split() if t]
            assert n_tok == len(toks) and n_tok >= 1


class TestTriangleReferenceProps:
    @given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                    min_size=1, max_size=80),
           st.integers(0, 2**31))
    @settings(max_examples=40, deadline=None)
    def test_edge_order_and_duplication_invariant(self, pairs, seed):
        from documentprocessor_ray.functions.graph import (
            triangle_counts_reference)

        base = triangle_counts_reference(pairs)
        rng = np.random.default_rng(seed)
        noisy = [pairs[i] for i in rng.permutation(len(pairs))]
        noisy += [(b, a) for a, b in pairs[: len(pairs) // 2]]  # reversed
        noisy += pairs[:3]  # duplicates
        assert triangle_counts_reference(noisy) == base
        assert sum(base.values()) % 3 == 0
