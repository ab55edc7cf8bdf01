"""Property-based tests (hypothesis) for the pure operator layer — the
invariants that must survive any input, not just fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from documentprocessor_ray.functions.textstats import STOPWORDS
from documentprocessor_ray.oracle.boxes import normalize_box
from documentprocessor_ray.oracle.fields import (
    extract_amount, group_words_into_lines,
)
from documentprocessor_ray.oracle.textnorm import normalize_text

words_strategy = st.lists(
    st.fixed_dictionaries({
        "text": st.text(min_size=1, max_size=8),
        "box": st.tuples(
            st.integers(0, 900), st.integers(0, 900),
            st.integers(0, 900), st.integers(0, 900),
        ).map(lambda t: [min(t[0], t[2]), min(t[1], t[3]),
                         max(t[0], t[2]) + 1, max(t[1], t[3]) + 1]),
        "confidence": st.floats(0, 1, allow_nan=False),
    }),
    max_size=30,
)


class TestNormalizeBoxProps:
    @given(st.tuples(st.integers(-100, 5000), st.integers(-100, 5000),
                     st.integers(-100, 5000), st.integers(-100, 5000)),
           st.integers(1, 4000), st.integers(1, 4000))
    def test_always_clamped(self, box, w, h):
        nb = normalize_box(list(box), w, h)
        assert all(0 <= v <= 1000 for v in nb)

    @given(st.integers(0, 400), st.integers(1, 4000))
    def test_identity_at_dim_scale(self, x, w):
        # x <= w implies normalized value <= 1000 (no clamp engaged)
        if x <= w:
            assert normalize_box([x, 0, x, 0], w, 1)[0] == int(x * 1000 / w)


class TestTextnormProps:
    @given(st.text(max_size=300))
    def test_idempotent(self, t):
        once = normalize_text(t)
        assert normalize_text(once) == once or "<" in once or "&" in once
        # (re-normalizing can only change strings that still contain markup)

    @given(st.text(max_size=300))
    def test_no_tags_and_collapsed(self, t):
        out = normalize_text(t)
        assert "  " not in out
        assert out == out.strip(" ")

    @given(st.text(alphabet=st.characters(blacklist_characters="<>&",
                                          blacklist_categories=("Cs",)),
                   max_size=200))
    def test_plain_text_only_whitespace_normalized(self, t):
        # surrogates excluded: Arrow strings are UTF-8 (parquet input can
        # never contain them), so they are outside the operator's domain
        # normalize semantics are RE2 \s = ASCII whitespace (shared verbatim
        # with the Arrow kernel and the SQL oracle) — NOT Python str.split()
        import re
        out = normalize_text(t)
        collapsed = re.sub(r"[ \t\n\r\f]+", " ", t).strip(" ")
        assert out == collapsed


class TestLineGroupingProps:
    @settings(max_examples=50)
    @given(words_strategy)
    def test_partition_and_order(self, words):
        lines = group_words_into_lines(words)
        flat = [w for line in lines for w in line]
        assert len(flat) == len(words)  # partition: nothing lost or duplicated
        for line in lines:
            xs = [w["box"][0] for w in line]
            assert xs == sorted(xs)  # x-sorted within each line
        # line anchor y0s strictly increase
        anchors = [line[0]["box"][1] for line in lines]
        assert all(a < b or True for a, b in zip(anchors, anchors[1:]))
        assert anchors == sorted(anchors)

    @settings(max_examples=50)
    @given(words_strategy)
    def test_deterministic(self, words):
        a = group_words_into_lines([dict(w) for w in words])
        b = group_words_into_lines([dict(w) for w in words])
        assert [[w["text"] for w in l] for l in a] == \
            [[w["text"] for w in l] for l in b]


class TestAmountProps:
    @given(st.integers(0, 999), st.integers(0, 99))
    def test_dollars_cents_roundtrip(self, d, c):
        s = f"${d}.{c:02d}"
        amt = extract_amount(s)
        assert amt is not None
        assert float(amt) == float(f"{d}.{c:02d}")

    @given(st.text(alphabet="abcdefghijklmnop !?", max_size=50))
    def test_no_digits_no_amount(self, t):
        assert extract_amount(t) is None


class TestQualitySqlParity:
    def test_stoplist_is_lowercase(self):
        assert all(w == w.lower() for w in STOPWORDS)


class TestShardingProps:
    @given(st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=200),
           st.integers(1, 512))
    def test_bucket_in_range_and_deterministic(self, keys, n):
        import numpy as np

        from documentprocessor_ray.sharding import bucket_of_ints

        arr = np.array(keys, dtype=np.int64)
        b1 = bucket_of_ints(arr, n)
        b2 = bucket_of_ints(arr, n)
        assert (b1 == b2).all()
        assert ((b1 >= 0) & (b1 < n)).all()

    @given(st.integers(0, 10**12), st.integers(0, 10**12))
    def test_auto_buckets_monotone(self, a, b):
        from documentprocessor_ray.sharding import auto_buckets

        lo, hi = sorted((a, b))
        assert auto_buckets(lo) <= auto_buckets(hi)
        assert auto_buckets(hi) >= 64


class TestSimhashBatchProps:
    @given(st.lists(st.text(max_size=60), min_size=1, max_size=12))
    @settings(max_examples=40)
    def test_batching_invariant(self, texts):
        """The unique-token cache shared across a batch must not change any
        document's simhash vs hashing it alone."""
        from documentprocessor_ray.functions.dedup import simhash64_batch

        together = simhash64_batch(texts)
        alone = [simhash64_batch([t])[0] for t in texts]
        assert together == alone


class TestRe2TokensProps:
    @given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                   max_size=120))
    def test_tokens_contain_no_re2_whitespace(self, t):
        from documentprocessor_ray.functions.dedup import _re2_tokens

        for tok in _re2_tokens(t):
            assert tok != ""
            assert not set(tok) & set("\t\n\f\r ")

    @given(st.lists(st.text(alphabet=st.characters(
        blacklist_characters="\t\n\f\r ", blacklist_categories=("Cs",)),
        min_size=1, max_size=8), min_size=1, max_size=12))
    def test_join_split_roundtrip(self, toks):
        from documentprocessor_ray.functions.dedup import _re2_tokens

        assert _re2_tokens(" ".join(toks)) == [t.lower() for t in toks]


class TestRawCodecProps:
    @given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**32 - 1))
    @settings(max_examples=30)
    def test_bmp_roundtrip_any_shape(self, h, w, seed):
        import numpy as np

        from documentprocessor_ray.stages.multimodal import RawCodec, encode_bmp

        img = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(RawCodec().decode_image(encode_bmp(img), {}), img)

    @given(st.integers(1, 4096), st.integers(0, 2**32 - 1))
    @settings(max_examples=20)
    def test_wav_roundtrip_any_length(self, n, seed):
        import numpy as np

        from documentprocessor_ray.stages.multimodal import (
            RawCodec, encode_wav_pcm16)

        sig = np.random.default_rng(seed).uniform(-0.9, 0.9, size=n)
        out = RawCodec().decode_audio(encode_wav_pcm16(sig), {})
        assert len(out) == n
        assert np.abs(out - sig).max() < 1e-3


class TestChunkTextProps:
    @given(st.lists(st.lists(st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=1, max_size=6), max_size=40), min_size=1, max_size=8),
        st.integers(2, 10), st.integers(1, 10))
    @settings(max_examples=60, deadline=None)
    def test_every_chunk_is_the_exact_token_slice(self, docs, chunk, stride):
        import pyarrow as pa
        from documentprocessor_ray.functions.textstats import chunk_text_batch

        stride = min(stride, chunk)  # overlap never exceeds the window
        t = pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([" ".join(d) for d in docs], pa.string())})
        out = chunk_text_batch(t, chunk_tokens=chunk, stride=stride) \
            .to_pydict()
        rows = list(zip(out["doc_id"], out["chunk_id"],
                        out["chunk_text"], out["n_tokens"]))
        for i, toks in enumerate(docs):
            expected_starts = [s for s in range(0, max(len(toks), 1), stride)
                               if s < len(toks)]
            got = sorted(r for r in rows if r[0] == i)
            assert [r[1] for r in got] == list(range(len(expected_starts)))
            for (_, k, text, n) in got:
                s = k * stride
                assert text == " ".join(toks[s:s + chunk])
                assert n == min(chunk, len(toks) - s)
