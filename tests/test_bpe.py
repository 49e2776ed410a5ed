"""BPE trainer/encoder (operators/bpe.py): golden merges on a tiny
corpus, encode/learn round-trip invariants, Spark-vs-python parity of
the pandas-UDF encoder, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_train,
    encode_word,
    learn_merges,
    vocab_from_merges,
    word_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_learn_merges_golden():
    # "low lower lowest", weighted: 'lo' dominates, then 'low'
    freqs = {"low": 5, "lower": 2, "lowest": 2}
    merges = learn_merges(freqs, 3)
    # ('l','o') and ('o','w') tie at count 9; the deterministic
    # tiebreak (lexicographic max) picks ('o','w') first
    assert merges[0] == ("o", "w")
    assert merges[1] == ("l", "ow")
    # third merge: 'low</w>' (count 5) beats 'low'+'e' (count 4)
    assert merges[2] == ("low", END)


def test_learn_merges_stops_at_singletons():
    # nothing repeats twice -> no merges memorized
    assert learn_merges({"ab": 1, "cd": 1}, 10) == []


def test_encode_word_applies_merge_order():
    freqs = {"low": 5, "lower": 2, "lowest": 2}
    ranks = {p: i for i, p in enumerate(learn_merges(freqs, 3))}
    assert encode_word("low", ranks) == ["low" + END]
    assert encode_word("lower", ranks) == ["low", "e", "r", END]
    # unseen word with no applicable merge stays at the char level
    assert encode_word("lox", ranks) == ["l", "o", "x", END]


def test_word_counts_bounded_agg(spark):
    docs = spark.createDataFrame(
        [(1, "a b b"), (2, "B a  "), (3, None), (4, "")],
        "doc_id long, text string",
    )
    got = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    assert got == {"a": 2, "b": 3}


def test_bpe_train_and_encode_spark_parity(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    merges = bpe_train(docs, n_merges=40)
    assert 1 <= len(merges) <= 40
    # determinism: same corpus -> identical merge table
    assert merges == bpe_train(docs, n_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}
    out = bpe_encode(docs, merges).select("doc_id", "text", "bpe_tokens")
    rows = out.collect()
    assert len(rows) == 60
    for r in rows[:10]:
        # parity with the python reference encoder
        expect = []
        for w in (r["text"] or "").lower().split():
            expect.extend(encode_word(w, ranks))
        assert list(r["bpe_tokens"]) == expect
        # lossless: concatenating tokens restores the normalized words
        joined = "".join(r["bpe_tokens"]).replace(END, " ").split()
        assert joined == (r["text"] or "").lower().split()


def test_vocab_from_merges():
    merges = [("l", "o"), ("lo", "w")]
    assert vocab_from_merges(merges) == ["lo", "low"]


def test_bpe_lossless_property():
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abcdef", min_size=1, max_size=8)

    @given(words=st.lists(word, min_size=1, max_size=30), n_merges=st.integers(0, 30))
    @settings(max_examples=50, deadline=None)
    def check(words, n_merges):
        freqs: dict[str, int] = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + 1
        merges = learn_merges(dict(freqs), n_merges)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in set(words):
            toks = encode_word(w, ranks)
            # lossless: tokens concatenate back to word + terminator
            assert "".join(toks) == w + END
            # every non-trivial token is either a char, the terminator,
            # or a product of the learned merges
            vocab = set("abcdef") | {END} | set(vocab_from_merges(merges))
            # tokens may be char+END fusions only via a learned merge
            for t in toks:
                assert t in vocab, (t, merges)

    check()


def test_bpe_train_vocab_cap(spark):
    """The max_vocab driver-collect cap (100 TB contract): at gate scale
    the default 1e6 cap is a no-op — merges identical to the uncapped
    collect — and a small cap trains on exactly the deterministic top-V
    head (count desc, word asc), matching the python model."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    uncapped = bpe_train(docs, n_merges=25, max_vocab=None)
    assert bpe_train(docs, n_merges=25) == uncapped  # default cap no-op

    head = sorted(
        ((r["word"], r["n"]) for r in word_counts(docs, min_count=2).collect()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:30]
    want = learn_merges(dict(head), 25)
    assert bpe_train(docs, n_merges=25, max_vocab=30) == want
