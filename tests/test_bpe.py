"""BPE trainer/tokenizer goldens: the distributed trainer must reproduce a
pure-python reference exactly (deterministic tie-breaks), and the tokenizer
must round-trip (concatenating a word's pieces restores the word)."""

from __future__ import annotations

import collections

from gearpump_spark.operators.bpe import (
    bpe_encode_word,
    bpe_tokenize,
    bpe_train,
)


def _py_train(texts: list[str], n_merges: int, min_freq: int = 2, mark=None):
    """Reference trainer: word-type counts, weighted adjacent-pair
    frequencies, argmax with (freq DESC, pair lexicographic) tie-break.
    ``mark`` appends the Sennrich end-of-word boundary symbol."""
    wc = collections.Counter(w for t in texts for w in t.lower().split() if w)
    vocab = {w: list(w) + ([mark] if mark else []) for w in wc}
    merges = []
    for _ in range(n_merges):
        pf: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pf[(syms[i], syms[i + 1])] += wc[w]
        if not pf:
            break
        best = min(pf.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the quick brown fox the the",
]


def test_trainer_matches_pure_python_golden(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    got = bpe_train(docs, n_merges=12)
    want = _py_train(TEXTS, 12)
    assert got == want
    assert len(got) == 12  # corpus is rich enough to yield all 12


def test_trainer_left_to_right_nonoverlapping_runs(spark):
    """'aaaa' with merge (a,a): left-to-right pairing gives [aa, aa] — the
    fold rewrite must not re-merge the freshly created symbol."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id bigint, text string"
    )
    merges = bpe_train(docs, n_merges=2)
    assert merges == _py_train(["aaaa aaaa aaaa"], 2)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("aa", "aa")


def test_encode_word_greedy_rank_order():
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    assert bpe_encode_word("lower", ranks) == ["low", "er"]
    assert bpe_encode_word("low", ranks) == ["low"]
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z"]
    assert bpe_encode_word("a", ranks) == ["a"]


def test_tokenize_round_trips_and_compresses(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    merges = bpe_train(docs, n_merges=12)
    out = {r.doc_id: r for r in bpe_tokenize(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        r = out[i]
        assert r.n_ws_tokens == len(words)
        # pieces concatenate back to the original words, in order
        assert "".join(r.bpe_tokens) == "".join(words)
        # merges learned on this corpus must compress it
        assert r.n_bpe_tokens < sum(len(w) for w in words)
        assert r.n_bpe_tokens >= r.n_ws_tokens


def test_tokenize_applies_training_segmentation(spark):
    """Applying the learned table to the training corpus must reproduce
    the trainer's final vocabulary segmentation (greedy-by-rank ==
    iterative-merge-by-rank on words seen in training)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    merges = bpe_train(docs, n_merges=12)
    ranks = {p: i for i, p in enumerate(merges)}
    # rebuild the reference trainer's final segmentation
    wc = collections.Counter(w for t in TEXTS for w in t.lower().split())
    vocab = {w: list(w) for w in wc}
    for a, b in merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    for w, syms in vocab.items():
        assert bpe_encode_word(w, ranks) == syms, w


# Property test: the distributed trainer must agree with the pure-python
# reference on arbitrary small corpora (random words over a tiny alphabet
# maximize pair-frequency ties, stressing the deterministic tie-break).
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abc", min_size=1, max_size=6)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.lists(WORD, min_size=1, max_size=8), min_size=1, max_size=5))
def test_trainer_property_matches_reference(spark, corpora):
    texts = [" ".join(ws) for ws in corpora]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    assert bpe_train(docs, n_merges=6) == _py_train(texts, 6)


def test_end_of_word_variant_matches_reference_and_learns_word_units(spark):
    """The </w> variant: trainer matches the reference, learned merges can
    produce whole-word units distinct from prefixes, and the tokenizer
    round-trips with the boundary marker appended per word."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    merges = bpe_train(docs, n_merges=16, end_of_word="</w>")
    assert merges == _py_train(TEXTS, 16, mark="</w>")
    # boundary symbol participates in merges (word-final units learnable)
    assert any("</w>" in a or "</w>" in b for a, b in merges)
    out = {r.doc_id: r for r in bpe_tokenize(
        docs, merges, end_of_word="</w>").collect()}
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        assert "".join(out[i].bpe_tokens) == "".join(w + "</w>" for w in words)
    # "low" as a full word can end in low</w> while "lower" keeps "low"
    ranks = {p: r for r, p in enumerate(merges)}
    full = bpe_encode_word("low", ranks, end_of_word="</w>")
    prefix = bpe_encode_word("lower", ranks, end_of_word="</w>")
    assert full[-1].endswith("</w>") and prefix[-1].endswith("</w>")
    assert full != prefix[: len(full)]


def test_tokenizer_word_boundary_matches_trainer(spark):
    """The tokenizer must split EXACTLY like the trainer (WS_RE), not
    python str.split(): NBSP and vertical tab are word characters to the
    trainer, so they must be to the tokenizer too."""
    docs = spark.createDataFrame(
        [(0, "ab cd ab cd ef\x0bgh ef\x0bgh")],
        "doc_id bigint, text string",
    )
    merges = bpe_train(docs, n_merges=4, min_freq=2)
    out = bpe_tokenize(docs, merges).collect()[0]
    # NBSP/VT do not split: exactly 4 whitespace tokens, reconstructable
    assert out.n_ws_tokens == 4
    assert "".join(out.bpe_tokens) == "ab cdab cdef\x0bghef\x0bgh"


# --- byte-level (UTF-8 alphabet) variant -----------------------------------


def _py_train_bytes(texts: list[str], n_merges: int, min_freq: int = 2):
    """Reference byte-level trainer: case-preserving whitespace words,
    uppercase hex byte-pair symbols, same (freq DESC, pair lex)
    tie-break."""
    wc = collections.Counter(w for t in texts for w in t.split() if w)
    vocab = {}
    for w in wc:
        hx = w.encode("utf-8").hex().upper()
        vocab[w] = [hx[i : i + 2] for i in range(0, len(hx), 2)]
    merges = []
    for _ in range(n_merges):
        pf: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pf[(syms[i], syms[i + 1])] += wc[w]
        if not pf:
            break
        best = min(pf.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


BYTE_TEXTS = [
    "naïve café naïve café déjà vu",
    "日本語 テスト 日本語 naïve",
    "emoji 🚀 rocket 🚀 emoji 🚀",
    "Mixed CASE Mixed CASE plain plain",
]


def test_byte_level_trainer_matches_pure_python_golden(spark):
    from gearpump_spark.operators.bpe import bpe_train_bytes

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BYTE_TEXTS)], "doc_id bigint, text string"
    )
    got = bpe_train_bytes(docs, n_merges=15)
    want = _py_train_bytes(BYTE_TEXTS, 15)
    assert got == want
    assert len(got) > 0


def test_byte_level_round_trips_non_ascii(spark):
    """Every token spells the exact bytes it covers: concatenating a
    word's token hex and decoding reconstructs the word — for accents,
    CJK, and emoji alike; and case survives (no lowercase folding)."""
    from gearpump_spark.operators.bpe import (
        bpe_encode_word_bytes,
        bpe_tokenize_bytes,
        bpe_train_bytes,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BYTE_TEXTS)], "doc_id bigint, text string"
    )
    merges = bpe_train_bytes(docs, n_merges=15)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for word in ["naïve", "日本語", "🚀", "CASE", "unseen-wörd"]:
        toks = bpe_encode_word_bytes(word, ranks)
        assert bytes.fromhex("".join(toks)).decode("utf-8") == word
    out = {r.doc_id: r for r in bpe_tokenize_bytes(docs, merges).collect()}
    # per-doc piece stream reconstructs the case-preserved word stream
    for i, t in enumerate(BYTE_TEXTS):
        joined = bytes.fromhex("".join(out[i].bpe_tokens)).decode("utf-8")
        assert joined == "".join(t.split())
        assert out[i].n_ws_tokens == len(t.split())
        assert out[i].n_bpe_tokens >= out[i].n_ws_tokens  # hex runs split finer


def test_train_vocab_final_syms_is_the_tokenization(spark):
    """bpe_train_vocab's returned vocabulary must carry each word's final
    segmentation — identical to the greedy encoder on every trained word
    (the equivalence text_bpe_exact's oracle path relies on)."""
    from gearpump_spark.operators.bpe import bpe_train_vocab

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )
    merges, vocab = bpe_train_vocab(docs, n_merges=12)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = {r.word: list(r.syms) for r in vocab.collect()}
    assert rows  # trained on a non-empty corpus
    for w, syms in rows.items():
        assert bpe_encode_word(w, ranks) == syms, w
    # merge list identical to the plain trainer's
    assert merges == bpe_train(docs, n_merges=12)


def test_bpe_query_guards_long_tokens(spark):
    """The unrolled greedy oracle applies at most BPE_ORACLE_N_APPLY
    merges per word while the Spark encoder runs to fixpoint — a long
    repetitive token would be a SILENT cross-engine divergence, so the
    queries enforce max-token-length <= n_apply + 1 loudly (r8
    self-audit find)."""
    import pytest

    from gearpump_spark.queries.llm import (
        BPE_ORACLE_N_APPLY,
        _guard_bpe_token_length,
    )

    ok = spark.createDataFrame(
        [(1, "ab " * 5 + "cd")], "doc_id bigint, text string"
    )
    _guard_bpe_token_length(ok, chars=True)  # short tokens pass
    long_tok = spark.createDataFrame(
        [(1, "ab" * (BPE_ORACLE_N_APPLY // 2 + 2))],
        "doc_id bigint, text string",
    )
    with pytest.raises(ValueError, match="merges per word"):
        _guard_bpe_token_length(long_tok, chars=True)
    # byte-level counts UTF-8 octets: a multi-byte char trips it sooner
    wide = spark.createDataFrame(
        [(1, "é" * (BPE_ORACLE_N_APPLY // 2 + 2))],
        "doc_id bigint, text string",
    )
    with pytest.raises(ValueError, match="merges per word"):
        _guard_bpe_token_length(wide, chars=False)
    # ADVICE r8 #1: the trainer lowercases first, and some codepoints
    # EXPAND under lowering (U+0130 'İ' -> 'i' + COMBINING DOT ABOVE:
    # 1 char -> 2, 2 octets -> 3). The guard must measure the LOWERED
    # token or a raw-length check under-counts what the oracle segments.
    dotted = spark.createDataFrame(
        [(1, "İ" * (BPE_ORACLE_N_APPLY // 2 + 1))],
        "doc_id bigint, text string",
    )
    # raw length = N/2+1 chars (passes a raw check); lowered = N+2 chars
    with pytest.raises(ValueError, match="merges per word"):
        _guard_bpe_token_length(dotted, chars=True)
    with pytest.raises(ValueError, match="merges per word"):
        _guard_bpe_token_length(dotted, chars=False)


def test_wordpiece_maximal_munch_semantics():
    """Hand-checked maximal munch: longest vocab prefix wins at every
    position; a single char absent from the vocab still consumes one
    position (UNK path) so the loop terminates in <= len(word) steps."""
    from gearpump_spark.operators.bpe import wordpiece_encode_word

    vocab = {"a", "b", "c", "ab", "abc"}
    assert wordpiece_encode_word("abcab", vocab) == ["abc", "ab"]
    assert wordpiece_encode_word("abca", vocab) == ["abc", "a"]
    assert wordpiece_encode_word("ba", vocab) == ["b", "a"]
    # greedy is NOT optimal: "aab" with vocab {aa, ab, a} -> [aa, UNK-b]
    assert wordpiece_encode_word("aab", {"aa", "ab", "a"}) == ["aa", "b"]
    # UNK fallback consumes exactly one position
    assert wordpiece_encode_word("xy", {"x"}) == ["x", "y"]
    assert wordpiece_encode_word("", vocab) == []


def test_wordpiece_tokenize_matches_pure_python(spark):
    """Distributed WordPiece == pure-python maximal munch over the same
    trained vocab, word for word (the wp_tokens column, not just
    counts)."""
    import re

    from gearpump_spark.functions import text as TXF
    from gearpump_spark.operators.bpe import (
        wordpiece_encode_word,
        wordpiece_tokenize,
        wordpiece_vocab,
    )

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "low new lowest newest"),
            (4, "zq zq unseen"),
        ],
        "doc_id bigint, text string",
    )
    vocab = wordpiece_vocab(docs, n_merges=8)
    V = set(vocab)
    ws = re.compile(TXF.WS_RE)
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_wp_tokens, list(r.wp_tokens))
        for r in wordpiece_tokenize(docs, vocab).collect()
    }
    for doc_id, text in [(1, "low lower lowest low low"),
                         (2, "new newer newest new"),
                         (3, "low new lowest newest"),
                         (4, "zq zq unseen")]:
        words = [w for w in ws.split(text.lower()) if w]
        pieces = [p for w in words for p in wordpiece_encode_word(w, V)]
        assert got[doc_id] == (len(words), len(pieces), pieces), doc_id


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.lists(WORD, min_size=1, max_size=8), min_size=1, max_size=4))
def test_wordpiece_property_matches_reference(spark, corpora):
    """Property: distributed WordPiece (trained vocab + Arrow-map encode)
    equals the pure-python maximal munch on arbitrary tiny-alphabet
    corpora — the same adversarial surface as the BPE trainer property
    (max ties, repeated substrings)."""
    import re

    from gearpump_spark.functions import text as TXF
    from gearpump_spark.operators.bpe import (
        wordpiece_encode_word,
        wordpiece_tokenize,
        wordpiece_vocab,
    )

    texts = [" ".join(ws) for ws in corpora]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    vocab = wordpiece_vocab(docs, n_merges=4)
    V = set(vocab)
    ws_re = re.compile(TXF.WS_RE)
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_wp_tokens)
        for r in wordpiece_tokenize(docs, vocab).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in ws_re.split(t.lower()) if w]
        pieces = [p for w in words for p in wordpiece_encode_word(w, V)]
        assert got[i] == (len(words), len(pieces)), (i, t)


def test_wordpiece_oracle_at_unroll_boundary(spark):
    """The unrolled SQL oracle must agree with the engine on a word at
    EXACTLY the guarded maximum length (WP_ORACLE_N_STEPS chars, worst
    case one char consumed per round) — the boundary where one fewer
    unroll step would silently truncate. Uses an alphabet of distinct
    chars so no merge fires and every round takes the 1-char path."""
    from gearpump_spark.queries.llm import (
        WP_ORACLE_N_STEPS,
        _guard_bpe_token_length,
        _wordpiece_oracle,
    )
    from gearpump_spark.operators.bpe import wordpiece_tokenize, wordpiece_vocab

    # 49 distinct characters -> 49 single-char pieces, needs all rounds
    import string

    alphabet = string.ascii_lowercase + string.digits + "éàüßñçøå_-+=*&"
    word = alphabet[:WP_ORACLE_N_STEPS]
    assert len(word) == WP_ORACLE_N_STEPS
    docs = spark.createDataFrame(
        [(1, word + " " + word), (2, "ab ab ab")], "doc_id bigint, text string"
    )
    _guard_bpe_token_length(docs, chars=True)  # boundary passes the guard
    vocab = wordpiece_vocab(docs, n_merges=4)
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_wp_tokens)
        for r in wordpiece_tokenize(docs, vocab)
        .select("doc_id", "n_ws_tokens", "n_wp_tokens")
        .collect()
    }
    assert got[1][1] >= WP_ORACLE_N_STEPS  # worst-case path actually taken
    import duckdb

    con = duckdb.connect()
    df = spark.createDataFrame(
        [(1, word + " " + word), (2, "ab ab ab")], "doc_id bigint, text string"
    ).toPandas()
    con.register("documents", df)
    want = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(_wordpiece_oracle(n_merges=4)).fetchall()
    }
    assert got == want


def test_unigram_viterbi_semantics():
    """Hand-checked Viterbi: unigram-LM segmentation is GLOBALLY optimal
    (unlike WordPiece's greedy munch), ties break to fewer pieces, and
    the packed key encodes (score, n) exactly."""
    from gearpump_spark.operators.bpe import (
        UNIGRAM_TIE_BASE,
        unigram_encode_word,
    )

    # greedy would munch "aa" first; Viterbi sees ["a","ab"] scores higher
    scores = {"a": -2_000_000, "b": -2_000_000, "aa": -3_000_000,
              "ab": -100_000}
    pieces, key = unigram_encode_word("aab", scores)
    assert pieces == ["a", "ab"]
    assert key == (-2_100_000) * UNIGRAM_TIE_BASE - 2
    assert (-key) % UNIGRAM_TIE_BASE == 2  # n_pieces unpack
    assert -((-key) // UNIGRAM_TIE_BASE) == -2_100_000  # score unpack
    # equal total score -> fewer pieces wins
    scores = {"a": -10, "aa": -20}
    pieces, key = unigram_encode_word("aa", scores)
    assert pieces == ["aa"]
    assert key == -20 * UNIGRAM_TIE_BASE - 1
    # a character outside the inventory is loud, never silent
    import pytest as _pytest

    with _pytest.raises(ValueError, match="outside the trained piece"):
        unigram_encode_word("ax", {"a": -1})


def test_unigram_tokenize_matches_pure_python(spark):
    """Distributed unigram tokenize == pure-python Viterbi over the same
    trained inventory, piece for piece and score for score."""
    import re

    from gearpump_spark.functions import text as TXF
    from gearpump_spark.operators.bpe import (
        UNIGRAM_TIE_BASE,
        unigram_encode_word,
        unigram_tokenize,
        unigram_vocab_scores,
    )

    rows = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new"),
        (3, "low new lowest newest"),
        (4, "zq zq unseen"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    scores = unigram_vocab_scores(docs, n_merges=8)
    ws = re.compile(TXF.WS_RE)
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_sp_tokens, r.logprob_micro,
                   list(r.sp_tokens))
        for r in unigram_tokenize(docs, scores).collect()
    }
    for doc_id, text in rows:
        words = [w for w in ws.split(text.lower()) if w]
        pieces, total = [], 0
        for w in words:
            ps, key = unigram_encode_word(w, scores)
            pieces.extend(ps)
            total += -((-key) // UNIGRAM_TIE_BASE)
        assert got[doc_id] == (len(words), len(pieces), total, pieces), doc_id


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.lists(WORD, min_size=1, max_size=8), min_size=1, max_size=4))
def test_unigram_property_matches_reference(spark, corpora):
    """Property: distributed unigram Viterbi (trained inventory + Arrow
    map) equals the pure-python decode on arbitrary tiny-alphabet corpora
    (max score ties, repeated substrings — the adversarial surface for
    the packed-key tie-break)."""
    import re

    from gearpump_spark.functions import text as TXF
    from gearpump_spark.operators.bpe import (
        UNIGRAM_TIE_BASE,
        unigram_encode_word,
        unigram_tokenize,
        unigram_vocab_scores,
    )

    texts = [" ".join(ws) for ws in corpora]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    scores = unigram_vocab_scores(docs, n_merges=4)
    ws_re = re.compile(TXF.WS_RE)
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_sp_tokens, r.logprob_micro)
        for r in unigram_tokenize(docs, scores).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in ws_re.split(t.lower()) if w]
        pieces, total = [], 0
        for w in words:
            ps, key = unigram_encode_word(w, scores)
            pieces.extend(ps)
            total += -((-key) // UNIGRAM_TIE_BASE)
        assert got[i] == (len(words), len(pieces), total), (i, t)


def test_unigram_oracle_at_unroll_boundary(spark):
    """The unrolled Viterbi oracle must agree with the engine on a word
    at EXACTLY the guarded maximum length (one DP round per character
    position) — the boundary where one fewer round would leave the final
    position uncomputed."""
    import string

    import duckdb

    from gearpump_spark.operators.bpe import (
        unigram_tokenize,
        unigram_vocab_scores,
    )
    from gearpump_spark.queries.llm import (
        WP_ORACLE_N_STEPS,
        _guard_bpe_token_length,
        _unigram_oracle,
    )

    alphabet = string.ascii_lowercase + string.digits + "éàüßñçøå_-+=*&"
    word = alphabet[:WP_ORACLE_N_STEPS]
    assert len(word) == WP_ORACLE_N_STEPS
    rows = [(1, word + " " + word), (2, "ab ab ab")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    _guard_bpe_token_length(docs, chars=True)  # boundary passes the guard
    scores = unigram_vocab_scores(docs, n_merges=4)
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_sp_tokens, r.logprob_micro)
        for r in unigram_tokenize(docs, scores)
        .select("doc_id", "n_ws_tokens", "n_sp_tokens", "logprob_micro")
        .collect()
    }
    assert got[1][1] >= WP_ORACLE_N_STEPS  # all-distinct chars: 1/round
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]))
        for r in con.execute(_unigram_oracle(n_merges=4)).fetchall()
    }
    assert got == want
