"""WordPiece tokenizer: Python-reference vs C++ core vs HF BertTokenizer
(instantiated from a local vocab file — no network)."""

import numpy as np
import pytest

from ance_tpu.data.wordpiece import (
    WordPieceTokenizer, basic_tokenize, wordpiece)

VOCAB_TOKENS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##ed", "##s", "over",
    "lazy", "dog", "un", "##believ", "##able", "!", ",", ".", "'",
    "hello", "world", "2023", "##23", "20", "a", "b", "c",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB_TOKENS) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def tok(vocab_file):
    return WordPieceTokenizer.from_vocab_file(vocab_file)


def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("don't stop") == ["don", "'", "t", "stop"]
    assert basic_tokenize("Café") == ["cafe"]  # accent stripped
    assert basic_tokenize("tab\tand\nnewline") == ["tab", "and", "newline"]


def test_wordpiece_greedy():
    vocab = {t: i for i, t in enumerate(VOCAB_TOKENS)}
    assert wordpiece("jumped", vocab) == ["jump", "##ed"]
    assert wordpiece("unbelievable", vocab) == ["un", "##believ", "##able"]
    assert wordpiece("xyzzy", vocab) == ["[UNK]"]
    assert wordpiece("x" * 200, vocab) == ["[UNK]"]


def test_encode_with_specials(tok):
    ids = tok.encode("the quick fox jumped!")
    toks = [VOCAB_TOKENS[i] for i in ids]
    assert toks == ["[CLS]", "the", "quick", "fox", "jump", "##ed", "!",
                    "[SEP]"]
    pair = tok.encode("hello", text_pair="world")
    assert [VOCAB_TOKENS[i] for i in pair] == \
        ["[CLS]", "hello", "[SEP]", "world", "[SEP]"]
    assert tok.encode("the quick fox", max_length=3) == \
        [tok.cls_token_id, VOCAB_TOKENS.index("the"),
         VOCAB_TOKENS.index("quick")]


def test_native_matches_python(tok):
    if tok._native is None:
        pytest.skip("native core unavailable (no g++)")
    texts = ["The Quick, brown FOX jumped over the lazy dog!",
             "unbelievable!!! hello world 2023",
             "a b c ' , . !", "", "    ", "x" * 150]
    for t in texts:
        native = tok._native.encode(t)
        python = [tok.vocab.get(x, tok.unk_token_id) for x in tok.tokenize(t)]
        assert native == python, t


def test_matches_hf_bert_tokenizer(vocab_file, tok):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(vocab_file=vocab_file,
                                    do_lower_case=True)
    texts = ["The Quick, brown FOX jumped over the lazy dog!",
             "unbelievable hello world", "Café au lait!",
             "don't stop 2023"]
    for t in texts:
        ours = tok.encode(t, add_special_tokens=True)
        theirs = hf.encode(t, add_special_tokens=True)
        assert ours == theirs, t
    # pair encoding
    ours = tok.encode("hello", text_pair="world brown")
    theirs = hf.encode("hello", text_pair="world brown")
    assert ours == theirs


def test_seed_tokenizer(vocab_file):
    from ance_tpu.data.wordpiece import SeedTokenizer
    tok = SeedTokenizer.from_vocab_file(vocab_file, do_lower_case=True)
    # mask appended after the vocab
    assert tok.mask_token_id == len(VOCAB_TOKENS)
    # do_lower_case lowers text but preserves special-token literals
    ids = tok.encode("THE QUICK [SEP] FOX", add_special_tokens=False)
    toks = [("<mask>" if i == tok.mask_token_id else VOCAB_TOKENS[i])
            for i in ids]
    assert toks == ["the", "quick", "[SEP]", "fox"]
    # no accent stripping at the wordpiece level (strip_accents=False):
    # 'café' keeps its accent and (absent from vocab) maps to [UNK]
    ids2 = tok.encode("café", add_special_tokens=False)
    assert ids2 == [tok.unk_token_id]


def test_native_fuzz_matches_python(tok):
    """Randomized ASCII fuzz: C++ core must equal the Python reference."""
    if tok._native is None:
        pytest.skip("native core unavailable")
    import random
    rnd = random.Random(0)
    alphabet = list("abcdefghijklmnopqrstuvwxyzABCDE !,.'\"-[]{}\t\n0123456789")
    for _ in range(300):
        t = "".join(rnd.choice(alphabet)
                    for _ in range(rnd.randint(0, 60)))
        native = tok._native.encode(t)
        python = [tok.vocab.get(p, tok.unk_token_id)
                  for w in basic_tokenize(t, tok.lowercase)
                  for p in wordpiece(w, tok.vocab, tok.unk_token)]
        assert native == python, repr(t)
