"""WordPiece tokenizer parity vs transformers' BertTokenizer over a local vocab."""

import numpy as np
import pytest

from tvts_tpu.text.wordpiece import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "person", "is", "play", "##ing", "the", "guitar", "on", "stage",
         "runs", "run", "##s", "dog", "##gy", "un", "##believ", "##able",
         ",", ".", "!", "'", "s", "##'", "##.", "2023", "##0", "##2", "##3"]

SAMPLES = [
    "A person is playing the guitar on stage!",
    "unbelievable doggy runs, runs.",
    "the person's dog",
    "completely-unknown-words here",
    "",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_matches_hf_bert_tokenizer(vocab_file):
    hf_tok = pytest.importorskip("transformers").BertTokenizer(
        vocab_file=vocab_file, do_lower_case=True)
    tk = WordPieceTokenizer(vocab_file)
    for s in SAMPLES:
        assert tk.tokenize(s) == hf_tok.tokenize(s), s
        got = tk([s], max_length=16)
        want = hf_tok([s], return_tensors="np", padding="max_length",
                      truncation=True, max_length=16)
        np.testing.assert_array_equal(got["input_ids"][0], want["input_ids"][0])
        np.testing.assert_array_equal(got["attention_mask"][0],
                                      want["attention_mask"][0])


def test_batch_shapes(vocab_file):
    tk = WordPieceTokenizer(vocab_file)
    out = tk(["a person", "the guitar on stage"], max_length=10)
    assert out["input_ids"].shape == (2, 10)
    assert out["attention_mask"].sum(axis=1).tolist() == [4, 6]
