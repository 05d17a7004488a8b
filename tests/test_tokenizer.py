import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.text.tokenizer import ClipBpeTokenizer, tokenize, tokenize_openclip

SAMPLES = [
    "a photo of a cat",
    "A person is playing the guitar on stage!!",
    "hello world, it's 2023 — let's test some unicode: naïve café 🎉",
    "THE QUICK BROWN FOX jumps over 1234567890 lazy dogs...",
    "   whitespace\t\tand\nnewlines   everywhere   ",
    "don't you'll we're i'm they've she'd it's",
    "",
    "supercalifragilisticexpialidocious pneumonoultramicroscopicsilicovolcanoconiosis",
]


@pytest.fixture(scope="module")
def tk():
    return ClipBpeTokenizer()


def test_vocab_size(tk):
    assert tk.vocab_size == 49408
    assert tk.sot_id == 49406
    assert tk.eot_id == 49407


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_encode_matches_reference(tk):
    ref = load_reference_module("v2/CLIP/clip/simple_tokenizer.py", "ref_tok")
    ref_tk = ref.SimpleTokenizer(
        bpe_path="/root/reference/v2/CLIP/clip/bpe_simple_vocab_16e6.txt.gz"
    )
    for s in SAMPLES:
        assert tk.encode(s) == ref_tk.encode(s), f"mismatch on {s!r}"


def test_roundtrip(tk):
    for s in ["a photo of a cat", "hello world"]:
        ids = tk.encode(s)
        assert tk.decode(ids).strip() == s


def test_tokenize_shapes():
    arr = tokenize(["a cat", "a dog"])
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == 49406
    assert (arr == 49407).sum(axis=1).tolist() == [1, 1]


def test_tokenize_overflow_raises_and_truncates():
    long = "word " * 200
    with pytest.raises(RuntimeError):
        tokenize([long])
    arr = tokenize([long], truncate=True)
    assert arr.shape == (1, 77)
    assert arr[0, -1] == 49407
    arr2 = tokenize_openclip([long])
    np.testing.assert_array_equal(arr, arr2)


def test_eot_is_argmax():
    # the text towers pool at argmax(token ids) == the EOT position
    arr = tokenize(["a photo of a cat"])
    eot_pos = int(np.argmax(arr[0]))
    assert arr[0, eot_pos] == 49407
