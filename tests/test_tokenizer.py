"""The production tokenizer path (VERDICT r2 item 7): ``HFCLIPTokenizer``
loading a real CLIP-format BPE vocab/merges from a local directory — the
entry the reference gets implicitly via ``from_pretrained``
(``main.py:284-301``).  A tiny BPE fixture is generated on the fly so the
real ``transformers.CLIPTokenizer`` machinery (byte-pair merges, ``</w>``
end-of-word, BOS/EOS framing, max-length padding + truncation) is exercised
without any downloaded assets."""

import json
import string

import numpy as np
import pytest

from tml_image_editing_defense_tpu.models.tokenizer import (
    HashTokenizer,
    HFCLIPTokenizer,
    load_tokenizer,
)

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """Tiny CLIP-format BPE tokenizer: single-char tokens for a-z (plain and
    word-final ``</w>`` forms) plus merge rules that fuse 'cat' and 'photo'
    into single tokens."""
    d = tmp_path_factory.mktemp("tiny_clip_tok")
    vocab = {}
    for ch in string.ascii_lowercase + string.digits:
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    for merged in ("ca", "cat</w>", "ph", "ot", "ph" + "ot", "o</w>", "phot" + "o</w>"):
        vocab.setdefault(merged, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    merges = [
        "c a",            # c,a → ca
        "ca t</w>",       # ca,t</w> → cat</w>
        "p h",
        "o t",
        "ph ot",
        "phot o</w>",
    ]
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return d, vocab


def test_load_tokenizer_picks_hf_path(tok_dir):
    d, _ = tok_dir
    tok = load_tokenizer(d, max_length=16)
    assert isinstance(tok, HFCLIPTokenizer)
    assert isinstance(load_tokenizer(None), HashTokenizer)


def test_framing_matches_raw_clip_tokenizer(tok_dir):
    """Our wrapper's array output == transformers.CLIPTokenizer with the
    same padding/truncation settings, BOS first, EOS terminated, EOS-padded."""
    d, vocab = tok_dir
    ours = HFCLIPTokenizer(d, max_length=16)
    raw = transformers.CLIPTokenizer.from_pretrained(str(d))

    prompts = ["a photo", "cat", ""]
    got = ours(prompts)
    want = raw(prompts, padding="max_length", max_length=16, truncation=True)
    np.testing.assert_array_equal(got, np.asarray(want["input_ids"], np.int32))

    bos, eos = vocab["<|startoftext|>"], vocab["<|endoftext|>"]
    assert ours.bos_id == bos and ours.eos_id == eos
    assert (got[:, 0] == bos).all()
    for row in got:
        assert eos in row
    # pad region is EOS-id (CLIP pad token == <|endoftext|>)
    assert (got[2, 2:] == eos).all()          # empty prompt: BOS, EOS, pad…


def test_bpe_merges_apply(tok_dir):
    d, vocab = tok_dir
    ours = HFCLIPTokenizer(d, max_length=16)
    ids = ours("cat")[0]
    assert ids[1] == vocab["cat</w>"]          # merged to one token
    ids = ours("photo")[0]
    assert ids[1] == vocab["photo</w>"]


def test_truncation(tok_dir):
    d, _ = tok_dir
    ours = HFCLIPTokenizer(d, max_length=8)
    ids = ours("a b c d e f g h i j k l")
    assert ids.shape == (1, 8)
    assert ids[0, -1] == ours.eos_id           # truncation keeps final EOS


def test_threads_through_embed_prompt_bank(tok_dir):
    """build_model(tokenizer_paths=…) uses the real tokenizer for the prompt
    bank the attack samples from (reference main.py:85-87, 334-360)."""
    import jax

    from tml_image_editing_defense_tpu.models import build_model

    d, _ = tok_dir
    model = build_model("tiny", key=jax.random.key(0), image_size=32,
                        tokenizer_paths=[d])
    assert isinstance(model.tokenizers[0], HFCLIPTokenizer)
    bank = model.embed_prompt_bank(["a photo", "cat"], "")
    e = np.asarray(bank.embeds)
    assert e.shape[0] == 2
    assert not np.allclose(e[0], e[1])
