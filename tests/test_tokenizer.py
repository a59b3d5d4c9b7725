"""Tokenizer parity vs HF WhisperTokenizer built from local synthetic files.

An HF slow WhisperTokenizer is constructed programmatically (tiny but
realistic byte-level BPE vocab + whisper special-token layout), saved, and
both implementations load the same artifacts — encode/decode/merge must agree.
"""

import json
import numpy as np
import pytest

from distil_whisper_tpu.tokenizer import WhisperTokenizer
from distil_whisper_tpu.tokenizer.bpe import ByteLevelBPE, bytes_to_unicode


SPECIALS = ["<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|fr|>",
            "<|de|>", "<|translate|>", "<|transcribe|>", "<|startoflm|>",
            "<|startofprev|>", "<|nospeech|>", "<|notimestamps|>"]

TEXTS = [
    "Hello world!",
    " Mr. Quilter is the apostle of the middle classes, and we are glad",
    "naïve café — déjà vu…  ",
    "numbers 1234 and $5.60",
    "UPPER lower MiXeD",
    "日本語テキスト",  # multi-byte utf-8 exercises byte fallback
    "tabs\tand\nnewlines",
    "'s 't 're contractions aren't",
]


def _build_files(tmpdir):
    units = list(bytes_to_unicode().values())
    merge_pairs = [("t", "h"), ("Ġ", "t"), ("Ġt", "h"), ("th", "e"),
                   ("Ġth", "e"), ("i", "n"), ("e", "r"), ("Ġ", "a"),
                   ("a", "n"), ("an", "d"), ("o", "r"), ("l", "d"),
                   ("Ġ", "w"), ("Ġw", "or"), ("w", "or"), ("or", "ld")]
    vocab = {u: i for i, u in enumerate(units)}
    for a, b in merge_pairs:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab_file = str(tmpdir / "vocab.json")
    merges_file = str(tmpdir / "merges.txt")
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merge_pairs:
            f.write(f"{a} {b}\n")
    return vocab_file, merges_file


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("tok")
    vocab_file, merges_file = _build_files(tmpdir)
    from transformers import WhisperTokenizer as HFWhisperTokenizer
    hf = HFWhisperTokenizer(vocab_file, merges_file)
    hf.add_tokens(SPECIALS, special_tokens=True)
    save_dir = tmpdir / "saved"
    hf.save_pretrained(str(save_dir))
    hf = HFWhisperTokenizer.from_pretrained(str(save_dir))
    ours = WhisperTokenizer.from_pretrained(str(save_dir))
    return hf, ours


def test_encode_parity(tokenizers):
    hf, ours = tokenizers
    for text in TEXTS:
        got = ours.encode(text)
        want = hf.convert_tokens_to_ids(hf.tokenize(text))
        assert got == want, f"encode mismatch for {text!r}: {got} vs {want}"


def test_decode_roundtrip(tokenizers):
    _, ours = tokenizers
    for text in TEXTS:
        ids = ours.encode(text)
        assert ours.decode(ids) == text


def test_special_token_ids(tokenizers):
    hf, ours = tokenizers
    assert ours.sot == hf.convert_tokens_to_ids("<|startoftranscript|>")
    assert ours.eos == hf.convert_tokens_to_ids("<|endoftext|>")
    assert ours.no_timestamps == hf.convert_tokens_to_ids("<|notimestamps|>")
    assert ours.timestamp_begin == ours.no_timestamps + 1
    assert ours.lang_to_id["en"] == hf.convert_tokens_to_ids("<|en|>")


def test_prompt_ids(tokenizers):
    _, ours = tokenizers
    ids = ours.prompt_ids(language="english", task="transcribe",
                          no_timestamps=True)
    assert ids == [ours.sot, ours.lang_to_id["en"], ours.transcribe,
                   ours.no_timestamps]
    ids = ours.prompt_ids(language="fr", task="translate", no_timestamps=False)
    assert ids == [ours.sot, ours.lang_to_id["fr"], ours.translate]


def test_decode_with_timestamps(tokenizers):
    _, ours = tokenizers
    ids = [ours.sot, ours.timestamp_token(0.0)] + ours.encode(" the world") + \
          [ours.timestamp_token(1.28), ours.eos]
    text = ours.decode(ids, decode_with_timestamps=True)
    assert text == "<|0.00|> the world<|1.28|>"
    plain = ours.decode(ids)
    assert plain == " the world"


def test_strip_prompt(tokenizers):
    _, ours = tokenizers
    prev = ours.previous_text_prompt("the world")
    assert prev[0] == ours.sot_prev
    ids = prev + [ours.sot] + ours.encode(" and")
    stripped = ours.strip_prompt(ids)
    assert stripped[0] == ours.sot


def _hf_decode_asr(hf, outputs, **kw):
    from transformers.models.whisper.tokenization_whisper import _decode_asr
    mo = [{"tokens": np.asarray([o["tokens"]]), **({"stride": o["stride"]}
          if "stride" in o else {})} for o in outputs]
    return _decode_asr(hf, mo, time_precision=0.02, **kw)


@pytest.mark.parametrize("return_timestamps", [False, True])
def test_decode_asr_parity(tokenizers, return_timestamps):
    hf, ours = tokenizers
    t = ours.timestamp_token
    the, world, the_sp = ours.encode("the")[0], ours.encode(" world"), ours.encode(" the")
    seg1 = [ours.sot, t(0.0)] + the_sp + world + [t(2.0), t(2.0)] + world + [t(25.0)]
    # overlapping chunk: repeats trailing words of seg1 within the left stride
    seg2 = [ours.sot, t(0.0)] + world + the_sp + [t(20.0), ours.eos]
    outputs = [
        {"tokens": seg1, "stride": (30.0, 0.0, 5.0)},
        {"tokens": seg2, "stride": (30.0, 5.0, 0.0)},
    ]
    golden_text, golden_opt = _hf_decode_asr(
        hf, outputs, return_timestamps=return_timestamps, return_language=False)
    text, opt = ours.decode_asr(outputs, return_timestamps=return_timestamps)
    assert text == golden_text
    if return_timestamps:
        got = [(c["text"], c["timestamp"]) for c in opt["chunks"]]
        want = [(c["text"], c["timestamp"]) for c in golden_opt["chunks"]]
        assert got == want


@pytest.mark.parametrize("return_timestamps", [False, True])
def test_decode_asr_fuzz(tokenizers, return_timestamps):
    """Randomized chunk streams through decode_asr vs HF: random word
    tokens, random (monotone) timestamp placements, random strides, eos or
    not — the stateful merge must agree everywhere."""
    import random
    hf, ours = tokenizers
    rng = random.Random(7)
    t = ours.timestamp_token
    words = [ours.encode(w) for w in
             (" the", " world", " and", " cat", " sat", " on", " a",
              " mat", " hello", " more")]

    for case in range(60):
        n_chunks = rng.randint(1, 4)
        outputs = []
        for ci in range(n_chunks):
            toks = [ours.sot]
            ts = 0.0
            toks.append(t(ts))
            for _ in range(rng.randint(0, 3)):          # segments
                for _ in range(rng.randint(1, 4)):      # words per segment
                    toks += rng.choice(words)
                ts = min(ts + rng.choice([0.5, 1.0, 2.0, 5.0]), 29.98)
                toks.append(t(ts))
                if rng.random() < 0.7:                  # segment boundary pair
                    toks.append(t(ts))
            for _ in range(rng.randint(1, 3)):
                toks += rng.choice(words)
            if rng.random() < 0.8:                      # closing timestamp
                toks.append(t(min(ts + 1.0, 29.98)))
            if rng.random() < 0.5:
                toks.append(ours.eos)
            left = 5.0 if ci > 0 else 0.0
            right = 5.0 if ci < n_chunks - 1 else 0.0
            outputs.append({"tokens": toks, "stride": (30.0, left, right)})

        golden_text, golden_opt = _hf_decode_asr(
            hf, outputs, return_timestamps=return_timestamps,
            return_language=False)
        text, opt = ours.decode_asr(outputs,
                                    return_timestamps=return_timestamps)
        assert text == golden_text, f"case {case}: {text!r} != {golden_text!r}"
        if return_timestamps:
            got = [(c["text"], c["timestamp"]) for c in opt["chunks"]]
            want = [(c["text"], c["timestamp"]) for c in golden_opt["chunks"]]
            assert got == want, f"case {case}"


def test_decode_asr_no_timestamp_merge(tokenizers):
    """Chunks without timestamps merge through the LCS overlap resolution."""
    hf, ours = tokenizers
    a = ours.encode(" the world and the world")
    b = ours.encode(" and the world or more")
    outputs = [{"tokens": [ours.sot] + a, "stride": (30.0, 0.0, 5.0)},
               {"tokens": [ours.sot] + b, "stride": (30.0, 5.0, 0.0)}]
    golden_text, _ = _hf_decode_asr(hf, outputs, return_timestamps=False,
                                    return_language=False)
    text, _ = ours.decode_asr(outputs)
    assert text == golden_text
