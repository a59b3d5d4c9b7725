"""Data pipeline tests: collator masking pinned to the reference collator,
WER filter semantics, label preparation, packing."""

import numpy as np
import pytest

from distil_whisper_tpu.tokenizer import EnglishTextNormalizer
from distil_whisper_tpu.training.data import (
    is_wer_in_range, shift_and_mask, Collator, prepare_labels,
    prev_prompt_from_output, pack_samples, in_length_range,
)
from tests.test_longform import _real_layout_tokenizer

SOT = 50258
PAD = 50257


def test_shift_and_mask_matches_reference_collator():
    """Golden from the reference collator formula (run_distillation.py:460-478)
    computed with torch."""
    import torch
    label_ids = [
        [SOT, 11, 12, 13, 50257],                 # plain: sot first
        [50361, 7, 8, SOT, 21, 22, 50257],        # prompted: mask thru SOT
        [SOT, 31, 50257],
    ]
    out = shift_and_mask(label_ids, decoder_start_token_id=SOT,
                         pad_token_id=PAD, max_target_length=448,
                         pad_to_multiple_of=None)

    width = max(len(x) for x in label_ids)
    padded = torch.full((3, width), PAD, dtype=torch.long)
    mask = torch.zeros((3, width), dtype=torch.long)
    for i, ids in enumerate(label_ids):
        padded[i, :len(ids)] = torch.tensor(ids)
        mask[i, :len(ids)] = 1
    labels = padded[:, 1:]
    labels = labels.masked_fill(mask[:, 1:].ne(1), -100)
    bos_index = torch.argmax((labels == SOT).long(), dim=1)
    bos_index = torch.where(bos_index > 0, bos_index + 1, bos_index)
    prompt_mask = torch.arange(labels.shape[1]) < bos_index[:, None]
    golden_labels = torch.where(prompt_mask, -100, labels)

    np.testing.assert_array_equal(out["labels"], golden_labels.numpy())
    np.testing.assert_array_equal(out["decoder_input_ids"],
                                  padded[:, :-1].numpy())


def test_wer_filter():
    norm = EnglishTextNormalizer({})
    assert is_wer_in_range("the cat sat on the mat",
                           "the cat sat on the mat", norm, 10.0)
    assert not is_wer_in_range("the cat sat on the mat",
                               "a dog stood near a door", norm, 10.0)
    # all-caps hallucination reject
    assert not is_wer_in_range("hello world", "HELLO WORLD", norm, 100.0)
    # missing transcript
    assert not is_wer_in_range("hello", None, norm, 10.0)
    assert not is_wer_in_range("", "something", norm, 10.0)


def test_prepare_labels_plain_text():
    tok = _real_layout_tokenizer()
    rng = np.random.default_rng(0)
    ids = prepare_labels(tok, "the world", is_pseudo_label=False,
                         language="en", timestamp_probability=0.0,
                         condition_on_prev_probability=0.0, rng=rng)
    assert ids[0] == tok.sot
    assert ids[1] == tok.lang_to_id["en"]
    assert ids[2] == tok.transcribe
    assert ids[3] == tok.no_timestamps
    assert ids[-1] == tok.eos


def test_prepare_labels_timestamp_filtering():
    tok = _real_layout_tokenizer()
    t = tok.timestamp_token
    transcript = ("<|startoftranscript|><|en|><|transcribe|><|0.00|>"
                  + tok.decode([ord('a')]) + "<|2.00|><|endoftext|>")
    # probability 0 -> timestamps always stripped, <|notimestamps|> inserted
    rng = np.random.default_rng(0)
    ids = prepare_labels(tok, transcript, is_pseudo_label=True,
                         language="en", timestamp_probability=0.0,
                         condition_on_prev_probability=0.0, rng=rng)
    assert tok.no_timestamps in ids
    assert not any(i >= tok.timestamp_begin for i in ids)
    assert ids[3] == tok.no_timestamps  # inserted at the multilingual position
    # probability 1 -> timestamps kept
    ids = prepare_labels(tok, transcript, is_pseudo_label=True,
                         language="en", timestamp_probability=1.0,
                         condition_on_prev_probability=0.0, rng=rng)
    assert any(i >= tok.timestamp_begin for i in ids)


def test_prepare_labels_prev_prompt_cutoff():
    tok = _real_layout_tokenizer()
    long_prev = list(range(300, 700))  # 400 tokens, > 224 cutoff
    transcript = "<|startoftranscript|><|en|><|transcribe|>abc<|endoftext|>"
    ids = prepare_labels(tok, transcript, is_pseudo_label=True,
                         language="en", prev_ids=long_prev,
                         timestamp_probability=1.0,
                         condition_on_prev_probability=1.0,
                         max_label_length=448,
                         rng=np.random.default_rng(0))
    assert ids[0] == tok.sot_prev
    assert len(ids) <= 448
    sot_pos = ids.index(tok.sot)
    assert sot_pos - 1 <= 223  # prev context respects the cutoff


def test_prev_prompt_from_output():
    tok = _real_layout_tokenizer()
    gen = [tok.sot, tok.lang_to_id["en"], tok.transcribe, 65, 66, tok.eos]
    prev = prev_prompt_from_output(tok, gen)
    assert prev == [tok.sot_prev, 65, 66]


def test_collator_fixed_shapes():
    col = Collator(decoder_start_token_id=SOT, pad_token_id=PAD,
                   max_target_length=448, pad_target_to_multiple_of=32)
    samples = [{"input_features": np.zeros((80, 3000), np.float32),
                "labels": [SOT, 1, 2, PAD]},
               {"input_features": np.zeros((80, 3000), np.float32),
                "labels": [SOT, 5, 6, 7, 8, 9, PAD]}]
    batch = col(samples)
    assert batch["input_features"].shape == (2, 80, 3000)
    assert batch["decoder_input_ids"].shape[1] == 31  # 32 - 1 after shift
    assert (batch["labels"][0][6:] == -100).all()


def test_pack_samples():
    sr = 16000
    mk = lambda secs, spk, txt: {"audio": np.zeros(int(secs * sr), np.float32),
                                 "text": txt, "speaker_id": spk}
    samples = [mk(10, "a", "one"), mk(10, "a", "two"), mk(15, "a", "three"),
               mk(5, "b", "four"), mk(29, "b", "five")]
    packed = pack_samples(samples, max_input_samples=30 * sr)
    # a: 10+10 packed, 15 separate (won't fit); b: 5 new speaker, 29 separate
    assert len(packed) == 4
    assert packed[0]["text"] == "one two"
    assert packed[0]["condition_on_prev"] == 0
    assert packed[1]["text"] == "three"
    assert packed[1]["condition_on_prev"] == 1  # same speaker as previous
    assert packed[2]["condition_on_prev"] == 0  # speaker changed
    assert packed[3]["condition_on_prev"] == 1


def test_length_range():
    assert in_length_range(16000, 10, 8000, 480000, 2, 448)
    assert not in_length_range(16000, 1, 8000, 480000, 2, 448)
    assert not in_length_range(500000, 10, 8000, 480000, 2, 448)
