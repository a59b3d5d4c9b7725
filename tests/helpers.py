"""Shared fixture builders: tiny random torch Whisper checkpoint (real
special-token layout) + synthetic tone datasets."""

import json
from pathlib import Path

import numpy as np

from distil_whisper_tpu.tokenizer.bpe import bytes_to_unicode


def make_tiny_checkpoint(path, encoder_layers=2, decoder_layers=2,
                         d_model=64, ffn=96, seed=0):
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    path = Path(path)
    torch.manual_seed(seed)
    hf_cfg = HFConfig(
        vocab_size=51865, num_mel_bins=80, d_model=d_model,
        encoder_layers=encoder_layers, decoder_layers=decoder_layers,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=ffn, decoder_ffn_dim=ffn,
        max_source_positions=1500, max_target_positions=448,
        dropout=0.0, suppress_tokens=None, begin_suppress_tokens=None,
        forced_decoder_ids=None, pad_token_id=50257, bos_token_id=50257,
        eos_token_id=50257, decoder_start_token_id=50258)
    WhisperForConditionalGeneration(hf_cfg).save_pretrained(str(path))

    units = list(bytes_to_unicode().values())
    vocab = {u: i for i, u in enumerate(units)}
    for i in range(len(units), 50257):
        vocab[f"[unused{i}]"] = i
    with open(path / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(path / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    added = {"<|endoftext|>": 50257, "<|startoftranscript|>": 50258,
             "<|en|>": 50259, "<|fr|>": 50265,
             "<|translate|>": 50358, "<|transcribe|>": 50359,
             "<|startoflm|>": 50360, "<|startofprev|>": 50361,
             "<|nospeech|>": 50362, "<|notimestamps|>": 50363}
    with open(path / "added_tokens.json", "w") as f:
        json.dump(added, f)
    return str(path)


def make_tone_dataset(path, n=4, seed=0):
    import datasets
    rng = np.random.default_rng(seed)
    texts = ["the cat sat", "a dog ran fast", "hello world now",
             "we are here", "it is late", "go home soon"]
    rows = []
    for i in range(n):
        secs = 2.0 + 0.5 * (i % 4)
        t = np.arange(int(secs * 16000)) / 16000.0
        audio = (0.2 * np.sin(2 * np.pi * (200 + 50 * i) * t)
                 + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
        rows.append({"audio": {"array": audio.tolist(),
                               "sampling_rate": 16000},
                     "text": texts[i % len(texts)],
                     "speaker_id": f"spk{i // 3}"})
    datasets.Dataset.from_list(rows).save_to_disk(str(path))
    return str(path)
