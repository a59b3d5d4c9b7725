"""Pipeline extras: translate task, language detection, stride overrides."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distil_whisper_tpu.models import init_params
from distil_whisper_tpu.pipeline import WhisperPipeline
from tests.test_longform import CFG, _real_layout_tokenizer


@pytest.fixture(scope="module")
def pipe():
    params = init_params(CFG, jax.random.PRNGKey(0))
    p = WhisperPipeline.__new__(WhisperPipeline)
    p.params, p.cfg, p.tokenizer = params, CFG, _real_layout_tokenizer()
    p.dtype = jnp.float32
    p.batch_size = 2
    p.max_new_tokens = 8
    p._generate_cache = {}
    return p


def test_pipeline_quantizes_decoder_only():
    """The constructor's quantize gate must fire for quantize_decoder even
    when quantize_encoder is off (regression: the gate only checked the
    encoder flag)."""
    cfg = CFG.replace(quantize_decoder=True)
    params = init_params(cfg, jax.random.PRNGKey(0))
    p = WhisperPipeline(checkpoint=None, params=params, cfg=cfg,
                        tokenizer=_real_layout_tokenizer(),
                        dtype=jnp.float32, batch_size=2, max_new_tokens=4)
    assert "kernel_q" in p.params["decoder"]["layers"]["fc1"]
    assert "kernel" in p.params["encoder"]["layers"]["fc1"]


def test_translate_task_prompt(pipe):
    tok = pipe.tokenizer
    ids = tok.prompt_ids(language="fr", task="translate")
    assert ids == [tok.sot, tok.lang_to_id["fr"], tok.translate,
                   tok.no_timestamps]
    out = pipe(np.zeros(16000, np.float32), language="fr", task="translate")
    assert isinstance(out["text"], str)


def test_language_detection_returns_known_code(pipe):
    mel = jnp.zeros((1, 80, 3000), jnp.float32)
    codes = pipe.detect_language(mel)
    assert codes[0] in pipe.tokenizer.lang_to_id


def test_custom_stride(pipe):
    audio = np.zeros(int(50 * 16000), np.float32)
    out = pipe(audio, chunk_length_s=20.0, stride_length_s=2.0, language="en")
    assert isinstance(out["text"], str)


def test_stride_too_large_raises(pipe):
    with pytest.raises(ValueError, match="strides"):
        pipe(np.zeros(16000 * 40, np.float32), chunk_length_s=10.0,
             stride_length_s=5.0, language="en")


def test_eval_cli_flags_round_trip_to_sequential_options():
    """--temperature_fallback / thresholds / --condition_on_prev round-trip
    into SequentialOptions (reference run_eval.py:147-176 flag set)."""
    from distil_whisper_tpu.cli.run_eval import (parse_args,
                                                 seq_options_from_args)
    args = parse_args([
        "--model_checkpoint", "x", "--dataset_path", "y",
        "--temperature_fallback", "0.0,0.4,1.0",
        "--logprob_threshold", "-0.5",
        "--no_speech_threshold", "0.4",
        "--compression_ratio_threshold", "2.0",
        "--condition_on_prev", "--max_new_tokens", "96"])
    o = seq_options_from_args(args)
    assert o.temperatures == (0.0, 0.4, 1.0)
    assert o.logprob_threshold == -0.5
    assert o.no_speech_threshold == 0.4
    assert o.compression_ratio_threshold == 2.0
    assert o.condition_on_prev_tokens is True
    assert o.max_new_tokens == 96


def test_pipeline_beam_via_generate_kwargs(tmp_path):
    """generate_kwargs={'num_beams': 2} routes through beam search (the
    reference pipeline forwards beams to HF generate the same way)."""
    import numpy as np
    import jax.numpy as jnp
    from tests.helpers import make_tiny_checkpoint
    from distil_whisper_tpu.pipeline import WhisperPipeline

    ck = make_tiny_checkpoint(tmp_path / "ck")
    pipe = WhisperPipeline(ck, dtype=jnp.float32, batch_size=4,
                           max_new_tokens=8)
    t = np.arange(int(3.0 * 16000)) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    out = pipe(audio, language="en", generate_kwargs={"num_beams": 2})
    assert isinstance(out["text"], str)


def test_run_eval_prompt_text(tmp_path):
    """--prompt_text conditions short-mode generation via <|startofprev|>
    prompt ids and the prompt text never leaks into the hypotheses."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import make_tiny_checkpoint, make_tone_dataset
    from distil_whisper_tpu.cli.run_eval import main as eval_main

    ck = tmp_path / "ck"
    make_tiny_checkpoint(ck)
    make_tone_dataset(tmp_path / "data", n=2)
    res = eval_main([
        "--model_checkpoint", str(ck), "--dataset_path",
        str(tmp_path / "data"), "--mode", "short", "--language", "en",
        "--batch_size", "2", "--max_new_tokens", "6", "--dtype", "float32",
        "--prompt_text", "ZYQXW unlikely context",
        "--output_json", str(tmp_path / "eval.json")])
    assert "wer" in res
    import json
    preds = json.load(open(tmp_path / "eval.json"))
    assert "ZYQXW" not in json.dumps(preds)


def test_sequential_initial_prompt_requires_condition_on_prev():
    from distil_whisper_tpu.generation.sequential import (
        SequentialOptions, SequentialTranscriber)
    from tests.test_longform import CFG as LCFG
    from distil_whisper_tpu.models import init_params as ip
    params = ip(LCFG, jax.random.PRNGKey(0))
    tok = _real_layout_tokenizer()
    tr = SequentialTranscriber(
        params, LCFG, tok,
        SequentialOptions(condition_on_prev_tokens=False, max_new_tokens=8),
        batch_size=1)
    feats = np.zeros((LCFG.num_mel_bins, 3100), np.float32)
    with pytest.raises(ValueError):
        tr.transcribe([feats], initial_prompt_tokens=[5, 6, 7])
