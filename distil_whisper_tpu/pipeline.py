"""User-facing ASR pipeline: short-form + chunked long-form transcription.

The TPU-native counterpart of the reference's ``FlaxWhisperPipeline``
(training/flax/distil_whisper/pipeline.py): audio -> strided 30 s chunks
(stride = chunk/6 by default, reference :325) -> batched log-mel -> one jitted
encode+generate program -> timestamp/LCS merge of overlapping chunks
(``WhisperTokenizer.decode_asr``).

All device work is fixed-shape: every chunk is a padded 30 s window, ragged
final batches are padded to the compiled batch size and dropped after
(reference pads the same way, pipeline.py:394-408).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .audio.io import load_audio
from .audio import compute_mel
from .config import WhisperConfig
from .generation import GenerationOptions, encode_and_generate
from .models import load_params, param_axes
from .models.whisper import encode
from .parallel import make_mesh, shard_params, data_sharding
from .tokenizer import WhisperTokenizer


class WhisperPipeline:
    """``pipeline = WhisperPipeline(ckpt_dir); pipeline(audio, chunk_length_s=30)``"""

    def __init__(self, checkpoint: str, dtype=jnp.bfloat16,
                 batch_size: int = 8, max_new_tokens: int = 128,
                 params=None, cfg: Optional[WhisperConfig] = None,
                 tokenizer: Optional[WhisperTokenizer] = None,
                 mesh=None, speculative_method: Optional[str] = None,
                 assistant=None, gamma: int = 5, max_ngram: int = 3):
        if params is None or cfg is None:
            params, cfg = load_params(checkpoint, cfg, dtype=dtype)
        if dtype == jnp.bfloat16:
            cfg = cfg.replace(fast_bf16_attention=True, use_flash_encoder=True)
        self._checkpoint = checkpoint
        # Chunks data-parallel over every chip: the batch of 30 s windows is
        # sharded over the mesh's 'data' axis (the GSPMD equivalent of the
        # reference's pmap'd pipeline_generate, flax pipeline.py:131-143).
        self.mesh = mesh if mesh is not None else make_mesh()
        self._n_data = self.mesh.shape["data"]
        self.params = shard_params(params, param_axes(cfg), self.mesh)
        if (cfg.quantize_encoder or cfg.quantize_decoder
                or cfg.quantize_lm_head):
            from .ops.quant import maybe_quantize_encoder
            self.params = maybe_quantize_encoder(self.params, cfg)
        self.cfg = cfg
        self.tokenizer = tokenizer or WhisperTokenizer.from_pretrained(checkpoint)
        self.dtype = dtype
        # round the compiled batch up to a multiple of the data-axis size
        self.batch_size = -(-batch_size // self._n_data) * self._n_data
        self.max_new_tokens = max_new_tokens
        # Speculative decoding for the greedy windows this pipeline batches
        # (short-form AND every chunked long-form window): "ngram" =
        # draft-free prompt lookup, "draft" = assistant-model speculation
        # with assistant=(draft_params, draft_cfg).  Token-identical to the
        # greedy program it replaces (incl. the timestamp FSM — per verify
        # column, generation.speculative), so chunk merging is unchanged.
        # The reference's chunked+speculative anchor is the single-long-file
        # latency table (reference README.md:285-290, :352-432).
        if speculative_method not in (None, "draft", "ngram"):
            raise ValueError(f"unknown speculative_method "
                             f"{speculative_method!r}; use 'draft' or 'ngram'")
        if speculative_method == "draft" and assistant is None:
            raise ValueError("speculative_method='draft' requires "
                             "assistant=(draft_params, draft_cfg)")
        if speculative_method == "ngram" and assistant is not None:
            raise ValueError("pick ONE speculation method: assistant draft "
                             "or ngram lookup")
        self.speculative_method = speculative_method
        self.assistant = assistant
        self.gamma = int(gamma)
        self.max_ngram = int(max_ngram)
        self.spec_stats = {"drafted": 0, "accepted": 0}
        self._generate_cache: Dict[Any, Any] = {}

    @property
    def n_data(self) -> int:
        # tolerate instances built without __init__ (tests wire attrs by hand)
        return getattr(self, "_n_data", 1)

    def _put_batch(self, mels: np.ndarray) -> jnp.ndarray:
        x = jnp.asarray(mels, self.dtype)
        mesh = getattr(self, "mesh", None)
        if mesh is None or self.n_data <= 1 or x.shape[0] % self.n_data:
            return x
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    # ------------------------------------------------------------------
    def _jitted_generate(self, opts: GenerationOptions, prompt_len: int):
        key = (opts, prompt_len)
        if key not in self._generate_cache:
            def fn(params, mel, prompt, temperature, rng):
                return encode_and_generate(params, self.cfg, mel, prompt, opts,
                                           temperature=temperature, rng=rng,
                                           dtype=self.dtype)
            self._generate_cache[key] = jax.jit(fn)
        return self._generate_cache[key]

    def _jitted_speculative(self, opts: GenerationOptions):
        """Speculative window program with the plain-generate call shape
        (temperature/rng accepted and ignored — the verify contract is
        deterministic argmax agreement; sampling falls back to plain)."""
        key = ("_spec", opts)
        if key not in self._generate_cache:
            from .generation.speculative import (
                ngram_speculative_generate_batched,
                speculative_generate_batched)
            from .models.whisper import cross_kv
            cfg, dtype = self.cfg, self.dtype
            gamma, max_ngram = self.gamma, self.max_ngram

            if self.speculative_method == "ngram":
                @jax.jit
                def spec(params, mel, prompts):
                    enc = encode(params["encoder"], cfg, mel, dtype=dtype)
                    t_cross = cross_kv(params["decoder"], cfg, enc)
                    return ngram_speculative_generate_batched(
                        params["decoder"], cfg, t_cross, prompts, opts,
                        gamma=gamma, max_ngram=max_ngram, dtype=dtype)

                def fn(params, mel, prompts, temperature, rng):
                    return spec(params, mel, prompts)
            else:
                d_cfg = self.assistant[1]

                @jax.jit
                def spec(params, d_params, mel, prompts):
                    enc = encode(params["encoder"], cfg, mel, dtype=dtype)
                    t_cross = cross_kv(params["decoder"], cfg, enc)
                    # distil drafts share the teacher encoder when widths
                    # match (reference run_eval.py:585-599)
                    d_enc = (enc if d_cfg.d_model == cfg.d_model
                             else encode(d_params["encoder"], d_cfg, mel,
                                         dtype=dtype))
                    d_cross = cross_kv(d_params["decoder"], d_cfg, d_enc)
                    return speculative_generate_batched(
                        params["decoder"], cfg, d_params["decoder"], d_cfg,
                        t_cross, d_cross, prompts, opts, gamma=gamma,
                        dtype=dtype)

                def fn(params, mel, prompts, temperature, rng):
                    return spec(params, self.assistant[0], mel, prompts)
            self._generate_cache[key] = fn
        return self._generate_cache[key]

    def _jitted_beam(self, opts: GenerationOptions, num_beams: int,
                     length_penalty: float):
        key = ("_beam", opts, num_beams, length_penalty)
        if key not in self._generate_cache:
            from .generation import encode_and_beam_search

            def fn(params, mel, prompt, temperature, rng):
                # temperature/rng unused: beam is deterministic (HF semantics)
                return encode_and_beam_search(
                    params, self.cfg, mel, prompt, opts, num_beams=num_beams,
                    length_penalty=length_penalty, dtype=self.dtype)
            self._generate_cache[key] = jax.jit(fn)
        return self._generate_cache[key]

    def _jitted_beam_with_weights(self, opts: GenerationOptions,
                                  num_beams: int, length_penalty: float):
        """Beam search + alignment-head cross-attention weights for the
        WINNING hypothesis (word timestamps x beam).

        Cross-attention rows depend only on the decoder hidden state at their
        own position, and that state depends only on the token prefix — so a
        teacher-forced pass over the winning beam reproduces exactly the
        weights beam search saw along that hypothesis path (HF instead
        gathers per-beam cross-attentions step by step,
        generation_whisper.py::_extract_token_timestamps; same result).
        Encoder + cross-KV are shared between the search and the alignment
        pass, so the combination costs one extra decoder-only pass."""
        key = ("_beam_wts", opts, num_beams, length_penalty)
        if key not in self._generate_cache:
            from .generation.beam import beam_search
            from .generation.word_timestamps import selected_cross_weights
            from .models.whisper import cross_kv
            heads = self._alignment_heads()

            def fn(params, mel, prompts, temperature, rng):
                # temperature/rng unused: beam is deterministic (HF semantics)
                enc = encode(params["encoder"], self.cfg, mel,
                             dtype=self.dtype)
                cross = cross_kv(params["decoder"], self.cfg, enc)
                out = beam_search(params["decoder"], self.cfg, cross,
                                  prompts, opts, num_beams=num_beams,
                                  length_penalty=length_penalty,
                                  dtype=self.dtype)
                sel = selected_cross_weights(
                    params["decoder"], self.cfg, out.sequences[:, :-1],
                    heads, cross=cross, dtype=self.dtype)
                return out, sel
            self._generate_cache[key] = jax.jit(fn)
        return self._generate_cache[key]

    def _alignment_heads(self):
        if not hasattr(self, "_align_heads_cache"):
            from .generation.word_timestamps import (default_alignment_heads,
                                                     load_alignment_heads)
            try:
                heads = load_alignment_heads(self._checkpoint, self.cfg)
            except (TypeError, OSError):
                heads = default_alignment_heads(self.cfg)
            self._align_heads_cache = heads
        return self._align_heads_cache

    def _jitted_generate_with_weights(self, opts: GenerationOptions,
                                      prompt_len: int):
        """jit (params, mel, prompts, temperature, rng) ->
        (GenerateOutput, alignment-head cross-attn weights).

        Encoder + cross-KV run ONCE and are shared by the generate loop and
        the teacher-forced alignment pass — a separate word-weights jit
        would pay a second full encoder pass per batch (32 layers for
        large-v3-family models)."""
        key = ("_gen_wts", opts, prompt_len)
        if key not in self._generate_cache:
            from .generation.word_timestamps import selected_cross_weights
            from .generation.generate import generate as gen_fn
            from .models.whisper import cross_kv
            heads = self._alignment_heads()

            def fn(params, mel, prompts, temperature, rng):
                enc = encode(params["encoder"], self.cfg, mel,
                             dtype=self.dtype)
                cross = cross_kv(params["decoder"], self.cfg, enc)
                out = gen_fn(params["decoder"], self.cfg, cross, prompts,
                             opts, temperature=temperature, rng=rng,
                             dtype=self.dtype)
                sel = selected_cross_weights(
                    params["decoder"], self.cfg, out.sequences[:, :-1],
                    heads, cross=cross, dtype=self.dtype)
                return out, sel
            self._generate_cache[key] = jax.jit(fn)
        return self._generate_cache[key]

    def detect_language(self, mel: jnp.ndarray) -> List[str]:
        """Language id from the first window (argmax over language tokens at
        the SOT position)."""
        tok = self.tokenizer
        if "_detect" not in self._generate_cache:
            from .models.whisper import decode as dec_fn, cross_kv, init_cache

            def fn(params, mel):
                enc = encode(params["encoder"], self.cfg, mel, dtype=self.dtype)
                cross = cross_kv(params["decoder"], self.cfg, enc)
                cache = init_cache(self.cfg, mel.shape[0], dtype=self.dtype)
                prompt = jnp.full((mel.shape[0], 1),
                                  self.cfg.decoder_start_token_id, jnp.int32)
                logits, _ = dec_fn(params["decoder"], self.cfg, prompt,
                                   cross=cross, cache=cache, pos_offset=0,
                                   dtype=self.dtype)
                return logits[:, 0]
            self._generate_cache["_detect"] = jax.jit(fn)
        logits = np.asarray(self._generate_cache["_detect"](self.params, mel))
        lang_ids = sorted(tok.lang_to_id.values())
        best = np.asarray(lang_ids)[np.argmax(logits[:, lang_ids], axis=-1)]
        return [tok.id_to_lang[int(i)] for i in best]

    # ------------------------------------------------------------------
    def _chunk(self, audio: np.ndarray, chunk_length_s: float,
               stride_length_s) -> List[Dict[str, Any]]:
        sr = self.cfg.sampling_rate
        chunk_len = int(round(chunk_length_s * sr))
        if stride_length_s is None:
            stride_length_s = chunk_length_s / 6.0
        if isinstance(stride_length_s, (int, float)):
            stride_length_s = [stride_length_s, stride_length_s]
        stride_left = int(round(stride_length_s[0] * sr))
        stride_right = int(round(stride_length_s[1] * sr))
        step = chunk_len - stride_left - stride_right
        if step <= 0:
            raise ValueError("strides are larger than the chunk length")

        chunks = []
        for start in range(0, max(len(audio), 1), step):
            piece = audio[start:start + chunk_len]
            is_first = start == 0
            is_last = start + chunk_len >= len(audio)
            chunks.append({
                "audio": piece,
                "start_s": start / sr,
                "stride": (len(piece) / sr,
                           0.0 if is_first else stride_left / sr,
                           0.0 if is_last else stride_right / sr),
            })
            if is_last:
                break
        return chunks

    # ------------------------------------------------------------------
    def __call__(self, audio, chunk_length_s: float = 30.0,
                 stride_length_s=None, batch_size: Optional[int] = None,
                 language: Optional[str] = None, task: str = "transcribe",
                 return_timestamps: bool = False,
                 return_language: bool = False,
                 max_new_tokens: Optional[int] = None,
                 generate_kwargs: Optional[dict] = None) -> Dict[str, Any]:
        tok = self.tokenizer
        cfg = self.cfg
        batch_size = batch_size or self.batch_size
        batch_size = -(-batch_size // self.n_data) * self.n_data
        max_new = max_new_tokens or self.max_new_tokens

        word_timestamps = return_timestamps == "word"
        wav = load_audio(audio, cfg.sampling_rate)
        chunks = self._chunk(wav, chunk_length_s, stride_length_s)
        single = len(chunks) == 1

        # features for every chunk, always a full padded 30 s window —
        # computed in ONE device call for the whole file and kept ON DEVICE
        wavs = np.zeros((len(chunks), cfg.n_samples), np.float32)
        for j, c in enumerate(chunks):
            w = c["audio"][:cfg.n_samples]
            wavs[j, :len(w)] = w
        mels = compute_mel(jnp.asarray(wavs), cfg).astype(self.dtype)

        if language is None and len(tok.lang_to_id) > 1:
            language = self.detect_language(mels[:1])[0]
        prompt = tok.prompt_ids(language=language, task=task,
                                no_timestamps=not return_timestamps)
        gen_kwargs = dict(generate_kwargs or {})
        num_beams = int(gen_kwargs.pop("num_beams", 1))
        length_penalty = float(gen_kwargs.pop("length_penalty", 1.0))
        opts = GenerationOptions.from_config(
            cfg, max_new_tokens=max_new,
            return_timestamps=bool(return_timestamps),
            no_speech_token_id=tok.no_speech,
            **gen_kwargs)
        if num_beams > 1 and word_timestamps:
            fn = self._jitted_beam_with_weights(opts, num_beams,
                                                length_penalty)
        elif num_beams > 1:
            fn = self._jitted_beam(opts, num_beams, length_penalty)
        elif word_timestamps:
            fn = self._jitted_generate_with_weights(opts, len(prompt))
        elif (getattr(self, "speculative_method", None)
              and not opts.do_sample):
            # speculative windows: token-identical to plain greedy (segment
            # timestamps included — the FSM runs per verify column), so the
            # downstream chunk merge sees the exact same token streams
            fn = self._jitted_speculative(opts)
        else:
            fn = self._jitted_generate(opts, len(prompt))

        outputs: List[Dict[str, Any]] = []
        rng = jax.random.PRNGKey(0)
        for i in range(0, len(mels), batch_size):
            batch = mels[i:i + batch_size]
            n = len(batch)
            if n < batch_size:  # pad ragged final batch to the compiled shape
                batch = jnp.concatenate(
                    [batch, jnp.zeros((batch_size - n,) + batch.shape[1:],
                                      batch.dtype)])
            prompts = jnp.asarray([prompt] * batch_size, jnp.int32)
            mel_dev = self._put_batch(batch)
            times = None
            if word_timestamps:
                from .generation.word_timestamps import (
                    token_timestamps_from_weights)
                out, sel_dev = fn(self.params, mel_dev, prompts, 0.0, rng)
                seqs = np.asarray(out.sequences)
                lens = np.asarray(out.seq_len)
                # crop the attention columns to each chunk's REAL mel frames
                # before the DTW: without this, final tokens can align into
                # the zero-padded tail past the audio and their words get
                # silently dropped by the stride filter (HF crops to
                # num_frames // 2 for the same reason)
                full = 2 * cfg.max_source_positions
                num_frames = [
                    min(int(round(chunks[i + j]["stride"][0] * 100)), full)
                    if i + j < len(chunks) else full
                    for j in range(batch_size)]
                sel = np.asarray(sel_dev, np.float32)
                times = token_timestamps_from_weights(
                    sel, num_input_ids=len(prompt), seq_lens=lens,
                    num_frames=num_frames)
            else:
                out = fn(self.params, mel_dev, prompts, 0.0, rng)
                seqs = np.asarray(out.sequences)
                lens = np.asarray(out.seq_len)
                if getattr(out, "drafted", None) is not None:
                    # live rows only: padded lanes decode a zero window
                    self.spec_stats["drafted"] += int(
                        np.sum(np.asarray(out.drafted)[:n]))
                    self.spec_stats["accepted"] += int(
                        np.sum(np.asarray(out.accepted)[:n]))
            for j in range(n):
                entry = {
                    "tokens": seqs[j][:lens[j]].tolist(),
                    "stride": chunks[i + j]["stride"],
                }
                if times is not None:
                    entry["token_times"] = times[j][:lens[j]]
                    entry["start_s"] = chunks[i + j]["start_s"]
                outputs.append(entry)

        if word_timestamps:
            return self._assemble_words(outputs, prompt_len=len(prompt))

        if single:
            ids = outputs[0]["tokens"]
            text = tok.decode(ids, skip_special_tokens=True)
            result: Dict[str, Any] = {"text": text}
            if return_timestamps:
                _, opt = tok.decode_asr(
                    [{"tokens": ids}], return_timestamps=True,
                    return_language=return_language)
                result.update(opt)
            return result

        text, optional = tok.decode_asr(outputs,
                                        return_timestamps=return_timestamps,
                                        return_language=return_language)
        return {"text": text, **optional}

    def transcribe_words_batch(self, wavs: List[np.ndarray],
                               languages: Optional[List[Optional[str]]] = None,
                               task: str = "transcribe",
                               max_new_tokens: Optional[int] = None,
                               ) -> List[Dict[str, Any]]:
        """Word-timestamp transcription of MANY short (<= 30 s) audios in
        shared device batches — the serving fallback's micro-batching path.

        Row-identical to calling ``self(wav, return_timestamps="word")``
        per audio (rows are independent through mel, generate, and the
        alignment pass), but K requests cost ceil(K/batch_size) device
        calls instead of K.  Languages may differ per row (the prompt
        layout has the same length for every language); missing ones are
        detected in one batched pass."""
        tok, cfg = self.tokenizer, self.cfg
        n = len(wavs)
        max_new = max_new_tokens or self.max_new_tokens
        full = 2 * cfg.max_source_positions
        wav_arr = np.zeros((n, cfg.n_samples), np.float32)
        n_frames, durs = [], []
        for j, w in enumerate(wavs):
            if len(w) > cfg.n_samples:
                raise ValueError("transcribe_words_batch is single-window "
                                 f"only (audio {j} exceeds 30 s)")
            wav_arr[j, :len(w)] = w
            n_frames.append(min(int(round(len(w) / cfg.sampling_rate * 100)),
                                full))
            durs.append(len(w) / cfg.sampling_rate)
        mels = compute_mel(jnp.asarray(wav_arr), cfg).astype(self.dtype)

        languages = list(languages) if languages else [None] * n
        if any(l is None for l in languages) and len(tok.lang_to_id) > 1:
            detected = self.detect_language(mels)
            languages = [l if l is not None else detected[j]
                         for j, l in enumerate(languages)]
        prompts_list = [tok.prompt_ids(language=languages[j], task=task,
                                       no_timestamps=False)
                        for j in range(n)]
        plen = len(prompts_list[0])
        assert all(len(p) == plen for p in prompts_list)

        opts = GenerationOptions.from_config(
            cfg, max_new_tokens=max_new, return_timestamps=True,
            no_speech_token_id=tok.no_speech)
        fn = self._jitted_generate_with_weights(opts, plen)
        from .generation.word_timestamps import token_timestamps_from_weights

        batch_size = self.batch_size
        rng = jax.random.PRNGKey(0)
        results: List[Dict[str, Any]] = []
        for i in range(0, n, batch_size):
            k = min(batch_size, n - i)
            batch = mels[i:i + k]
            if k < batch_size:
                batch = jnp.concatenate(
                    [batch, jnp.zeros((batch_size - k,) + batch.shape[1:],
                                      batch.dtype)])
            prompts = jnp.asarray(
                prompts_list[i:i + k]
                + [prompts_list[0]] * (batch_size - k), jnp.int32)
            out, sel_dev = fn(self.params, self._put_batch(batch), prompts,
                              0.0, rng)
            seqs = np.asarray(out.sequences)
            lens = np.asarray(out.seq_len)
            frames = n_frames[i:i + k] + [full] * (batch_size - k)
            times = token_timestamps_from_weights(
                np.asarray(sel_dev, np.float32), num_input_ids=plen,
                seq_lens=lens, num_frames=frames)
            for j in range(k):
                entry = {"tokens": seqs[j][:lens[j]].tolist(),
                         "stride": (durs[i + j], 0.0, 0.0),
                         "token_times": times[j][:lens[j]],
                         "start_s": 0.0}
                res = self._assemble_words([entry], prompt_len=plen)
                res["language"] = languages[i + j]
                results.append(res)
        return results

    def _assemble_words(self, outputs: List[Dict[str, Any]],
                        prompt_len: int) -> Dict[str, Any]:
        """Per-chunk token times -> global word list with stride trimming:
        each word belongs to the chunk whose non-strided core contains its
        start (left/right strides are 0 on the first/last chunk)."""
        from .generation.word_timestamps import words_from_tokens
        tok = self.tokenizer
        words: List[Dict[str, Any]] = []
        for o in outputs:
            dur, left, right = o["stride"]
            gen_ids = o["tokens"][prompt_len:]
            gen_times = o["token_times"][prompt_len:len(o["tokens"])]
            for w in words_from_tokens(tok, gen_ids, gen_times,
                                       time_offset=0.0):
                if w["start"] < left - 1e-6 or w["start"] >= dur - right:
                    continue
                words.append({
                    "text": w["word"],
                    "timestamp": (round(o["start_s"] + w["start"], 2),
                                  round(o["start_s"] + w["end"], 2)),
                })
        text = "".join(w["text"] for w in words)
        return {"text": text.strip(), "chunks": words}
