"""DecodingTask: one pass of the decoder over encoded audio windows.

openai-whisper ``DecodingTask`` semantics on top of the jitted
``decode_step``: host numpy orchestrates (logit rules, sampling, beam
bookkeeping), the device runs fixed-shape forwards only. Prompt prefill is
right-padded to 32-token buckets so arbitrary prompt lengths reuse a handful
of compiled programs.

The reference's vestigial fields this realizes: ``probs``/``logits``
(main.rs:351-352), ``prompt_past`` consumption via options.prompt,
``token_translate``/``token_transcribe`` usage (main.rs:553-572).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..io.vocab import WhisperVocab
from ..model.decoder import KVCache, decode_step, init_cache
from .result import DecodingResult, compression_ratio
from .rules import (
    ApplyTimestampRules,
    SuppressBlank,
    SuppressTokens,
    build_suppress_list,
    log_softmax,
)
from .sequence import BeamSearchDecoder, GreedyDecoder, MaximumLikelihoodRanker


@dataclasses.dataclass(frozen=True)
class DecodingOptions:
    task: str = "transcribe"           # "transcribe" | "translate"
    language: Optional[str] = None     # None -> detect (multilingual) / "en"
    temperature: float = 0.0
    sample_len: Optional[int] = None   # default n_text_ctx // 2
    best_of: Optional[int] = None      # sampling candidates when temperature > 0
    beam_size: Optional[int] = None    # beam search when temperature == 0
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    prompt: Optional[Sequence[int]] = None   # previous-text conditioning tokens
    prefix: Optional[Sequence[int]] = None   # forced start of this segment
    suppress_tokens: Optional[Sequence[int]] = (-1,)
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0
    seed: int = 42


_PREFILL_BUCKET = 32


def _cross_batch(cross) -> int:
    """Batch dim of the cross memory (plain array or QuantKV)."""
    return getattr(cross, "data", cross).shape[1]


def _cache_dtype(cross):
    """Cache compute dtype: bf16 when the cross memory is int8-quantized."""
    import jax.numpy as _jnp

    arr = getattr(cross, "data", cross)
    return _jnp.bfloat16 if arr.dtype == _jnp.int8 else arr.dtype


def _pad_to_bucket(tokens: np.ndarray) -> Tuple[np.ndarray, int]:
    t = tokens.shape[1]
    padded = (t + _PREFILL_BUCKET - 1) // _PREFILL_BUCKET * _PREFILL_BUCKET
    if padded == t:
        return tokens, t
    out = np.zeros((tokens.shape[0], padded), dtype=tokens.dtype)
    out[:, :t] = tokens
    return out, t


class DecodingTask:
    def __init__(
        self,
        config: WhisperConfig,
        vocab: WhisperVocab,
        options: DecodingOptions,
        params=None,
    ):
        self.config = config
        self.vocab = vocab
        self.options = options
        self.params_ref = params  # model params pytree used by run()

        # option-compatibility contract (openai decoding.py _verify_options)
        if options.beam_size is not None and options.best_of is not None:
            raise ValueError("beam_size and best_of can't be given together")
        if options.beam_size is not None and options.temperature > 0:
            raise ValueError("beam search is only valid at temperature 0")
        if options.temperature == 0 and options.best_of is not None:
            raise ValueError("best_of with greedy sampling is not compatible")
        if options.patience is not None and options.beam_size is None:
            raise ValueError("patience requires beam_size to be given")

        self.n_group = options.beam_size or options.best_of or 1
        self.sample_len = options.sample_len or config.n_text_ctx // 2
        self.sot_sequence = self._sot_sequence()
        self.initial_tokens = self._initial_tokens()
        self.sample_begin = len(self.initial_tokens)
        self.sot_index = self.initial_tokens.index(vocab.token_sot)

        if options.beam_size is not None:
            self.decoder = BeamSearchDecoder(options.beam_size, vocab.token_eot, options.patience)
        else:
            # same PRNG schedule as the device loop (host/device t>0 parity)
            self.decoder = GreedyDecoder(
                options.temperature, vocab.token_eot, options.seed
            )
        self.ranker = MaximumLikelihoodRanker(options.length_penalty)

        self.filters = []
        if options.suppress_blank:
            self.filters.append(SuppressBlank(vocab, self.sample_begin))
        if options.suppress_tokens:
            self.filters.append(
                SuppressTokens(build_suppress_list(vocab, options.suppress_tokens))
            )
        if not options.without_timestamps:
            max_initial_index = None
            if options.max_initial_timestamp is not None:
                max_initial_index = round(options.max_initial_timestamp / 0.02)
            self.filters.append(
                ApplyTimestampRules(vocab, self.sample_begin, max_initial_index)
            )

    # -- token sequence construction (openai _get_initial_tokens) --

    def _sot_sequence(self) -> List[int]:
        v = self.vocab
        seq = [v.token_sot]
        if v.is_multilingual:
            lang = self.options.language or "en"
            seq.append(v.language_token(lang))
            seq.append(
                v.token_translate if self.options.task == "translate" else v.token_transcribe
            )
        if self.options.without_timestamps:
            seq.append(v.token_not)
        return seq

    def _initial_tokens(self) -> List[int]:
        tokens = list(self.sot_sequence)
        if self.options.prefix is not None:
            prefix = list(self.options.prefix)
            if self.sample_len is not None:
                # openai's exact arithmetic (decoding.py _get_initial_tokens):
                # prefix[-max_prefix_len:], INCLUDING its negative-length
                # behavior — when sample_len overshoots n_text_ctx//2 the
                # slice drops the first (sample_len - n_ctx//2) tokens, down
                # to an empty prefix — never the untruncated fallback
                max_prefix_len = self.config.n_text_ctx // 2 - self.sample_len
                prefix = prefix[-max_prefix_len:]
            tokens = tokens + prefix
        if self.options.prompt is not None and len(self.options.prompt) > 0:
            prompt = list(self.options.prompt)
            tokens = (
                [self.vocab.token_prev]
                + prompt[-(self.config.n_text_ctx // 2 - 1) :]
                + tokens
            )
        return tokens

    # -- main loop --

    def run(self, cross_k: jnp.ndarray, cross_v: jnp.ndarray,
            use_topk_device: bool = False) -> List[DecodingResult]:
        """cross_k/v: (L, n_audio, Ta, S) from the encoder.

        ``use_topk_device``: for beam search, apply logit rules on device and
        transfer only the top beam_size+1 candidates per step (identical
        candidate set to openai's host computation; avoids the full-vocab
        logits transfer that dominates step latency on remote chips).
        """
        cfg, v = self.config, self.vocab
        n_audio = _cross_batch(cross_k)
        n_seq = n_audio * self.n_group
        # Beam/best_of groups share their group's cross memory: decode_step
        # folds the group axis into the query when the cross batch is smaller
        # than the token batch (rows are group-contiguous) — no tiling.

        use_topk = use_topk_device and isinstance(self.decoder, BeamSearchDecoder)
        if use_topk:
            from .device_loop import build_masks

            sup_mask, blank_mask = build_masks(
                v, suppress_tokens=self.options.suppress_tokens
            )
            if not self.options.suppress_blank:
                blank_mask = jnp.zeros_like(blank_mask)
            max_initial_index = None
            if (
                self.options.max_initial_timestamp is not None
                and not self.options.without_timestamps
            ):
                max_initial_index = round(self.options.max_initial_timestamp / 0.02)

        self.decoder.reset()
        tokens = np.tile(np.array(self.initial_tokens, np.int32), (n_seq, 1))
        cache = init_cache(cfg, n_seq, dtype=_cache_dtype(cross_k))

        # Prefill (bucketed) — one forward for the whole prompt. Only TWO
        # positions of the (n_seq, P, V) logits are ever used (SOT for the
        # no-speech prob, true_len-1 to seed sampling): slice them on device
        # before the host fetch — the full tensor is ~265 MB at beam-5
        # large-v3 and the tunneled link stalls for minutes on >100 MB pulls.
        padded, true_len = _pad_to_bucket(tokens)
        logits_all, cache = decode_step(
            self.params_ref, jnp.asarray(padded), jnp.int32(0), cache, cross_k, cross_v, cfg
        )
        two = np.asarray(
            logits_all[:, (self.sot_index, true_len - 1)], dtype=np.float32)
        # no-speech prob from the SOT position (openai semantics).
        probs_at_sot = np.exp(log_softmax(two[:, 0]))
        no_speech_probs = probs_at_sot[:, v.token_nosp]
        logits = two[:, 1]
        n_past = true_len

        sum_logprobs = np.zeros(n_seq, dtype=np.float64)
        topk = None  # (top_lp, top_ids) when the device applied the rules
        for i in range(self.sample_len):
            if topk is not None:
                tokens, completed, sources = self.decoder.update_from_topk(
                    tokens, topk[0], topk[1], sum_logprobs
                )
            else:
                filt = logits.copy()
                for f in self.filters:
                    f(filt, tokens)
                if isinstance(self.decoder, BeamSearchDecoder):
                    tokens, completed, sources = self.decoder.update(
                        tokens, filt, sum_logprobs
                    )
                else:
                    tokens, completed = self.decoder.update(tokens, filt, sum_logprobs)
                    sources = None
            if isinstance(self.decoder, BeamSearchDecoder) and sources is not None:
                if not np.array_equal(sources, np.arange(n_seq)):
                    idx = jnp.asarray(sources)
                    cache = KVCache(
                        k=jnp.take(cache.k, idx, axis=0), v=jnp.take(cache.v, idx, axis=0)
                    )
            if completed or tokens.shape[-1] > cfg.n_text_ctx:
                break
            next_tok = jnp.asarray(tokens[:, -1:].astype(np.int32))
            if use_topk:
                from .topk_step import decode_step_topk, rule_state_from_tokens

                last_t, prev_t, last_ts, step = rule_state_from_tokens(
                    tokens, self.sample_begin, v.token_beg
                )
                top_lp, top_ids, _, cache = decode_step_topk(
                    self.params_ref, next_tok, jnp.int32(n_past), cache,
                    cross_k, cross_v, sup_mask, blank_mask,
                    last_t, prev_t, last_ts, step, cfg,
                    k=self.options.beam_size + 1,
                    use_timestamps=not self.options.without_timestamps,
                    max_initial_index=max_initial_index,
                )
                topk = (np.asarray(top_lp), np.asarray(top_ids))
            else:
                lg, cache = decode_step(
                    self.params_ref, next_tok, jnp.int32(n_past), cache,
                    cross_k, cross_v, cfg,
                )
                logits = np.asarray(lg[:, 0], dtype=np.float32)
            n_past += 1

        # Finalize & rank.
        if isinstance(self.decoder, BeamSearchDecoder):
            final_tokens, final_logprobs = self.decoder.finalize(tokens, sum_logprobs)
            grouped_tokens = [
                [seq[self.sample_begin : seq.index(v.token_eot) if v.token_eot in seq else len(seq)]
                 for seq in group]
                for group in final_tokens
            ]
            grouped_logprobs = final_logprobs
        else:
            final_tokens, final_logprobs = self.decoder.finalize(tokens, sum_logprobs)
            grouped_tokens = []
            grouped_logprobs = []
            for i in range(n_audio):
                gt, gp = [], []
                for j in range(self.n_group):
                    seq = final_tokens[i * self.n_group + j].tolist()
                    end = seq.index(v.token_eot) if v.token_eot in seq else len(seq)
                    gt.append(seq[self.sample_begin : end])
                    gp.append(final_logprobs[i * self.n_group + j])
                grouped_tokens.append(gt)
                grouped_logprobs.append(gp)

        selected = self.ranker.rank(grouped_tokens, grouped_logprobs)
        results = []
        for i, j in enumerate(selected):
            toks = [int(t) for t in grouped_tokens[i][j]]
            sum_lp = grouped_logprobs[i][j]
            avg_logprob = sum_lp / (len(toks) + 1)
            text = v.decode(toks).strip()
            results.append(
                DecodingResult(
                    tokens=toks,
                    text=text,
                    avg_logprob=float(avg_logprob),
                    no_speech_prob=float(no_speech_probs[i * self.n_group]),
                    temperature=self.options.temperature,
                    compression_ratio=compression_ratio(text),
                )
            )
        return results


def decode_full(
    params,
    config: WhisperConfig,
    vocab: WhisperVocab,
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
    options: DecodingOptions,
    use_device_loop: bool = False,
) -> List[DecodingResult]:
    """Decode one or more encoded windows with the given options.

    ``use_device_loop=True`` routes plain greedy/temperature decoding through
    the fused on-device loop (decoding.device_loop) — token-identical for
    greedy, ~50x lower per-segment latency on remote/tunneled chips. Beam
    search and best_of groups use the host loop.
    """
    if (
        use_device_loop
        and options.beam_size is None
        and (options.best_of or 1) == 1
    ):
        return _decode_full_device(params, config, vocab, cross_k, cross_v, options)
    if use_device_loop and options.beam_size is not None and options.patience is None:
        # Fully on-device beam loop (token-exact vs the host beam).
        return _decode_full_device_beam(params, config, vocab, cross_k, cross_v, options)
    task = DecodingTask(config, vocab, options, params=params)
    # Fallback acceleration: rules + top-k on device, bookkeeping on host.
    return task.run(cross_k, cross_v, use_topk_device=use_device_loop)


def _device_decode_prologue(config, vocab, options: DecodingOptions,
                            n_rows: int):
    """Shared setup for every FUSED device decode wrapper (greedy, beam,
    speculative): masks, tiled+bucketed prompt rows, timestamp cap, and the
    openai context-budget clamp. One place on purpose — the clamp is
    subtle: the host loop samples, appends, THEN breaks when
    tokens.shape[-1] > n_text_ctx, so up to n_text_ctx - true_len + 1
    tokens are sampled (the final token comes from logits at position
    n_text_ctx - 1 and is never forwarded; the wasted forward's pe/KV
    writes clamp harmlessly — callers size caches past the budget)."""
    from .device_loop import build_masks

    task = DecodingTask(config, vocab, options)
    sup_mask, blank_mask = build_masks(
        vocab, suppress_tokens=options.suppress_tokens)
    if not options.suppress_blank:
        blank_mask = jnp.zeros_like(blank_mask)
    init = np.tile(np.array(task.initial_tokens, np.int32), (n_rows, 1))
    padded, true_len = _pad_to_bucket(init)
    max_initial_index = None
    if (options.max_initial_timestamp is not None
            and not options.without_timestamps):
        max_initial_index = round(options.max_initial_timestamp / 0.02)
    sample_len = max(0, min(task.sample_len, config.n_text_ctx - true_len + 1))
    return (task, padded, true_len, sup_mask, blank_mask,
            max_initial_index, sample_len)


def _greedy_device_results(toks, lengths, sum_lp, nosp, vocab,
                           temperature: float) -> List[DecodingResult]:
    """Host-side DecodingResult construction shared by the greedy and
    speculative device wrappers (same avg_logprob len+1 convention as the
    host loop)."""
    toks = np.asarray(toks)
    lengths = np.asarray(lengths)
    sum_lp = np.asarray(sum_lp)
    nosp = np.asarray(nosp)
    results = []
    for i in range(toks.shape[0]):
        seq = [int(t) for t in toks[i, : lengths[i]]]
        text = vocab.decode(seq).strip()
        results.append(DecodingResult(
            tokens=seq, text=text,
            avg_logprob=float(sum_lp[i]) / (len(seq) + 1),
            no_speech_prob=float(nosp[i]),
            temperature=temperature,
            compression_ratio=compression_ratio(text),
        ))
    return results


def _decode_full_device(
    params, config, vocab, cross_k, cross_v, options: DecodingOptions
) -> List[DecodingResult]:
    from .device_loop import decode_segment_device

    n_audio = _cross_batch(cross_k)
    (task, padded, true_len, sup_mask, blank_mask, max_initial_index,
     sample_len) = _device_decode_prologue(config, vocab, options, n_audio)
    # Right-size the cache: the segment can't exceed prefill + sample budget.
    cache = init_cache(
        config, n_audio, dtype=_cache_dtype(cross_k),
        ctx=padded.shape[1] + sample_len + 8,
    )
    toks, lengths, sum_lp, nosp = decode_segment_device(
        params,
        jnp.asarray(padded),
        true_len,
        task.sot_index,
        cache,
        cross_k,
        cross_v,
        sup_mask,
        blank_mask,
        config,
        sample_len=sample_len,
        use_timestamps=not options.without_timestamps,
        max_initial_index=max_initial_index,
        temperature=options.temperature,
        seed=options.seed,
    )
    return _greedy_device_results(toks, lengths, sum_lp, nosp, vocab,
                                  options.temperature)


def _decode_full_device_beam(
    params, config, vocab, cross_k, cross_v, options: DecodingOptions
) -> List[DecodingResult]:
    from .device_beam import beam_decode_device

    k = options.beam_size
    n_audio = _cross_batch(cross_k)
    ck, cv = cross_k, cross_v  # group-shared: decode_step folds the beam axis
    (task, padded, true_len, sup_mask, blank_mask, max_initial_index,
     sample_len) = _device_decode_prologue(config, vocab, options,
                                           n_audio * k)
    # No ctx padding: the lane-dot fork copy (kernels/beam_gather.
    # lane_dot_permute) has no row-alignment requirement, and the exact-size
    # cache measured 21.4 vs 23.4 ms/step at ctx 75-vs-128 (fork-step cost
    # 9.0 vs 16.6) — the 128-multiple rows were only ever needed by the
    # raw-DMA COW kernel this path no longer uses.
    cache = init_cache(
        config, n_audio * k, dtype=_cache_dtype(ck),
        ctx=padded.shape[1] + sample_len + 8,
    )
    (act_toks, act_lp, fin_toks, fin_scores, fin_len, fin_count, steps, nosp) = (
        beam_decode_device(
            params, jnp.asarray(padded), true_len, task.sot_index, cache,
            ck, cv, sup_mask, blank_mask, config,
            beam_size=k, sample_len=sample_len,
            use_timestamps=not options.without_timestamps,
            max_initial_index=max_initial_index,
        )
    )
    act_toks = np.asarray(act_toks)
    act_lp = np.asarray(act_lp)
    fin_toks = np.asarray(fin_toks)
    fin_scores = np.asarray(fin_scores)
    fin_len = np.asarray(fin_len)
    fin_count = np.asarray(fin_count)
    steps = int(steps)
    nosp = np.asarray(nosp)

    results = []
    for g in range(n_audio):
        seqs: List[List[int]] = []
        lps: List[float] = []
        for i in range(int(fin_count[g])):
            seqs.append([int(t) for t in fin_toks[g, i, : int(fin_len[g, i])]])
            lps.append(float(fin_scores[g, i]))
        if len(seqs) < k:
            # openai finalize: pad with in-flight beams (desc sum_lp), + EOT.
            for i in np.argsort(-act_lp[g]):
                if len(seqs) >= k:
                    break
                seqs.append([int(t) for t in act_toks[g, int(i), :steps]])
                lps.append(float(act_lp[g, int(i)]))
        sel = task.ranker.rank([seqs], [lps])[0]
        toks = seqs[sel]
        avg_logprob = lps[sel] / (len(toks) + 1)
        text = vocab.decode(toks).strip()
        results.append(
            DecodingResult(
                tokens=toks,
                text=text,
                avg_logprob=float(avg_logprob),
                no_speech_prob=float(nosp[g]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(text),
            )
        )
    return results


def detect_language(
    params, config: WhisperConfig, vocab: WhisperVocab,
    cross_k: jnp.ndarray, cross_v: jnp.ndarray,
) -> Tuple[List[str], List[dict]]:
    """Single forward from SOT; distribution over language tokens only
    (openai detect_language)."""
    n_audio = _cross_batch(cross_k)
    # one T=1 forward writes one KV column: a tiny ctx keeps the throwaway
    # cache off the HBM budget (default n_text_ctx would transiently claim
    # ~73 MB/row on large-v3 for a batched language-ID pass)
    cache = init_cache(config, n_audio, dtype=_cache_dtype(cross_k), ctx=8)
    tokens = jnp.full((n_audio, 1), vocab.token_sot, dtype=jnp.int32)
    logits, _ = decode_step(params, tokens, jnp.int32(0), cache, cross_k, cross_v, config)
    logits = np.array(logits[:, 0], dtype=np.float32)  # mutable host copy
    mask = np.full(logits.shape[-1], True)
    mask[vocab.all_language_tokens] = False
    logits[:, mask] = -np.inf
    probs = np.exp(log_softmax(logits))
    langs = []
    all_probs = []
    for i in range(n_audio):
        token = int(probs[i].argmax())
        langs.append(vocab.language_of_token(token))
        all_probs.append(
            {lang: float(probs[i, vocab.language_token(lang)]) for lang in vocab.languages}
        )
    return langs, all_probs
