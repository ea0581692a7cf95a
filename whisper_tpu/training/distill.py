"""Decoder distillation recipe (distil-whisper style).

The serving cost of Whisper is dominated by the autoregressive decoder
(one full weight + cross-memory read per token); distil-whisper showed the
32-layer large-v3 decoder can be shrunk to 2-4 layers at small WER cost by
training the student on (a) the teacher's pseudo-labels (cross entropy) and
(b) the teacher's token distributions (KL), with the encoder frozen and
copied. The reference has no training at all (src/main.rs is
inference-only); this completes the production story on top of
training/train.py.

Recipe (Gandhi et al., "Distil-Whisper", arXiv:2311.00430):

  * student = teacher's encoder (frozen) + a decoder initialized from
    maximally-spaced teacher decoder layers (first & last for n=2);
  * loss = ce_weight * CE(student, labels) + kl_weight * T^2 * KL(
    softmax(teacher/T) || softmax(student/T));
  * labels are the teacher's own greedy transcripts (pseudo-labels) in
    production; any (audio, text) pairs work here.

TPU notes: the teacher forward runs under the same jit as the student's
grad step (one program, no extra host round trips); encoder params are
shared by reference between teacher and student pytrees, so the frozen
copy costs no HBM; only decoder grads are computed (jax.grad over the
student-decoder subtree).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import WhisperConfig
from ..utils.logging import get_logger
from .train import decoder_forward_train, make_optimizer
from ..model.encoder import encode

log = get_logger("distill")


def student_config(teacher_cfg: WhisperConfig, n_text_layer: int) -> WhisperConfig:
    """Teacher geometry with a shrunk decoder stack."""
    return dataclasses.replace(teacher_cfg, n_text_layer=n_text_layer)


def pick_layer_map(n_teacher: int, n_student: int) -> List[int]:
    """Maximally-spaced teacher layer indices, first and last included
    (distil-whisper's initialization: for n_student=2 -> [0, n_teacher-1])."""
    if n_student == 1:
        return [n_teacher - 1]
    return [
        round(i * (n_teacher - 1) / (n_student - 1)) for i in range(n_student)
    ]


def init_student_params(teacher_params: dict, teacher_cfg: WhisperConfig,
                        n_text_layer: int) -> dict:
    """Student pytree: encoder SHARED (same arrays — frozen anyway), decoder
    blocks gathered from maximally-spaced teacher layers, embeddings/final
    LN copied."""
    layer_map = jnp.asarray(
        pick_layer_map(teacher_cfg.n_text_layer, n_text_layer))
    tdec = teacher_params["decoder"]
    sdec = dict(tdec)
    sdec["blocks"] = jax.tree.map(lambda a: a[layer_map], tdec["blocks"])
    return {"encoder": teacher_params["encoder"], "decoder": sdec}


def cross_memory(hidden: jnp.ndarray, dec_blocks: dict,
                 cfg: WhisperConfig):
    """Cross-attention K/V for every decoder layer from encoder hidden
    states (mirrors model/encoder.encode's precompute; differentiable wrt
    the decoder's cross projections — the student trains through this)."""
    from ..kernels.ops import linear
    from ..model.decoder import to_kv_major

    kscale = jnp.asarray(cfg.d_head_text ** -0.25, dtype=hidden.dtype)
    h = cfg.n_text_head

    def one(ck_w, cv_w, cv_b):
        k = linear(hidden, ck_w) * kscale
        v = linear(hidden, cv_w, cv_b)
        return to_kv_major(k, h), to_kv_major(v, h)

    return jax.vmap(one)(dec_blocks["cross_k_w"], dec_blocks["cross_v_w"],
                         dec_blocks["cross_v_b"])


def distill_loss(
    student_dec: dict,
    frozen: dict,            # {"encoder": ..., "teacher_decoder": ...}
    mel: jnp.ndarray,
    tokens: jnp.ndarray,
    token_mask: jnp.ndarray,
    teacher_cfg: WhisperConfig,
    student_cfg: WhisperConfig,
    kl_weight: float = 1.0,
    ce_weight: float = 0.8,
    temperature: float = 2.0,
):
    """Weighted CE + KL(teacher || student) on next-token distributions.

    One (frozen) encoder forward feeds BOTH decoders; each decoder's cross
    K/V memory is computed from its OWN cross projections — the student's
    are trainable, the teacher's run under stop_gradient.
    """
    enc_out = encode(
        {"encoder": frozen["encoder"], "decoder": frozen["teacher_decoder"]},
        mel, teacher_cfg)
    hidden = jax.lax.stop_gradient(enc_out.hidden)
    s_cross_k, s_cross_v = cross_memory(hidden, student_dec["blocks"],
                                        student_cfg)
    inp = tokens[:, :-1]
    targets = tokens[:, 1:]
    mask = token_mask[:, 1:].astype(jnp.float32)

    s_logits = decoder_forward_train(
        {"decoder": student_dec}, inp, s_cross_k, s_cross_v, student_cfg)
    t_logits = jax.lax.stop_gradient(decoder_forward_train(
        {"decoder": frozen["teacher_decoder"]}, inp, enc_out.cross_k,
        enc_out.cross_v, teacher_cfg))

    ce = optax.softmax_cross_entropy_with_integer_labels(s_logits, targets)
    t_prob = jax.nn.softmax(t_logits / temperature, axis=-1)
    s_logp = jax.nn.log_softmax(s_logits / temperature, axis=-1)
    t_logp = jax.nn.log_softmax(t_logits / temperature, axis=-1)
    kl = (t_prob * (t_logp - s_logp)).sum(-1) * (temperature ** 2)

    denom = jnp.maximum(mask.sum(), 1.0)
    ce_l = (ce * mask).sum() / denom
    kl_l = (kl * mask).sum() / denom
    return ce_weight * ce_l + kl_weight * kl_l, (ce_l, kl_l)


def _flatten_dec(dec: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in dec.items():
        if isinstance(v, dict):
            out.update(_flatten_dec(v, prefix + k + "."))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def save_draft(path: str, params: dict, config: WhisperConfig) -> None:
    """Persist a distilled DRAFT decoder as .npz (the encoder is shared with
    the target by construction, so only the decoder subtree ships). Consumed
    by ``load_draft`` and `BENCH_MODE=spec BENCH_DRAFT=<path>`."""
    np.savez(path, __n_text_layer__=config.n_text_layer,
             **_flatten_dec(params["decoder"]))


def load_draft(path: str, teacher_params: dict, teacher_cfg: WhisperConfig,
               dtype=None):
    """(draft_params, draft_config) from a ``save_draft`` file: the draft
    shares the teacher's encoder arrays; its cross memory projects from the
    teacher's hidden state (model/encoder.cross_kv_from_hidden)."""
    flat = np.load(path)
    n_layer = int(flat["__n_text_layer__"])
    dec: dict = {}
    for k in flat.files:
        if k == "__n_text_layer__":
            continue
        parts = k.split(".")
        d = dec
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        arr = flat[k]
        if arr.dtype == np.dtype("V2"):
            # np.savez stores ml_dtypes.bfloat16 as raw 2-byte void records
            # and np.load cannot cast them; reinterpret explicitly.
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        d[parts[-1]] = jnp.asarray(arr, dtype=dtype or arr.dtype)
    cfg = student_config(teacher_cfg, n_layer)
    return {"encoder": teacher_params["encoder"], "decoder": dec}, cfg


@dataclasses.dataclass
class DistillResult:
    params: dict                 # full student pytree (shared encoder)
    config: WhisperConfig
    losses: List[float]
    ce_losses: List[float]
    kl_losses: List[float]


def make_distill_step(teacher_cfg, student_cfg, optimizer,
                      kl_weight=1.0, ce_weight=0.8, temperature=2.0):
    @jax.jit
    def step(student_dec, opt_state, frozen, mel, tokens, token_mask):
        (loss, (ce_l, kl_l)), grads = jax.value_and_grad(
            distill_loss, has_aux=True)(
            student_dec, frozen, mel, tokens, token_mask,
            teacher_cfg, student_cfg, kl_weight, ce_weight, temperature)
        updates, opt_state = optimizer.update(grads, opt_state, student_dec)
        student_dec = optax.apply_updates(student_dec, updates)
        return student_dec, opt_state, loss, ce_l, kl_l

    return step


def distill(
    model,                       # teacher WhisperModel
    pairs: Sequence[Tuple[np.ndarray, str]],
    n_text_layer: int = 2,
    steps: int = 100,
    batch_size: int = 4,
    lr: float = 1e-4,
    kl_weight: float = 1.0,
    ce_weight: float = 0.8,
    temperature: float = 2.0,
    language: str = "en",
    seed: int = 0,
    log_every: int = 10,
) -> DistillResult:
    """Distill ``model``'s decoder into ``n_text_layer`` layers on (audio,
    transcript) pairs (use the teacher's own transcripts for pseudo-label
    distillation). Returns the student params + config and the loss curves."""
    from .finetune import make_batches

    teacher_cfg = model.config
    s_cfg = student_config(teacher_cfg, n_text_layer)
    student_dec = init_student_params(
        model.params, teacher_cfg, n_text_layer)["decoder"]
    frozen = {"encoder": model.params["encoder"],
              "teacher_decoder": model.params["decoder"]}

    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(student_dec)
    step_fn = make_distill_step(
        teacher_cfg, s_cfg, optimizer, kl_weight, ce_weight, temperature)

    losses: List[float] = []
    ces: List[float] = []
    kls: List[float] = []
    it = 0
    while it < steps:
        for mel, tokens, token_mask in make_batches(
                model, pairs, batch_size, language=language, seed=seed + it):
            student_dec, opt_state, loss, ce_l, kl_l = step_fn(
                student_dec, opt_state, frozen, mel, tokens, token_mask)
            losses.append(float(loss))
            ces.append(float(ce_l))
            kls.append(float(kl_l))
            it += 1
            if it % log_every == 0:
                log.info("distill step %d: loss=%.4f ce=%.4f kl=%.4f",
                         it, losses[-1], ces[-1], kls[-1])
            if it >= steps:
                break
    params = {"encoder": model.params["encoder"], "decoder": student_dec}
    return DistillResult(params=params, config=s_cfg, losses=losses,
                         ce_losses=ces, kl_losses=kls)
