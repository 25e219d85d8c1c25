"""SEED-Encoder pretraining: MLM + CLS-bottleneck decoder reconstruction.

The reference repo ships pretrained SEED checkpoints but no pretraining
code (SEED-Encoder.md:1 — fine-tuning only), so this is beyond-parity: the
TPU-native pretraining loop for ``SeedForMaskedLM`` (models/seed.py), whose
objective the reference's modeling code defines implicitly:

  * RoBERTa-style dynamic masking over the encoder input → MLM loss on the
    masked positions (reference modeling_seed_encoder.py:147-183 MLM head);
  * a weak windowed decoder, cross-attending ONLY to the CLS bottleneck,
    teacher-forced to reconstruct the full token sequence → LM loss
    (the information-flow restriction that makes CLS absorb sentence
    semantics — SEED paper §3);
  * the two terms weighted by ``train_ratio``
    (configuration_seed_encoder.py:92 '0.5:0.5').

Data comes straight from a preprocessed token cache (e.g. the MS MARCO
``passages`` cache) — no separate pretraining corpus format. Masking is
dynamic (fresh per epoch), BERT-style 80/10/10.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ance_tpu.data.cache import TokenCache
from ance_tpu.models import losses

logger = logging.getLogger(__name__)


def mask_tokens(tokens: np.ndarray, lengths: np.ndarray, *,
                mask_token_id: int, vocab_size: int,
                special_ids: Sequence[int], rs: np.random.RandomState,
                mask_prob: float = 0.15,
                first_regular_id: int = 5
                ) -> tuple[np.ndarray, np.ndarray]:
    """BERT-style dynamic masking: select ``mask_prob`` of the non-special
    in-length positions; of those 80% → [MASK], 10% → random regular token,
    10% → unchanged. Returns (masked_tokens, mlm_mask) with mlm_mask=1 at
    the selected (loss-bearing) positions."""
    B, L = tokens.shape
    in_len = np.arange(L)[None, :] < lengths[:, None]
    special = np.isin(tokens, np.asarray(list(special_ids)))
    candidates = in_len & ~special
    sel = candidates & (rs.random_sample((B, L)) < mask_prob)
    roll = rs.random_sample((B, L))
    masked = tokens.copy()
    masked[sel & (roll < 0.8)] = mask_token_id
    rand_pos = sel & (roll >= 0.8) & (roll < 0.9)
    masked[rand_pos] = rs.randint(first_regular_id, vocab_size,
                                  int(rand_pos.sum()))
    return masked, sel.astype(np.int32)


def seed_pretrain_batches(cache: TokenCache, batch_size: int, *,
                          mask_token_id: int, vocab_size: int,
                          special_ids: Sequence[int], pad_token_id: int = 1,
                          mask_prob: float = 0.15, seed: int = 0,
                          epoch: int = 0, host_id: int = 0,
                          num_hosts: int = 1) -> Iterator[dict]:
    """One epoch of pretraining batches from a token cache.

    Each record row yields: ``src_tokens`` (dynamically masked),
    ``attention_mask``, MLM targets/mask, and the teacher-forced decoder
    stream — ``prev_tokens`` = row shifted right (starts at CLS, the
    fairseq shifted-target convention), ``dec_targets`` = tokens 1..l−1,
    masked to real positions. Dynamic masking: the mask redraws per
    (seed, epoch), RoBERTa-style. Hosts stripe records round-robin.

    Multi-host contract: the shuffle is seeded host-INDEPENDENTLY so every
    host stripes the same global permutation (per-host seeds would draw
    stripes from different orderings — some records never seen, others
    double-weighted); only the masking RNG differs per host. Stripes are
    truncated to ``n // num_hosts`` records so every host yields the same
    number of batches — a one-record imbalance would deadlock the sharded
    train step's collectives at the epoch tail."""
    shuffle_rs = np.random.RandomState(seed + 7919 * epoch)
    rs = np.random.RandomState(seed + 7919 * epoch + 104729 * host_id)
    n = len(cache)
    order = np.arange(n)
    shuffle_rs.shuffle(order)
    order = order[host_id::num_hosts][:n // num_hosts]
    L = cache.embedding_size
    for s in range(0, len(order) - batch_size + 1, batch_size):
        keys = order[s:s + batch_size]
        lengths, tokens = cache.batch(keys)
        tokens = tokens.astype(np.int32)
        in_len = np.arange(L)[None, :] < lengths[:, None]
        tokens = np.where(in_len, tokens, pad_token_id)
        masked, mlm_mask = mask_tokens(
            tokens, lengths, mask_token_id=mask_token_id,
            vocab_size=vocab_size, special_ids=special_ids, rs=rs,
            mask_prob=mask_prob)
        prev = np.roll(tokens, 1, axis=1)
        prev[:, 0] = tokens[:, 0]            # CLS starts the decode
        prev = np.where(in_len, prev, pad_token_id)
        dec_targets = tokens
        dec_mask = (in_len & (np.arange(L)[None, :] > 0)).astype(np.int32)
        yield {"src_tokens": masked,
               "attention_mask": in_len.astype(np.int32),
               "mlm_targets": tokens, "mlm_mask": mlm_mask,
               "prev_tokens": prev, "dec_targets": dec_targets,
               "dec_mask": dec_mask}


def make_seed_pretrain_step(model, optimizer,
                            train_ratio: tuple[float, float] = (0.5, 0.5),
                            mesh=None, data_axis: str = "data") -> Callable:
    """(state, batch, rng) → (state, {loss, mlm_loss, decoder_loss})."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ance_tpu.train.trainer import TrainState

    def loss_fn(params, batch, dropout_rng):
        mlm_logits, dec_logits = model.apply(
            {"params": params}, batch["src_tokens"],
            batch["attention_mask"], batch["prev_tokens"],
            deterministic=False, rngs={"dropout": dropout_rng})
        total, parts = losses.seed_pretrain_loss(
            mlm_logits, batch["mlm_targets"], batch["mlm_mask"],
            dec_logits, batch["dec_targets"], batch["dec_mask"],
            train_ratio)
        return total, parts

    def step_fn(state: TrainState, batch, dropout_rng):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, {"loss": loss, **parts}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    return jax.jit(step_fn, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))


@dataclasses.dataclass
class SeedPretrainConfig:
    num_epochs: int = 1
    batch_size: int = 32
    mask_prob: float = 0.15
    max_steps: int = -1
    save_steps: int = 0
    log_every: int = 100
    checkpoint_dir: Optional[str] = None
    seed: int = 42
    host_id: int = 0
    num_hosts: int = 1


def run_seed_pretrain(cfg: SeedPretrainConfig, *, state, train_step: Callable,
                      cache: TokenCache, rng, mask_token_id: int,
                      vocab_size: int, special_ids: Sequence[int],
                      pad_token_id: int = 1,
                      params_of: Callable = lambda s: s.params,
                      batch_transform: Optional[Callable] = None):
    """Epoch loop over the cache with dynamic re-masking. Returns
    (state, history of {step, loss, mlm_loss, decoder_loss})."""
    from ance_tpu.train import checkpoint as ckpt
    history = []
    global_step = 0
    for epoch in range(cfg.num_epochs):
        for batch in seed_pretrain_batches(
                cache, cfg.batch_size, mask_token_id=mask_token_id,
                vocab_size=vocab_size, special_ids=special_ids,
                pad_token_id=pad_token_id, mask_prob=cfg.mask_prob,
                seed=cfg.seed, epoch=epoch, host_id=cfg.host_id,
                num_hosts=cfg.num_hosts):
            if batch_transform is not None:
                batch = batch_transform(batch)
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, batch, sub)
            global_step += 1
            if global_step % cfg.log_every == 0 or global_step == 1:
                entry = {"step": global_step,
                         **{k: float(jax.device_get(v))
                            for k, v in metrics.items()}}
                history.append(entry)
                logger.info("seed-pretrain %s", entry)
            if cfg.save_steps and cfg.checkpoint_dir and cfg.host_id == 0 \
                    and global_step % cfg.save_steps == 0:
                ckpt.save_checkpoint(cfg.checkpoint_dir, global_step,
                                     params_of(state),
                                     opt_state=getattr(state, "opt_state",
                                                       None),
                                     extra={"epoch": epoch})
            if 0 < cfg.max_steps <= global_step:
                break
        else:
            continue
        break
    if cfg.checkpoint_dir and cfg.host_id == 0:
        ckpt.save_checkpoint(cfg.checkpoint_dir, global_step,
                             params_of(state),
                             opt_state=getattr(state, "opt_state", None),
                             extra={"final": True})
    return state, history
