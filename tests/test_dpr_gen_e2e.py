"""End-to-end DPR ANN generation pass over the preprocessed mini-wiki."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ance_tpu.data.cache import TokenCache
from ance_tpu.data.dpr import (
    load_answers, load_mapping, load_positive_ids, load_passage_texts,
    preprocess_dpr)
from ance_tpu.models.dot_models import BiEncoder
from ance_tpu.models.transformer import EncoderConfig
from ance_tpu.train.dpr_gen import generate_new_ann_dpr
from ance_tpu.train.encode import make_encode_fn

from test_dpr import _write_dpr_raw, make_fake_bert_tokenizer


def test_generate_new_ann_dpr(tmp_path):
    cfg = _write_dpr_raw(tmp_path)
    preprocess_dpr(cfg, make_fake_bert_tokenizer)
    out = cfg.out_data_dir

    pid2offset, _ = load_mapping(out, "pid2offset")
    raw_texts = load_passage_texts(cfg.wiki_dir + "/psgs_w100.tsv")
    passage_texts = {pid2offset[pid]: t for pid, t in raw_texts.items()}
    train_answers = load_answers(out + "/train-ann")
    positives = load_positive_ids(out + "/train-data")
    # test answers keyed by qas row order (reference load_data parses the csv)
    test_answers = {0: ["paris"]}
    trivia_answers = {0: ["germany"]}

    enc_cfg = EncoderConfig.bert_base(
        vocab_size=520, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BiEncoder(enc_cfg)
    L = cfg.max_seq_length
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((2, L), jnp.int32),
                                 jnp.ones((2, L), jnp.int32))["params"]
    qfn = make_encode_fn(model, BiEncoder.query_emb)
    bfn = make_encode_fn(model, BiEncoder.body_emb)

    with TokenCache(out + "/train-query") as tq, \
            TokenCache(out + "/test-query") as te, \
            TokenCache(out + "/trivia-test-query") as tr, \
            TokenCache(out + "/passages") as pc:
        result = generate_new_ann_dpr(
            output_num=0, checkpoint_path="init", params=params,
            query_encode_fn=qfn, body_encode_fn=bfn,
            train_query_cache=tq, test_query_cache=te,
            trivia_test_query_cache=tr, passage_cache=pc,
            passage_texts=passage_texts, train_answers=train_answers,
            test_answers=test_answers, trivia_test_answers=trivia_answers,
            training_query_positive_id=positives,
            output_dir=str(tmp_path / "ann"), topk_training=4,
            negative_sample=2, dev_search_depth=4, encode_batch_size=4)

    assert 0.0 <= result["top20"] <= 1.0
    sidecar = json.load(open(result["ndcg_path"]))
    assert set(sidecar) >= {"top20", "top100", "top20_trivia",
                            "top100_trivia", "checkpoint"}
    lines = open(result["data_path"]).read().splitlines()
    # negatives never contain the answer string (answer-filtered mining)
    for line in lines:
        qid, pos, negs = line.split("\t")
        answers = train_answers[int(qid)]
        for neg in negs.split(","):
            text = passage_texts[int(neg)][0]
            assert not any(a in text for a in answers)
