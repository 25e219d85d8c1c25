"""Goldens that EXECUTE the reference's own code — not a re-derivation.

Earlier parity tests re-typed the reference math by hand (test_optim.py),
which can't catch a shared transcription error. These import the actual
reference sources from /root/reference (read-only) and run them on the same
inputs as our implementations:

  * utils/lamb.py::Lamb.step           vs optim/lamb.py::reference_lamb
  * drivers/run_ann_data_gen.py::GenerateNegativePassaageID
                                       vs train/ann_gen.py::mine_negatives
  * utils/util.py::get_latest_ann_data vs train/ann_gen.py::get_latest_ann_data
  * utils/msmarco_eval.py::compute_metrics(_from_files)
                                       vs evaluation/msmarco_eval.py

The reference's CUDA/faiss deps don't exist here, so module-level imports it
never actually exercises in these functions are stubbed in sys.modules
(faiss, pytrec_eval, tensorboardX, sentencepiece) and the transformers
2.x-era ``AdamW`` symbol is aliased to torch's — none of the functions under
test touch any of those.
"""

import importlib.machinery
import importlib.util
import json
import os
import random
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


def _stub(name: str) -> None:
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    m.SummaryWriter = object          # tensorboardX surface lamb.py touches
    m.SentencePieceProcessor = object  # transformers' optional dep probe
    sys.modules[name] = m


def _load_ref_module(relpath: str, modname: str):
    """Import a single reference file by path (no package side effects)."""
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_lamb():
    _stub("tensorboardX")
    return _load_ref_module("utils/lamb.py", "_ref_lamb")


@pytest.fixture(scope="module")
def ref_msmarco_eval():
    return _load_ref_module("utils/msmarco_eval.py", "_ref_msmarco_eval")


@pytest.fixture(scope="module")
def ref_msmarco_data(ref_gen):
    """reference data/msmarco_data.py, riding ref_gen's sys.path/stub setup."""
    import data.msmarco_data as md
    return md


@pytest.fixture(scope="module")
def ref_gen():
    """The full drivers/run_ann_data_gen.py module, imported for real."""
    for name in ("faiss", "pytrec_eval", "tensorboardX", "sentencepiece"):
        _stub(name)
    sys.path.insert(0, REF)
    try:
        # utils.util's transformers side effects must land BEFORE the AdamW
        # alias (importing it later resets the lazy module's attributes)
        import utils.util as ref_util  # noqa: F401
        import transformers
        if not hasattr(transformers, "AdamW"):
            transformers.AdamW = torch.optim.AdamW
        import drivers.run_ann_data_gen as gen
        yield gen, ref_util
    finally:
        sys.path.remove(REF)
        # the reference uses generic top-level package names (utils, data,
        # model, drivers) — evict them so no later test import collides
        for name in list(sys.modules):
            root = name.split(".", 1)[0]
            if root in ("utils", "data", "model", "drivers"):
                mod = sys.modules[name]
                if getattr(mod, "__file__", "") and \
                        str(getattr(mod, "__file__", "")).startswith(REF):
                    del sys.modules[name]


def test_lamb_executes_reference_source(ref_lamb):
    """Run the reference's actual Lamb.step for 5 steps against
    reference_lamb on identical params/grads (reference utils/lamb.py:95-121)."""
    import jax
    import jax.numpy as jnp

    from ance_tpu.optim.lamb import reference_lamb

    rs = np.random.RandomState(7)
    shapes = {"w": (16, 8), "b": (8,), "big": (64,)}
    params = {k: rs.randn(*s).astype(np.float32) for k, s in shapes.items()}
    params["big"] *= 10.0  # push ‖w‖ past the reference's clamp at 10
    lr, b1, b2, eps, wd = 2e-3, 0.9, 0.999, 1e-6, 0.01

    tp = {k: torch.nn.Parameter(torch.tensor(v.copy()))
          for k, v in params.items()}
    opt_t = ref_lamb.Lamb(list(tp.values()), lr=lr, betas=(b1, b2), eps=eps,
                          weight_decay=wd)

    opt_j = reference_lamb(lr, b1, b2, eps, weight_decay=wd)
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    state = opt_j.init(jp)
    step = jax.jit(lambda g, s, p: opt_j.update(g, s, p))

    for _ in range(5):
        grads = {k: rs.randn(*shapes[k]).astype(np.float32) for k in shapes}
        for k in shapes:
            tp[k].grad = torch.tensor(grads[k])
        opt_t.step()
        updates, state = step({k: jnp.asarray(v) for k, v in grads.items()},
                              state, jp)
        jp = jax.tree.map(lambda p, u: p + u, jp, updates)

    for k in shapes:
        np.testing.assert_allclose(np.asarray(jp[k]),
                                   tp[k].detach().numpy(),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


@pytest.mark.parametrize("select_topk", [True, False])
def test_mine_negatives_executes_reference_source(ref_gen, select_topk):
    """GenerateNegativePassaageID (reference run_ann_data_gen.py:339-396)
    and mine_negatives produce identical negatives and MRR probe on the
    same neighbor matrix — including the shuffled-negatives path, by
    feeding both sides the same Mersenne stream."""
    gen, _ = ref_gen
    from ance_tpu.train.ann_gen import mine_negatives

    rs = np.random.RandomState(3)
    n_q, n_p, depth = 12, 40, 20
    query_embedding2id = np.arange(100, 100 + n_q)
    passage_embedding2id = rs.permutation(n_p) + 500
    neighbors = np.stack([rs.permutation(n_p)[:depth] for _ in range(n_q)])
    # positives for 9 of 12 queries; 3 are outside the effective set
    positive = {int(query_embedding2id[i]):
                int(passage_embedding2id[neighbors[i, rs.randint(depth)]])
                for i in range(9)}
    effective = set(positive)
    args = SimpleNamespace(ann_measure_topk_mrr=select_topk,
                           negative_sample=5, rank=0)

    random.seed(11)  # reference consumes the GLOBAL random stream
    ref_negs = gen.GenerateNegativePassaageID(
        args, query_embedding2id, passage_embedding2id, positive,
        neighbors.copy(), effective)

    ours_negs, ours_mrr = mine_negatives(
        query_embedding2id, passage_embedding2id, positive, neighbors,
        negative_sample=5, select_topk=select_topk,
        rng=random.Random(11))

    assert {int(k): [int(p) for p in v] for k, v in ours_negs.items()} \
        == {int(k): [int(p) for p in v] for k, v in ref_negs.items()}
    if select_topk:
        # re-derive the reference's printed MRR from its own loop to compare
        random.seed(11)
        mrr = 0.0
        for qi in range(n_q):
            qid = int(query_embedding2id[qi])
            if qid not in effective:
                continue
            for rank, idx in enumerate(neighbors[qi, :6], start=1):
                if int(passage_embedding2id[idx]) == positive[qid] \
                        and rank <= 10:
                    mrr += 1.0 / rank
        assert ours_mrr == pytest.approx(mrr / 9)


def test_get_latest_ann_data_executes_reference_source(ref_gen, tmp_path):
    """utils/util.py:229-243 and ann_gen.get_latest_ann_data agree on an
    identical directory — including the empty and no-dir cases."""
    _, ref_util = ref_gen
    from ance_tpu.train.ann_gen import get_latest_ann_data

    missing = str(tmp_path / "nope")
    assert ref_util.get_latest_ann_data(missing) == \
        get_latest_ann_data(missing) == (-1, None, None)

    d = tmp_path / "ann"
    d.mkdir()
    assert ref_util.get_latest_ann_data(str(d)) == \
        get_latest_ann_data(str(d)) == (-1, None, None)

    for n, ndcg in ((0, 0.21), (3, 0.29)):
        (d / f"ann_ndcg_{n}").write_text(
            json.dumps({"ndcg": ndcg, "checkpoint": f"ckpt-{n}"}))
        (d / f"ann_training_data_{n}").write_text("1\t2\t3\n")
    ref_out = ref_util.get_latest_ann_data(str(d))
    ours_out = get_latest_ann_data(str(d))
    assert ref_out == ours_out
    assert ref_out[0] == 3 and ref_out[2]["ndcg"] == 0.29


def test_msmarco_eval_executes_reference_source(ref_msmarco_eval, tmp_path):
    """The reference's official scorer (utils/msmarco_eval.py:109-139) and
    ours produce the same MRR@10 on identical dicts AND identical files."""
    from ance_tpu.evaluation import msmarco_eval as ours

    # the reference indexes candidate_pid[0:10] unconditionally — its
    # load_candidate pads every ranking to 1000 entries of pid 0, so feed
    # both sides reference-shaped (padded) dicts
    qrels = {1: [7], 2: [9], 3: [4], 4: [1]}
    ranked = {1: [7, 8, 5], 2: [5, 6, 9], 3: [2, 3], 4: []}
    ranked = {q: (r + [0] * 1000)[:1000] for q, r in ranked.items()}
    ref_m = ref_msmarco_eval.compute_metrics(qrels, ranked)
    our_m = ours.compute_metrics(qrels, ranked)
    assert our_m["MRR @10"] == pytest.approx(ref_m["MRR @10"])
    assert our_m["QueriesRanked"] == ref_m["QueriesRanked"]

    ref_f = tmp_path / "qrels.tsv"
    ref_f.write_text("1\t0\t7\t1\n2\t0\t9\t1\n3\t0\t4\t1\n")
    cand = tmp_path / "cand.tsv"
    cand.write_text("1\t7\t1\n1\t8\t2\n2\t5\t1\n2\t9\t2\n3\t2\t1\n")
    ref_m = ref_msmarco_eval.compute_metrics_from_files(str(ref_f), str(cand))
    our_m = ours.compute_metrics_from_files(str(ref_f), str(cand))
    assert our_m["MRR @10"] == pytest.approx(ref_m["MRR @10"])
    assert our_m["QueriesRanked"] == ref_m["QueriesRanked"]


def _write_cache(tmp_path, name, n, max_len, seed):
    from ance_tpu.data.cache import TokenCacheWriter
    rs = np.random.RandomState(seed)
    base = str(tmp_path / name)
    rows = []
    with TokenCacheWriter(base, max_len) as w:
        for _ in range(n):
            length = int(rs.randint(1, max_len + 1))
            toks = np.zeros(max_len, np.int32)
            toks[:length] = rs.randint(5, 1000, size=length)
            w.write(length, toks)
            rows.append((length, toks))
    return base, rows


def test_embedding_cache_executes_reference_source(ref_gen, tmp_path):
    """The reference's EmbeddingCache (utils/util.py:257-307) reads a cache
    file OUR TokenCacheWriter wrote — random access, len, and the seeded
    iteration permutation all match our TokenCache on the same bytes."""
    _, ref_util = ref_gen
    from ance_tpu.data.cache import TokenCache

    base, rows = _write_cache(tmp_path, "pc", n=13, max_len=9, seed=5)
    with ref_util.EmbeddingCache(base) as ref_c, TokenCache(base) as ours_c:
        assert len(ref_c) == len(ours_c) == 13
        for i in (0, 5, 12):
            ref_len, ref_toks = ref_c[i]
            our_len, our_toks = ours_c[i]
            assert ref_len == our_len == rows[i][0]
            np.testing.assert_array_equal(ref_toks, our_toks)
            np.testing.assert_array_equal(ref_toks, rows[i][1])
    with ref_util.EmbeddingCache(base, seed=11) as ref_c, \
            TokenCache(base, seed=11) as ours_c:
        for (ref_len, ref_toks), (our_len, our_toks) in zip(ref_c, ours_c):
            assert ref_len == our_len
            np.testing.assert_array_equal(ref_toks, our_toks)


def test_triplet_processing_fn_executes_reference_source(
        ref_gen, ref_msmarco_data, tmp_path):
    """GetTripletTrainingDataProcessingFn (reference
    data/msmarco_data.py:337-362), fed through the reference's own
    EmbeddingCache over caches our writer produced, yields exactly the
    (ids, mask) triples TripletBatches assembles from the same lines."""
    _, ref_util = ref_gen
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.data.feed import TripletBatches, expand_triples

    max_q, max_p = 6, 9
    qbase, _ = _write_cache(tmp_path, "q", n=4, max_len=max_q, seed=1)
    pbase, _ = _write_cache(tmp_path, "p", n=8, max_len=max_p, seed=2)
    lines = ["0\t1\t2,3\n", "2\t5\t0,6,7\n"]
    args = SimpleNamespace(max_query_length=max_q, max_seq_length=max_p)

    with ref_util.EmbeddingCache(qbase) as qc, \
            ref_util.EmbeddingCache(pbase) as pc:
        fn = ref_msmarco_data.GetTripletTrainingDataProcessingFn(args, qc, pc)
        ref_rows = [r for i, line in enumerate(lines) for r in fn(line, i)]

    triples = expand_triples(lines)
    batches = TripletBatches(TokenCache(qbase), TokenCache(pbase),
                             triples, batch_size=triples.shape[0])
    batch = next(iter(batches.epoch(0)))

    assert len(ref_rows) == triples.shape[0] == 5
    for t, row in enumerate(ref_rows):
        q_ids, q_mask, _, p_ids, p_mask, _, n_ids, n_mask, _ = row
        np.testing.assert_array_equal(batch["query_ids"][t], q_ids.numpy())
        np.testing.assert_array_equal(
            batch["query_mask"][t], q_mask.numpy().astype(np.int32))
        np.testing.assert_array_equal(batch["pos_ids"][t], p_ids.numpy())
        np.testing.assert_array_equal(
            batch["pos_mask"][t], p_mask.numpy().astype(np.int32))
        np.testing.assert_array_equal(batch["neg_ids"][t], n_ids.numpy())
        np.testing.assert_array_equal(
            batch["neg_mask"][t], n_mask.numpy().astype(np.int32))
