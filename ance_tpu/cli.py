"""``ance`` command-line interface.

Subcommands mirror the reference's driver scripts (flag names kept close to
the reference argparse surface for operability, SURVEY.md §7.1 "cli/"):

  preprocess       data/msmarco_data.py main        (passage + doc modes)
  preprocess-dpr   data/DPR_data.py main            (NQ/TriviaQA/both)
  warmup           drivers/run_warmup.py            (BM25 triples trainer)
  train            drivers/run_ann.py               (ANCE trainer, poll mode)
  generate         drivers/run_ann_data_gen.py      (encode→index→mine)
  ance-loop        single-program generate→train alternation (TPU-native)
  infer            drivers/run_ann_data_gen.py --inference
  serve            batch retrieval serving (encoder + exact index → rankings)
  eval             evaluation notebook / msmarco_eval.py CLI
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

logger = logging.getLogger("ance_tpu")


class _tokenizer_factory:
    """Resolve a tokenizer by name: HF pretrained (roberta-base /
    bert-base-uncased / local dir) or the native WordPiece.

    A picklable class, not a closure — preprocessing fans out over
    spawn-based worker processes that must serialize the factory."""

    def __init__(self, name: str, model_dir: str | None = None):
        self.name = name
        self.model_dir = model_dir

    def __call__(self):
        if self.name == "seed-wordpiece":
            from ance_tpu.data.wordpiece import WordPieceTokenizer
            if not self.model_dir:
                raise SystemExit("seed tokenizer requires --model_name_or_path "
                                 "pointing at a vocab.txt directory")
            return WordPieceTokenizer.from_vocab_file(self.model_dir)
        from transformers import AutoTokenizer
        if self.model_dir:
            try:
                return AutoTokenizer.from_pretrained(self.model_dir)
            except Exception:
                # a weights-only dir (native pretrain→finetune handoff
                # checkpoints carry no tokenizer files) — fall back to the
                # registry's default tokenizer for the model family
                print(f"note: no tokenizer files in {self.model_dir}; "
                      f"falling back to {self.name!r}", file=sys.stderr)
        return AutoTokenizer.from_pretrained(self.name)


def _parse_host_port(spec: str) -> tuple[str, int]:
    """Validate a ``--http HOST:PORT`` value: a missing or non-numeric port
    is a usage error (clean SystemExit), not a ValueError traceback. IPv6
    literals must be bracketed (``[::1]:8080``) — bare colons are ambiguous."""
    host, sep, port = spec.rpartition(":")
    if not sep or not port.isdigit():
        raise SystemExit(f"--http expects HOST:PORT (got {spec!r}), "
                         "e.g. 127.0.0.1:8080 or [::1]:8080")
    if ":" in host and not (host.startswith("[") and host.endswith("]")):
        raise SystemExit(f"--http IPv6 hosts must be bracketed (got "
                         f"{spec!r}), e.g. [::1]:8080")
    port_num = int(port)
    if not 0 <= port_num <= 65535:
        raise SystemExit(f"--http port {port_num} out of range [0, 65535]")
    return host.strip("[]") or "127.0.0.1", port_num


def _add_common_model_flags(p):
    p.add_argument("--model_type", default="rdot_nll",
                   help="registry key (rdot_nll | rdot_nll_multi_chunk | "
                        "dpr | seeddot_nll)")
    p.add_argument("--model_name_or_path", default=None,
                   help="HF checkpoint dir / tokenizer source")
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--max_query_length", type=int, default=64)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 encoder compute (recommended on TPU)")
    p.add_argument("--attention", default="auto",
                   choices=["auto", "xla", "xla_bf16", "fused", "flash"],
                   help="auto picks by measured crossover: xla (bf16 "
                        "softmax under --bf16) < seq 256, fused 256-1024, "
                        "flash beyond")
    p.add_argument("--encoder_overrides", default=None,
                   help="debug/smoke-test JSON overriding encoder-config "
                        "fields, e.g. '{\"num_layers\": 2, "
                        "\"hidden_size\": 64}'")


def _build_model(args):
    import jax.numpy as jnp
    from ance_tpu.models.registry import get_model_spec
    spec = get_model_spec(args.model_type)
    overrides = json.loads(args.encoder_overrides) \
        if getattr(args, "encoder_overrides", None) else None
    model = spec.build(dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                       attention_impl=args.attention,
                       config_overrides=overrides)
    return spec, model


def cmd_preprocess(args):
    from ance_tpu.data.preprocess import PreprocessConfig, preprocess
    from ance_tpu.models.registry import get_model_spec
    spec = get_model_spec(args.model_type)
    cfg = PreprocessConfig(
        data_dir=args.data_dir, out_data_dir=args.out_data_dir,
        data_type=args.data_type, max_seq_length=args.max_seq_length,
        max_query_length=args.max_query_length,
        max_doc_character=args.max_doc_character,
        num_processes=args.num_processes)
    result = preprocess(cfg, _tokenizer_factory(spec.tokenizer_name,
                                                args.model_name_or_path))
    print(json.dumps({k: len(v) if isinstance(v, dict) else v
                      for k, v in result.items()}))


def cmd_preprocess_dpr(args):
    from ance_tpu.data.dpr import DprPreprocessConfig, preprocess_dpr
    from ance_tpu.models.registry import get_model_spec
    spec = get_model_spec(args.model_type)
    cfg = DprPreprocessConfig(
        wiki_dir=args.wiki_dir, question_dir=args.question_dir,
        answer_dir=args.answer_dir, out_data_dir=args.out_data_dir,
        data_type=args.data_type, max_seq_length=args.max_seq_length,
        num_processes=args.num_processes)
    result = preprocess_dpr(cfg, _tokenizer_factory(
        spec.tokenizer_name, args.model_name_or_path))
    print(json.dumps({k: (len(v) if isinstance(v, dict) else v)
                      for k, v in result.items()}))


def _torch_ckpt_file(model_dir: str) -> bool:
    return any(f.endswith((".bin", ".pt")) for f in os.listdir(model_dir))


def _native_ckpt_dir(model_dir: str):
    """Resolve a NATIVE checkpoint under ``model_dir``: the dir itself
    (params.msgpack / orbax ``state/``) or the newest complete
    ``checkpoint-N`` inside it. None when there is nothing native.

    An orbax ``state/`` requires the DONE marker — the async writer commits
    it only at the fence (checkpoint.py protocol), so an unmarked state dir
    may be mid-write. A ``params.msgpack`` is published by atomic rename
    and is safe to read as soon as it exists."""
    from ance_tpu.train import checkpoint as ckpt
    if os.path.exists(os.path.join(model_dir, "params.msgpack")) or \
            (os.path.isdir(os.path.join(model_dir, "state"))
             and ckpt.is_complete(model_dir)):
        return model_dir
    path, _ = ckpt.get_latest_checkpoint(model_dir)
    return path if path and ckpt.is_complete(path) else None


def _has_warm_start(model_dir: str) -> bool:
    return _torch_ckpt_file(model_dir) or _native_ckpt_dir(model_dir) is not None


def _eval_mesh(batch_size: int, tensor_parallel: int = 1):
    """Mesh for generator/inference encode paths (the reference's
    StreamingDataset rank striping, util.py:318-329). None on a single
    device, or when the batch can't split evenly over the data axis.
    With ``tensor_parallel > 1`` the mesh is 2-D (data, model) and the
    encoder weights shard Megatron-style (core/tp.py)."""
    import jax
    from ance_tpu.core.mesh import make_mesh
    n = jax.device_count()
    if n <= 1:
        return None
    tp = max(1, tensor_parallel)
    if n % tp:
        raise SystemExit(f"--tensor_parallel {tp} does not divide "
                         f"{n} devices")
    dp = n // tp
    if batch_size % dp:
        logger.warning("eval batch %d not divisible by %d data-parallel "
                       "devices; encode runs single-device", batch_size, dp)
        return None
    if tp > 1:
        from ance_tpu.core.tp import make_mesh_2d
        return make_mesh_2d(model=tp, data=dp)
    return make_mesh()


def _encode_shardings(args, model, params, mesh):
    """TP param-sharding tree for make_encode_fn, or None (replicated)."""
    tp = getattr(args, "tensor_parallel", 1)
    if mesh is None or tp <= 1:
        return None
    from ance_tpu.core.tp import encoder_param_shardings, validate_tp
    validate_tp(model.config, mesh)
    return encoder_param_shardings(params, mesh)


def _warm_start_params(spec, params, model_dir):
    """Graft a checkpoint onto fresh init params, dispatching the mapping
    on the model family (ADVICE r1: a DPR CheckpointState must go through
    the biencoder mapping, never the RobertaDot one).

    Accepts torch checkpoints (HF/DPR/fairseq dirs) AND native msgpack/
    orbax checkpoints — in particular a ``seed-pretrain`` MLM checkpoint,
    whose encoder grafts onto the seeddot fine-tuning model (the
    reference's pretrain→fine-tune handoff, README.md:83-87; the decoder +
    LM head are pretraining-only and dropped, like the reference dropping
    the fairseq decoder when fine-tuning)."""
    from ance_tpu.models import hf_loader
    native = _native_ckpt_dir(model_dir)
    if native is not None and not _torch_ckpt_file(model_dir):
        from ance_tpu.train import checkpoint as ckpt
        tree = ckpt.load_raw_params(native)
        if "lm_dense" in tree:  # SEED MLM pretraining tree → encoder only
            tree = {"encoder": tree["encoder"]}
        return hf_loader.graft(params, tree)
    sd = hf_loader.load_torch_state_dict(model_dir)
    if spec.two_tower:
        loaded = hf_loader.biencoder_params_from_torch(sd)
    elif spec.name == "seeddot_nll":
        loaded = hf_loader.seeddot_params_from_torch(sd)
    else:
        loaded = hf_loader.robertadot_params_from_torch(sd)
    return hf_loader.graft(params, loaded)


def _make_training(args, model, spec):
    import jax
    import jax.numpy as jnp
    from ance_tpu.core.mesh import initialize_distributed, make_mesh
    from ance_tpu.optim.schedules import warmup_cosine, warmup_linear
    from ance_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step, triplet_loss_fn)

    host_id, num_hosts = initialize_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes, process_id=args.process_id)
    if getattr(args, "rewarmup_per_dataset", False):
        # the reference's DEFAULT scheduler behavior (a fresh warmup per
        # ann-data file, run_ann.py:210-215); our default matches the
        # reference's --single_warmup (one global schedule, run_ann.py:174)
        if getattr(args, "single_warmup", False):
            raise SystemExit("--single_warmup and --rewarmup_per_dataset "
                             "are mutually exclusive")
        if args.lr_style != "linear":
            raise SystemExit("--rewarmup_per_dataset implies the linear "
                             "schedule (the reference rebuilds "
                             "get_linear_schedule_with_warmup)")
        opt = make_optimizer(args.optimizer, args.learning_rate,
                             eps=args.adam_epsilon,
                             weight_decay=args.weight_decay,
                             max_grad_norm=args.max_grad_norm,
                             rewarmup=(args.warmup_steps, args.max_steps))
    else:
        sched_fn = warmup_cosine if args.lr_style == "cosine" \
            else warmup_linear
        schedule = sched_fn(args.learning_rate, args.warmup_steps,
                            args.max_steps)
        opt = make_optimizer(args.optimizer, schedule,
                             eps=args.adam_epsilon,
                             weight_decay=args.weight_decay,
                             max_grad_norm=args.max_grad_norm)
    L = args.max_query_length
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed),
                                 jnp.zeros((2, L), jnp.int32),
                                 jnp.ones((2, L), jnp.int32))["params"]
    if args.model_name_or_path and os.path.isdir(args.model_name_or_path) \
            and _has_warm_start(args.model_name_or_path):
        params = _warm_start_params(spec, params, args.model_name_or_path)
        logger.info("warm-started %s from %s", spec.name,
                    args.model_name_or_path)
    state = init_train_state(params, opt)
    mesh = make_mesh() if args.data_parallel else None
    if spec.loss == "dpr_inbatch":
        from ance_tpu.train.dpr_trainer import make_dpr_accum_train_step
        # accum preserves the GLOBAL softmax (GradCache two-phase step) —
        # published DPR configs' large effective batches at microbatch
        # memory (reference run_ann_dpr.py:65, 226)
        step = make_dpr_accum_train_step(
            model, opt, accum_steps=args.gradient_accumulation_steps,
            mesh=mesh, multichunk=spec.multichunk)
    else:
        step = make_train_step(
            triplet_loss_fn(model, multichunk=spec.multichunk,
                            fused_body=args.fused_body), opt,
            accum_steps=args.gradient_accumulation_steps, mesh=mesh)
    return state, step, mesh, (host_id, num_hosts)


def _add_train_flags(p):
    p.add_argument("--optimizer", default="lamb", choices=["lamb", "adamw"])
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--rewarmup_per_dataset", action="store_true",
                   help="reset the LR warmup at every ann-data swap with "
                        "the new file's size as decay horizon — the "
                        "reference's default scheduler (run_ann.py:210-215)")
    p.add_argument("--single_warmup", action="store_true",
                   help="one global schedule for the whole run (reference "
                        "--single_warmup, run_ann.py:174-178). This is "
                        "already the default; the flag exists for "
                        "reference-commandline parity and rejects being "
                        "combined with --rewarmup_per_dataset")
    p.add_argument("--lr_style", default="linear", choices=["linear", "cosine"])
    p.add_argument("--per_device_train_batch_size", type=int, default=32)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--feed_workers", type=int, default=8,
                   help="mmap-gather prefetch threads for the triple feed "
                        "(order-identical to serial; 8 = measured "
                        "cold-cache optimum, 0 = serial gathers — "
                        "DESIGN.md §5 feed table; replaces the reference "
                        "DataLoader's num_workers, run_ann.py:230-235)")
    p.add_argument("--fused_body", action="store_true",
                   help="encode pos+neg as ONE [2B, S] pass (exactly equal "
                        "in deterministic mode; wider GEMMs)")
    p.add_argument("--data_parallel", action="store_true", default=True)
    p.add_argument("--no_data_parallel", dest="data_parallel",
                   action="store_false")
    # multi-host bring-up (replaces torch.distributed.launch env plumbing,
    # reference run_ann.py:603-646); on TPU pods jax discovers the topology
    # and these can stay unset
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (off-TPU multi-process)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def cmd_warmup(args):
    import jax
    from ance_tpu.train.warmup import WarmupConfig, run_warmup
    spec, model = _build_model(args)
    state, step, _, (host_id, num_hosts) = _make_training(args, model,
                                                          spec)
    tokenizer = _tokenizer_factory(spec.tokenizer_name,
                                   args.model_name_or_path)()

    eval_fn = None
    if args.evaluate_during_training:
        from ance_tpu.evaluation.mrr_eval import passage_dist_eval
        from ance_tpu.train.encode import make_encode_fn
        qfn = make_encode_fn(model, type(model).query_emb)
        bfn = make_encode_fn(model, type(model).body_emb)
        d = args.data_dir

        def eval_fn(params):
            return passage_dist_eval(
                query_encode_fn=qfn, body_encode_fn=bfn, params=params,
                tokenizer=tokenizer,
                queries_path=os.path.join(d, "queries.dev.small.tsv"),
                collection_path=os.path.join(d, "collection.tsv"),
                top1000_path=os.path.join(d, "top1000.dev"),
                qrels_path=os.path.join(d, "qrels.dev.small.tsv"),
                max_query_length=args.max_query_length,
                max_seq_length=args.max_seq_length)

    cfg = WarmupConfig(num_epochs=args.num_train_epochs,
                       batch_size=args.per_device_train_batch_size,
                       max_seq_length=args.max_seq_length,
                       max_steps=args.max_steps,
                       save_steps=args.save_steps,
                       eval_every=args.eval_steps,
                       checkpoint_dir=args.output_dir,
                       host_id=host_id, num_hosts=num_hosts)

    # resume: restore the newest complete checkpoint and skip its steps —
    # a preempted 60K-step warmup must not restart from zero (reference
    # run_warmup.py:144-163 step-skipping resume)
    from ance_tpu.train import checkpoint as ckpt
    state, start_step, _meta = ckpt.resume_train_state(args.output_dir,
                                                       state)
    if start_step:
        logger.info("warmup resume from step %s", start_step)

    state, history = run_warmup(cfg, state=state, train_step=step,
                                tokenizer=tokenizer,
                                triples_path=args.train_file,
                                rng=jax.random.PRNGKey(args.seed),
                                eval_fn=eval_fn, start_step=start_step)
    print(json.dumps(history[-3:]))


def cmd_train(args):
    import jax
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.data.feed import expand_triples, sample_one_neg_triples
    from ance_tpu.train.ance_loop import AnceCycleConfig, run_trainer_job
    spec, model = _build_model(args)
    state, step, mesh, (host_id, num_hosts) = _make_training(args, model,
                                                             spec)

    if args.num_epoch > 0:
        # fixed-epoch alternative to ann polling (reference
        # run_ann_dpr.py:179-211) — a DPR-trainer mode
        if spec.loss != "dpr_inbatch":
            raise SystemExit("--num_epoch is the DPR trainer's fixed-epoch "
                             "mode; use --model_type dpr")
        from ance_tpu.train.dpr_trainer import evaluate_dev, run_dpr_epochs
        epoch_transform = None
        if mesh is not None and num_hosts > 1:
            from ance_tpu.core.mesh import shard_batch
            def epoch_transform(b):
                return shard_batch(b, mesh)
        with TokenCache(args.data_dir + "/train-query") as qc, \
                TokenCache(args.data_dir + "/passages") as pc:
            dev_eval_fn = None
            if args.dev_data:
                def dev_eval_fn(params):
                    return evaluate_dev(
                        model, params, qc, pc, args.dev_data,
                        batch_size=args.per_device_train_batch_size)
            state, history = run_dpr_epochs(
                state=state, train_step=step,
                rng=jax.random.PRNGKey(args.seed),
                params_of=lambda s: s.params,
                query_cache=qc, passage_cache=pc,
                train_data_path=args.data_dir + "/train-data",
                num_epochs=args.num_epoch,
                batch_size=args.per_device_train_batch_size,
                shuffle_seed=args.seed, dev_eval_fn=dev_eval_fn,
                checkpoint_dir=args.output_dir,
                host_id=host_id, num_hosts=num_hosts,
                batch_transform=epoch_transform)
        print(json.dumps(history))
        return

    if not args.ann_dir:
        raise SystemExit("--ann_dir is required unless --num_epoch > 0")
    cycle_cfg = AnceCycleConfig(batch_size=args.per_device_train_batch_size,
                                shuffle_seed=args.seed,
                                feed_workers=args.feed_workers)
    triples_fn = sample_one_neg_triples if spec.loss == "dpr_inbatch" \
        else expand_triples
    batch_transform = None
    if mesh is not None and num_hosts > 1:
        from ance_tpu.core.mesh import shard_batch
        def batch_transform(b):
            return shard_batch(b, mesh)
    with TokenCache(args.data_dir + "/train-query") as qc, \
            TokenCache(args.data_dir + "/passages") as pc:
        run_trainer_job(cycle_cfg, state=state, train_step=step,
                        rng=jax.random.PRNGKey(args.seed),
                        params_of=lambda s: s.params,
                        query_cache=qc, passage_cache=pc,
                        ann_dir=args.ann_dir, training_dir=args.output_dir,
                        max_steps=args.max_steps,
                        save_every=args.save_steps, triples_fn=triples_fn,
                        host_id=host_id, num_hosts=num_hosts,
                        batch_transform=batch_transform,
                        rewarmup_per_dataset=args.rewarmup_per_dataset)


def cmd_ance_loop(args):
    """Single-program pipelined refresh (the TPU-native mode)."""
    import jax
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.train.ance_loop import load_offset_qrels
    from ance_tpu.train.encode import make_encode_fn
    from ance_tpu.train.pipelined import PipelineConfig, PipelinedAnce
    from ance_tpu.train import checkpoint as ckpt

    spec, model = _build_model(args)
    state, step, mesh, (host_id, num_hosts) = _make_training(args, model,
                                                             spec)
    body_method = type(model).body_emb_multichunk if spec.multichunk \
        else type(model).body_emb
    qfn = make_encode_fn(model, type(model).query_emb, mesh=mesh)
    bfn = make_encode_fn(model, body_method, mesh=mesh)
    cfg = PipelineConfig(
        train_steps_per_slice=args.train_steps_per_slice,
        encode_slice_size=args.encode_slice_size,
        encode_batch_size=args.per_device_eval_batch_size,
        batch_size=args.per_device_train_batch_size,
        topk_training=args.topk_training,
        negative_sample=args.negative_sample,
        ann_chunk_factor=args.ann_chunk_factor,
        search_chunk_queries=args.search_chunk_queries,
        multichunk=spec.multichunk, shuffle_seed=args.seed,
        feed_workers=args.feed_workers,
        index_quantize=args.index_quantize,
        rewarmup_per_dataset=args.rewarmup_per_dataset,
        checkpoint_dir=args.output_dir, save_every=args.save_steps,
        log_trust_ratios=args.log_trust_ratios,
        host_id=host_id, num_hosts=num_hosts)
    batch_transform = None
    if num_hosts > 1:
        from ance_tpu.core.mesh import shard_batch

        def batch_transform(b):
            return shard_batch(b, mesh)
    train_qrels = load_offset_qrels(args.data_dir + "/train-qrel.tsv")
    dev_qrels = load_offset_qrels(args.data_dir + "/dev-qrel.tsv")
    from ance_tpu.utils.observability import MetricsLogger
    metrics = MetricsLogger(os.path.join(args.output_dir, "refresh.jsonl")) \
        if host_id == 0 else None
    with TokenCache(args.data_dir + "/passages") as pc, \
            TokenCache(args.data_dir + "/train-query") as tq, \
            TokenCache(args.data_dir + "/dev-query") as dq:
        loop = PipelinedAnce(
            cfg, state=state, train_step=step,
            rng=jax.random.PRNGKey(args.seed),
            params_of=lambda s: s.params,
            query_encode_fn=qfn, body_encode_fn=bfn,
            passage_cache=pc, train_query_cache=tq, dev_query_cache=dq,
            train_qrels=train_qrels, dev_qrels=dev_qrels, mesh=mesh,
            metrics_logger=metrics, batch_transform=batch_transform)
        resumed = loop.resume()
        remaining = max(0, args.max_steps - resumed)
        server = None
        if args.http and num_hosts > 1:
            # a search from one host's server thread would dispatch
            # collectives the other hosts never join → whole-job hang
            raise SystemExit("ance-loop --http is single-host only; on a "
                             "multi-host mesh run `ance serve` against "
                             "exported checkpoints/index instead")
        if args.http and remaining <= 0:
            raise SystemExit(
                "ance-loop --http: training is already complete (resumed "
                f"step {resumed} >= max_steps {args.max_steps}) — the "
                "server would bootstrap a full refresh and then exit "
                "immediately; use `ance serve` for the final checkpoint")
        if args.http and host_id == 0:
            # train + serve in ONE program: queries answer against the live
            # refreshing index with the loop's own snapshot params
            import numpy as np
            from ance_tpu.serve import LoopRetriever
            from ance_tpu.serve_http import RetrieverHTTPServer
            if loop.index is None:
                loop.bootstrap()  # serving needs the initial refresh
            rows_per = getattr(loop, "_rows_per_record", 1) or 1
            off2pid = _offset2id_lookup(args.data_dir, "pid2offset")
            if off2pid is not None:
                # same coverage guard as cmd_serve: a stale/mismatched
                # pid2offset must fail loudly, not IndexError or silently
                # serve unretrievable -1 pids
                if len(off2pid) < len(pc) or \
                        (np.asarray(off2pid[:len(pc)]) < 0).any():
                    raise SystemExit("pid2offset does not cover the "
                                     "passages cache — stale preprocess "
                                     "artifacts under --data_dir?")
                base = off2pid[np.arange(len(pc))]
            else:
                base = np.arange(len(pc))
            tokenizer = None
            try:
                tokenizer = _tokenizer_factory(spec.tokenizer_name,
                                               args.model_name_or_path)()
            except BaseException as e:
                if isinstance(e, KeyboardInterrupt):
                    raise
                print(f"WARNING: no tokenizer ({e}); live serving accepts "
                      "token arrays only", file=sys.stderr)
            retriever = LoopRetriever(
                loop, qfn, tokenizer=tokenizer,
                max_query_length=args.max_query_length,
                embedding2id=np.repeat(base.astype(np.int64), rows_per))
            host, port = _parse_host_port(args.http)
            server = RetrieverHTTPServer(
                retriever, host=host, port=port,
                pid_space="real" if off2pid is not None else "offset",
                pad_token_id=model.config.pad_token_id).start()
            addr = server.address
            print(json.dumps({"live_serving": f"http://{addr[0]}:{addr[1]}",
                              "ntotal": int(loop.index.ntotal)}), flush=True)
        try:
            loop.run(remaining)
        finally:
            if server is not None:
                server.shutdown()
        loop.flush_checkpoints()
        if host_id == 0:
            ckpt.save_checkpoint(args.output_dir,
                                 int(jax.device_get(loop.state.step)),
                                 loop.state.params,
                                 opt_state=loop.state.opt_state)
    if metrics is not None:
        metrics.close()
    print(json.dumps(loop.history[-3:]))


def cmd_seed_pretrain(args):
    """SEED-Encoder pretraining (MLM + CLS-bottleneck decoder) over a
    preprocessed token cache — beyond-parity: the reference ships only
    pretrained SEED checkpoints, no pretraining code (SEED-Encoder.md:1)."""
    import jax
    import jax.numpy as jnp
    from ance_tpu.core.mesh import (initialize_distributed, make_mesh,
                                    shard_batch)
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.data.wordpiece import SeedTokenizer
    from ance_tpu.models.seed import (
        SeedDecoderConfig, SeedForMaskedLM, seed_encoder_config)
    from ance_tpu.optim.schedules import warmup_cosine, warmup_linear
    from ance_tpu.train.seed_pretrain import (
        SeedPretrainConfig, make_seed_pretrain_step, run_seed_pretrain)
    from ance_tpu.train.trainer import init_train_state, make_optimizer

    host_id, num_hosts = initialize_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes, process_id=args.process_id)
    tok = SeedTokenizer.from_vocab_file(args.model_name_or_path)
    vocab_size = len(tok.vocab)
    overrides = json.loads(args.encoder_overrides) \
        if args.encoder_overrides else {}
    ecfg = seed_encoder_config(
        vocab_size, dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        attention_impl=args.attention, pad_token_id=tok.pad_token_id,
        **overrides)
    dcfg = SeedDecoderConfig(
        num_layers=args.decoder_layers,
        attention_window=args.decoder_atten_window,
        hidden_size=ecfg.hidden_size, num_heads=ecfg.num_heads,
        intermediate_size=ecfg.intermediate_size)
    model = SeedForMaskedLM(ecfg, dcfg)
    sched_fn = warmup_cosine if args.lr_style == "cosine" else warmup_linear
    schedule = sched_fn(args.learning_rate, args.warmup_steps, args.max_steps)
    opt = make_optimizer(args.optimizer, schedule, eps=args.adam_epsilon,
                         weight_decay=args.weight_decay,
                         max_grad_norm=args.max_grad_norm)
    L = args.max_seq_length
    shape = jnp.zeros((2, L), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), shape,
                                 jnp.ones((2, L), jnp.int32), shape)["params"]
    state = init_train_state(params, opt)
    mesh = make_mesh() if args.data_parallel else None
    if num_hosts > 1 and mesh is None:
        # without a mesh the train step has no collectives — each host
        # would silently train an independent diverging replica
        raise SystemExit("multi-host seed-pretrain requires data "
                         "parallelism (drop --no_data_parallel)")
    ratio = tuple(float(x) for x in args.train_ratio.split(":"))
    step = make_seed_pretrain_step(model, opt, train_ratio=ratio, mesh=mesh)
    batch_transform = None
    if mesh is not None and num_hosts > 1:
        def batch_transform(b):
            return shard_batch(b, mesh)
    cfg = SeedPretrainConfig(
        num_epochs=args.num_train_epochs,
        batch_size=args.per_device_train_batch_size,
        mask_prob=args.mask_prob, max_steps=args.max_steps,
        save_steps=args.save_steps, log_every=args.log_every,
        checkpoint_dir=args.output_dir, seed=args.seed,
        host_id=host_id, num_hosts=num_hosts)
    special_ids = [tok.cls_token_id, tok.sep_token_id, tok.pad_token_id,
                   tok.unk_token_id, tok.mask_token_id]
    with TokenCache(args.data_dir + "/passages") as cache:
        state, history = run_seed_pretrain(
            cfg, state=state, train_step=step, cache=cache,
            rng=jax.random.PRNGKey(args.seed),
            mask_token_id=tok.mask_token_id, vocab_size=vocab_size,
            special_ids=special_ids, pad_token_id=tok.pad_token_id,
            batch_transform=batch_transform)
    print(json.dumps(history[-3:]))


def cmd_generate(args, inference_only=False):
    import jax
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.train.ance_loop import (
        load_offset_qrels, positives_from_qrels)
    from ance_tpu.train.ann_gen import AnnGenConfig, generate_new_ann
    from ance_tpu.train.encode import make_encode_fn

    spec, model = _build_model(args)
    L = args.max_query_length
    params = _init_params(model, L)
    params, ckpt_path, step = _load_latest_params(
        params, args.training_dir, args.init_model_dir)

    mesh = _eval_mesh(args.per_device_eval_batch_size,
                      args.tensor_parallel)
    pshard = _encode_shardings(args, model, params, mesh)
    qfn = make_encode_fn(model, type(model).query_emb, mesh=mesh,
                         param_shardings=pshard)
    body_method = type(model).body_emb_multichunk if spec.multichunk \
        else type(model).body_emb
    bfn = make_encode_fn(model, body_method, mesh=mesh,
                         param_shardings=pshard)
    gen_cfg = AnnGenConfig(topk_training=args.topk_training,
                           negative_sample=args.negative_sample,
                           ann_chunk_factor=args.ann_chunk_factor,
                           ann_measure_topk_mrr=args.ann_measure_topk_mrr,
                           multichunk=spec.multichunk,
                           index_quantize=args.index_quantize,
                           encode_batch_size=args.per_device_eval_batch_size)
    train_qrels = load_offset_qrels(args.data_dir + "/train-qrel.tsv")
    dev_qrels = load_offset_qrels(args.data_dir + "/dev-qrel.tsv")
    with TokenCache(args.data_dir + "/dev-query") as dev_c, \
            TokenCache(args.data_dir + "/passages") as pass_c, \
            TokenCache(args.data_dir + "/train-query") as train_c:
        result = generate_new_ann(
            gen_cfg, output_num=args.output_num,
            checkpoint_path=ckpt_path or "<init>", params=params,
            query_encode_fn=qfn, body_encode_fn=bfn,
            dev_query_cache=dev_c, passage_cache=pass_c,
            train_query_cache=train_c,
            training_query_positive_id=positives_from_qrels(train_qrels),
            dev_query_positive_id=dev_qrels,
            output_dir=args.output_dir, inference_only=inference_only,
            mesh=mesh)
    if result and inference_only:
        # persist embeddings in the notebook-compatible shard layout
        # (reference --inference mode stops after encode, run_ann_data_gen.py
        # :256-257; shards per reference util.py:108-113)
        from ance_tpu.evaluation.offline import save_embedding_shard
        os.makedirs(args.output_dir, exist_ok=True)
        prefix = os.path.join(args.output_dir, f"step{args.output_num}")
        index = result["index"]
        paths = {
            "passages": save_embedding_shard(
                prefix + "_passage_emb_p_",
                jax.device_get(index._emb)[:index.ntotal]),
            "passage_ids": save_embedding_shard(
                prefix + "_passage_embid_p_", result["passage_embedding2id"]),
            "dev_query": save_embedding_shard(
                prefix + "_dev_query_emb_p_", result["dev_query_embedding"]),
            "dev_query_ids": save_embedding_shard(
                prefix + "_dev_query_embid_p_",
                result["dev_query_embedding2id"]),
        }
        print(json.dumps(paths))
    elif result:
        print(json.dumps({"dev_ndcg": result["dev_ndcg"],
                          "ann_mrr": result["ann_mrr"],
                          "data_path": result["data_path"]}))


def cmd_generate_dpr(args):
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.data.dpr import (
        load_answers, load_mapping, load_passage_texts, load_positive_ids)
    from ance_tpu.train.dpr_gen import generate_new_ann_dpr
    from ance_tpu.train.encode import make_encode_fn

    spec, model = _build_model(args)
    L = args.max_seq_length
    params = _init_params(model, L)
    params, ckpt_path, _ = _load_latest_params(
        params, args.training_dir, args.init_model_dir)

    pid2offset, _ = load_mapping(args.data_dir, "pid2offset")
    raw = load_passage_texts(args.wiki_path)
    passage_texts = {pid2offset[p]: t for p, t in raw.items()
                     if p in pid2offset}
    train_answers = load_answers(args.data_dir + "/train-ann")
    positives = load_positive_ids(args.data_dir + "/train-data")
    test_answers = load_answers(args.data_dir + "/test-ann") \
        if os.path.exists(args.data_dir + "/test-ann") else \
        _qas_answers(args.test_qas)
    trivia_answers = _qas_answers(args.trivia_qas)

    mesh = _eval_mesh(args.per_device_eval_batch_size,
                      args.tensor_parallel)
    pshard = _encode_shardings(args, model, params, mesh)
    qfn = make_encode_fn(model, type(model).query_emb, mesh=mesh,
                         param_shardings=pshard)
    bfn = make_encode_fn(model, type(model).body_emb, mesh=mesh,
                         param_shardings=pshard)
    with TokenCache(args.data_dir + "/train-query") as tq, \
            TokenCache(args.data_dir + "/test-query") as te, \
            TokenCache(args.data_dir + "/trivia-test-query") as tr, \
            TokenCache(args.data_dir + "/passages") as pc:
        result = generate_new_ann_dpr(
            index_quantize=args.index_quantize,
            output_num=args.output_num, checkpoint_path=ckpt_path or "<init>",
            params=params, query_encode_fn=qfn, body_encode_fn=bfn,
            train_query_cache=tq, test_query_cache=te,
            trivia_test_query_cache=tr, passage_cache=pc,
            passage_texts=passage_texts, train_answers=train_answers,
            test_answers=test_answers, trivia_test_answers=trivia_answers,
            training_query_positive_id=positives,
            output_dir=args.output_dir, topk_training=args.topk_training,
            negative_sample=args.negative_sample,
            encode_batch_size=args.per_device_eval_batch_size, mesh=mesh)
    result.pop("index", None)
    print(json.dumps(result))


def _qas_answers(path):
    """qas CSV (question\\tanswers-repr) → qid(order) → answers."""
    import ast
    import csv
    out = {}
    if not path or not os.path.exists(path):
        return out
    with open(path, encoding="utf-8") as f:
        for qid, row in enumerate(csv.reader(f, delimiter="\t")):
            out[qid] = list(ast.literal_eval(row[1]))
    return out


def cmd_export_hf(args):
    """Export a trained checkpoint OUT to the reference ecosystem's formats
    (models/hf_export.py): an HF ``from_pretrained`` directory (rdot_nll*),
    a DPR CheckpointState file (dpr), or a fairseq-named state dict
    (seeddot_nll)."""
    from ance_tpu.train import checkpoint as ckpt
    spec, model = _build_model(args)
    path, step = ckpt.get_latest_checkpoint(args.training_dir or "",
                                            args.init_model_dir)
    if path is None or not ckpt.is_complete(path):
        raise SystemExit(
            "export-hf: no complete checkpoint under --training_dir/"
            "--init_model_dir — refusing to export a random init")
    if step == 0:
        # --init_model_dir path: get_latest_checkpoint reports step 0 for
        # it; recover the real step (the reference's DPR resume reads the
        # exported offset) from meta.json, else the dirname
        meta_path = os.path.join(path, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                step = int(json.load(f).get("step", 0))
        else:
            step = ckpt.checkpoint_no(path)
    # raw (template-free) load: a seed-pretrain MLM tree is exportable even
    # though no registry model matches it; geometry is validated against the
    # config by save_hf_checkpoint / structurally by the exporters
    tree = ckpt.load_raw_params(path)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.model_type == "dpr":
        from ance_tpu.models.hf_export import save_dpr_checkpoint
        out = save_dpr_checkpoint(
            os.path.join(args.out_dir, f"checkpoint-{step}"), tree,
            offset=step)
    elif args.model_type == "seeddot_nll":
        import torch
        from ance_tpu.models.hf_export import (
            torch_seed_mlm_state_dict, torch_seeddot_state_dict)
        to_sd = torch_seed_mlm_state_dict if "lm_dense" in tree \
            else torch_seeddot_state_dict
        out = os.path.join(args.out_dir, "pytorch_model.bin")
        torch.save(to_sd(tree), out)
    else:
        from ance_tpu.models.hf_export import save_hf_checkpoint
        out = save_hf_checkpoint(args.out_dir, tree, model.config)
    print(json.dumps({"exported": out, "from": path, "step": step,
                      "model_type": args.model_type}))


def cmd_eval(args):
    from ance_tpu.evaluation.msmarco_eval import compute_metrics_from_files
    metrics = compute_metrics_from_files(args.reference, args.candidate)
    for k in sorted(metrics):
        print(f"{k}: {metrics[k]}")


def cmd_eval_full(args):
    from ance_tpu.evaluation.offline import (
        full_ranking_eval, load_embedding_shards, rerank_eval)
    from ance_tpu.train.ance_loop import load_offset_qrels
    q = load_embedding_shards(args.query_prefix)
    q_ids = load_embedding_shards(args.query_id_prefix)
    p = load_embedding_shards(args.passage_prefix)
    p_ids = load_embedding_shards(args.passage_id_prefix)
    if any(x is None for x in (q, q_ids, p, p_ids)):
        raise SystemExit("missing embedding shards")
    qrels = load_offset_qrels(args.qrels)
    if not args.candidates:
        print(json.dumps(full_ranking_eval(q, q_ids, p, p_ids, qrels,
                                           topn=args.topn)))
        return
    # BM25-candidate rerank mode (notebook cell 11): restrict each query's
    # ranking to its top1000.dev candidate set. Candidate files carry REAL
    # ids; embedding ids are cache offsets — map through the preprocess
    # pickles when --data_dir is given, else candidates must already be
    # offset-space.
    from ance_tpu.evaluation.mrr_eval import parse_top_dev
    cand = parse_top_dev(args.candidates)
    if args.data_dir:
        from ance_tpu.data.preprocess import load_id_map
        pid2off = load_id_map(
            os.path.join(args.data_dir, "pid2offset.pickle"))
        qmap_path = os.path.join(
            args.data_dir, f"{args.query_split}_qid2offset.pickle")
        if not os.path.exists(qmap_path):  # pre-per-split-map layouts
            qmap_path = os.path.join(args.data_dir, "qid2offset.pickle")
        qid2off = load_id_map(qmap_path)
        cand = {qid2off[qid]: [pid2off[p] for p in pids if p in pid2off]
                for qid, pids in cand.items() if qid in qid2off}
    print(json.dumps(rerank_eval(q, q_ids, p, p_ids, cand, qrels,
                                 k=args.rerank_depth)))


def _init_params(model, seq_len: int):
    import jax
    import jax.numpy as jnp
    return jax.jit(model.init)(jax.random.PRNGKey(0),
                               jnp.zeros((2, seq_len), jnp.int32),
                               jnp.ones((2, seq_len), jnp.int32))["params"]


def _load_latest_params(params, training_dir, init_model_dir):
    """Load the newest COMPLETE checkpoint onto ``params``.  Returns
    (params, ckpt_path, step); ckpt_path is None when nothing complete
    exists (params stay as given, step still reflects the newest dir so
    generators number their outputs consistently)."""
    from ance_tpu.train import checkpoint as ckpt
    path, step = None, 0
    if training_dir or init_model_dir:
        path, step = ckpt.get_latest_checkpoint(training_dir or "",
                                                init_model_dir)
    if path and ckpt.is_complete(path):
        try:
            params, _, _ = ckpt.load_checkpoint(path, params)
        except ValueError as e:
            raise SystemExit(
                f"checkpoint {path} does not structurally match this "
                f"model family ({e}); a different-family checkpoint — "
                "e.g. a seed-pretrain MLM tree warm-starting seeddot — "
                "goes through --model_name_or_path, not "
                "--training_dir/--init_model_dir")
        return params, path, step
    return params, None, step


def _offset2id_lookup(data_dir, stem):
    """offset → real-id lookup array from ``<stem>.pickle`` (MS MARCO,
    preprocess.py) or the text ``<stem>`` mapping (DPR, data/dpr.py).
    Returns None when no map exists.  Offsets are contiguous 0..N−1 by
    construction (merge_split_files), so an array is exact."""
    import numpy as np
    if not data_dir:
        return None
    pkl = os.path.join(data_dir, stem + ".pickle")
    txt = os.path.join(data_dir, stem)
    if os.path.exists(pkl):
        from ance_tpu.data.preprocess import load_id_map
        mapping = load_id_map(pkl)
    elif os.path.exists(txt):
        from ance_tpu.data.dpr import load_mapping
        mapping, _ = load_mapping(data_dir, stem)
    else:
        return None
    if not mapping:
        return None
    offs = np.fromiter(mapping.values(), np.int64, len(mapping))
    reals = np.fromiter(mapping.keys(), np.int64, len(mapping))
    arr = np.full(offs.max() + 1, -1, np.int64)
    arr[offs] = reals
    return arr


def cmd_serve(args):
    """Batch retrieval serving: frozen encoder + device-resident exact index
    behind one command — the serving capability behind the reference's
    ~100× cascade-speedup claim (reference README.md:16-17). Corpus
    embeddings come from an ``infer`` dump (--emb_prefix) or are encoded
    fresh from the --data_dir token cache. Emits ``qid\\tpid\\trank`` lines
    in REAL id space (offsets are mapped back through pid2offset /
    qid2offset, so the output feeds the official scorer directly; add
    scores with --with_scores)."""
    import jax.numpy as jnp
    import numpy as np
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.index.flat import FlatIPIndex
    from ance_tpu.serve import Retriever
    from ance_tpu.train.encode import encode_cache, make_encode_fn

    if not args.queries and not args.query_cache and not args.http:
        raise SystemExit("serve needs a query source: --queries (raw TSV), "
                         "--query_cache (tokenized cache), or --http "
                         "(online mode)")
    if not args.emb_prefix and not args.data_dir and not args.load_index:
        raise SystemExit("serve needs a corpus source: --emb_prefix (infer "
                         "dump), --data_dir (token cache to encode), or "
                         "--load_index (saved index)")
    if args.index != "ivf" and (args.nlist is not None or args.nprobe != 8):
        raise SystemExit("--nlist/--nprobe apply to --index ivf only")

    spec, model = _build_model(args)
    L = args.max_query_length
    params = _init_params(model, L)
    params, ckpt_path, _ = _load_latest_params(
        params, args.training_dir, args.init_model_dir)
    if ckpt_path:
        params_source = ckpt_path
    elif args.model_name_or_path and os.path.isdir(args.model_name_or_path) \
            and _has_warm_start(args.model_name_or_path):
        params = _warm_start_params(spec, params, args.model_name_or_path)
        params_source = args.model_name_or_path
    else:
        params_source = "<random-init>"
        print("WARNING: serve found no complete checkpoint "
              f"(--training_dir={args.training_dir!r}) and no torch "
              "warm-start — serving RANDOM encoder params; rankings will "
              "be garbage unless this is a smoke test", file=sys.stderr)

    if args.load_index:
        # instant restart: int8 stays int8 on disk, no corpus re-encode, no
        # quantization or k-means pass; ids were saved in REAL pid space.
        # The file carries its own kind (flat: 'emb', ivf: 'bins_emb').
        lp = args.load_index if args.load_index.endswith(".npz") \
            else args.load_index + ".npz"
        with np.load(lp, allow_pickle=False) as z:
            is_ivf = "bins_emb" in z.files
        if is_ivf:
            from ance_tpu.index.ivf import IVFIPIndex
            index = IVFIPIndex.load(
                args.load_index,
                nprobe=args.nprobe if args.nprobe != 8 else None)
        else:
            index = FlatIPIndex.load(args.load_index)
        e2id = np.load(args.load_index + ".ids.npy").astype(np.int64)
        if len(e2id) != index.ntotal:
            raise SystemExit("saved index and its .ids.npy sidecar disagree")
        return _serve_with_index(args, spec, model, params, params_source,
                                 index, e2id, pid_space="real")
    if args.emb_prefix:
        from ance_tpu.evaluation.offline import load_embedding_shards
        emb = load_embedding_shards(args.emb_prefix)
        e2id = load_embedding_shards(args.emb_id_prefix)
        if emb is None or e2id is None:
            raise SystemExit("missing embedding shards under --emb_prefix/"
                             "--emb_id_prefix")
        e2id = e2id.astype(np.int64)
    else:
        body = type(model).body_emb_multichunk if spec.multichunk \
            else type(model).body_emb
        bfn = make_encode_fn(model, body)
        with TokenCache(args.data_dir + "/passages") as pc:
            emb, e2id = encode_cache(bfn, params, pc,
                                     args.per_device_eval_batch_size,
                                     multichunk=spec.multichunk)

    # embedding rows carry cache OFFSETS; the scorer needs real passage ids
    off2pid = _offset2id_lookup(args.data_dir, "pid2offset")
    pid_space = "real"
    if off2pid is not None:
        e2id = np.asarray(e2id, np.int64)
        # bounds first: an out-of-range offset would raise a raw numpy
        # IndexError instead of the intended diagnostic (ADVICE r2)
        if e2id.size and (e2id.min() < 0 or e2id.max() >= len(off2pid)):
            raise SystemExit("embedding ids not covered by pid2offset — "
                             "emb dump and --data_dir disagree")
        e2id = off2pid[e2id]
        if (e2id < 0).any():
            raise SystemExit("embedding ids not covered by pid2offset — "
                             "emb dump and --data_dir disagree")
    else:
        pid_space = "offset"
        print("WARNING: no pid2offset map found under --data_dir; emitted "
              "pids are cache offsets (equal to real pids only when the "
              "collection ids are already 0..N-1 in file order)",
              file=sys.stderr)

    if args.index == "ivf":
        from ance_tpu.index.ivf import IVFIPIndex
        if args.quantize == "rows":
            raise SystemExit("--quantize rows applies to the flat index "
                             "only (per-row scales cannot fold into the "
                             "query); use --quantize dims with ivf")
        index = IVFIPIndex(dim=emb.shape[1], nlist=args.nlist,
                           nprobe=args.nprobe,
                           quantize=False if args.quantize == "none"
                           else args.quantize,
                           dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
        index.add(emb)
    else:
        index = FlatIPIndex(
            dim=emb.shape[1],
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            quantize=False if args.quantize == "none" else args.quantize)
        if args.quantize == "rows":
            index.add(emb)  # per-row scales need the corpus-global pass
        else:
            # chunked build: never stages the full fp corpus in HBM (at the
            # 8.8M x 768 reference scale the fp32 dump is 27 GB; the int8
            # index it builds is 6.3 GB — one-v5e-core serving)
            index.add_chunked(emb)
    if args.save_index:
        index.save(args.save_index)
        np.save(args.save_index + ".ids.npy", np.asarray(e2id, np.int64))
        print(f"saved index ({index.ntotal} rows) to "
              f"{args.save_index}.npz", file=sys.stderr)
    return _serve_with_index(args, spec, model, params, params_source,
                             index, e2id, pid_space)


def _serve_with_index(args, spec, model, params, params_source,
                      index, e2id, pid_space):
    import numpy as np
    from ance_tpu.data.cache import TokenCache
    from ance_tpu.serve import Retriever
    from ance_tpu.train.encode import make_encode_fn

    L = args.max_query_length
    tokenizer = None
    if not args.query_cache:
        try:
            tokenizer = _tokenizer_factory(spec.tokenizer_name,
                                           args.model_name_or_path)()
        # BaseException: the seed-wordpiece path raises SystemExit when no
        # vocab dir is given — HTTP mode must still degrade to token-only
        except BaseException as e:
            if not args.http or isinstance(e, KeyboardInterrupt):
                raise
            print(f"WARNING: no tokenizer ({e}); HTTP mode will accept "
                  "token arrays (ids/mask) only", file=sys.stderr)
    retriever = Retriever(make_encode_fn(model, type(model).query_emb),
                          params, index, embedding2id=e2id,
                          tokenizer=tokenizer, max_query_length=L)

    if args.http:
        from ance_tpu.serve_http import RetrieverHTTPServer
        host, port = _parse_host_port(args.http)
        server = RetrieverHTTPServer(retriever, host=host,
                                     port=port, pid_space=pid_space,
                                     default_k=args.topk,
                                     pad_token_id=model.config.pad_token_id,
                                     allow_reload=args.allow_reload)
        addr = server.address
        print(json.dumps({"serving": f"http://{addr[0]}:{addr[1]}",
                          "params": params_source,
                          "ntotal": int(index.ntotal),
                          "pid_space": pid_space}), flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
        return

    out = open(args.output, "w", encoding="utf-8") if args.output \
        else sys.stdout
    B = args.per_device_eval_batch_size
    n_q = 0
    if args.query_cache:
        from ance_tpu.train.encode import iter_cache_batches
        # cache keys are offsets; recover THIS split's real qids via the
        # per-split map (qid2offset.pickle is overwritten per split)
        qdir = os.path.dirname(args.query_cache) or "."
        qstem = os.path.basename(args.query_cache)
        off2qid = (_offset2id_lookup(qdir, f"{qstem}_qid2offset")
                   if qstem else None)
        fallback = off2qid is None
        if fallback:
            off2qid = _offset2id_lookup(qdir, "qid2offset")
        with TokenCache(args.query_cache) as qc:
            if off2qid is not None and (
                    len(qc) > len(off2qid)
                    or (off2qid[:len(qc)] < 0).any()):
                # a generic qid2offset.pickle belongs to the LAST
                # preprocessed split — if it doesn't cover this cache,
                # trusting it would emit the WRONG split's qids
                print("WARNING: qid2offset map does not cover "
                      f"{args.query_cache} ({len(qc)} rows) — it likely "
                      "belongs to another split; emitting cache offsets",
                      file=sys.stderr)
                off2qid = None
            elif off2qid is not None and fallback:
                print("note: using generic qid2offset.pickle for "
                      f"{args.query_cache} (no per-split map found); "
                      "verify it matches this split", file=sys.stderr)
            if off2qid is None:
                print("WARNING: no usable qid2offset map next to "
                      "--query_cache; emitted qids are cache offsets",
                      file=sys.stderr)
            for keys, ids, mask in iter_cache_batches(qc, B):
                scores, pids = retriever.search_tokens(ids[:len(keys)],
                                                       mask[:len(keys)],
                                                       args.topk)
                qids = keys if off2qid is None else \
                    [int(off2qid[k]) for k in keys]
                _write_ranking(out, qids, pids, scores, args.with_scores,
                               args.format, args.id_prefix, args.run_tag)
                n_q += len(keys)
    else:
        rows = []
        # utf-8-sig: a BOM would make the first qid fail the digit test and
        # silently vanish into the header-skip path
        with open(args.queries, encoding="utf-8-sig") as f:
            for lineno, line in enumerate(f, 1):
                if not line.strip():
                    continue
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2 or not parts[0].lstrip("-").isdigit():
                    # header-skip only for recognizably-header first lines;
                    # a legitimate first query with a non-numeric id must
                    # fail loudly, not vanish (ADVICE r2)
                    if lineno == 1 and parts and parts[0].strip().lower() in (
                            "qid", "query_id", "id", "queryid"):
                        print(f"note: skipping header line in "
                              f"{args.queries}", file=sys.stderr)
                        continue
                    raise SystemExit(f"{args.queries}:{lineno}: expected "
                                     f"'qid\\ttext', got {line.rstrip()!r}")
                rows.append(parts)
        for s in range(0, len(rows), B):
            chunk = rows[s:s + B]
            qids = [int(r[0]) for r in chunk]
            scores, pids = retriever.search([r[1] for r in chunk], args.topk)
            _write_ranking(out, qids, pids, scores, args.with_scores,
                           args.format, args.id_prefix, args.run_tag)
            n_q += len(chunk)
    if args.output:
        out.close()
        print(json.dumps({"queries": n_q, "topk": args.topk,
                          "corpus_rows": int(index.ntotal),
                          "params": params_source, "pid_space": pid_space,
                          "output": args.output}))


def _write_ranking(out, qids, pids, scores, with_scores: bool,
                   fmt: str = "msmarco", id_prefix: str = "",
                   run_tag: str = "ance_tpu") -> None:
    """``msmarco``: ``qid\\tpid\\trank`` (official MS MARCO candidate file);
    ``trec``: ``qid Q0 <id_prefix>pid rank score tag`` (trec_eval run file —
    the TREC-DL doc judgments use D-prefixed ids, pass --id_prefix D)."""
    for qid, prow, srow in zip(qids, pids, scores):
        for rank, (pid, sc) in enumerate(zip(prow, srow), start=1):
            if pid < 0:
                break
            if fmt == "trec":
                out.write(f"{int(qid)} Q0 {id_prefix}{int(pid)} {rank} "
                          f"{float(sc):.6f} {run_tag}\n")
                continue
            line = f"{int(qid)}\t{id_prefix}{int(pid)}\t{rank}"
            if with_scores:
                line += f"\t{float(sc):.6f}"
            out.write(line + "\n")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="ance")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("preprocess", help="MS MARCO raw TSV → binary caches")
    _add_common_model_flags(p)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--out_data_dir", required=True)
    p.add_argument("--data_type", type=int, default=1,
                   help="0 = doc, 1 = passage (reference flag)")
    p.add_argument("--max_doc_character", type=int, default=10000)
    p.add_argument("--num_processes", type=int, default=32)
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("preprocess-dpr", help="DPR wiki/json → binary caches")
    _add_common_model_flags(p)
    p.add_argument("--wiki_dir", required=True)
    p.add_argument("--question_dir", required=True)
    p.add_argument("--answer_dir", required=True)
    p.add_argument("--out_data_dir", required=True)
    p.add_argument("--data_type", type=int, default=0,
                   help="0 = NQ, 1 = TriviaQA, 2 = both")
    p.add_argument("--num_processes", type=int, default=16)
    p.set_defaults(fn=cmd_preprocess_dpr)

    p = sub.add_parser("warmup", help="BM25-triples warmup training")
    _add_common_model_flags(p)
    _add_train_flags(p)
    p.add_argument("--train_file", required=True,
                   help="triples.train.small.tsv")
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--save_steps", type=int, default=5000)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--evaluate_during_training", action="store_true")
    p.add_argument("--eval_steps", type=int, default=0,
                   help="steps between in-train MRR evals")
    p.add_argument("--data_dir", default=None,
                   help="dir with collection.tsv/queries.dev.small.tsv/"
                        "top1000.dev/qrels.dev.small.tsv for eval")
    p.set_defaults(fn=cmd_warmup)

    p = sub.add_parser("train", help="ANCE trainer (polls ann_dir)")
    _add_common_model_flags(p)
    _add_train_flags(p)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--ann_dir", required=False, default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--save_steps", type=int, default=10000)
    p.add_argument("--num_epoch", type=int, default=0,
                   help="DPR fixed-epoch mode: train this many epochs over "
                        "{data_dir}/train-data instead of polling ann_dir "
                        "(reference run_ann_dpr.py:179-191)")
    p.add_argument("--dev_data", default=None,
                   help="dev triples file for per-epoch NLL/accuracy eval "
                        "(reference run_ann_dpr.py:196-211)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("ance-loop",
                       help="single-program pipelined refresh (TPU-native)")
    _add_common_model_flags(p)
    _add_train_flags(p)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--train_steps_per_slice", type=int, default=8)
    p.add_argument("--encode_slice_size", type=int, default=65536)
    p.add_argument("--topk_training", type=int, default=500)
    p.add_argument("--negative_sample", type=int, default=5)
    p.add_argument("--ann_chunk_factor", type=int, default=5)
    p.add_argument("--search_chunk_queries", type=int, default=4096,
                   help="queries per search work item (bounds the gap a "
                        "search item inserts between train steps)")
    p.add_argument("--per_device_eval_batch_size", type=int, default=128)
    p.add_argument("--save_steps", type=int, default=0,
                   help="mid-run checkpoint cadence (0 = at refresh "
                        "boundaries only); restarts resume automatically")
    p.add_argument("--log_trust_ratios", action="store_true",
                   help="LAMB trust-ratio stats in each refresh entry")
    p.add_argument("--index_quantize", default=None, choices=["dims"],
                   help="int8 HBM-resident index (half the bf16 footprint: "
                        "the full 8.8M MS MARCO corpus fits ONE v5e core); "
                        "per-dim scales snapshot from the first slice")
    p.add_argument("--http", default=None, metavar="HOST:PORT",
                   help="train AND serve in one program: answer /search "
                        "against the live refreshing index with the loop's "
                        "snapshot params (rank 0 only)")
    p.set_defaults(fn=cmd_ance_loop)

    p = sub.add_parser("seed-pretrain",
                       help="SEED-Encoder pretraining: MLM + CLS-bottleneck "
                            "decoder over {data_dir}/passages")
    _add_common_model_flags(p)
    _add_train_flags(p)
    p.add_argument("--data_dir", required=True,
                   help="preprocessed dir whose passages cache is the "
                        "pretraining corpus")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--save_steps", type=int, default=10000)
    p.add_argument("--mask_prob", type=float, default=0.15)
    p.add_argument("--train_ratio", default="0.5:0.5",
                   help="MLM:decoder loss weights "
                        "(configuration_seed_encoder.py:92)")
    p.add_argument("--decoder_layers", type=int, default=3,
                   help="1 or 3 (shipped SEED configs)")
    p.add_argument("--decoder_atten_window", type=int, default=2,
                   help="decoder local-attention span (2 or 8)")
    p.add_argument("--log_every", type=int, default=100)
    p.set_defaults(fn=cmd_seed_pretrain)

    for name, inference in (("generate", False), ("infer", True)):
        p = sub.add_parser(name)
        _add_common_model_flags(p)
        p.add_argument("--data_dir", required=True)
        p.add_argument("--training_dir", required=True)
        p.add_argument("--init_model_dir", default=None)
        p.add_argument("--output_dir", required=True)
        p.add_argument("--output_num", type=int, default=0)
        p.add_argument("--topk_training", type=int, default=500)
        p.add_argument("--negative_sample", type=int, default=5)
        p.add_argument("--ann_chunk_factor", type=int, default=5)
        p.add_argument("--ann_measure_topk_mrr", action="store_true")
        p.add_argument("--index_quantize", default=None, choices=["dims"],
                       help="int8 corpus index (full 8.8M corpus on one "
                            "v5e core)")
        p.add_argument("--per_device_eval_batch_size", type=int, default=128)
        p.add_argument("--tensor_parallel", type=int, default=1,
                       help="shard the encoder weights Megatron-style over "
                            "this many devices (core/tp.py); requires "
                            "--attention xla and divisible head counts")
        p.set_defaults(fn=lambda a, inf=inference: cmd_generate(a, inf))

    p = sub.add_parser("generate-dpr",
                       help="DPR ANN generation (answer-filtered mining)")
    _add_common_model_flags(p)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--wiki_path", required=True, help="psgs_w100.tsv")
    p.add_argument("--test_qas", default=None)
    p.add_argument("--trivia_qas", default=None)
    p.add_argument("--training_dir", required=True)
    p.add_argument("--init_model_dir", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--output_num", type=int, default=0)
    p.add_argument("--topk_training", type=int, default=100)
    p.add_argument("--negative_sample", type=int, default=20)
    p.add_argument("--index_quantize", default=None, choices=["dims"],
                   help="int8 corpus index (21M wiki passages: 15 GB int8 "
                        "vs 60 GB fp32 FAISS)")
    p.add_argument("--per_device_eval_batch_size", type=int, default=128)
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="shard the encoder weights Megatron-style over "
                        "this many devices (core/tp.py)")
    p.set_defaults(fn=cmd_generate_dpr)

    p = sub.add_parser("serve",
                       help="batch retrieval serving: encoder + exact index "
                            "→ qid\\tpid\\trank rankings")
    _add_common_model_flags(p)
    p.add_argument("--training_dir", default=None,
                   help="checkpoint dir (newest complete checkpoint loads)")
    p.add_argument("--init_model_dir", default=None)
    p.add_argument("--data_dir", default=None,
                   help="token-cache dir; encodes {data_dir}/passages when "
                        "no --emb_prefix is given")
    p.add_argument("--emb_prefix", default=None,
                   help="corpus embedding shard prefix from `ance infer`")
    p.add_argument("--emb_id_prefix", default=None)
    p.add_argument("--queries", default=None,
                   help="raw TSV (qid\\ttext); tokenized on the fly")
    p.add_argument("--query_cache", default=None,
                   help="pre-tokenized query cache (offsets become qids)")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--index", default="flat", choices=["flat", "ivf"],
                   help="flat = exact search; ivf = TPU-native approximate "
                        "(clustered) search — the MXU-friendly answer to "
                        "FAISS HNSW for high-QPS serving")
    p.add_argument("--nlist", type=int, default=None,
                   help="IVF cluster count (default √N)")
    p.add_argument("--nprobe", type=int, default=8,
                   help="IVF clusters searched per query (recall/speed knob)")
    p.add_argument("--quantize", default="none",
                   choices=["none", "dims", "rows"],
                   help="int8 corpus storage (dims folds scales into the "
                        "query; 1.18x faster than bf16 measured, 4x smaller "
                        "than fp32 FAISS)")
    p.add_argument("--save_index", default=None,
                   help="persist the built flat index (+ .ids.npy sidecar) "
                        "after building — int8 stays int8 on disk")
    p.add_argument("--load_index", default=None,
                   help="serve from a saved index: instant restart, no "
                        "corpus encode / quantization pass")
    p.add_argument("--with_scores", action="store_true")
    p.add_argument("--format", default="msmarco",
                   choices=["msmarco", "trec"],
                   help="msmarco: qid\\tpid\\trank (official scorer); "
                        "trec: 6-column trec_eval run file (TREC-DL)")
    p.add_argument("--id_prefix", default="",
                   help="prepended to output pids (doc mode strips 'D' at "
                        "preprocess — pass 'D' to restore TREC-DL doc ids)")
    p.add_argument("--run_tag", default="ance_tpu",
                   help="run tag column for --format trec")
    p.add_argument("--output", default=None, help="ranking TSV (else stdout)")
    p.add_argument("--per_device_eval_batch_size", type=int, default=128)
    p.add_argument("--http", default=None, metavar="HOST:PORT",
                   help="serve ONLINE over HTTP instead of ranking a batch: "
                        "GET /healthz, POST /search {queries|ids, k} "
                        "(ance_tpu/serve_http.py)")
    p.add_argument("--allow_reload", action="store_true",
                   help="enable POST /reload (hot-swap a saved index by "
                        "filesystem path) — only on trusted networks: any "
                        "client of the bound address can repoint the index")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("export-hf",
                       help="export a checkpoint to reference/HF torch "
                            "formats (from_pretrained dir, DPR "
                            "CheckpointState, or fairseq SEED dict)")
    _add_common_model_flags(p)
    p.add_argument("--training_dir", default=None,
                   help="trainer output dir — exports the LATEST complete "
                        "checkpoint")
    p.add_argument("--init_model_dir", default=None,
                   help="a specific checkpoint dir to export")
    p.add_argument("--out_dir", required=True)
    p.set_defaults(fn=cmd_export_hf)

    p = sub.add_parser("eval", help="official MS MARCO MRR scorer")
    p.add_argument("reference")
    p.add_argument("candidate")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("eval-full",
                       help="offline eval over dumped embedding shards "
                            "(notebook equivalent)")
    p.add_argument("--query_prefix", required=True)
    p.add_argument("--query_id_prefix", required=True)
    p.add_argument("--passage_prefix", required=True)
    p.add_argument("--passage_id_prefix", required=True)
    p.add_argument("--qrels", required=True,
                   help="offset-space qrels tsv (train/dev-qrel.tsv)")
    p.add_argument("--topn", type=int, default=1000)
    p.add_argument("--candidates", default=None,
                   help="BM25 candidate file (top1000.dev) → rerank mode "
                        "(notebook cell 11) instead of full ranking")
    p.add_argument("--data_dir", default=None,
                   help="preprocess output dir with pid2offset/qid2offset "
                        "pickles to map the candidate file's real ids to "
                        "cache offsets (omit if candidates are offset-space)")
    p.add_argument("--query_split", default="dev-query",
                   help="query cache stem whose per-split qid map applies "
                        "to --candidates")
    p.add_argument("--rerank_depth", type=int, default=10,
                   help="rerank cutoff k (notebook uses 10)")
    p.set_defaults(fn=cmd_eval_full)
    return parser


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
