"""CLI surface: parser coverage + an end-to-end eval subcommand run."""

import os

import pytest

from ance_tpu.cli import build_parser
from ance_tpu.evaluation.msmarco_eval import compute_metrics_from_files


def test_parser_has_all_driver_equivalents():
    parser = build_parser()
    sub = next(a for a in parser._actions
               if isinstance(a, type(parser._subparsers._group_actions[0])))
    commands = set(sub.choices)
    # the reference's 5 drivers + preprocessing + eval (SURVEY.md §1)
    assert {"preprocess", "preprocess-dpr", "warmup", "train", "generate",
            "infer", "eval", "ance-loop"} <= commands


def test_generate_parser_flags_match_reference_names():
    parser = build_parser()
    args = parser.parse_args([
        "generate", "--data_dir", "d", "--training_dir", "t",
        "--output_dir", "o", "--topk_training", "200",
        "--negative_sample", "20", "--ann_chunk_factor", "5",
        "--ann_measure_topk_mrr"])
    assert args.topk_training == 200 and args.negative_sample == 20
    assert args.ann_measure_topk_mrr


def test_command_presets_parse_and_use_valid_flags():
    """All 7 reference presets exist (commands/ parity with reference
    commands/), each parses under bash -n, and every ance_tpu.cli invocation
    inside uses only flags the target subparser actually defines."""
    import re
    import shlex
    import subprocess
    from ance_tpu.cli import build_parser

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cdir = os.path.join(repo, "commands")
    presets = sorted(os.listdir(cdir))
    assert {"run_train.sh", "run_ann_data_gen.sh", "run_train_warmup.sh",
            "data_download.sh", "run_train_dpr.sh",
            "run_ann_data_gen_dpr.sh", "run_inference.sh"} <= set(presets)

    sub_actions = build_parser()._subparsers._group_actions[0].choices
    for preset in presets:
        path = os.path.join(cdir, preset)
        assert subprocess.run(["bash", "-n", path]).returncode == 0, preset
        text = open(path).read()
        for m in re.finditer(
                r"python -m ance_tpu\.cli (\S+)((?:.|\\\n)*?)(?:\n[a-z#]|\Z)",
                text):
            sub = m.group(1)
            assert sub in sub_actions, f"{preset}: unknown subcommand {sub}"
            valid = {opt for a in sub_actions[sub]._actions
                     for opt in a.option_strings}
            used = set(re.findall(r"(--[a-z0-9_]+)", m.group(2)))
            unknown = used - valid
            assert not unknown, f"{preset} {sub}: unknown flags {unknown}"


def test_eval_subcommand(tmp_path, capsys):
    ref = tmp_path / "qrels.tsv"
    ref.write_text("1\t0\t7\t1\n2\t0\t9\t1\n")
    cand = tmp_path / "cand.tsv"
    cand.write_text("1\t7\t1\n1\t8\t2\n2\t5\t1\n")
    metrics = compute_metrics_from_files(str(ref), str(cand))
    assert metrics["MRR @10"] == pytest.approx(0.5)

    from ance_tpu.cli import main
    main(["eval", str(ref), str(cand)])
    out = capsys.readouterr().out
    assert "MRR @10: 0.5" in out


def test_parse_host_port_validates():
    """--http HOST:PORT parsing: a missing or non-numeric port is a clean
    usage error (SystemExit), not a ValueError traceback; bracketed IPv6
    works; bare-colon IPv6 is rejected as ambiguous."""
    from ance_tpu.cli import _parse_host_port

    assert _parse_host_port("127.0.0.1:8080") == ("127.0.0.1", 8080)
    assert _parse_host_port(":8080") == ("127.0.0.1", 8080)
    assert _parse_host_port("[::1]:8080") == ("::1", 8080)
    for bad in ("myhost", "host:", "host:abc", "::1", "host:70000"):
        with pytest.raises(SystemExit):
            _parse_host_port(bad)
