"""CLI surface coverage (argparse wiring, verbs, error paths)."""

import json
import os

import pytest

from pde_engine_tpu.cli import build_parser, main


def test_parser_accepts_reference_verbs():
    p = build_parser()
    args = p.parse_args([
        "--mode", "parallel", "--problem", "force_free", "--max-depth", "4",
        "--validators", "8", "--resume-validators", "4",
        "--verify-scope", "novel", "--monopole-target", "either"])
    assert args.max_depth == 4
    assert args.validators == 8  # accepted for compat, ignored


def test_cli_end_to_end_tiny(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(["--problem", "laplace", "--max-depth", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Known (paper) solutions found" in out
    dbs = [f for f in os.listdir("problems/laplace/outputs")
           if f.endswith(".db")]
    assert len(dbs) == 1
    run_id = dbs[0].replace("parallel_runs_", "").replace(".db", "")

    # print-run-id round trip + post-hoc verify
    rc = main(["--problem", "laplace", "--print-run-id", run_id,
               "--verify-pde", "--verify-scope", "valid"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "verify-pde" in out and " 0 refuted" in out


def test_cli_missing_db_paths(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert main(["--problem", "laplace", "--print-run-id", "nope"]) == 1
    assert main(["--problem", "laplace", "--watch-run", "nope"]) == 1
    # neither may create a stray database
    assert not any(f.endswith(".db")
                   for f in os.listdir("problems/laplace/outputs"))


def test_cli_omega_variant(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(["--problem", "force_free", "--max-depth", "1",
               "--omega", "1.0"])
    assert rc == 0
    out = capsys.readouterr().out
    # under rigid rotation only 5 of the 7 knowns validate
    assert out.count("✓") == 5
    assert out.count("✗") == 2
