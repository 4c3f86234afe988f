"""Persistence, resume, reports, and the post-hoc audit suite.

Parity targets: run DB schema (general:644-747), resume (general:973-1107),
report artifacts (general:546-641), verify-pde / monopole / audit
(general:2024-2385).
"""

import json
import os
import sqlite3

import pytest

from pde_engine_tpu.runtime import DiscoveryRun
from pde_engine_tpu.utils.config import SearchConfig
from pde_engine_tpu.utils.db import db_path_for, new_run_id, table_name_for


@pytest.fixture()
def outdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _mk_run(problem="laplace", depth=2, **kw):
    cfg = SearchConfig(max_depth=depth, **kw)
    return DiscoveryRun(problem, config=cfg, verbose=False)


def test_run_id_format():
    rid = new_run_id()
    assert rid.startswith("paper_repro_")
    assert len(rid.split("_")[-1]) == 8


def test_db_schema_parity(outdir):
    run = _mk_run()
    run.run(2)
    conn = sqlite3.connect(run.db_path)
    tables = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert table_name_for(run.run_id) in tables
    assert {"run_metadata", "generator_progress",
            "worker_progress"} <= tables
    cols = {r[1] for r in conn.execute(
        f"PRAGMA table_info({table_name_for(run.run_id)})")}
    for c in ("id", "expression", "normalized", "signature", "depth",
              "validation_status", "is_valid", "validation_reason",
              "validator_method", "is_paper_solution",
              "paper_solution_name", "created_at", "validated_at",
              "heavy_is_valid", "heavy_reason"):
        assert c in cols, c
    meta = conn.execute("SELECT status, total_generated, valid_solutions "
                        "FROM run_metadata").fetchone()
    assert meta[0] == "completed"
    assert meta[1] > 0
    run.close()


def test_report_files_written(outdir):
    run = _mk_run()
    rep = run.run(2)
    out = run.problem.get_output_dir()
    files = os.listdir(out)
    assert any(f.startswith("reproduction_") and f.endswith(".json")
               for f in files)
    assert any(f.startswith("report_") and f.endswith(".txt")
               for f in files)
    jf = [f for f in files if f.endswith(".json")][0]
    data = json.load(open(os.path.join(out, jf)))
    assert data["total_generated"] == rep["total_generated"]
    assert "by_depth" in data and "paper_solutions_found" in data
    run.close()


def test_resume_continues_and_matches_fresh(outdir):
    frun = _mk_run(depth=3)
    fresh = frun.run(3)
    frun.close()

    prun = _mk_run(depth=2)
    prun.run(2)
    rid = prun.run_id
    prun.close()

    rrun = DiscoveryRun.resume("laplace", rid,
                               config=SearchConfig(max_depth=3),
                               verbose=False)
    resumed = rrun.continue_run(3)
    rrun.close()

    # the same solutions must be found (counts can drift by a few
    # fingerprint merges after the reparse round-trip)
    assert (set(resumed["paper_solutions_found"])
            == set(fresh["paper_solutions_found"]))
    assert abs(resumed["total_valid"] - fresh["total_valid"]) \
        <= 0.05 * fresh["total_valid"] + 2


def test_print_run_id_roundtrip(outdir):
    run = _mk_run()
    run.run(2)
    rid = run.run_id
    run.close()
    run2 = DiscoveryRun("laplace", run_id=rid, verbose=False)
    rep = run2.print_report_from_db(classify_novel=False)
    assert rep["total_generated"] > 0
    run2.close()


def test_verify_pde_from_db(outdir):
    run = _mk_run()
    run.run(2)
    res = run.verify_pde_from_db(scope="valid")
    # Every inline-valid row must survive symbolic verification — if not,
    # the numeric funnel admitted a false positive.
    assert res["refuted"] == [], res["refuted"]
    assert len(res["confirmed"]) > 0
    run.close()


def test_heavy_validate_from_db(outdir):
    run = _mk_run()
    run.run(2)
    out = run.heavy_validate_from_db(scope="valid")
    assert out["passed"] + out["failed"] > 0
    conn = sqlite3.connect(run.db_path)
    n = conn.execute(
        f"SELECT COUNT(*) FROM {table_name_for(run.run_id)} "
        "WHERE heavy_validated_at IS NOT NULL").fetchone()[0]
    assert n == out["passed"] + out["failed"]
    run.close()


def test_kerr_audit_tools(outdir):
    run = DiscoveryRun("kerr_magnetosphere",
                       config=SearchConfig(max_depth=2), verbose=False)
    run.run(2)
    tags = run.audit_kerr_candidates(scope="valid")
    assert set(tags) == {"constant", "no_r_dependence", "no_x_dependence",
                        "disguised_monopole", "other"}
    hits = run.find_monopole_extensions(scope="all", target="either")
    assert isinstance(hits, list)
    run.close()
