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


def test_report_files_follow_explicit_db_path(outdir):
    """With an explicit db_path, reports land next to the DB — not in
    the problem's default problems/<name>/outputs/ (which would litter
    the repo when tests/mega-runs use scratch DBs)."""
    sub = outdir / "scratch"
    sub.mkdir()
    run = DiscoveryRun("laplace", config=SearchConfig(max_depth=2),
                       db_path=str(sub / "run.db"), verbose=False)
    run.run(2)
    run.close()
    files = os.listdir(sub)
    assert any(f.startswith("reproduction_") for f in files)
    assert any(f.startswith("report_") for f in files)
    default = run.problem.get_output_dir()
    assert not any(f.startswith(("reproduction_", "report_"))
                   for f in os.listdir(default))


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


def test_validator_evidence_persisted(outdir):
    """Per-row evidence JSON + math description are persisted (reference
    general:1330-1335, kerr validator.py:296-306)."""
    run = _mk_run()
    run.run(2)
    conn = sqlite3.connect(run.db_path)
    rows = conn.execute(
        f"SELECT validator_evidence, validator_math, is_valid FROM "
        f"{table_name_for(run.run_id)}").fetchall()
    assert rows
    n_valid = 0
    for ev_json, math, is_valid in rows:
        assert ev_json, "validator_evidence must be non-NULL"
        ev = json.loads(ev_json)
        assert "rel_max" in ev and "stage" in ev and "screen_ok" in ev
        if is_valid:
            n_valid += 1
            assert math, "validator_math must be non-NULL on valid rows"
        else:
            # documented deviation (utils/db.py): reject rows store NULL
            # validator_math — it is a run-level constant, kept on valid
            # rows and in generator_progress.state_json
            assert math is None
    assert n_valid > 0
    state, = conn.execute(
        "SELECT state_json FROM generator_progress WHERE run_id=?",
        (run.run_id,)).fetchone()
    assert json.loads(state)["math_definition"]
    run.close()


def test_signatures_stable_across_processes(outdir):
    """Dedup keys/signatures must not depend on Python's per-process hash
    salt (ADVICE.md round 1): two runs under different PYTHONHASHSEED
    must store identical expression→signature maps."""
    import subprocess
    import sys

    sigs = []
    for seed in ("1", "31337"):
        wd = outdir / f"seed{seed}"
        wd.mkdir()
        env = dict(os.environ, PYTHONHASHSEED=seed,
                   PYTHONPATH="/root/repo")
        code = (
            "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
            "from pde_engine_tpu.runtime import DiscoveryRun\n"
            "from pde_engine_tpu.utils.config import SearchConfig\n"
            "r = DiscoveryRun('laplace', config=SearchConfig(max_depth=2),"
            " run_id='paper_repro_20000101_000000_testseed',"
            " verbose=False)\n"
            "r.run(2); r.close()\n")
        subprocess.run([sys.executable, "-c", code], cwd=wd, env=env,
                       check=True, capture_output=True)
        db = (wd / "problems" / "laplace" / "outputs" /
              "parallel_runs_paper_repro_20000101_000000_testseed.db")
        conn = sqlite3.connect(db)
        sigs.append(dict(conn.execute(
            "SELECT expression, signature FROM "
            "expressions_paper_repro_20000101_000000_testseed")))
        conn.close()
    assert sigs[0] == sigs[1]


def test_mid_depth_resume_no_duplicates(outdir):
    """An interrupt mid-depth must not re-admit already-stored uniques on
    resume (stable struct keys): rewind the generator state to depth 1 and
    re-run depth 2 — the dedup map must absorb every candidate."""
    frun = _mk_run(depth=2)
    fresh = frun.run(2)
    rid = frun.run_id
    # simulate a mid-depth-2 interrupt: state says depth 1 completed
    frun.db.save_generator_state({"completed_depth": 1, "max_depth": 2,
                                  "include_special_ops": True,
                                  "prune": True})
    frun.close()

    rrun = DiscoveryRun.resume("laplace", rid,
                               config=SearchConfig(max_depth=2),
                               verbose=False)
    resumed = rrun.continue_run(2)
    rrun.close()
    # no new uniques/rows may appear — depth 2 was already fully stored
    assert resumed["total_generated"] == fresh["total_generated"]
    assert resumed["total_valid"] == fresh["total_valid"]


def test_kerr_anchor_only_known_semantics(outdir):
    """The Kerr monopole 1 - x solves only the a→0 limit: it must be
    validated at its anchor (✓, not a spurious ✗) and excluded from the
    report's found/expected discoverability count (VERDICT round 1)."""
    from pde_engine_tpu.models import load_problem
    from pde_engine_tpu.utils.report import format_report_text

    p = load_problem("kerr_magnetosphere")
    ok, rel, note = p.validate_known("1 - x")
    assert ok and "anchor" in note
    assert rel < 1e-9

    run = DiscoveryRun(p, config=SearchConfig(max_depth=2), verbose=False)
    rep = run.run(2)
    run.close()
    txt = format_report_text(rep)
    assert "found: 0/0" in txt
    assert "ANCHR" in txt


def test_no_audit_rejects_mode(tmp_path):
    """--no-audit-rejects: rejects screened/deduped/counted but not
    persisted; valid rows stored; reports read the saved per-depth counts."""
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig

    run = DiscoveryRun("laplace",
                       config=SearchConfig(max_depth=2,
                                           audit_rejects=False),
                       db_path=str(tmp_path / "na.db"), verbose=False)
    report = run.run(2)
    full = DiscoveryRun("laplace",
                        config=SearchConfig(max_depth=2),
                        db_path=str(tmp_path / "full.db"), verbose=False)
    ref = full.run(2)
    # same totals and valids as the audited run
    assert report["total_generated"] == ref["total_generated"]
    assert report["total_valid"] == ref["total_valid"]
    assert report["by_depth"] == ref["by_depth"]
    # DB holds only valid rows (plus nothing else)
    rows = run.db.rows()
    assert all(bool(r["is_valid"]) for r in rows)
    assert len(rows) == report["total_valid"]
    # post-hoc report reconstructs true totals from generator state
    post = run.print_report_from_db(classify_novel=False)
    assert post["total_generated"] == ref["total_generated"]
    run.close()
    full.close()


def test_no_audit_resume_matches_fresh(tmp_path):
    """VERDICT round-2 missing #1 (the repro that exposed it): resuming a
    --no-audit-rejects run must reproduce a fresh run exactly — the
    registry sidecar carries the full unique set even though the DB holds
    only valid rows.  Before the sidecar, a resumed laplace depth-2→3 run
    under-enumerated 1427→291 uniques with no warning."""
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig

    fresh = DiscoveryRun("laplace",
                         config=SearchConfig(max_depth=3,
                                             audit_rejects=False),
                         db_path=str(tmp_path / "fresh.db"), verbose=False)
    frep = fresh.run(3)

    part = DiscoveryRun("laplace",
                        config=SearchConfig(max_depth=2,
                                            audit_rejects=False),
                        db_path=str(tmp_path / "part.db"), verbose=False)
    part.run(2)
    rid = part.run_id
    part.close()

    res = DiscoveryRun.resume("laplace", rid,
                              config=SearchConfig(max_depth=3,
                                                  audit_rejects=False),
                              db_path=str(tmp_path / "part.db"),
                              verbose=False)
    rrep = res.continue_run(3)

    # per-depth unique/valid counts identical (291 vs 1427 before the fix)
    assert rrep["by_depth"] == frep["by_depth"]
    assert rrep["total_valid"] == frep["total_valid"]
    # every valid row identical: id, expression, signature
    fv = {(int(r["id"]), r["expression"], r["signature"])
          for r in fresh.db.rows("is_valid=1")}
    rv = {(int(r["id"]), r["expression"], r["signature"])
          for r in res.db.rows("is_valid=1")}
    assert rv == fv
    # the rebuilt registry matches the fresh forward registry exactly
    import numpy as np
    eb, ef = fresh.engine.enumerator, res.engine.enumerator
    n = eb.count_uniques()
    assert ef.count_uniques() == n
    np.testing.assert_array_equal(ef.u_op[:n], eb.u_op[:n])
    np.testing.assert_array_equal(ef.u_a[:n], eb.u_a[:n])
    np.testing.assert_array_equal(ef.u_b[:n], eb.u_b[:n])
    assert [ef.expr_str_of(u) for u in range(n)] == \
           [eb.expr_str_of(u) for u in range(n)]
    fresh.close()
    res.close()


def test_no_audit_resume_without_sidecar_refuses(tmp_path):
    """A no-audit run whose registry sidecar is missing (e.g. a round-2
    DB) must REFUSE to resume rather than silently under-enumerate."""
    import pytest as _pytest

    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig

    run = DiscoveryRun("laplace",
                       config=SearchConfig(max_depth=2,
                                           audit_rejects=False),
                       db_path=str(tmp_path / "na.db"), verbose=False)
    run.run(2)
    rid = run.run_id
    run.close()
    os.remove(str(tmp_path / "na.db") + ".registry.npz")

    with _pytest.raises(RuntimeError, match="audit_rejects=False"):
        DiscoveryRun.resume("laplace", rid,
                            config=SearchConfig(max_depth=3,
                                                audit_rejects=False),
                            db_path=str(tmp_path / "na.db"),
                            verbose=False)


def test_struct_fast_resume_equals_parse_resume(tmp_path):
    """The array-speed resume (structural triples, no re-parsing) must
    rebuild EXACTLY the registry the SymPy parse path builds: same uids,
    same flags, same strings, same fp->uid map, and the continued run
    must produce identical rows."""
    import numpy as np

    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig

    base = DiscoveryRun("force_free",
                        config=SearchConfig(max_depth=3),
                        db_path=str(tmp_path / "a.db"), verbose=False)
    base.run(3)
    rid = base.run_id
    eb = base.engine.enumerator  # ground truth: the forward-path registry

    fast = DiscoveryRun.resume("force_free", rid,
                               config=SearchConfig(max_depth=3),
                               db_path=str(tmp_path / "a.db"),
                               verbose=False)
    # the fast path must actually have engaged (new-schema DB,
    # consecutive ids)
    rows = fast.db.rows()
    assert fast._struct_resume_prefix(rows) > 0

    # the rebuilt registry must EQUAL the forward-path one, uid for uid
    # (the legacy parse path loses rows whose sympy re-parse fails — the
    # structural path has no parser, so nothing to lose)
    ef = fast.engine.enumerator
    n = eb.count_uniques()
    assert ef.count_uniques() == n
    np.testing.assert_array_equal(ef.u_op[:n], eb.u_op[:n])
    np.testing.assert_array_equal(ef.u_a[:n], eb.u_a[:n])
    np.testing.assert_array_equal(ef.u_b[:n], eb.u_b[:n])
    np.testing.assert_array_equal(ef.f_has_var[:n], eb.f_has_var[:n])
    np.testing.assert_array_equal(ef.f_top_inv[:n], eb.f_top_inv[:n])
    np.testing.assert_array_equal(ef.f_is_coord[:n], eb.f_is_coord[:n])
    assert ef._coordinate_uids == eb._coordinate_uids
    assert [ef.expr_str_of(u) for u in range(n)] == \
           [eb.expr_str_of(u) for u in range(n)]
    # every forward-path dedup key maps to the same uid
    for k, v in base.engine.fp_to_uid.items():
        assert fast.engine.fp_to_uid.get(int(k)) == int(v)
    base.close()

    # the continued run keeps finding the knowns and assigns fresh ids
    # beyond the stored range
    rep = fast.continue_run(4)
    assert len(rep["paper_solutions_found"]) == 7
    d4 = fast.db.rows("depth = 4")
    assert len(d4) > 0
    assert min(int(r["id"]) for r in d4) > n
    fast.close()


def test_registry_sidecar_parts_are_incremental(tmp_path):
    """The registry sidecar is persisted as append-only per-barrier delta
    parts: extending a run adds a new part file without rewriting the
    earlier ones (a depth-6 run must not rewrite a ~20 GB sidecar at
    every barrier — round-3 review finding)."""
    import numpy as np

    run = DiscoveryRun("laplace",
                       config=SearchConfig(max_depth=2,
                                           audit_rejects=False),
                       db_path=str(tmp_path / "inc.db"), verbose=False)
    run.run(2)
    rid = run.run_id
    parts0 = run._registry_part_files()
    assert parts0, "depth barriers must write registry parts"
    assert parts0[0][0] == 0
    first = parts0[0][2]
    sig0 = (os.path.getsize(first), os.path.getmtime(first))
    run.close()

    res = DiscoveryRun.resume("laplace", rid,
                              config=SearchConfig(max_depth=3,
                                                  audit_rejects=False),
                              db_path=str(tmp_path / "inc.db"),
                              verbose=False)
    res.continue_run(3)
    parts1 = res._registry_part_files()
    assert len(parts1) > len(parts0)
    # contiguous coverage, and the first part untouched (no rewrite)
    expect = 0
    for lo, hi, _ in parts1:
        assert lo == expect
        expect = hi
    assert expect == res.engine.enumerator.count_uniques()
    assert (os.path.getsize(first), os.path.getmtime(first)) == sig0
    # every part carries this run's id
    for _, _, p in parts1:
        with np.load(p) as z:
            assert str(z["run_id"]) == rid
    res.close()


def test_sharded_keys_reject_stale_shards(tmp_path):
    """_load_sharded_keys must read exactly ranks 0..world-1 and refuse
    shard files whose world size or run_id does not match — stale files
    from an earlier run sharing the db_path must never be merged
    (round-3 review finding)."""
    import numpy as np

    run = DiscoveryRun("laplace", config=SearchConfig(max_depth=1),
                       db_path=str(tmp_path / "st.db"), verbose=False)

    def shard(rank, world, run_id, uids, keys):
        with open(run._keys_shard_path(rank), "wb") as f:
            np.savez(f, keys=np.asarray(keys, np.uint64),
                     uids=np.asarray(uids, np.int64),
                     world=np.int64(world), run_id=np.str_(run_id))

    # good pair covering uids 0..3 for THIS run at world=2
    shard(0, 2, run.run_id, [0, 2], [10, 12])
    shard(1, 2, run.run_id, [1, 3], [11, 13])
    # stale leftover from an older world=3 run: must be ignored entirely
    shard(2, 3, "paper_repro_old_deadbeef", [0, 1, 2, 3], [9, 9, 9, 9])
    keys = run._load_sharded_keys(4, 2)
    np.testing.assert_array_equal(keys, [10, 11, 12, 13])

    # wrong world in an in-range rank: refuse
    shard(1, 3, run.run_id, [1, 3], [11, 13])
    with pytest.raises(RuntimeError, match="different run"):
        run._load_sharded_keys(4, 2)

    # wrong run_id: refuse
    shard(1, 2, "paper_repro_other_cafebabe", [1, 3], [11, 13])
    with pytest.raises(RuntimeError, match="different run"):
        run._load_sharded_keys(4, 2)

    # missing rank: refuse
    os.remove(run._keys_shard_path(1))
    with pytest.raises(RuntimeError, match="missing"):
        run._load_sharded_keys(4, 2)
    run.close()


def test_fresh_run_clears_stale_sidecar_files(tmp_path):
    """A fresh run at a db_path that carries another run's resume state
    (jet shards, registry parts, key shards) must clear it — otherwise
    its own checkpoints would silently merge foreign data (round-3
    review finding)."""
    import numpy as np

    db = str(tmp_path / "reuse.db")
    # plant a foreign run's artifacts at the same path
    os.makedirs(db + ".jets.d")
    with open(os.path.join(db + ".jets.d", "shard_0_8.npz"), "wb") as f:
        np.savez(f, screen=np.ones((8, 4), np.float32),
                 fp=np.ones((8, 2), np.float32))
    os.makedirs(db + ".registry.d")
    with open(os.path.join(db + ".registry.d", "part_0_9.npz"),
              "wb") as f:
        np.savez(f, op=np.zeros(9, np.int16), a=np.zeros(9, np.int32),
                 b=np.zeros(9, np.int32), depth=np.ones(9, np.int16),
                 keys=np.arange(9, dtype=np.uint64),
                 run_id=np.str_("paper_repro_old_deadbeef"))
    with open(db + ".registry.npz", "wb") as f:
        np.savez(f, n_uniques=np.int64(9),
                 run_id=np.str_("paper_repro_old_deadbeef"),
                 d1_exprs=np.array(["X"]), completed_depth=np.int64(3),
                 cache_n=np.int64(9), n_rows=np.int64(9),
                 keys_sharded=np.int64(0))
    with open(db + ".registry.keys.0.npz", "wb") as f:
        np.savez(f, keys=np.arange(4, dtype=np.uint64),
                 uids=np.arange(4, dtype=np.int64),
                 world=np.int64(4),
                 run_id=np.str_("paper_repro_old_deadbeef"))

    run = DiscoveryRun("laplace", config=SearchConfig(max_depth=2),
                       db_path=db, verbose=False)
    run.run(2)
    # the foreign artifacts are gone; what exists now belongs to this run
    assert not os.path.exists(db + ".registry.keys.0.npz")
    with np.load(db + ".registry.npz") as z:
        assert str(z["run_id"]) == run.run_id
    for _, _, p in run._registry_part_files():
        with np.load(p) as z:
            assert str(z["run_id"]) == run.run_id
    shards = run._shard_files()
    assert shards and shards[0][0] == 0
    # and the first jet shard is this run's (cache rows, not 8 foreign)
    assert shards[-1][1] == min(
        run.engine.cache.n,
        run.config.snapshot_max_bytes
        // ((run.engine.cache.sdim + run.engine.cache.fdim) * 4))
    run.close()


def test_resume_with_corrupt_jet_shard_invalidates_snapshot(tmp_path):
    """When a resume cannot load the jet snapshot (corrupt shard), the
    stale shards must be removed so later barriers rebuild the snapshot
    from row 0 of the live cache — appending on top of an unloaded base
    would hand the NEXT resume inconsistent parent jets (round-3 review
    finding)."""
    import numpy as np

    db = str(tmp_path / "corrupt.db")
    run = DiscoveryRun("laplace", config=SearchConfig(max_depth=2),
                       db_path=db, verbose=False)
    run.run(2)
    rid = run.run_id
    shards = run._shard_files()
    assert shards
    run.close()
    with open(shards[0][2], "wb") as f:
        f.write(b"not an npz")

    res = DiscoveryRun.resume("laplace", rid,
                              config=SearchConfig(max_depth=3),
                              db_path=db, verbose=False)
    res.continue_run(3)
    # snapshot was rebuilt from scratch and is loadable + contiguous
    shards2 = res._shard_files()
    assert shards2 and shards2[0][0] == 0
    snap = res._load_jet_snapshot()
    assert snap is not None
    assert snap["n"] == shards2[-1][1]
    np.testing.assert_array_equal(
        snap["screen"][: snap["n"]],
        np.asarray(res.engine.cache.screen)[: snap["n"]])
    res.close()


def test_no_audit_resume_extends_two_depths(tmp_path):
    """Extending a resumed no-audit run by TWO depths drives the arena
    tail repair (_ensure_strings): the sidecar restores the registry with
    dropped strings, the first non-final ingest needs parent strings
    back, and the batched segment recomposition must reproduce the fresh
    run byte-for-byte (per-uid recursive rebuild took hours at mega
    scale — round-3 review finding)."""
    fresh = DiscoveryRun("laplace",
                         config=SearchConfig(max_depth=4,
                                             audit_rejects=False),
                         db_path=str(tmp_path / "f4.db"), verbose=False)
    frep = fresh.run(4)

    part = DiscoveryRun("laplace",
                        config=SearchConfig(max_depth=2,
                                            audit_rejects=False),
                        db_path=str(tmp_path / "p4.db"), verbose=False)
    part.run(2)
    rid = part.run_id
    part.close()

    res = DiscoveryRun.resume("laplace", rid,
                              config=SearchConfig(max_depth=4,
                                                  audit_rejects=False),
                              db_path=str(tmp_path / "p4.db"),
                              verbose=False)
    rrep = res.continue_run(4)
    assert rrep["by_depth"] == frep["by_depth"]
    fv = {(int(r["id"]), r["expression"], r["signature"])
          for r in fresh.db.rows("is_valid=1")}
    rv = {(int(r["id"]), r["expression"], r["signature"])
          for r in res.db.rows("is_valid=1")}
    assert rv == fv
    # display strings identical across the whole registry
    eb, ef = fresh.engine.enumerator, res.engine.enumerator
    n = eb.count_uniques()
    assert ef.count_uniques() == n
    assert [ef.expr_str_of(u) for u in range(n)] == \
           [eb.expr_str_of(u) for u in range(n)]
    fresh.close()
    res.close()


import pytest


@pytest.mark.parametrize("use_segmented", [False, True])
def test_extension_resume_widens_final_append_window(tmp_path,
                                                     use_segmented):
    """Extending a COMPLETED run past its recorded max_depth must widen
    the parent window to what a fresh run would have appended: the saved
    cache_n was clamped by the FINAL-depth append limit (the original
    run had no deeper depth to feed), not by the HBM budget.  The
    missing jets replay through the production kernels
    (pipeline._replay_composed_rows), so resumed+extended == fresh holds
    even when the original final depth stopped appending early.  Before
    the widening, this resume silently under-enumerated depth 4 (the
    depth-3 parents beyond cache_n never composed children)."""
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig

    # truncate hard: only 10 depth-3 uniques get cached in run A.
    # use_segmented=True routes the replay through the tile-aligned
    # superbatch packing (interpret-mode Pallas on CPU) — the path a
    # production TPU resume takes.
    small = dict(final_append_limit=10, audit_rejects=False,
                 use_segmented=use_segmented)
    fresh = DiscoveryRun("laplace",
                         config=SearchConfig(max_depth=4, **small),
                         db_path=str(tmp_path / "fresh.db"),
                         verbose=False)
    frep = fresh.run(4)

    part = DiscoveryRun("laplace",
                        config=SearchConfig(max_depth=3, **small),
                        db_path=str(tmp_path / "part.db"), verbose=False)
    part.run(3)
    rid = part.run_id
    n_d3 = part.engine.enumerator.count_uniques()
    assert part.engine.cache.n < n_d3, \
        "test premise: the final depth must stop appending early"
    part.close()

    res = DiscoveryRun.resume("laplace", rid,
                              config=SearchConfig(max_depth=4, **small),
                              db_path=str(tmp_path / "part.db"),
                              verbose=False)
    # window widened to every depth<=3 unique (cache_row_limit >> n here)
    assert res.engine.cache.n == n_d3
    rrep = res.continue_run(4)

    assert rrep["by_depth"] == frep["by_depth"]
    assert rrep["total_valid"] == frep["total_valid"]
    fv = {(int(r["id"]), r["expression"], r["signature"])
          for r in fresh.db.rows("is_valid=1")}
    rv = {(int(r["id"]), r["expression"], r["signature"])
          for r in res.db.rows("is_valid=1")}
    assert rv == fv
    fresh.close()
    res.close()


def test_reresume_interrupted_depth_keeps_saved_window(tmp_path):
    """The widening applies ONLY to extensions of completed runs: a run
    whose max_depth is NOT yet reached resumes with exactly the saved
    cache_n window (re-running an interrupted depth with a different
    parent window would compose candidates the original depth never
    saw)."""
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig

    part = DiscoveryRun("laplace",
                        config=SearchConfig(max_depth=3,
                                            audit_rejects=False),
                        db_path=str(tmp_path / "p.db"), verbose=False)
    part.run(2)  # completed depth 2 of a max_depth-3 run
    rid = part.run_id
    cache_n = part.engine.cache.n
    part.close()

    res = DiscoveryRun.resume("laplace", rid,
                              config=SearchConfig(max_depth=3,
                                                  audit_rejects=False),
                              db_path=str(tmp_path / "p.db"),
                              verbose=False)
    assert res.engine.cache.n == cache_n
    res.close()
