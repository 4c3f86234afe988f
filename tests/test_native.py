"""Native host-ingest core (csrc/ingest_core.cpp): equivalence with the
pure-Python paths it replaces.

The native core is optional (graceful fallback when g++/libsqlite3 are
missing), so these tests skip rather than fail when it can't build — but in
CI-like environments with the toolchain they pin down:
- DedupMap batch-insert semantics == the dict + np.unique path
- the sqlite reject sink writes byte-identical rows to the Python sink
"""

import os
import sqlite3

import numpy as np
import pytest

from pde_engine_tpu.utils.native import DedupMap, load_core

native_available = load_core() is not None
needs_native = pytest.mark.skipif(not native_available,
                                  reason="native core unavailable")


# ---------------------------------------------------------------------------
# DedupMap
# ---------------------------------------------------------------------------

@needs_native
def test_dedupmap_batch_semantics_match_python():
    rng = np.random.default_rng(7)
    nmap, pmap = DedupMap(), DedupMap(force_python=True)
    base = 0
    for _ in range(5):
        # heavy duplication within and across batches
        keys = rng.integers(0, 5000, size=20_000).astype(np.uint64)
        a = nmap.insert_batch(keys, base_uid=base)
        b = pmap.insert_batch(keys, base_uid=base)
        assert np.array_equal(a, b)
        base += a.size
    assert len(nmap) == len(pmap)
    assert sorted(nmap.items()) == sorted(pmap.items())


@needs_native
def test_dedupmap_dict_interface():
    m = DedupMap()
    assert len(m) == 0
    m[12345] = 7
    assert 12345 in m and m[12345] == 7 and m.get(12345) == 7
    assert 999 not in m and m.get(999) is None
    with pytest.raises(KeyError):
        m[999]
    m[12345] = 8  # overwrite
    assert m[12345] == 8 and len(m) == 1
    # extreme keys (bit 63 set — structural tag space)
    k = (1 << 63) | 42
    m[k] = 3
    assert m[k] == 3
    m[0] = 1  # zero key must be representable
    assert m[0] == 1


@needs_native
def test_dedupmap_growth_keeps_entries():
    m = DedupMap(cap_hint=4)
    keys = np.arange(100_000, dtype=np.uint64) * np.uint64(2654435761)
    new = m.insert_batch(keys, base_uid=0)
    assert new.size == 100_000
    assert len(m) == 100_000
    # spot-check round trips after many growths
    for i in (0, 1, 99_999, 50_000):
        assert m[int(keys[i])] == i


def test_dedupmap_python_fallback_works():
    m = DedupMap(force_python=True)
    assert not m.native
    keys = np.array([3, 3, 4], dtype=np.uint64)
    assert np.array_equal(m.insert_batch(keys, 10), [0, 2])
    assert m[3] == 10 and m[4] == 11


# ---------------------------------------------------------------------------
# End-to-end: native sink rows == Python sink rows
# ---------------------------------------------------------------------------

def _run_rows(tmp_path, native: bool):
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig
    cfg = SearchConfig(max_depth=2, use_native=native, use_pallas=False)
    sub = tmp_path / ("native" if native else "python")
    sub.mkdir()
    run = DiscoveryRun("force_free", cfg, verbose=False,
                       db_path=str(sub / "run.db"))
    run.run()
    rows = [(r["id"], r["expression"], r["normalized"], r["signature"],
             r["depth"], r["validation_status"], r["is_valid"],
             r["validation_reason"], r["validator_method"],
             r["validator_math"], r["validator_evidence"])
            for r in run.db.rows()]
    run.close()
    return rows


@needs_native
def test_native_sink_rows_identical_to_python(tmp_path):
    rows_n = _run_rows(tmp_path, native=True)
    rows_p = _run_rows(tmp_path, native=False)
    assert len(rows_n) == len(rows_p) > 0
    assert rows_n == rows_p


@needs_native
def test_native_run_has_reject_and_valid_rows(tmp_path):
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig
    cfg = SearchConfig(max_depth=3, use_native=True, use_pallas=False)
    run = DiscoveryRun("force_free", cfg, verbose=False,
                       db_path=str(tmp_path / "r.db"))
    rep = run.run()
    assert rep["total_valid"] > 0
    con = sqlite3.connect(str(tmp_path / "r.db"))
    n_reject, = con.execute(
        f"SELECT COUNT(*) FROM {run.db.table} WHERE is_valid=0").fetchone()
    n_valid, = con.execute(
        f"SELECT COUNT(*) FROM {run.db.table} WHERE is_valid=1").fetchone()
    ev, = con.execute(
        f"SELECT validator_evidence FROM {run.db.table} "
        "WHERE is_valid=0 AND validator_evidence IS NOT NULL LIMIT 1"
    ).fetchone()
    con.close()
    assert n_reject > 0 and n_valid == rep["total_valid"]
    import json
    d = json.loads(ev)  # native-formatted JSON must parse
    assert d["stage"] == "screen" and "rel_max" in d
    run.close()


@needs_native
def test_native_resume_matches_fresh(tmp_path):
    """An extended resumed run reproduces a fresh run EXACTLY row-for-row
    (ids, expressions, signatures, verdicts): the jet-cache snapshot
    restores the original device f32 jets bit-exactly, so post-resume
    fingerprint keys agree with stored signatures.  Only the f64-recheck
    relres inside the human-readable reason text may differ (resumed
    parent tapes are sympy-normalized re-parses with different f64 op
    order at the 1e-16 level)."""
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig
    cfg = SearchConfig(max_depth=2, use_native=True, use_pallas=False)
    a = DiscoveryRun("force_free", cfg, verbose=False,
                     db_path=str(tmp_path / "a.db"))
    a.run()
    run_id = a.run_id
    a.close()
    # incremental shard-dir snapshot format (round 3)
    shard_dir = tmp_path / "a.db.jets.d"
    assert shard_dir.is_dir() and any(
        f.startswith("shard_") for f in os.listdir(shard_dir))

    def key_cols(run):
        return [(r["id"], r["expression"], r["signature"], r["depth"],
                 r["is_valid"], r["validator_method"],
                 r["is_paper_solution"]) for r in run.db.rows()]

    b = DiscoveryRun.resume("force_free", run_id,
                            SearchConfig(max_depth=3, use_native=True,
                                         use_pallas=False),
                            db_path=str(tmp_path / "a.db"), verbose=False)
    b.continue_run(max_depth=3)
    rows_b = key_cols(b)
    b.close()

    fresh = DiscoveryRun("force_free",
                         SearchConfig(max_depth=3, use_native=True,
                                      use_pallas=False),
                         verbose=False, db_path=str(tmp_path / "c.db"))
    fresh.run()
    rows_c = key_cols(fresh)
    fresh.close()
    assert rows_b == rows_c


def test_c_jet_oracle_matches_numpy():
    """The C float64 tape oracle (ej_eval_many) must agree with the NumPy
    implementation on real enumerated tapes — same math, same operation
    order, so differences can only come from libm-vs-numpy transcendental
    rounding (<= a few ulp)."""
    import numpy as np

    from pde_engine_tpu.enumerator import Enumerator
    from pde_engine_tpu.models import load_problem
    from pde_engine_tpu.ops.interpreter import _eval_jets_np_many_numpy
    from pde_engine_tpu.utils.native import eval_jets_native

    p = load_problem("force_free")
    enum = Enumerator(p)
    cands = []
    for c in enum.primitive_candidates():
        enum.add_unique(c)
        cands.append(c)
    # all depth-2 candidates + a handful of depth-3 (covers every opcode)
    d2 = list(enum.candidates_at_depth(2))
    for c in d2:
        enum.add_unique(c)
    d3 = list(enum.candidates_at_depth(3))[:200]
    cands = d2 + d3
    L = max(len(c.tape) for c in cands)
    tapes = np.stack([c.tape.padded(L) for c in cands])
    lengths = np.array([len(c.tape) for c in cands], np.int64)
    consts = p.consts.as_array(np.float64)
    pts = p.screen_points
    for order in (1, 4):
        ref = _eval_jets_np_many_numpy(tapes, lengths, consts, pts, order)
        out = eval_jets_native(tapes, lengths, consts, pts, order)
        assert out is not None, "native core must be available in CI"
        # identical NaN/Inf structure
        np.testing.assert_array_equal(np.isfinite(ref), np.isfinite(out))
        m = np.isfinite(ref)
        # atol floor: catastrophic-cancellation coefficients near 1e-16
        # amplify 1-ulp libm-vs-numpy transcendental differences
        np.testing.assert_allclose(out[m], ref[m], rtol=1e-12, atol=5e-15)


@needs_native
def test_tape_builder_matches_python_composition(tmp_path):
    """C tape materializer (tm_build_batch) must produce byte-identical
    tapes to the Python apply_unary/apply_binary composition for every
    registered unique (all 17 surface ops exercised at depth 3)."""
    from pde_engine_tpu.models import load_problem
    from pde_engine_tpu.pipeline import DiscoveryEngine
    from pde_engine_tpu.utils.config import SearchConfig

    p = load_problem("force_free")
    eng = DiscoveryEngine(p, SearchConfig(max_depth=3, use_native=True))
    eng.run(3)
    enum = eng.enumerator
    n = enum.count_uniques()
    assert enum._tape_builder() is not None and enum._tape_builder() \
        is not False
    uids = np.arange(n, dtype=np.int64)
    arr, lens = enum.tapes_batch(uids)
    for u in range(n):
        want = enum.unique_at(u).tape
        got = arr[u, :int(lens[u])]
        np.testing.assert_array_equal(got, np.asarray(want.rows),
                                      err_msg=enum.expr_str_of(u))


def test_tune_allocator_idempotent():
    """hostmem.tune_allocator applies glibc mallopt tuning (Linux) and is
    safe to call repeatedly — pipeline calls it per-engine."""
    import sys

    from pde_engine_tpu.utils.hostmem import tune_allocator
    first = tune_allocator()
    assert tune_allocator() == first
    if sys.platform.startswith("linux"):
        assert first is True


# ---------------------------------------------------------------------------
# Disk-spilled string arena (SearchConfig.spill_strings / --spill-strings):
# string bytes in an UNLINKED MAP_SHARED temp file, evictable under memory
# pressure — the mega-run host-RAM lever (PERF.md roadmap #4).
# ---------------------------------------------------------------------------

@needs_native
def test_spill_arena_matches_anonymous(tmp_path):
    from pde_engine_tpu.utils.native import ExprArena
    spill = ExprArena(spill_dir=str(tmp_path))
    anon = ExprArena()
    assert spill.spilled and not anon.spilled
    for a in (spill, anon):
        a.add_raw(["rho", "z", "1"])
        a.set_wrapped(2, "(1)")
        a.add_bulk("(", " + ", ")", np.arange(3), np.array([1, 2, 0]),
                   use_wrapped=True)
        # grow through several ftruncate+mremap cycles
        for _ in range(8):
            n = len(a)
            a.add_bulk("sqrt(", None, ")", np.arange(n), None)
    assert len(spill) == len(anon)
    for uid in range(0, len(spill), max(1, len(spill) // 64)):
        assert spill.get(uid) == anon.get(uid)
    uids = np.arange(0, len(spill), 7, dtype=np.int64)
    assert spill.blob(uids) == anon.blob(uids)
    # the backing file is unlinked at creation: nothing visible on disk
    assert not [f for f in os.listdir(tmp_path)
                if f.startswith(".pde_arena")]
    # unwritable dir falls back to the anonymous arena, not an error
    fb = ExprArena(spill_dir=str(tmp_path / "missing"))
    assert not fb.spilled
    fb.add_raw(["x"])
    assert fb.get(0) == "x"


@needs_native
def test_spill_strings_run_matches_default(tmp_path):
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig

    def rows(spill):
        sub = tmp_path / ("spill" if spill else "plain")
        sub.mkdir()
        cfg = SearchConfig(max_depth=3, use_pallas=False,
                           spill_strings=str(sub) if spill else None)
        run = DiscoveryRun("laplace", cfg, verbose=False,
                           db_path=str(sub / "run.db"))
        run.run()
        out = [(r["id"], r["expression"], r["signature"], r["is_valid"])
               for r in run.db.rows()]
        run.close()
        return out

    a, b = rows(True), rows(False)
    assert a == b and len(a) > 0
