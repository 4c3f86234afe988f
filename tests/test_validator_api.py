"""The per-expression validator API (reference interface parity)."""

import pytest
import sympy as sp

from pde_engine_tpu.models import load_problem


def test_validate_knowns_force_free():
    p = load_problem("force_free")
    # fast mode: the symbolic proof of the sqrt-heavy dets takes minutes
    # (reference wart); the exact path is covered by the parabolic test
    results = p.validator.validate_known_solutions(fast_point_only=True)
    assert all(results.values()), results
    assert len(results) == 7


def test_validate_rejects_nonsolution():
    p = load_problem("force_free")
    ok, reason = p.validator.validate("rho*z")
    assert not ok
    assert "residual != 0" in reason


def test_validate_rejects_constant_and_degenerate():
    p = load_problem("force_free")
    ok, reason = p.validator.validate("1")
    assert not ok and "constant" in reason.lower()
    ok, reason = p.validator.validate("rho / (1 - 1)")
    assert not ok
    assert "non-finite" in reason.lower() or "error" in reason.lower()


def test_fast_point_only_mode():
    p = load_problem("force_free")
    ok, reason = p.validator.validate("rho**2", fast_point_only=True)
    assert ok and "point check" in reason


def test_exact_zero_proven_inline():
    p = load_problem("force_free")
    ok, reason = p.validator.validate(
        "sqrt(rho**2 + z**2) - z", check_regularity=False)
    assert ok and "exact zero" in reason
    ev = p.validator.last_evidence()
    assert ev["symbolic_zero"] is True


def test_kerr_validator_heavy_path():
    p = load_problem("kerr")
    # 1 - x is not exact at a = 1/10
    ok, reason = p.validator.validate("1 - x")
    assert not ok
    d = p.validator.describe()
    assert "method_name" in d and "math_definition" in d


def test_cache_stats():
    p = load_problem("force_free")
    p.validator.validate("rho**2")
    p.validator.validate("rho*z")
    stats = p.validator.get_cache_stats()
    assert stats["total"] >= 2
    p.validator.clear_cache()
    assert p.validator.get_cache_stats()["total"] == 0
