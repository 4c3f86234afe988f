"""Command-line interface.

Verb-for-verb parity with the reference's argparse surface
(general_method_paper_reproduction.py:2387-2460):

  python -m pde_engine_tpu --problem force_free --max-depth 4
  python -m pde_engine_tpu --print-run-id <id> [--verify-pde] [--find-monopole] [--audit-kerr]
  python -m pde_engine_tpu --resume-run <id>

``--validators`` is accepted for compatibility; the TPU pipeline has no
worker processes (its parallelism is the device mesh — ``--devices`` picks
how many chips to shard the candidate axis over).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pde_engine_tpu",
        description="TPU-native symbolic PDE-solution discovery engine")
    p.add_argument("--mode", choices=["parallel", "sequential"],
                   default="parallel",
                   help="Kept for reference parity; both modes run the "
                        "device pipeline (sequential additionally proves "
                        "exact zeros inline via SymPy).")
    p.add_argument("--problem", type=str, default="force_free",
                   help="force_free | kerr_magnetosphere | laplace | "
                        "grad_shafranov")
    p.add_argument("--max-depth", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=None,
                   help="candidates per device dispatch (default: auto — "
                        "262144 on accelerators, 16384 on CPU)")
    p.add_argument("--validators", type=int, default=0,
                   help="(compat) ignored — validation is on-device")
    p.add_argument("--devices", type=int, default=None,
                   help="Shard the candidate axis over this many devices")
    p.add_argument("--no-special-ops", action="store_true",
                   help="Disable sqrt_shift/exp_mul/log_mul special ops "
                        "(matches the reference fast path's effective "
                        "op set)")
    p.add_argument("--no-prune", action="store_true")
    p.add_argument("--no-audit-rejects", action="store_true",
                   help="Mega-scale mode: screen/dedup/count rejects but "
                        "store only valid rows (a 10^9-candidate depth's "
                        "reject audit alone is ~100 GB)")
    p.add_argument("--max-cache-rows", type=int, default=None,
                   help="Device jet-cache HBM budget in rows (default: "
                        "auto — an ~11 GiB budget over the family's "
                        "jet-row bytes: 20M rows for order-4 force_free "
                        "at ~552 B/row, ~2x that for order-2 families; "
                        "uniques beyond it are screened and stored but "
                        "not composed deeper on this chip)")
    p.add_argument("--spill-strings", nargs="?", const="auto",
                   default=None, metavar="DIR",
                   help="Disk-spill the display-string arena to an "
                        "unlinked temp file in DIR (default: the run "
                        "DB's directory) — string pages become "
                        "evictable, lifting the ~50 B/unique share of "
                        "the mega-run host-RAM ceiling")
    p.add_argument("--omega", type=float, default=0.0,
                   help="Rigid field-line rotation rate (force_free only)")
    p.add_argument("--confirm-symbolic", action="store_true",
                   help="Prove exact zeros inline with SymPy (slow; "
                        "default defers to --verify-pde)")
    p.add_argument("--heavy-checks", action="store_true",
                   help="Run regularity/finiteness/anchor checks inline "
                        "instead of deferring")
    p.add_argument("--no-report-families", action="store_true",
                   help="Skip the family-breakdown pass in --print-run-id "
                        "reports (without a populated registry it falls "
                        "back to per-row SymPy at ~1.4k rows/s — hours on "
                        "a 10^7-valid partial mega-run)")
    p.add_argument("--print-run-id", type=str,
                   help="Print results for an existing run (DB only)")
    p.add_argument("--watch-run", type=str,
                   help="Attach a live status monitor to a running run")
    p.add_argument("--db-path", type=str)
    p.add_argument("--resume-run", type=str,
                   help="Resume generation/validation for an existing run")
    p.add_argument("--resume-validators", type=int, default=8,
                   help="(compat) ignored")
    p.add_argument("--verify-pde", action="store_true",
                   help="Symbolically verify residual == 0 for stored rows")
    p.add_argument("--verify-scope", choices=["novel", "valid", "all"],
                   default="novel")
    p.add_argument("--verify-limit", type=int, default=None,
                   help="Verify at most N rows (shortest-first; SymPy "
                        "proofs are ~0.1-1 s/row — cap this on mega-runs)")
    p.add_argument("--heavy-limit", type=int, default=None,
                   help="Heavy-validate at most N rows (shortest-first "
                        "sampled pass for mega-run DBs)")
    p.add_argument("--find-monopole", action="store_true")
    p.add_argument("--monopole-target", choices=["either", "1-x", "x"],
                   default="either")
    p.add_argument("--audit-kerr", action="store_true")
    p.add_argument("--heavy-validate", action="store_true",
                   help="Run heavy checks over stored rows (post-hoc)")
    p.add_argument("--certify", action="store_true",
                   help="Emit machine-checkable exactness certificates for "
                        "stored rows (verify independently with "
                        "tools/check_certificates.py)")
    p.add_argument("--certify-limit", type=int, default=None,
                   help="Certify at most N rows (shortest-expression "
                        "first; SymPy proof work is ~0.1-1 s/row)")
    p.add_argument("--multihost", action="store_true",
                   help="Initialize the multi-host JAX runtime "
                        "(jax.distributed; configure via "
                        "PDE_ENGINE_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID "
                        "or rely on pod auto-detection) and shard over the "
                        "global mesh")
    p.add_argument("--shard-cache", action="store_true",
                   help="With --devices: shard the device jet cache by "
                        "uid range across the mesh (chip d holds cache "
                        "rows [d*C/K, (d+1)*C/K); operand rows are "
                        "reconstructed per batch with one fused psum), so "
                        "the parent window scales to K * --max-cache-rows "
                        "with NO truncation instead of capping at one "
                        "chip's HBM")
    p.add_argument("--shard-registry", action="store_true",
                   help="With --multihost: shard the host-side registry "
                        "across processes — each host's dedup map holds "
                        "only its slice of the key space and display "
                        "strings/reject rows live on the writer host "
                        "only, so per-host RAM scales down with the pod")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="Capture a jax.profiler trace of the run into DIR "
                        "(view with TensorBoard / xprof)")
    p.add_argument("--debug-nans", action="store_true",
                   help="Enable jax_debug_nans (sanitizer mode; NaNs in "
                        "device computation raise immediately — note the "
                        "screen INTENTIONALLY produces NaNs for domain "
                        "violations, so this is for kernel debugging only)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .runtime import DiscoveryRun
    from .utils.config import SearchConfig

    config = SearchConfig(
        max_depth=args.max_depth,
        batch_size=args.batch_size,
        include_special_ops=not args.no_special_ops,
        prune=not args.no_prune,
        confirm_symbolic=(args.confirm_symbolic
                          or args.mode == "sequential"),
        defer_heavy_checks=not args.heavy_checks,
        audit_rejects=not args.no_audit_rejects,
        shard_registry=args.shard_registry,
        shard_cache=args.shard_cache,
        spill_strings=args.spill_strings,
    )
    if args.shard_cache and not (args.devices or args.multihost):
        print("error: --shard-cache requires a mesh (--devices N)",
              flush=True)
        return 2
    if args.max_cache_rows is not None:
        config.max_cache_rows = args.max_cache_rows

    mesh = None
    if args.multihost:
        from .parallel.distributed import (global_candidate_mesh,
                                           initialize)
        initialize()
        mesh = global_candidate_mesh()
    elif args.devices:
        from .parallel.mesh import candidate_mesh
        mesh = candidate_mesh(args.devices)

    if args.validators:
        # reference compatibility knob; validation here is on-device
        print(f"note: --validators {args.validators} ignored — validation "
              "runs on-device (use --devices to shard across chips)")

    def _problem():
        if args.omega and args.problem.startswith("force"):
            from .models.force_free import ForceFreeProblem
            return ForceFreeProblem(omega=args.omega)
        return args.problem

    def make_run(run_id=None, resume=False):
        if resume:
            return DiscoveryRun.resume(_problem(), args.resume_run,
                                       config=config, db_path=args.db_path,
                                       mesh=mesh)
        return DiscoveryRun(_problem(), config=config, run_id=run_id,
                            db_path=args.db_path, mesh=mesh)

    if args.watch_run:
        from .models import load_problem as _lp
        from .utils.db import db_path_for
        from .utils.monitor import watch
        _prob = _problem()
        if isinstance(_prob, str):
            _prob = _lp(_prob)
        db_path = args.db_path or db_path_for(_prob.get_output_dir(),
                                              args.watch_run)
        if not os.path.exists(db_path):
            print(f"Database not found: {db_path}")
            return 1
        watch(db_path, args.watch_run)
        return 0

    if args.print_run_id:
        # existence check BEFORE constructing the run — RunDB would
        # otherwise create an empty database at the inferred path.
        # NOTE: _problem() (not args.problem) so --omega post-hoc audits
        # (--verify-pde/--heavy-validate) use the rotating residual
        # (ADVICE.md round 1, cli.py:142).
        from .models import load_problem as _lp
        from .utils.db import db_path_for
        prob = _problem()
        if isinstance(prob, str):
            prob = _lp(prob)
        db_path = args.db_path or db_path_for(prob.get_output_dir(),
                                              args.print_run_id)
        if not os.path.exists(db_path):
            print(f"Database not found: {db_path}")
            return 1
        run = DiscoveryRun(prob, config=config,
                           run_id=args.print_run_id, db_path=db_path)
        run.print_report_from_db(families=not args.no_report_families)
        if args.verify_pde:
            run.verify_pde_from_db(scope=args.verify_scope,
                                   limit=args.verify_limit)
        if args.find_monopole:
            run.find_monopole_extensions(scope=args.verify_scope,
                                         target=args.monopole_target)
        if args.audit_kerr:
            run.audit_kerr_candidates(scope=args.verify_scope)
        if args.heavy_validate:
            run.heavy_validate_from_db(scope=args.verify_scope,
                                       limit=args.heavy_limit)
        if args.certify:
            run.certify_from_db(scope=args.verify_scope,
                                limit=args.certify_limit)
        run.close()
        return 0

    if args.resume_run:
        run = make_run(resume=True)
        run.continue_run(max_depth=args.max_depth)
        run.close()
        return 0

    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)

    run = make_run()
    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            run.run(max_depth=args.max_depth)
        print(f"Profiler trace written to {args.profile}")
    else:
        run.run(max_depth=args.max_depth)
    run.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
