"""Search/run configuration (analog of the reference's argparse surface +
validator ctor flags, general_method_paper_reproduction.py:2390-2406 and
kerr validator.py:30-58)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class SearchConfig:
    max_depth: int = 4
    # Candidates per device dispatch (the segmented superbatch rounds it
    # down to a 512-row tile multiple).  None = auto: 262144 on
    # accelerator backends — each dispatch costs a fixed host round trip
    # (~27 ms through the axon tunnel) so fewer, larger batches amortize
    # it, the kernel workspace is only ~2 KB/candidate, and 262144 is the
    # shape every recorded mega-run and the persistent compile cache use
    # (a fresh shape costs a 300-400 s remote Mosaic compile for the
    # order-4 kernels) — and 16384 on CPU, where the XLA oracle path
    # dominates and big batches just slow the test suite.
    batch_size: Optional[int] = None
    include_special_ops: bool = True
    prune: bool = True

    # validation funnel
    defer_heavy_checks: bool = True     # heavy sympy checks post-hoc
    # SymPy exact-zero confirm inline.  Default False: the reference's own
    # parallel fast path accepts on its (single!) point check alone
    # (force_free validator fast_point_only, validator.py:374-393) and
    # defers symbolic proof to --verify-pde; our inline screen is already a
    # 16-point f32+f64 funnel.  Set True for reference sequential-mode
    # semantics (exact zero proven inline).
    confirm_symbolic: bool = False
    sympy_len_limit: int = 4000         # skip symbolic confirm above this
    # Store constant rows too (the reference drops them pre-DB,
    # general:262-264; we keep them so a resumed run can rebuild the exact
    # unique set that feeds deeper enumeration).
    store_constants: bool = True

    # device engine: "incremental" evaluates candidates from the device
    # jet cache (one surface-op per candidate); "tape" re-interprets full
    # tapes (general fallback)
    engine: str = "incremental"

    # Pallas lane-major fused kernels for the incremental path.  None =
    # auto (on for TPU backends, off for CPU where the XLA path is the
    # oracle).  The Pallas kernels also Mosaic-compile ~10x faster than
    # the XLA fused kernel, which matters on remote-compile backends.
    use_pallas: Optional[bool] = None

    # device batching (tape path buckets)
    buckets: Tuple[int, ...] = (16, 32, 64, 128, 256)

    # thresholds (None -> problem defaults)
    screen_rtol: Optional[float] = None
    confirm_rtol: Optional[float] = None

    # f32 screen results below this relative residual are accepted without
    # the float64 host recheck.  Default 0.0: EVERY screen passer gets the
    # batched f64 recheck (independent arithmetic) — the reference's fast
    # path demanded |det| < 1e-20 at 50-digit precision, and an f32-only
    # accept would store near-solutions as Valid (ADVICE.md round 1).
    # The recheck is batched per depth, so the cost is small.
    f64_skip_below: float = 0.0

    # novel-solution equivalence classing in the final report is SymPy-heavy
    # (simplify per valid row, reference general:1919-2008); skip it when
    # more rows are valid than this.
    novel_class_limit: int = 300

    # sharding: number of devices to use (None -> all visible)
    n_devices: Optional[int] = None
    use_mesh: bool = False

    # native C++ host-ingest core (csrc/ingest_core.cpp): dedup hash map +
    # direct-sqlite reject sink.  None = auto (use when it builds/loads);
    # False = pure Python; True = require (raises if unavailable).
    use_native: Optional[bool] = None

    # Checkpoint the device jet cache to <db>.jets.d/ shards at each depth
    # completion (incremental: each depth writes only the rows appended
    # since the last barrier).  Resume loads it bit-exactly — required for
    # resumed runs to reproduce the original run's f32 fingerprints
    # (without it, resume re-derives jets through the f64 oracle and
    # ~2-4% of quantized fingerprint keys shift, mis-deduping against
    # stored signatures).
    snapshot_jets: bool = True
    # Stop snapshotting beyond this many bytes of shards (disk budget;
    # resume re-derives the un-snapshotted tail in float64, noted in the
    # log).  16 GiB covers a full 20M-row max_cache_rows cache.
    snapshot_max_bytes: int = 16 << 30

    # Final-depth uniques never feed deeper levels within the same run, so
    # their jets normally skip the cache (60%+ of a mega-run's uniques —
    # this is the HBM ceiling saver).  Appending them while the cache is
    # below this row count keeps *extension* resumes (--max-depth deeper
    # than the original run) bit-exact for small/medium runs.
    final_append_limit: int = 2_000_000

    # Segmented superbatch dispatch (single-device Pallas): pack mixed-op
    # tile-aligned segments into one kernel call with a per-tile op-id
    # scalar-prefetch array — ceil(total/batch_size) dispatches per depth
    # instead of one per (op, shape).  None = auto (on for the
    # single-device Pallas path).
    use_segmented: Optional[bool] = None

    # Structured-dispatch gather bypass inside the segmented path: a
    # superbatch-sized run of candidates sharing one op, with one
    # constant operand and one contiguous-uid operand (the dominant
    # repeat/tile blocks the enumerator emits), dispatches through
    # make_pallas_structured_kernel — the constant operand is ONE cache
    # row and the varying operand a full-bandwidth contiguous slice,
    # bypassing the XLA row-gather that profiles at ~79% of the mixed
    # kernel's device time (tools/profile_kernel.py; measured 3.1x per
    # superbatch on the v5e: 18.5 ms -> 6.0 ms / 262144 candidates).
    # Verdicts are bit-identical to the mixed kernel.
    # None = auto (on whenever the segmented path is on).
    use_structured: Optional[bool] = None

    # Per-TILE gather bypass (make_pallas_tiled_kernel): run-shaped
    # items SHORTER than a superbatch — deferred run tails, short-run
    # blocks — pack into a second superbatch buffer where every
    # 512-candidate tile carries its own (op, const uid, contiguous
    # start); the kernel block-slices each tile's operand rows instead
    # of row-gathering them and is bit-identical to the mixed kernel.
    # With both bypasses on, superbatch DISPATCH ORDER (and so uid
    # assignment) interleaves the three buffers deterministically but no
    # longer equals the mixed-only path's candidate order; per-depth
    # unique/valid counts are order-invariant (fingerprint dedup) and
    # asserted equal across modes in tests/test_structured.py.
    # None = auto (on whenever the segmented path is on).
    use_tiled: Optional[bool] = None

    # Run items with fewer real rows than this go to the MIXED buffer
    # even when run-shaped: a tiled tile costs ~17.6 us of device time
    # for 512 slots, the mixed path ~70 ns/row — below ~256 real rows
    # the pad waste exceeds the gather saved.
    tiled_min_rows: int = 256

    # Persist reject rows to the audit DB (reference parity: every
    # expression gets a row).  At depth-6 scale (~10^9 candidates,
    # ~10^8-10^9 uniques) the reject audit alone is ~100 GB and hours of
    # sqlite; --no-audit-rejects keeps full screening/dedup/valid-row
    # semantics but stores only valid rows + per-depth counts, and the
    # report notes the elision.
    audit_rejects: bool = True

    # Shard the host-side registry across processes in a multi-host run:
    # each host's dedup map holds only the keys it owns (key mod
    # process_count — ~24 B/unique becomes ~24/H), new-key verdicts are
    # combined with one tiny all-gather per batch, and display strings /
    # reject rows / gray f64 rechecks run ONLY on the writer host.  The
    # structural SoA registry (op, a, b, depth + flags, ~16 B/unique)
    # stays replicated — it is what enumeration reads.  Off by default:
    # single-process runs gain nothing, and the replicated mode keeps
    # every host's ingest byte-identical (the stronger invariant the
    # 2-process determinism test asserts).
    shard_registry: bool = False

    # Directory for disk-spilling the display-string arena (None = keep
    # strings in anonymous RAM).  When set, string bytes live in an
    # UNLINKED temp file there mapped MAP_SHARED: the kernel pages them
    # out under memory pressure, removing the ~50 B/unique string share
    # of the host registry (the 10^9-unique RAM ceiling, PERF.md).
    # Composition reads stay sequential (strings are uid-ordered and
    # the enumerator streams contiguous uid runs).  The file vanishes
    # on process exit; resume never reads it (strings rebuild from the
    # DB / registry sidecar).
    spill_strings: Optional[str] = None

    # Hard HBM budget for the device jet cache, in rows PER CHIP.
    # Mid-depth uniques beyond the budget are still screened, stored,
    # and deduplicated — they just never become PARENTS of deeper
    # candidates (the run logs the truncated parent window).  None =
    # auto: spend a fixed ~11 GiB row-size-aware budget (inside a v5e's
    # 16 GiB with batch workspace).  An order-4 family like force_free
    # (~552 B/row: 8 screen pts x 15 jet coeffs + 6 fp pts x 3) gets
    # 20M rows; order-2 families (laplace/GS ~264 B/row, kerr ~216 B/row
    # with its 6 screen points) get ~2-2.6x the parent window from the
    # same budget — roughly one extra depth of parents on a deep
    # order-2 run.  With
    # ``shard_cache`` the budget scales with the mesh: K chips hold
    # contiguous uid-range slices, so the effective parent window is
    # K * max_cache_rows.
    max_cache_rows: Optional[int] = None

    # Shard the device jet cache by uid range across the mesh
    # (parallel/incremental.make_op_kernel_uidrange): chip d holds cache
    # rows [d*C/K, (d+1)*C/K), each batch reconstructs its operand rows
    # with a masked local gather + one fused psum over ICI, and each chip
    # screens its slice of the batch.  This is how a pod exceeds the
    # single-chip HBM parent-window cap (max_cache_rows) WITHOUT
    # truncation — the reference has no analog (its validator pool shares
    # one process's memory, general:801-823).  Requires a mesh
    # (``--devices``/DiscoveryEngine(mesh=...)); single-process only
    # (combine with --multihost is not supported).  Off by default: the
    # replicated cache skips the per-batch operand psum, which is faster
    # whenever the uniques fit one chip.
    shard_cache: bool = False
