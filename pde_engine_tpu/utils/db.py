"""Run database: SQLite audit trail with schema parity to the reference.

Tables, columns, indices, run-id naming and status state machine mirror
general_method_paper_reproduction.py:644-747 so existing SQL queries from the
reference's README (README.md:489-504) keep working:

  expressions_<run_id>(id, expression, normalized UNIQUE, signature, depth,
      validation_status, is_valid, validation_reason, validator_method,
      validator_math, validator_evidence, is_paper_solution,
      paper_solution_name, created_at, validated_at,
      heavy_is_valid, heavy_reason, heavy_validated_at)
  run_metadata(run_id, table_name, started_at, completed_at, max_depth,
      total_generated, total_validated, valid_solutions, status)
  generator_progress(run_id, state_json)
  worker_progress(run_id, pid, role, validated, errors, ...)

The host process is the single writer (the reference funnelled all UPDATEs
through one writer process for the same reason, general:1109-1220); WAL mode
keeps concurrent readers (monitors) cheap.
"""

from __future__ import annotations

import json
import os
import sqlite3
import time
import uuid
from typing import Dict, Iterable, List, Optional, Tuple


def new_run_id() -> str:
    """Reference naming: paper_repro_<ts>_<uuid8> (general:757-760)."""
    ts = time.strftime("%Y%m%d_%H%M%S")
    return f"paper_repro_{ts}_{uuid.uuid4().hex[:8]}"


def db_path_for(output_dir: str, run_id: str) -> str:
    return os.path.join(output_dir, f"parallel_runs_{run_id}.db")


def table_name_for(run_id: str) -> str:
    return f"expressions_{run_id.replace('-', '_')}"


class RunDB:

    def __init__(self, db_path: str, run_id: str):
        self.db_path = db_path
        self.run_id = run_id
        self.table = table_name_for(run_id)
        os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
        self.conn = sqlite3.connect(db_path)
        # 32 KiB pages (effective for NEW databases only — set before WAL
        # switches the journal): 8x fewer, larger write syscalls.  On
        # virtualized hosts syscall cost dominates the reject stream —
        # measured 94k write() calls (2.7 KB avg) per 15 s of depth-5
        # ingest with the default 4 KiB pages, the writer thread spending
        # ~90% of the core in kernel mode.
        self.conn.execute("PRAGMA page_size=32768")
        self.conn.execute("PRAGMA journal_mode=WAL")
        # NORMAL in WAL mode fsyncs only at checkpoints — a process crash
        # loses nothing (OS buffers survive), and the run is resumable
        # anyway.  FULL was ~40% of mega-run ingest wall.
        self.conn.execute("PRAGMA synchronous=NORMAL")
        # 60 s: with 32 KiB pages a WAL checkpoint moves ~32 MB, which on
        # a slow-I/O virtualized host can hold the writer lock for
        # seconds — the old 5 s timeout aborted mid-run ('database is
        # locked') when this connection's flush collided with the native
        # sink's checkpoint
        self.conn.execute("PRAGMA busy_timeout=60000")
        # keep the default ~1000-page checkpoint cadence (32 MB at this
        # page size) and a 256 MB page cache so the reject stream's
        # b-tree pages are never re-read from disk
        self.conn.execute("PRAGMA cache_size=-262144")
        self._init_schema()
        self._pending_rows: List[tuple] = []
        self._indices_made = False

    # ------------------------------------------------------------------
    def _init_schema(self):
        c = self.conn
        # `normalized` carries the reference's UNIQUE semantics
        # (general:672-678) but NOT an inline constraint: maintaining a
        # unique string index during bulk insert was the single largest
        # mega-run cost (random-order b-tree inserts over 24M ~60-byte
        # keys — 525 s of a 20-min depth-5 run).  The engine guarantees
        # one row per unique upstream (fingerprint dedup), and
        # ensure_indices() builds a plain normalized index at completion
        # for the readers' equality lookups.
        #
        # Documented deviation: REJECT rows store NULL for normalized
        # (it always equals expression in this engine — COALESCE on
        # read) and for validator_math (a run-level constant, recorded
        # in generator_progress.state_json and on valid rows) — together
        # they were ~40% of the sqlite-write-bound mega-run reject
        # volume.  Valid rows keep both populated.
        c.execute(f"""
            CREATE TABLE IF NOT EXISTS {self.table} (
                id INTEGER PRIMARY KEY,
                expression TEXT NOT NULL,
                normalized TEXT,
                signature TEXT,
                depth INTEGER,
                validation_status TEXT DEFAULT 'pending',
                is_valid INTEGER,
                validation_reason TEXT,
                validator_method TEXT,
                validator_math TEXT,
                validator_evidence TEXT,
                is_paper_solution INTEGER DEFAULT 0,
                paper_solution_name TEXT,
                created_at DATETIME DEFAULT CURRENT_TIMESTAMP,
                validated_at DATETIME,
                heavy_is_valid INTEGER,
                heavy_reason TEXT,
                heavy_validated_at DATETIME,
                struct_op INTEGER,
                struct_a INTEGER,
                struct_b INTEGER
            )""")
        # nullable structural triple (op id, parent uids) — lets resume
        # rebuild the registry at array speed instead of re-parsing every
        # expression with SymPy (~200 µs/row — 80 min at 24M rows).
        # Column-add migration for DBs created before the columns existed,
        # the same mechanism the reference used for heavy_* (general:
        # 2036-2044).
        have = {r[1] for r in c.execute(
            f"PRAGMA table_info({self.table})")}
        for col in ("struct_op", "struct_a", "struct_b"):
            if col not in have:
                c.execute(f"ALTER TABLE {self.table} "
                          f"ADD COLUMN {col} INTEGER")
        c.execute("""
            CREATE TABLE IF NOT EXISTS run_metadata (
                run_id TEXT PRIMARY KEY,
                table_name TEXT,
                started_at DATETIME,
                completed_at DATETIME,
                max_depth INTEGER,
                total_generated INTEGER DEFAULT 0,
                total_validated INTEGER DEFAULT 0,
                valid_solutions INTEGER DEFAULT 0,
                status TEXT DEFAULT 'running'
            )""")
        c.execute("""
            CREATE TABLE IF NOT EXISTS generator_progress (
                run_id TEXT PRIMARY KEY,
                state_json TEXT,
                updated_at DATETIME DEFAULT CURRENT_TIMESTAMP
            )""")
        c.execute("""
            CREATE TABLE IF NOT EXISTS worker_progress (
                run_id TEXT,
                pid INTEGER,
                role TEXT,
                validated INTEGER DEFAULT 0,
                errors INTEGER DEFAULT 0,
                current_expr_id INTEGER,
                current_started_at DATETIME,
                current_expr_snippet TEXT,
                last_completed_id INTEGER,
                last_completed_at DATETIME,
                PRIMARY KEY (run_id, pid, role)
            )""")
        c.commit()

    # ------------------------------------------------------------------
    def start_run(self, max_depth: int):
        self.conn.execute(
            "INSERT OR REPLACE INTO run_metadata "
            "(run_id, table_name, started_at, max_depth, status) "
            "VALUES (?, ?, datetime('now'), ?, 'running')",
            (self.run_id, self.table, max_depth))
        self.conn.commit()

    def add_row(self, row) -> None:
        """Buffered insert of a pipeline Row (batched executemany, like the
        reference's single-writer batching, general:1126-1204)."""
        self._pending_rows.append((
            row.id, row.expression, row.normalized, row.signature, row.depth,
            row.validation_status, int(row.is_valid), row.validation_reason,
            row.validator_method,
            getattr(row, "validator_math", None) or None,
            getattr(row, "validator_evidence", None) or None,
            int(row.is_paper_solution), row.paper_solution_name,
            None if row.heavy_is_valid is None else int(row.heavy_is_valid),
            row.heavy_reason,
            getattr(row, "struct_op", None),
            getattr(row, "struct_a", None),
            getattr(row, "struct_b", None),
        ))
        if len(self._pending_rows) >= 2000:
            self.flush()

    def add_row_tuples(self, tuples) -> None:
        """Bulk sink for the pipeline's vectorized reject emission: raw
        tuples already in the INSERT column order (see flush)."""
        self._pending_rows.extend(tuples)
        if len(self._pending_rows) >= 50000:
            self.flush()

    def ensure_indices(self):
        """Secondary indices (signature/status/depth — same trio as the
        reference, general:684-688) are created lazily: building them
        during bulk insert roughly doubles ingest cost, so they appear at
        completion / first read instead."""
        if self._indices_made:
            return
        c = self.conn
        # the reference's UNIQUE(normalized) becomes a plain index built
        # post-hoc (see _init_schema): readers keep their equality-lookup
        # speed; uniqueness is enforced upstream by fingerprint dedup
        # (and deliberately NOT by the index — a resumed run that could
        # not re-register every stored row re-admits under an id_offset,
        # and the audit trail must record that rather than drop rows).
        c.execute(f"CREATE INDEX IF NOT EXISTS "
                  f"idx_{self.table}_norm ON {self.table}(normalized)")
        c.execute(f"CREATE INDEX IF NOT EXISTS idx_{self.table}_sig "
                  f"ON {self.table}(signature)")
        c.execute(f"CREATE INDEX IF NOT EXISTS idx_{self.table}_status "
                  f"ON {self.table}(validation_status)")
        c.execute(f"CREATE INDEX IF NOT EXISTS idx_{self.table}_depth "
                  f"ON {self.table}(depth)")
        c.commit()
        self._indices_made = True

    def flush(self):
        if not self._pending_rows:
            return
        self.conn.executemany(
            f"INSERT OR IGNORE INTO {self.table} "
            "(id, expression, normalized, signature, depth, "
            " validation_status, is_valid, validation_reason, "
            " validator_method, validator_math, validator_evidence, "
            " is_paper_solution, paper_solution_name, heavy_is_valid, "
            " heavy_reason, struct_op, struct_a, struct_b, validated_at) "
            "VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?, "
            "datetime('now'))",
            self._pending_rows)
        self._pending_rows = []
        self.conn.commit()

    def update_metadata(self, total_generated: int, total_validated: int,
                        valid_solutions: int, status: Optional[str] = None):
        if status:
            self.conn.execute(
                "UPDATE run_metadata SET total_generated=?, "
                "total_validated=?, valid_solutions=?, status=? "
                "WHERE run_id=?",
                (total_generated, total_validated, valid_solutions, status,
                 self.run_id))
        else:
            self.conn.execute(
                "UPDATE run_metadata SET total_generated=?, "
                "total_validated=?, valid_solutions=? WHERE run_id=?",
                (total_generated, total_validated, valid_solutions,
                 self.run_id))
        self.conn.commit()

    def complete_run(self, status: str = "completed"):
        self.flush()
        self.ensure_indices()
        self.conn.execute(
            "UPDATE run_metadata SET completed_at=datetime('now'), status=? "
            "WHERE run_id=?", (status, self.run_id))
        self.conn.commit()

    def save_generator_state(self, state: Dict):
        self.conn.execute(
            "INSERT OR REPLACE INTO generator_progress "
            "(run_id, state_json, updated_at) VALUES (?, ?, datetime('now'))",
            (self.run_id, json.dumps(state)))
        self.conn.commit()

    def load_generator_state(self) -> Optional[Dict]:
        cur = self.conn.execute(
            "SELECT state_json FROM generator_progress WHERE run_id=?",
            (self.run_id,))
        r = cur.fetchone()
        return json.loads(r[0]) if r else None

    def worker_heartbeat(self, pid: int, role: str, validated: int,
                         errors: int = 0, snippet: str = ""):
        self.conn.execute(
            "INSERT OR REPLACE INTO worker_progress "
            "(run_id, pid, role, validated, errors, current_expr_snippet, "
            " last_completed_at) VALUES (?,?,?,?,?,?, datetime('now'))",
            (self.run_id, pid, role, validated, errors, snippet[:120]))
        self.conn.commit()

    # -- read side ------------------------------------------------------
    def depth_counts(self) -> Dict[int, Dict[str, int]]:
        """Per-depth generated/valid counts via SQL aggregate (the report
        path for mega-runs that don't keep rows in memory)."""
        self.flush()
        self.ensure_indices()
        cur = self.conn.execute(
            f"SELECT depth, COUNT(*), COALESCE(SUM(is_valid), 0) "
            f"FROM {self.table} GROUP BY depth ORDER BY depth")
        return {int(d): {"generated": int(n), "valid": int(v)}
                for d, n, v in cur.fetchall()}

    def counts(self) -> Dict[str, int]:
        cur = self.conn.execute(
            f"SELECT COUNT(*), SUM(validation_status='completed'), "
            f"SUM(is_valid) FROM {self.table}")
        total, validated, valid = cur.fetchone()
        return {"total": total or 0, "validated": validated or 0,
                "valid": valid or 0}

    def rows(self, where: str = "", args: tuple = ()) -> List[sqlite3.Row]:
        self.flush()
        self.ensure_indices()
        self.conn.row_factory = sqlite3.Row
        cur = self.conn.execute(
            f"SELECT * FROM {self.table} "
            + (f"WHERE {where} " if where else "") + "ORDER BY id", args)
        out = cur.fetchall()
        self.conn.row_factory = None
        return out

    def metadata(self) -> Optional[sqlite3.Row]:
        self.conn.row_factory = sqlite3.Row
        cur = self.conn.execute(
            "SELECT * FROM run_metadata WHERE run_id=?", (self.run_id,))
        out = cur.fetchone()
        self.conn.row_factory = None
        return out

    def update_heavy(self, row_id: int, ok: bool, reason: str):
        self.conn.execute(
            f"UPDATE {self.table} SET heavy_is_valid=?, heavy_reason=?, "
            "heavy_validated_at=datetime('now') WHERE id=?",
            (int(ok), reason, row_id))
        self.conn.commit()

    def close(self):
        self.flush()
        self.conn.close()


class ReadOnlyRunDB:
    """RunDB stand-in for NON-WRITER hosts in a multi-process run.

    Single-writer discipline (the reference funnelled every UPDATE
    through one writer process, general:1109-1220): only process 0 owns
    the run DB — with every host constructing a DiscoveryRun, concurrent
    SQLite writers from multiple hosts over a shared filesystem risk
    corruption (WAL over NFS), and report/snapshot files would clobber
    each other (ADVICE.md round 2).  Non-writers get this object: every
    write is a no-op; reads pass through to the writer's file when it is
    visible on a shared filesystem (resume state, valid rows), else
    return empties."""

    def __init__(self, db_path: str, run_id: str):
        self.db_path = db_path
        self.run_id = run_id
        self.table = table_name_for(run_id)

    def _ro(self) -> Optional[sqlite3.Connection]:
        if not os.path.exists(self.db_path):
            return None
        try:
            return sqlite3.connect(f"file:{self.db_path}?mode=ro",
                                   uri=True)
        except sqlite3.Error:
            return None

    # -- writes: all no-ops --------------------------------------------
    def start_run(self, max_depth: int):
        pass

    def add_row(self, row) -> None:
        pass

    def add_row_tuples(self, tuples) -> None:
        pass

    def ensure_indices(self):
        pass

    def flush(self):
        pass

    def update_metadata(self, *a, **kw):
        pass

    def complete_run(self, status: str = "completed"):
        pass

    def save_generator_state(self, state: Dict):
        pass

    def worker_heartbeat(self, *a, **kw):
        pass

    def update_heavy(self, *a, **kw):
        pass

    # -- reads: through the writer's file when visible ------------------
    def load_generator_state(self) -> Optional[Dict]:
        conn = self._ro()
        if conn is None:
            return None
        try:
            cur = conn.execute(
                "SELECT state_json FROM generator_progress WHERE run_id=?",
                (self.run_id,))
            r = cur.fetchone()
            return json.loads(r[0]) if r else None
        except sqlite3.Error:
            return None
        finally:
            conn.close()

    def depth_counts(self) -> Dict[int, Dict[str, int]]:
        conn = self._ro()
        if conn is None:
            return {}
        try:
            cur = conn.execute(
                f"SELECT depth, COUNT(*), COALESCE(SUM(is_valid), 0) "
                f"FROM {self.table} GROUP BY depth ORDER BY depth")
            return {int(d): {"generated": int(n), "valid": int(v)}
                    for d, n, v in cur.fetchall()}
        except sqlite3.Error:
            return {}
        finally:
            conn.close()

    def counts(self) -> Dict[str, int]:
        conn = self._ro()
        if conn is None:
            return {"total": 0, "validated": 0, "valid": 0}
        try:
            cur = conn.execute(
                f"SELECT COUNT(*), SUM(validation_status='completed'), "
                f"SUM(is_valid) FROM {self.table}")
            total, validated, valid = cur.fetchone()
            return {"total": total or 0, "validated": validated or 0,
                    "valid": valid or 0}
        except sqlite3.Error:
            return {"total": 0, "validated": 0, "valid": 0}
        finally:
            conn.close()

    def rows(self, where: str = "", args: tuple = ()) -> List[sqlite3.Row]:
        conn = self._ro()
        if conn is None:
            return []
        try:
            conn.row_factory = sqlite3.Row
            cur = conn.execute(
                f"SELECT * FROM {self.table} "
                + (f"WHERE {where} " if where else "") + "ORDER BY id",
                args)
            return cur.fetchall()
        except sqlite3.Error:
            return []
        finally:
            conn.close()

    def metadata(self) -> Optional[sqlite3.Row]:
        conn = self._ro()
        if conn is None:
            return None
        try:
            conn.row_factory = sqlite3.Row
            cur = conn.execute(
                "SELECT * FROM run_metadata WHERE run_id=?",
                (self.run_id,))
            return cur.fetchone()
        except sqlite3.Error:
            return None
        finally:
            conn.close()

    def close(self):
        pass
