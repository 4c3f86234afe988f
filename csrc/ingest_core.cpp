// Native host-ingest core for pde_engine_tpu.
//
// TPU-native replacement for the reference's host-side record keeping
// (general_method_paper_reproduction.py:1251-1411 emit_to_db — per-expression
// Python objects, sympify re-parses and per-row sqlite round trips).  The
// device screens millions of candidates per second; at that rate the host's
// per-unique bookkeeping (dedup map, audit-row emission) is the scaling
// wall (PERF.md).  This module keeps the two hottest structures native:
//
//   1. DedupMap  — open-addressing uint64 -> uid hash map with first-
//      occurrence batch insert (replaces a Python dict: ~20 ns/key and
//      ~16 B/slot instead of ~100 ns and ~100 B/entry — the difference
//      between 3 GB and 300 MB of host RAM at depth-6 scale).
//   2. IngestDB  — reject-row sink writing straight into the run's SQLite
//      audit table through the C API with a prepared statement (replaces
//      per-row Python tuple construction + executemany: the evidence JSON,
//      reason string and signature hex are snprintf'd in place).
//
// Built by pde_engine_tpu/utils/native.py with g++ at first use (ctypes
// binding; no pybind11 in the image).  sqlite3 prototypes are declared
// inline because the image ships libsqlite3.so.0 without headers.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>

#ifdef __linux__
#include <fcntl.h>
#include <sys/mman.h>
#include <unistd.h>
#endif

// Allocate a big arena 2 MiB-aligned and ask for transparent huge pages
// (hosts often run THP=madvise, where plain malloc gets 4 KiB pages):
// the dedup map probes GBs of memory in hash order, and with 4 KiB pages
// every probe is a TLB/EPT-walk miss — measured 0.9 s vs 10.3 s for the
// same depth-4 dedup depending on whether the kernel happened to back
// the arena with huge pages.  Sequential memset after the madvise both
// pre-faults the pages and gives khugepaged nothing to collapse later.
static inline void* arena_alloc(size_t bytes) {
    const size_t align = 2u << 20;
    size_t padded = (bytes + align - 1) / align * align;
    void* p = aligned_alloc(align, padded);
    if (!p) return nullptr;
#if defined(__linux__) && defined(MADV_HUGEPAGE)
    madvise(p, padded, MADV_HUGEPAGE);
#endif
    memset(p, 0, padded);
    return p;
}

// ---------------------------------------------------------------------------
// Minimal sqlite3 C API surface (libsqlite3.so.0 is linked directly; the
// dev header is not installed in the image).
// ---------------------------------------------------------------------------
extern "C" {
typedef struct sqlite3 sqlite3;
typedef struct sqlite3_stmt sqlite3_stmt;
int sqlite3_open_v2(const char*, sqlite3**, int, const char*);
int sqlite3_close_v2(sqlite3*);
int sqlite3_exec(sqlite3*, const char*, void*, void*, char**);
int sqlite3_prepare_v2(sqlite3*, const char*, int, sqlite3_stmt**,
                       const char**);
int sqlite3_bind_int64(sqlite3_stmt*, int, int64_t);
int sqlite3_bind_int(sqlite3_stmt*, int, int);
int sqlite3_bind_text(sqlite3_stmt*, int, const char*, int,
                      void (*)(void*));
int sqlite3_bind_null(sqlite3_stmt*, int);
int sqlite3_step(sqlite3_stmt*);
int sqlite3_reset(sqlite3_stmt*);
int sqlite3_clear_bindings(sqlite3_stmt*);
int sqlite3_finalize(sqlite3_stmt*);
int sqlite3_busy_timeout(sqlite3*, int);
const char* sqlite3_errmsg(sqlite3*);
}
#define SQLITE_OK 0
#define SQLITE_DONE 101
#define SQLITE_OPEN_READWRITE 0x00000002
#define SQLITE_OPEN_CREATE 0x00000004
// SQLITE_TRANSIENT — sqlite copies the bound text before returning.
#define TEXT_TRANSIENT ((void (*)(void*)) - 1)
// SQLITE_STATIC — the pointer stays valid through sqlite3_step.
#define TEXT_STATIC ((void (*)(void*))0)

// ===========================================================================
// 1. DedupMap
// ===========================================================================

namespace {

// splitmix64 finalizer — the dedup keys are already well-mixed digests /
// fingerprint hashes, but structural keys carry low-entropy low bits.
static inline uint64_t mix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ULL;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
    return x ^ (x >> 31);
}

struct DedupMap {
    uint64_t* keys;
    int64_t* vals;   // -1 == empty slot
    uint64_t cap;    // power of two
    uint64_t mask;
    int64_t size;

    explicit DedupMap(uint64_t cap_hint) {
        cap = 1024;
        while (cap < cap_hint * 2) cap <<= 1;
        mask = cap - 1;
        size = 0;
        // arena_alloc: huge-page-madvised, 2 MiB-aligned, pre-faulted by
        // a sequential memset.  Random-order demand faults measured
        // 29 us/key for the first 600k inserts (vs 1.2 once resident),
        // and 4 KiB-page TLB/EPT walks another ~10x on virtualized
        // hosts — see arena_alloc.
        keys = (uint64_t*)arena_alloc(cap * sizeof(uint64_t));
        vals = (int64_t*)arena_alloc(cap * sizeof(int64_t));
        for (uint64_t i = 0; i < cap; ++i) vals[i] = -1;
    }
    ~DedupMap() {
        free(keys);
        free(vals);
    }

    void grow() {
        uint64_t old_cap = cap;
        uint64_t* ok = keys;
        int64_t* ov = vals;
        cap <<= 1;
        mask = cap - 1;
        keys = (uint64_t*)arena_alloc(cap * sizeof(uint64_t));
        vals = (int64_t*)arena_alloc(cap * sizeof(int64_t));
        for (uint64_t i = 0; i < cap; ++i) vals[i] = -1;
        for (uint64_t i = 0; i < old_cap; ++i) {
            if (ov[i] < 0) continue;
            uint64_t h = mix64(ok[i]) & mask;
            while (vals[h] >= 0) h = (h + 1) & mask;
            keys[h] = ok[i];
            vals[h] = ov[i];
        }
        free(ok);
        free(ov);
    }

    inline void maybe_grow() {
        if ((uint64_t)size * 3 >= cap * 2) grow();  // load factor 2/3
    }

    // Insert key if absent; returns slot value (existing or `fresh`).
    inline int64_t insert(uint64_t k, int64_t fresh, bool* is_new) {
        maybe_grow();
        uint64_t h = mix64(k) & mask;
        for (;;) {
            if (vals[h] < 0) {
                keys[h] = k;
                vals[h] = fresh;
                ++size;
                *is_new = true;
                return fresh;
            }
            if (keys[h] == k) {
                *is_new = false;
                return vals[h];
            }
            h = (h + 1) & mask;
        }
    }

    inline int64_t get(uint64_t k) const {
        uint64_t h = mix64(k) & mask;
        for (;;) {
            if (vals[h] < 0) return -1;
            if (keys[h] == k) return vals[h];
            h = (h + 1) & mask;
        }
    }

    inline void set(uint64_t k, int64_t v) {
        maybe_grow();
        uint64_t h = mix64(k) & mask;
        for (;;) {
            if (vals[h] < 0) {
                keys[h] = k;
                vals[h] = v;
                ++size;
                return;
            }
            if (keys[h] == k) {
                vals[h] = v;
                return;
            }
            h = (h + 1) & mask;
        }
    }
};

}  // namespace

extern "C" {

void* dm_new(uint64_t cap_hint) { return new DedupMap(cap_hint); }
void dm_free(void* h) { delete (DedupMap*)h; }
int64_t dm_size(void* h) { return ((DedupMap*)h)->size; }

// First-occurrence batch insert: keys absent from the map get consecutive
// uids base_uid, base_uid+1, ... in batch order (identical semantics to the
// np.unique + dict filter it replaces, pipeline._ingest_vec).  Returns the
// number of new keys; out_new_pos[k] is the batch position of the k-th one.
int64_t dm_insert_batch(void* h, const uint64_t* keys, int64_t n,
                        int64_t base_uid, int64_t* out_new_pos) {
    DedupMap* m = (DedupMap*)h;
    int64_t n_new = 0;
    for (int64_t i = 0; i < n; ++i) {
        bool is_new;
        m->insert(keys[i], base_uid + n_new, &is_new);
        if (is_new) out_new_pos[n_new++] = i;
    }
    return n_new;
}

int64_t dm_get(void* h, uint64_t key) { return ((DedupMap*)h)->get(key); }
void dm_set(void* h, uint64_t key, int64_t val) {
    ((DedupMap*)h)->set(key, val);
}

// Bulk exact-assignment (resume: key[i] -> val[i]); later duplicates win.
void dm_set_batch(void* h, const uint64_t* keys, const int64_t* vals,
                  int64_t n) {
    DedupMap* m = (DedupMap*)h;
    for (int64_t i = 0; i < n; ++i) m->set(keys[i], vals[i]);
}

// Export every (key, value) pair (for tests / diagnostics).
void dm_items(void* h, uint64_t* out_keys, int64_t* out_vals) {
    DedupMap* m = (DedupMap*)h;
    int64_t j = 0;
    for (uint64_t i = 0; i < m->cap; ++i) {
        if (m->vals[i] < 0) continue;
        out_keys[j] = m->keys[i];
        out_vals[j] = m->vals[i];
        ++j;
    }
}

}  // extern "C"

// ===========================================================================
// 2. IngestDB — native reject-row sink
// ===========================================================================

namespace {

struct IngestDB {
    sqlite3* db = nullptr;
    sqlite3_stmt* stmt = nullptr;
    char err[256] = {0};
};

}  // namespace

extern "C" {

// Opens the run DB and prepares the reject INSERT.  Column list matches
// RunDB.flush (utils/db.py) so native and Python rows are interchangeable.
void* idb_open(const char* path, const char* table) {
    IngestDB* s = new IngestDB();
    if (sqlite3_open_v2(path, &s->db,
                        SQLITE_OPEN_READWRITE | SQLITE_OPEN_CREATE,
                        nullptr) != SQLITE_OK) {
        snprintf(s->err, sizeof(s->err), "open failed: %s",
                 s->db ? sqlite3_errmsg(s->db) : "?");
        return s;
    }
    sqlite3_busy_timeout(s->db, 60000);  // see RunDB: 32 KiB-page
    //                     checkpoints can hold the writer lock for seconds
    char* emsg = nullptr;
    sqlite3_exec(s->db, "PRAGMA journal_mode=WAL", nullptr, nullptr, &emsg);
    sqlite3_exec(s->db, "PRAGMA synchronous=NORMAL", nullptr, nullptr,
                 &emsg);
    // match RunDB (utils/db.py): a page cache big enough that the reject
    // stream's b-tree pages never thrash — cache-miss re-reads were most
    // of the writer thread's kernel time on virtualized hosts
    sqlite3_exec(s->db, "PRAGMA cache_size=-262144", nullptr, nullptr,
                 &emsg);
    char sql[1024];
    snprintf(sql, sizeof(sql),
             "INSERT OR IGNORE INTO \"%s\" "
             "(id, expression, normalized, signature, depth, "
             " validation_status, is_valid, validation_reason, "
             " validator_method, validator_math, validator_evidence, "
             " is_paper_solution, paper_solution_name, heavy_is_valid, "
             " heavy_reason, struct_op, struct_a, struct_b, validated_at) "
             "VALUES (?,?,?,?,?,'completed',0,?,'screen',?,?,0,"
             "NULL,NULL,NULL, ?,?,?, ?)",
             table);
    if (sqlite3_prepare_v2(s->db, sql, -1, &s->stmt, nullptr) != SQLITE_OK) {
        snprintf(s->err, sizeof(s->err), "prepare failed: %s",
                 sqlite3_errmsg(s->db));
    }
    return s;
}

const char* idb_error(void* h) { return ((IngestDB*)h)->err; }

void idb_close(void* h) {
    IngestDB* s = (IngestDB*)h;
    if (s->stmt) sqlite3_finalize(s->stmt);
    if (s->db) sqlite3_close_v2(s->db);
    delete s;
}

// Emit n reject rows in one transaction.
//   expr_blob  — n NUL-separated UTF-8 expression strings
//   reason_code— 0 constant, 1 non-finite, 2 screen-fail
//   rel        — f32 screen rel_max per row (formatted into reason/evidence)
//   flags      — screen_ok / nonfinite / is_const / fp_finite as uint8
// Byte-for-byte the same reason strings and evidence JSON as the Python
// path (pipeline._emit_rejects_bulk) so the two sinks are interchangeable.
int64_t idb_emit_rejects(void* h, int64_t n, const int64_t* ids,
                         const char* expr_blob, const uint64_t* sigs,
                         int32_t depth, const uint8_t* reason_code,
                         const float* rel, const uint8_t* screen_ok,
                         const uint8_t* nonfinite, const uint8_t* is_const,
                         const uint8_t* fp_finite, int32_t n_screen_points,
                         const char* math_def, int32_t struct_op,
                         const int32_t* struct_a, const int32_t* struct_b) {
    IngestDB* s = (IngestDB*)h;
    if (!s->stmt) return -1;
    char* emsg = nullptr;
    if (sqlite3_exec(s->db, "BEGIN", nullptr, nullptr, &emsg) != SQLITE_OK) {
        snprintf(s->err, sizeof(s->err), "BEGIN failed: %s",
                 emsg ? emsg : "?");
        return -1;
    }
    const char* p = expr_blob;
    char reason[160];
    char evidence[256];
    char relbuf[32];
    // JSON-parseable float spelling: Python's json accepts Infinity/NaN
    // (its own non-standard extension) but not printf's bare "inf"/"nan";
    // must match pipeline.DiscoveryEngine._fmt_rel byte for byte.
    auto fmt_rel = [&](double v) -> const char* {
        if (std::isnan(v)) return "NaN";
        if (std::isinf(v)) return v > 0 ? "Infinity" : "-Infinity";
        snprintf(relbuf, sizeof(relbuf), "%.6e", v);
        return relbuf;
    };
    int64_t inserted = 0;
    const int math_len = (int)strlen(math_def);
    // one timestamp per batch (sqlite's datetime('now') per row was
    // measurable at 10^7-row scale); UTC to match sqlite's datetime()
    char now_buf[24];
    {
        time_t t = time(nullptr);
        struct tm tmv;
        gmtime_r(&t, &tmv);
        strftime(now_buf, sizeof(now_buf), "%Y-%m-%d %H:%M:%S", &tmv);
    }
    const int now_len = (int)strlen(now_buf);
    for (int64_t i = 0; i < n; ++i) {
        size_t elen = strlen(p);
        const char* reason_ptr;
        int reason_len;
        switch (reason_code[i]) {
            case 0:
                reason_ptr = "Zero gradient (constant expression)";
                reason_len = 35;
                break;
            case 1:
                reason_ptr = "Non-finite on safe domain (rejected)";
                reason_len = 36;
                break;
            default:
                reason_len = snprintf(
                    reason, sizeof(reason),
                    u8"PDE residual != 0 (screen relres ≈ %.2e)",
                    (double)rel[i]);
                reason_ptr = reason;
        }
        int ev_len = snprintf(
            evidence, sizeof(evidence),
            "{\"rel_max\": %s, \"screen_ok\": %s, \"nonfinite\": %s,"
            " \"is_const\": %s, \"fp_finite\": %s, \"n_screen_points\": %d,"
            " \"stage\": \"screen\"}",
            fmt_rel((double)rel[i]), screen_ok[i] ? "true" : "false",
            nonfinite[i] ? "true" : "false", is_const[i] ? "true" : "false",
            fp_finite[i] ? "true" : "false", n_screen_points);
        char sig[17];
        snprintf(sig, sizeof(sig), "%016llx", (unsigned long long)sigs[i]);

        sqlite3_stmt* st = s->stmt;
        sqlite3_bind_int64(st, 1, ids[i]);
        sqlite3_bind_text(st, 2, p, (int)elen, TEXT_STATIC);
        // normalized is NULL on reject rows: it always equals expression
        // in this engine (documented schema deviation, utils/db.py) and
        // duplicating it was ~25% of mega-run write volume — the depth-5
        // reject stream is sqlite-write-bound on slow-I/O hosts
        sqlite3_bind_null(st, 3);
        sqlite3_bind_text(st, 4, sig, 16, TEXT_TRANSIENT);
        sqlite3_bind_int(st, 5, depth);
        sqlite3_bind_text(st, 6, reason_ptr, reason_len, TEXT_STATIC);
        // validator_math is NULL on reject rows: it is a run-level
        // constant (the problem's math definition), recorded in the
        // generator state and on valid rows (see bind 3 note)
        (void)math_len;
        sqlite3_bind_null(st, 7);
        sqlite3_bind_text(st, 8, evidence, ev_len, TEXT_STATIC);
        if (struct_op >= 0) {
            sqlite3_bind_int(st, 9, struct_op);
            sqlite3_bind_int(st, 10, struct_a[i]);
            if (struct_b && struct_b[i] >= 0)
                sqlite3_bind_int(st, 11, struct_b[i]);
            else
                sqlite3_bind_null(st, 11);
        } else {
            sqlite3_bind_null(st, 9);
            sqlite3_bind_null(st, 10);
            sqlite3_bind_null(st, 11);
        }
        sqlite3_bind_text(st, 12, now_buf, now_len, TEXT_STATIC);
        if (sqlite3_step(st) != SQLITE_DONE) {
            snprintf(s->err, sizeof(s->err), "step failed at row %lld: %s",
                     (long long)i, sqlite3_errmsg(s->db));
            sqlite3_reset(st);
            sqlite3_exec(s->db, "ROLLBACK", nullptr, nullptr, &emsg);
            return -1;
        }
        sqlite3_reset(st);
        ++inserted;
        p += elen + 1;
    }
    if (sqlite3_exec(s->db, "COMMIT", nullptr, nullptr, &emsg) !=
        SQLITE_OK) {
        snprintf(s->err, sizeof(s->err), "COMMIT failed: %s",
                 emsg ? emsg : "?");
        return -1;
    }
    return inserted;
}

}  // extern "C"

// ===========================================================================
// 3. ExprArena — display strings without Python string objects
// ===========================================================================
//
// The enumerator's display-string construction (enumerator.add_uniques_bulk:
// one Python str concat per unique) and the reject-blob join were ~100 s of
// a 24M-unique depth-5 run.  The arena keeps every unique's display string
// as (offset, length) into one growable byte buffer; children are built
// natively from their parents' bytes, and the reject sink packs its
// NUL-separated blob straight out of the arena with one memcpy pass.

namespace {

struct ExprArena {
    char* buf = nullptr;
    uint64_t len = 0, cap = 0;
    // >= 0: buf is a MAP_SHARED mapping of an unlinked temp file — the
    // kernel writes string pages back and evicts them under memory
    // pressure, so display strings stop counting against the anonymous
    // RSS that sets the single-host registry ceiling (PERF roadmap:
    // ~50 B/unique was one of the two largest per-host structures).
    // Composition reads stay fast because strings are stored in uid
    // order and the enumerator streams contiguous uid runs: parent
    // reads are sequential, which file readahead covers.
    int fd = -1;
    uint64_t* off = nullptr;     // per-uid offset into buf
    uint32_t* slen = nullptr;    // per-uid string length
    uint64_t n = 0, ncap = 0;
    // wrapped-form overrides: only non-atomic PRIMITIVES differ from
    // their expr form (e.g. "rho**2 + z**2" wraps as "(rho**2 + z**2)"
    // for binary-format composition); composed entries are self-wrapped.
    // A handful of entries — linear lookup.
    struct Wrap { uint64_t uid; char* s; uint32_t l; };
    Wrap wraps[32];
    int n_wraps = 0;

    ~ExprArena() {
#ifdef __linux__
        if (fd >= 0) {
            if (buf) munmap(buf, cap);
            close(fd);
        } else {
            free(buf);
        }
#else
        free(buf);
#endif
        free(off);
        free(slen);
        for (int i = 0; i < n_wraps; ++i) free(wraps[i].s);
    }
    inline void wrapped_of(uint64_t uid, const char** s, uint32_t* l,
                           bool use_wrapped) const {
        if (use_wrapped) {
            for (int i = 0; i < n_wraps; ++i) {
                if (wraps[i].uid == uid) {
                    *s = wraps[i].s;
                    *l = wraps[i].l;
                    return;
                }
            }
        }
        *s = buf + off[uid];
        *l = slen[uid];
    }
    void reserve_bytes(uint64_t need) {
        if (len + need <= cap) return;
        uint64_t nc = cap ? cap : (1u << 20);
        while (nc < len + need) nc <<= 1;
#ifdef __linux__
        if (fd >= 0) {
            void* nb = MAP_FAILED;
            if (ftruncate(fd, (off_t)nc) == 0) {
                nb = cap
                    ? mremap(buf, cap, nc, MREMAP_MAYMOVE)
                    : mmap(nullptr, nc, PROT_READ | PROT_WRITE,
                           MAP_SHARED, fd, 0);
            }
            if (nb == MAP_FAILED) {
                // Spill-device failure — typically ENOSPC on the spill
                // directory, the very resource this feature trades RAM
                // for.  Degrade to an anonymous RAM buffer instead of
                // killing a multi-day mega-run (ADVICE.md round 3):
                // copy the live bytes, drop the mapping, and continue
                // unspilled (growth falls through to realloc below).
                perror("ExprArena spill: ftruncate/mremap failed; "
                       "degrading string arena to RAM");
                char* heap = (char*)malloc(nc);
                if (!heap) {
                    perror("ExprArena spill fallback: malloc");
                    abort();  // truly out of both disk and RAM: the run
                }             // DB is durable and resumable
                if (buf) {
                    memcpy(heap, buf, len);
                    munmap(buf, cap);
                }
                close(fd);
                fd = -1;
                buf = heap;
                cap = nc;
                return;
            }
            buf = (char*)nb;
            cap = nc;
            return;
        }
#endif
        buf = (char*)realloc(buf, nc);
        cap = nc;
    }
    void reserve_rows(uint64_t need) {
        if (n + need <= ncap) return;
        uint64_t nc = ncap ? ncap : (1u << 16);
        while (nc < n + need) nc <<= 1;
        off = (uint64_t*)realloc(off, nc * sizeof(uint64_t));
        slen = (uint32_t*)realloc(slen, nc * sizeof(uint32_t));
        ncap = nc;
    }
    inline void push(const char* s, uint32_t l) {
        reserve_bytes(l);
        reserve_rows(1);
        memcpy(buf + len, s, l);
        off[n] = len;
        slen[n] = l;
        len += l;
        ++n;
    }
};

}  // namespace

extern "C" {

void* ea_new() { return new ExprArena(); }

// Disk-backed arena: string bytes live in an UNLINKED temp file under
// `dir` (MAP_SHARED), so they page out under memory pressure instead of
// counting against anonymous RSS, and vanish on process exit (resume
// rebuilds strings from the DB/registry sidecar, never from the arena).
// Returns NULL when no temp file can be created there — callers fall
// back to the anonymous arena.
void* ea_new_spill(const char* dir) {
#ifdef __linux__
    int fd = open(dir, O_TMPFILE | O_RDWR, 0600);
    if (fd < 0) {  // filesystem without O_TMPFILE: mkstemp + unlink
        char path[4096];
        snprintf(path, sizeof path, "%s/.pde_arena_XXXXXX", dir);
        fd = mkstemp(path);
        if (fd < 0) return nullptr;
        unlink(path);
    }
    ExprArena* a = new ExprArena();
    a->fd = fd;
    return a;
#else
    (void)dir;
    return nullptr;
#endif
}

void ea_free(void* h) { delete (ExprArena*)h; }
int64_t ea_count(void* h) { return (int64_t)((ExprArena*)h)->n; }
int64_t ea_bytes(void* h) { return (int64_t)((ExprArena*)h)->len; }

// Append raw strings (NUL-separated blob) — primitives / resume seeding.
void ea_add_raw(void* h, const char* blob, int64_t n) {
    ExprArena* a = (ExprArena*)h;
    const char* p = blob;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t l = (uint32_t)strlen(p);
        a->push(p, l);
        p += l + 1;
    }
}

// Register a wrapped-form override for `uid` (composite primitives only).
int64_t ea_set_wrapped(void* h, int64_t uid, const char* s) {
    ExprArena* a = (ExprArena*)h;
    if (a->n_wraps >= 32) return -1;
    uint32_t l = (uint32_t)strlen(s);
    char* copy = (char*)malloc(l);
    memcpy(copy, s, l);
    a->wraps[a->n_wraps++] = {(uint64_t)uid, copy, l};
    return 0;
}

// Append n composed strings: p1 + str(a_uid) + (binary: mid + str(b_uid))
// + p2.  Parent uids must already be in the arena (uids are append order).
// use_wrapped != 0 selects the wrapped parent form (binary infix formats);
// unary/special formats use the expr form.  Returns 0 on success, -1 if
// any parent uid is out of range.
int64_t ea_add_bulk(void* h, const char* p1, const char* mid,
                    const char* p2, const int32_t* a_uids,
                    const int32_t* b_uids, int64_t n,
                    int32_t use_wrapped) {
    ExprArena* a = (ExprArena*)h;
    const uint32_t l1 = (uint32_t)strlen(p1);
    const uint32_t lm = mid ? (uint32_t)strlen(mid) : 0;
    const uint32_t l2 = (uint32_t)strlen(p2);
    const bool uw = use_wrapped != 0;
    a->reserve_rows((uint64_t)n);
    for (int64_t i = 0; i < n; ++i) {
        uint32_t au = (uint32_t)a_uids[i];
        if (au >= a->n) return -1;
        const char* as;
        uint32_t al;
        a->wrapped_of(au, &as, &al, uw);
        const char* bs = nullptr;
        uint32_t bl = 0;
        if (b_uids) {
            uint32_t bu = (uint32_t)b_uids[i];
            if (bu >= a->n) return -1;
            a->wrapped_of(bu, &bs, &bl, uw);
        }
        uint32_t total = l1 + al + lm + bl + l2;
        // reserve may realloc buf — re-derive in-buffer parent pointers
        const char* old_buf = a->buf;
        a->reserve_bytes(total);
        if (a->buf != old_buf) {
            if (as >= old_buf && as < old_buf + a->len)
                as = a->buf + (as - old_buf);
            if (bs && bs >= old_buf && bs < old_buf + a->len)
                bs = a->buf + (bs - old_buf);
        }
        char* w = a->buf + a->len;
        memcpy(w, p1, l1);
        w += l1;
        memcpy(w, as, al);
        w += al;
        if (b_uids) {
            memcpy(w, mid, lm);
            w += lm;
            memcpy(w, bs, bl);
            w += bl;
        }
        memcpy(w, p2, l2);
        a->off[a->n] = a->len;
        a->slen[a->n] = total;
        a->len += total;
        ++a->n;
    }
    return 0;
}

// Copy uid's string into out (caller sizes it via ea_strlen).
int32_t ea_strlen(void* h, int64_t uid) {
    ExprArena* a = (ExprArena*)h;
    if ((uint64_t)uid >= a->n) return -1;
    return (int32_t)a->slen[uid];
}
int32_t ea_get(void* h, int64_t uid, char* out, int32_t out_cap) {
    ExprArena* a = (ExprArena*)h;
    if ((uint64_t)uid >= a->n) return -1;
    uint32_t l = a->slen[uid];
    if ((int32_t)l > out_cap) return -1;
    memcpy(out, a->buf + a->off[uid], l);
    return (int32_t)l;
}

// Total bytes of a NUL-separated blob for the given uids.
int64_t ea_blob_size(void* h, const int64_t* uids, int64_t n) {
    ExprArena* a = (ExprArena*)h;
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) {
        if ((uint64_t)uids[i] >= a->n) return -1;
        total += a->slen[uids[i]] + 1;
    }
    return total;
}

// Pack the NUL-separated blob into out (sized by ea_blob_size).
void ea_blob(void* h, const int64_t* uids, int64_t n, char* out) {
    ExprArena* a = (ExprArena*)h;
    char* w = out;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t l = a->slen[uids[i]];
        memcpy(w, a->buf + a->off[uids[i]], l);
        w += l;
        *w++ = '\0';
    }
}

// Truncate back to `keep` strings (drop a final depth's transient tail;
// the byte buffer shrinks logically, capacity is reused).
void ea_truncate(void* h, int64_t keep) {
    ExprArena* a = (ExprArena*)h;
    if ((uint64_t)keep >= a->n) return;
    a->len = a->off[keep];
    a->n = (uint64_t)keep;
}

}  // extern "C"

// ===========================================================================
// 4. Float64 jet-tape oracle — the gray-zone recheck in C
// ===========================================================================
//
// Mirrors ops/interpreter.eval_jets_np_many / ops/jets.py semantics exactly
// (same accumulation order in the truncated product, same Horner
// composition, same binary-exponentiation pow built from sqrt and integer
// powers).  The NumPy batch oracle pays per-step array dispatch; at depth-5
// scale its ~480k screen-passer rechecks were ~120 s of wall on the
// one-core axon host.  This runs the same math tape-at-a-time in C.

namespace {

// Opcode values — must match ops/optable.py:28-38.
enum { EJ_NOP = 0, EJ_VAR0 = 1, EJ_VAR1 = 2, EJ_CONST = 3, EJ_ADD = 4,
       EJ_SUB = 5, EJ_MUL = 6, EJ_NEG = 7, EJ_POW = 8, EJ_EXP = 9,
       EJ_LOG = 10 };

// monomials ordered by total degree, i descending: k(i,j) below.
static inline int ej_k(int i, int j) {
    int d = i + j;
    return d * (d + 1) / 2 + (d - i);
}

struct EjTables {
    int order;
    int T;
    // truncated-product pairs per output coefficient, in the exact order
    // jets.mul_table emits them (p ascending, then q ascending)
    int n_pairs[15];
    int pairs[15][25][2];
    int lin0, lin1;              // indices of the (1,0), (0,1) monomials

    explicit EjTables(int R) {
        order = R;
        T = (R + 1) * (R + 2) / 2;
        int k = 0;
        for (int d = 0; d <= R; ++d) {
            for (int i = d; i >= 0; --i) {
                int j = d - i;
                int np = 0;
                for (int p = 0; p <= i; ++p)
                    for (int q = 0; q <= j; ++q) {
                        pairs[k][np][0] = ej_k(p, q);
                        pairs[k][np][1] = ej_k(i - p, j - q);
                        ++np;
                    }
                n_pairs[k] = np;
                ++k;
            }
        }
        lin0 = ej_k(1, 0);
        lin1 = ej_k(0, 1);
    }
};

static EjTables* ej_tables(int order) {
    static EjTables* cache[5] = {nullptr, nullptr, nullptr, nullptr,
                                 nullptr};
    if (order < 0 || order > 4) return nullptr;
    if (!cache[order]) cache[order] = new EjTables(order);
    return cache[order];
}

// out = a * b truncated — SYMMETRIZED accumulation, the exact grouping
// of jets.jet_mul (swap_safe=False): pair p is summed with its
// operand-swapped mirror m-1-p first, then groups accumulate in order
// and an odd middle term is added last.  Keeping the f64 oracle on the
// same association order as the NumPy mirror preserves the byte-level
// agreement tests/test_native.py checks.
static inline void ej_mul(const EjTables* t, const double* a,
                          const double* b, double* out) {
    for (int k = 0; k < t->T; ++k) {
        const int m = t->n_pairs[k];
        double acc = 0.0;
        for (int p = 0; p < m / 2; ++p) {
            const double x = a[t->pairs[k][p][0]] * b[t->pairs[k][p][1]];
            const double y = a[t->pairs[k][m - 1 - p][0]]
                           * b[t->pairs[k][m - 1 - p][1]];
            const double term = x + y;
            acc = (p == 0) ? term : acc + term;
        }
        if (m % 2) {
            const int p = m / 2;
            const double mid = a[t->pairs[k][p][0]] * b[t->pairs[k][p][1]];
            acc = (m == 1) ? mid : acc + mid;
        }
        out[k] = acc;
    }
}

// integer power by binary exponentiation — the exact operation sequence
// of jets._int_pow (result ⊗ base accumulation, base squarings between)
static inline double ej_int_pow(double v, int n) {
    if (n == 0) return 1.0;
    bool inv = n < 0;
    if (inv) n = -n;
    double result = 0.0;
    bool have = false;
    double base = v;
    while (n) {
        if (n & 1) {
            result = have ? result * base : base;
            have = true;
        }
        n >>= 1;
        if (n) base = base * base;
    }
    return inv ? 1.0 / result : result;
}

// v**(num/den) with den in {1, 2}, matching jets._v_pow
static inline double ej_v_pow(double v, int num, int den) {
    if (den == 1) return ej_int_pow(v, num);
    return ej_int_pow(sqrt(v), num);
}

// fs tables: fs[k] = f^(k)(v)/k! for the POW family — coefficients are
// the Fraction-exact values from jets.pow_binom_table (hardcoded; see
// POW_EXPONENTS, optable.py:51-58)
static const double EJ_POW_COEF[5][5] = {
    {1.0, -1.0, 1.0, -1.0, 1.0},               // inv        p = -1
    {1.0, 0.5, -0.125, 0.0625, -0.0390625},    // sqrt       p = 1/2
    {1.0, 2.0, 1.0, 0.0, 0.0},                 // square     p = 2
    {1.0, 1.5, 0.375, -0.0625, 0.0234375},     // pow_3_2    p = 3/2
    {1.0, -1.5, 1.875, -2.1875, 2.4609375},    // pow_neg_3_2 p = -3/2
};
static const int EJ_POW_NUM[5][5] = {
    {-1, -2, -3, -4, -5},
    {1, -1, -3, -5, -7},
    {2, 1, 0, -1, -2},
    {3, 1, -1, -3, -5},
    {-3, -5, -7, -9, -11},
};
static const int EJ_POW_DEN[5] = {1, 2, 1, 2, 2};

// compose f onto jet w via Horner (jets.jet_compose): wt = w minus its
// constant term; acc = fs[R]; acc = acc*wt + fs[k] downward.
static inline void ej_compose(const EjTables* t, const double* w,
                              const double* fs, double* out,
                              double* scratch) {
    int T = t->T;
    double* wt = scratch;          // [T]
    double* acc = scratch + T;     // [T]
    double* tmp = scratch + 2 * T; // [T]
    wt[0] = 0.0;
    for (int k = 1; k < T; ++k) wt[k] = w[k];
    for (int k = 0; k < T; ++k) acc[k] = 0.0;
    acc[0] = fs[t->order];
    for (int k = t->order - 1; k >= 0; --k) {
        ej_mul(t, acc, wt, tmp);
        for (int i = 0; i < T; ++i) acc[i] = tmp[i];
        acc[0] += fs[k];
    }
    for (int k = 0; k < T; ++k) out[k] = acc[k];
}

}  // namespace

extern "C" {

// tapes: int32[n, L, 3]; lengths: int64[n]; consts: f64[n_consts];
// points: f64[P, 2]; out: f64[n, P, T].  Returns 0, or -1 on a bad
// opcode / unsupported order.
int64_t ej_eval_many(const int32_t* tapes, const int64_t* lengths,
                     int64_t n, int64_t L, const double* consts,
                     const double* points, int64_t P, int32_t order,
                     double* out) {
    EjTables* t = ej_tables(order);
    if (!t) return -1;
    const int T = t->T;
    // per-candidate register file: [L][P][T]
    double* buf = (double*)malloc((size_t)L * P * T * sizeof(double));
    double fs[5];
    double scratch[3 * 15];
    if (!buf) return -1;
    for (int64_t c = 0; c < n; ++c) {
        const int32_t* tape = tapes + c * L * 3;
        int64_t len = lengths[c];
        for (int64_t i = 0; i < len; ++i) {
            int opc = tape[i * 3 + 0];
            int ai = tape[i * 3 + 1];
            int bi = tape[i * 3 + 2];
            double* dst = buf + i * P * T;
            const double* av = buf + (int64_t)ai * P * T;
            const double* bv = buf + (int64_t)bi * P * T;
            switch (opc) {
                case EJ_NOP:
                    memset(dst, 0, (size_t)P * T * sizeof(double));
                    break;
                case EJ_VAR0:
                case EJ_VAR1:
                    for (int64_t p = 0; p < P; ++p) {
                        double* o = dst + p * T;
                        for (int k = 0; k < T; ++k) o[k] = 0.0;
                        o[0] = points[p * 2 + (opc == EJ_VAR1 ? 1 : 0)];
                        o[opc == EJ_VAR1 ? t->lin1 : t->lin0] = 1.0;
                    }
                    break;
                case EJ_CONST:
                    for (int64_t p = 0; p < P; ++p) {
                        double* o = dst + p * T;
                        for (int k = 0; k < T; ++k) o[k] = 0.0;
                        o[0] = consts[bi];
                    }
                    break;
                case EJ_ADD:
                    for (int64_t k = 0; k < P * T; ++k)
                        dst[k] = av[k] + bv[k];
                    break;
                case EJ_SUB:
                    for (int64_t k = 0; k < P * T; ++k)
                        dst[k] = av[k] - bv[k];
                    break;
                case EJ_MUL:
                    for (int64_t p = 0; p < P; ++p)
                        ej_mul(t, av + p * T, bv + p * T, dst + p * T);
                    break;
                case EJ_NEG:
                    for (int64_t k = 0; k < P * T; ++k) dst[k] = -av[k];
                    break;
                case EJ_POW: {
                    if (bi < 0 || bi > 4) {
                        free(buf);
                        return -1;
                    }
                    for (int64_t p = 0; p < P; ++p) {
                        const double* w = av + p * T;
                        double v = w[0];
                        for (int k = 0; k <= order; ++k) {
                            double cc = EJ_POW_COEF[bi][k];
                            fs[k] = (cc == 0.0)
                                ? 0.0
                                : cc * ej_v_pow(v, EJ_POW_NUM[bi][k],
                                                EJ_POW_DEN[bi]);
                        }
                        ej_compose(t, w, fs, dst + p * T, scratch);
                    }
                    break;
                }
                case EJ_EXP:
                    for (int64_t p = 0; p < P; ++p) {
                        const double* w = av + p * T;
                        double e = exp(w[0]);
                        double fact = 1.0;
                        for (int k = 0; k <= order; ++k) {
                            if (k > 0) fact *= k;
                            fs[k] = e * (1.0 / fact);
                        }
                        ej_compose(t, w, fs, dst + p * T, scratch);
                    }
                    break;
                case EJ_LOG:
                    for (int64_t p = 0; p < P; ++p) {
                        const double* w = av + p * T;
                        double v = w[0];
                        fs[0] = log(v);
                        double r = 1.0 / v;
                        double rk = r;
                        for (int k = 1; k <= order; ++k) {
                            fs[k] = ((k % 2 == 1) ? 1.0 : -1.0) * rk / k;
                            rk = rk * r;
                        }
                        ej_compose(t, w, fs, dst + p * T, scratch);
                    }
                    break;
                default:
                    free(buf);
                    return -1;
            }
        }
        memcpy(out + c * P * T, buf + (len - 1) * P * T,
               (size_t)P * T * sizeof(double));
    }
    free(buf);
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Tape materializer (tm_*): flatten a registry uid into its SSA tape.
//
// Mirrors the Python composition exactly (pde_engine_tpu/ops/tape.py
// apply_unary/apply_binary + optable.py surface lowerings): a composed
// tape is left operand rows, then right operand rows with registers
// shifted, then the surface op's lowered rows.  Byte-identical output is
// asserted against the Python path in tests/test_native.py.
//
// This removes the per-passer Python cost of ancestor Unique
// materialization + recursive tape composition (~100-150 us/passer —
// ~75 s of a depth-5 audited run; PERF roadmap #3).
// ---------------------------------------------------------------------------

namespace tapemat {

enum { T_NOP = 0, T_VAR0 = 1, T_VAR1 = 2, T_CONST = 3, T_ADD = 4,
       T_SUB = 5, T_MUL = 6, T_NEG = 7, T_POW = 8, T_EXP = 9, T_LOG = 10 };
enum { P_INV = 0, P_SQRT = 1, P_SQUARE = 2, P_32 = 3, P_N32 = 4 };

// surface op ids = ALL_SURFACE_OPS insertion order (optable.py:163-190);
// the Python binding asserts this order at load time
enum { S_NEG = 0, S_INV, S_SQRT, S_SQUARE, S_POW32, S_POWN32, S_EXP,
       S_EXP_NEG, S_ADD, S_SUB, S_MUL, S_DIV, S_GEOM_SUM,
       S_SQRT_SHIFT_NEG, S_SQRT_SHIFT_POS, S_EXP_MUL, S_LOG_MUL };

struct Builder {
    const int16_t* u_op;
    const int32_t* u_a;
    const int32_t* u_b;
    const int32_t* leaf_rows;   // [sum(leaf_len), 3], leaf i == uid i
    const int64_t* leaf_off;
    const int64_t* leaf_len;
    int64_t n_leaves;
    int32_t one_idx;            // const-table index of Fraction(1)
    int32_t* out;               // [cap, 3]
    int64_t len, cap;
    bool ok;

    int64_t emit(int op, int64_t a, int64_t b) {
        if (len >= cap) { ok = false; return 0; }
        int32_t* r = out + len * 3;
        r[0] = (int32_t)op; r[1] = (int32_t)a; r[2] = (int32_t)b;
        return len++;
    }

    int64_t build(int64_t uid) {
        int16_t op = u_op[uid];
        if (op < 0) {            // leaf: copy primitive rows, shifted
            if (uid >= n_leaves) { ok = false; return 0; }
            int64_t off = leaf_off[uid], L = leaf_len[uid];
            int64_t shift = len;
            if (len + L > cap) { ok = false; return 0; }
            for (int64_t i = 0; i < L; ++i) {
                const int32_t* r = leaf_rows + (off + i) * 3;
                int32_t opc = r[0], a = r[1], b = r[2];
                if (opc == T_ADD || opc == T_SUB || opc == T_MUL) {
                    a += (int32_t)shift; b += (int32_t)shift;
                } else if (opc == T_NEG || opc == T_POW || opc == T_EXP
                           || opc == T_LOG) {
                    a += (int32_t)shift;
                }
                int32_t* o = out + len * 3;
                o[0] = opc; o[1] = a; o[2] = b; ++len;
            }
            return len - 1;
        }
        int64_t ra = build(u_a[uid]);
        if (!ok) return 0;
        int64_t rb = -1;
        if (u_b[uid] >= 0) {
            rb = build(u_b[uid]);
            if (!ok) return 0;
        }
        switch (op) {
            case S_NEG:    return emit(T_NEG, ra, 0);
            case S_INV:    return emit(T_POW, ra, P_INV);
            case S_SQRT:   return emit(T_POW, ra, P_SQRT);
            case S_SQUARE: return emit(T_POW, ra, P_SQUARE);
            case S_POW32:  return emit(T_POW, ra, P_32);
            case S_POWN32: return emit(T_POW, ra, P_N32);
            case S_EXP:    return emit(T_EXP, ra, 0);
            case S_EXP_NEG: {
                int64_t n1 = emit(T_NEG, ra, 0);
                return emit(T_EXP, n1, 0);
            }
            case S_ADD:    return emit(T_ADD, ra, rb);
            case S_SUB:    return emit(T_SUB, ra, rb);
            case S_MUL:    return emit(T_MUL, ra, rb);
            case S_DIV: {
                int64_t i1 = emit(T_POW, rb, P_INV);
                return emit(T_MUL, ra, i1);
            }
            case S_GEOM_SUM: {
                int64_t one = emit(T_CONST, 0, one_idx);
                int64_t den = emit(T_SUB, one, rb);
                int64_t inv = emit(T_POW, den, P_INV);
                return emit(T_MUL, ra, inv);
            }
            case S_SQRT_SHIFT_NEG: {
                int64_t one = emit(T_CONST, 0, one_idx);
                int64_t am1 = emit(T_SUB, ra, one);
                int64_t s1 = emit(T_POW, am1, P_SQUARE);
                int64_t s2 = emit(T_POW, rb, P_SQUARE);
                int64_t tot = emit(T_ADD, s1, s2);
                return emit(T_POW, tot, P_SQRT);
            }
            case S_SQRT_SHIFT_POS: {
                int64_t one = emit(T_CONST, 0, one_idx);
                int64_t ap1 = emit(T_ADD, ra, one);
                int64_t s1 = emit(T_POW, ap1, P_SQUARE);
                int64_t s2 = emit(T_POW, rb, P_SQUARE);
                int64_t tot = emit(T_ADD, s1, s2);
                return emit(T_POW, tot, P_SQRT);
            }
            case S_EXP_MUL: {
                int64_t e = emit(T_EXP, rb, 0);
                return emit(T_MUL, ra, e);
            }
            case S_LOG_MUL: {
                int64_t l = emit(T_LOG, rb, 0);
                return emit(T_MUL, ra, l);
            }
            default: ok = false; return 0;
        }
    }
};

}  // namespace tapemat

extern "C" {

// Build padded tapes for `uids` into out[n, max_len, 3] (caller
// zero-fills; pad rows are NOP).  Returns 0, or -(i+1) when tape i
// exceeded max_len / hit an unknown op (caller falls back to Python).
int64_t tm_build_batch(const int16_t* u_op, const int32_t* u_a,
                       const int32_t* u_b, const int32_t* leaf_rows,
                       const int64_t* leaf_off, const int64_t* leaf_len,
                       int64_t n_leaves, int32_t one_idx,
                       const int64_t* uids, int64_t n,
                       int32_t* out, int64_t max_len,
                       int64_t* out_lens) {
    for (int64_t i = 0; i < n; ++i) {
        tapemat::Builder B{u_op, u_a, u_b, leaf_rows, leaf_off, leaf_len,
                           n_leaves, one_idx, out + i * max_len * 3,
                           0, max_len, true};
        B.build(uids[i]);
        if (!B.ok) return -(i + 1);
        out_lens[i] = B.len;
    }
    return 0;
}

}  // extern "C"
