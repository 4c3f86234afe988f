"""Host allocator tuning for virtualized (Firecracker/EPT) hosts.

Anonymous page faults on the microVM hosts this engine runs on cost
30 us - 3 ms EACH (measured: memset of a fresh 2 GB mmap = 15-180 s,
vs ~0.2 s on bare metal) because every first touch exits to the
hypervisor.  glibc malloc serves every allocation above
M_MMAP_THRESHOLD (128 KB default) with a fresh mmap and munmaps it on
free — so the MB-scale NumPy temporaries the ingest loop creates and
drops per batch re-pay the full fault cost every single batch.  That
churn measured as ~85% of wall in kernel mode on the depth-5 hot loop.

``tune_allocator`` raises the mmap threshold and disables heap trimming,
so large temporaries come from the (already-faulted) heap and memory is
REUSED instead of being returned to the kernel and re-faulted.  The
trade: peak-sized heap stays resident for the process lifetime — the
right trade for a discovery run, whose working set is its peak anyway.

Idempotent, Linux-only, silently a no-op where unavailable.
"""

from __future__ import annotations

import ctypes
import sys

_done = False

# malloc.h mallopt parameter codes (glibc)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_allocator() -> bool:
    """Raise glibc's mmap threshold to 1 GiB and disable trim.  Returns
    True when the tuning was applied."""
    global _done
    if _done:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        _done = bool(ok1) and bool(ok2)
    except Exception:
        return False
    return _done
