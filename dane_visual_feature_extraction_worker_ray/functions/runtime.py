"""Worker-side runtime tuning.

Every data-plane process pins Arrow's internal thread pool to one
thread: Ray already schedules one task per CPU, so per-task pools
sized at ``hardware_concurrency`` oversubscribe the node N× (measured
55 s → 24 s on the 8.5M-turn exchange at 32 CPUs). Idempotent and
cheap — call at the top of any UDF that touches pyarrow kernels.
"""

from __future__ import annotations

import pyarrow as pa


def pin_arrow_threads() -> None:
    try:
        if pa.cpu_count() > 1:
            pa.set_cpu_count(1)
        if pa.io_thread_count() > 2:
            pa.set_io_thread_count(2)
    except Exception:
        pass
