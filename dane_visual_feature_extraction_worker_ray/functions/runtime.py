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


def autoscale_pool(concurrency) -> tuple[int, int]:
    """Actor-pool sizing for ``map_batches(Cls, concurrency=...)``.

    An int N becomes ``(floor, N)`` where the floor pre-starts the full
    pool UNLESS that would hold every schedulable CPU — a FIXED pool of
    N actors deadlocks a session with exactly N CPUs (the pool owns
    every slot and the upstream read task starves; CLAUDE.md gotcha).
    Pre-starting matters: a lazy ``(1, N)`` ramp re-warms one actor at
    a time and measurably slows short stages (scorer_stage 6.4 s →
    16.4 s at 32 CPUs when the round-3 deadlock fix first shipped as
    ``(1, N)``). Tuples pass through unchanged.
    """
    if not isinstance(concurrency, int):
        return concurrency
    try:
        import ray

        total = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        total = 0
    if total <= 0:
        return (1, concurrency)
    floor = min(concurrency, max(1, total - 2))
    return (floor, concurrency)
