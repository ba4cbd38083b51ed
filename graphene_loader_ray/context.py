"""Ray Data context defaults for this engine.

Never calls ``ray.init``; only tunes the ``DataContext`` of the session the
caller owns.
"""

from __future__ import annotations


def configure(quiet: bool = True, target_max_block_size: int | None = None) -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except Exception:
            pass
    # html rows are wide (binary) — a smaller block target keeps
    # batch x concurrency within worker heaps (SURVEY.md §4 memory row)
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = False
    # Ray Data wraps EVERY map task in a MemoryProfiler (1 s RSS polling);
    # at ~0.5 s tasks × 28 actors the profiler threads cost ~30% of actor
    # throughput on this box (measured: 117k → 173k docs/s with it off).
    # Per-task memory telemetry is not worth a third of the cluster.
    try:
        ctx.memory_usage_poll_interval_s = None
    except Exception:
        pass
