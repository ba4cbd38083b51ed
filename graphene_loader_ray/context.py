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
