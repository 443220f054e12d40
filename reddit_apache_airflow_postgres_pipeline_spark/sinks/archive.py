"""Archive move — exactly-once-ish file handling (SURVEY.md A11).

The reference drains the inbox every run: used, skipped, AND
empty-result source files all move ``data/`` → ``data/loaded/``
(Combine_send_to_postgresql.py:168-200). Batch mode = driver-side rename
after a successful write. Streaming mode calls THIS function driver-side
inside ``foreachBatch`` after the merge commits
(streaming/combine_stream.py) — not the built-in ``cleanSource=archive``:
the drift-tolerant re-read needs the batch's file list in the driver
anyway, and the explicit move preserves the reference's
move-after-commit ordering.
"""

from __future__ import annotations

import os
import shutil


def archive_files(paths: list[str], loaded_dir: str) -> list[str]:
    """Move each file into ``loaded_dir``; returns new paths. Name
    collisions get a numeric suffix rather than overwriting (the reference
    can re-archive identically-named files across runs)."""
    os.makedirs(loaded_dir, exist_ok=True)
    moved = []
    for p in paths:
        base = os.path.basename(p)
        dest = os.path.join(loaded_dir, base)
        i = 1
        while os.path.exists(dest):
            dest = os.path.join(loaded_dir, f"{base}.{i}")
            i += 1
        shutil.move(p, dest)
        moved.append(dest)
    return moved
