"""Shared lifecycle for per-invocation scratch directories under the
system temp dir — the persisted ANN index (`operators/similarity.py`)
and the incremental-dedup standing state (`operators/incremental.py`)
both write build-once/probe-many sinks that must not be yanked out
from under a still-lazy result DataFrame, so each invocation gets its
own directory, bounded two ways (ADVICE r7/r9):

- this process's dirs are rmtree'd at exit (atexit — by which time no
  lazy result can still need them);
- dirs whose embedded creator pid is dead are swept at entry, across
  ALL tags (a tag-scoped sweep leaves other fixtures' orphans to
  accumulate unboundedly — the r9 advisor finding), never touching a
  LIVE process's dirs (its own atexit hook cleans them).

Path format: ``{prefix}_{tag}_{pid}_{k}`` — the sweep parses the pid
at split("_")[-2]. One instance per prefix; factored here so the next
lifecycle fix lands once instead of drifting between two hand-rolled
copies (r9 self-review finding).
"""

from __future__ import annotations

import atexit
import glob
import itertools
import os
import shutil
import tempfile


class ScratchDirs:
    """Per-prefix scratch-directory manager (see module docstring)."""

    def __init__(self, prefix: str) -> None:
        self.prefix = prefix
        self._nonce = itertools.count()
        self._own: list[str] = []
        atexit.register(self._cleanup_own)

    def _cleanup_own(self) -> None:
        for d in self._own:
            shutil.rmtree(d, ignore_errors=True)

    def sweep_dead(self) -> None:
        """Reclaim dirs (all tags) whose creator process is dead."""
        for d in glob.glob(
            os.path.join(tempfile.gettempdir(), f"{self.prefix}_*")
        ):
            try:
                pid = int(os.path.basename(d).split("_")[-2])
                os.kill(pid, 0)
            except (ValueError, IndexError):
                continue
            except ProcessLookupError:
                shutil.rmtree(d, ignore_errors=True)
            except PermissionError:
                continue  # pid alive under another user

    def new_dir(self, tag: str) -> str:
        """Sweep dead dirs, then reserve a fresh per-invocation path
        (not created on disk — the writer's .parquet() call does)."""
        self.sweep_dead()
        out = os.path.join(
            tempfile.gettempdir(),
            f"{self.prefix}_{tag}_{os.getpid()}_{next(self._nonce)}",
        )
        self._own.append(out)
        return out
