"""Training-divergence detection (failure-detection subsystem).

The reference continues silently when the loss goes NaN/Inf — every later
epoch trains on garbage and the "best" checkpoint gate (``val_dice >
best``) simply never fires again (ref: uncertainty_guided_trainer.py:316-398
has no finiteness check anywhere).  Here both trainers check the epoch-mean
losses they already fetched (zero extra device syncs — metrics come back
once per epoch), and on the first non-finite value they:

1. save a ``*_stage{S}_diverged`` diagnostic checkpoint (variables +
   optimizer state + the offending metrics + history), so the blown-up
   state can be inspected rather than overwritten, and
2. raise :class:`TrainingDivergedError` — fail fast instead of burning the
   rest of the stage budget on NaNs.

Opt out with ``nan_guard=False`` on either trainer.
"""

from __future__ import annotations

import math

__all__ = ["TrainingDivergedError", "nonfinite_metrics"]


class TrainingDivergedError(RuntimeError):
    """Raised when an epoch's mean loss is NaN/Inf (with ``nan_guard``).

    Attributes mirror the diagnostic checkpoint's metadata: ``stage``,
    ``epoch`` (1-based, the epoch that diverged), ``metrics`` (the
    non-finite name -> value map), and ``checkpoint`` (path of the saved
    diagnostic state, or None if saving itself failed).
    """

    def __init__(self, stage: int, epoch: int, metrics: dict, checkpoint=None):
        self.stage = stage
        self.epoch = epoch
        self.metrics = dict(metrics)
        self.checkpoint = checkpoint
        names = ", ".join(f"{k}={v!r}" for k, v in self.metrics.items())
        where = f"; diagnostic state saved to {checkpoint}" if checkpoint else ""
        super().__init__(
            f"training diverged at stage {stage}, epoch {epoch}: {names}"
            f"{where}.  Typical causes: learning rate too high, bad/corrupt "
            f"input batch, fp16-style overflow.  Pass nan_guard=False to "
            f"train through it anyway."
        )


def nonfinite_metrics(**named: float) -> dict:
    """Subset of ``named`` whose values are NaN/Inf (empty = all finite)."""
    return {k: v for k, v in named.items() if not math.isfinite(float(v))}
