"""Optional TensorBoard event logging.

The reference pins ``tensorboard==2.17.0`` in requirements but never
imports it (ref: requirements.txt:26 — noted in SURVEY.md §5); here the
intent is wired for real: both trainers take ``tb_logdir=`` and write
per-epoch scalars through ``torch.utils.tensorboard`` when available.  The
writer degrades to a no-op (with one warning) when the backend is missing,
matching the repo's matplotlib/sklearn-optional convention.
"""

from __future__ import annotations

import warnings

__all__ = ["TBWriter"]


class TBWriter:
    """Tiny scalar-only TensorBoard writer; no-op if the backend is absent."""

    def __init__(self, logdir):
        self._w = None
        if logdir is None:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(str(logdir))
        except Exception as e:  # tensorboard/torch not installed
            warnings.warn(
                f"tb_logdir={logdir!r} requested but the TensorBoard writer "
                f"is unavailable ({e}); event logging disabled",
                stacklevel=2,
            )

    @property
    def active(self) -> bool:
        return self._w is not None

    def scalars(self, step: int, **values) -> None:
        """Write ``values`` (floats) at ``step``; tag = the kwarg name."""
        if self._w is None:
            return
        for tag, value in values.items():
            self._w.add_scalar(tag, float(value), step)

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
            self._w = None
