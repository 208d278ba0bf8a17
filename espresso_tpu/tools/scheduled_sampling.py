"""Scheduled sampling rate scheduler.

Rebuild of espresso/tools/scheduled_sampling_rate_scheduler.py:28-41: maps
epoch -> probability of feeding the teacher token (1.0 = pure teacher
forcing). ``probs`` may be a single value or a decreasing schedule that
advances one entry per epoch starting at ``start_epoch``.
"""

from __future__ import annotations

from typing import List, Sequence


class ScheduledSamplingRateScheduler:
    def __init__(
        self,
        scheduled_sampling_probs: Sequence[float] = (1.0,),
        start_scheduled_sampling_epoch: int = 1,
    ):
        self.probs = list(scheduled_sampling_probs)
        self.start_epoch = start_scheduled_sampling_epoch

    def step(self, epoch: int) -> float:
        if (
            len(self.probs) > 1 or self.probs[0] < 1.0
        ) and epoch >= self.start_epoch:
            i = min(epoch - self.start_epoch, len(self.probs) - 1)
            return self.probs[i]
        return 1.0
