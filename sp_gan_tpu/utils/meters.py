"""Running-average meter (reference `AverageValueMeter`,
`/root/reference/Common/loss_utils.py:41-60`)."""

from __future__ import annotations


class AverageValueMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0.0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count
