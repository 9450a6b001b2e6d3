"""Host-side ReduceLROnPlateau controller.

Mirrors torch.optim.lr_scheduler.ReduceLROnPlateau with the reference's
settings (mode='min', factor=0.5, patience=20, min_lr=1e-5 — lightning_
model.py:160-173, 570-583). The learning rate is a scalar fed into the
jitted train step, so changing it never triggers recompilation.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ReduceLROnPlateau:
    lr: float
    factor: float = 0.5
    patience: int = 20
    min_lr: float = 1e-5
    threshold: float = 1e-4  # relative, torch default
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float) -> float:
        """Update with this epoch's monitored metric; returns current lr."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr
