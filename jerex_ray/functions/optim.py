"""AdamW + linear warmup schedule, numpy form.

Mirrors the reference's optimizer setup
(``/root/reference/jerex/model.py:187-204`` and ``configs.py:88-92``):
AdamW with lr 5e-5 and weight_decay 0.01 — bias parameters excluded
from decay, as in ``_get_optimizer_params`` (model.py:213-223) — under
``transformers.get_linear_schedule_with_warmup``: lr ramps linearly
from 0 over ``warmup`` steps, then decays linearly to 0 at ``total``
steps. Decoupled weight decay per Loshchilov & Hutter 2019 (public).
"""

from __future__ import annotations

import numpy as np


def linear_warmup_lr(step: int, *, base_lr: float, warmup: int,
                     total: int) -> float:
    """transformers.get_linear_schedule_with_warmup, numpy form
    (step is 0-indexed; the factor applies to the UPCOMING update)."""
    if total <= 0:
        return base_lr
    if warmup > 0 and step < warmup:
        return base_lr * step / warmup
    if total == warmup:
        return base_lr
    return base_lr * max(0.0, (total - step) / (total - warmup))


class AdamW:
    """Decoupled-weight-decay Adam over a dict of numpy parameters.

    ``params`` maps name → array (updated IN PLACE by ``step``).
    Names containing ``b_`` prefixes (biases) take no weight decay,
    mirroring the reference's no-decay group."""

    def __init__(self, params: dict[str, np.ndarray], *,
                 lr: float = 5e-5, betas: tuple = (0.9, 0.999),
                 eps: float = 1e-6, weight_decay: float = 0.01,
                 warmup: int = 0, total: int = 0):
        self.params = params
        self.lr = lr
        self.b1, self.b2 = betas
        self.eps = eps
        self.weight_decay = weight_decay
        self.warmup, self.total = warmup, total
        self.t = 0
        self.m = {n: np.zeros_like(p) for n, p in params.items()}
        self.v = {n: np.zeros_like(p) for n, p in params.items()}

    def _decays(self, name: str) -> bool:
        return not name.startswith("b_")

    def current_lr(self) -> float:
        return linear_warmup_lr(self.t, base_lr=self.lr,
                                warmup=self.warmup, total=self.total) \
            if self.total else self.lr

    def step(self, grads: dict[str, np.ndarray]) -> float:
        """One update over all params; returns the applied lr."""
        lr = self.current_lr()
        self.t += 1
        bc1 = 1.0 - self.b1 ** self.t
        bc2 = 1.0 - self.b2 ** self.t
        for n, p in self.params.items():
            gr = grads[n]
            m = self.m[n]
            v = self.v[n]
            m *= self.b1
            m += (1 - self.b1) * gr
            v *= self.b2
            v += (1 - self.b2) * gr * gr
            update = (m / bc1) / (np.sqrt(v / bc2) + self.eps)
            if self.weight_decay and self._decays(n):
                update = update + self.weight_decay * p
            p -= lr * update
        return lr
