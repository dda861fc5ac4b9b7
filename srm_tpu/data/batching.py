"""Batch generation for the collapsed (realization x time) sample axis.

TPU-native re-design of the reference ``BatchGenerator``
(``/root/reference/training.py:17-229``): the (K, T) leading axes of each
feature/label group are collapsed Fortran-style into one sample axis, pairs
are concatenated, and per-epoch permutations drive fixed-size batches.

Differences from the reference, driven by XLA's compilation model:

* **Static batch shapes.** The last ragged batch is dropped (XLA would
  otherwise recompile the train step for the remainder shape). With the
  default dry-gas sizes (60 x 51 = 3060 samples, batch 32) this drops at most
  one partial batch per epoch.
* **Epoch-at-once device layout.** ``epoch_batches`` returns a single
  gathered ``(num_batches, B, ...)`` array ready for ``jax.lax`` scanning or
  simple step loops — the host never re-gathers per step.
* Optional deterministic LHS-stratified shuffle (ref :209-227).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

Labels = Union[np.ndarray, Dict[str, np.ndarray]]


def collapse_axes_fortran(arr: np.ndarray, axes: Sequence[int] = (0, 1),
                          order: str = "F") -> np.ndarray:
    """Collapse ``axes`` into one leading axis.  ``order='F'`` is
    first-axis-fastest (the reference's default); ``'C'`` is last-axis-fastest
    — the reference's BatchGenerator supports both (ref training.py:150-229)."""
    if not axes:
        return arr
    axes = sorted(a if a >= 0 else arr.ndim + a for a in axes)
    other = [i for i in range(arr.ndim) if i not in axes]
    perm = other + list(axes)
    moved = np.transpose(arr, perm)
    new_shape = [arr.shape[i] for i in other] + [int(np.prod([arr.shape[a] for a in axes]))]
    flat = np.reshape(moved, new_shape, order=order)
    return np.moveaxis(flat, -1, axes[0])


def lhs_shuffle_indices(n: int, seed: int = 42) -> np.ndarray:
    """Latin-hypercube stratified shuffle (ref training.py:209-227)."""
    rng = np.random.default_rng(seed)
    bins = np.linspace(0, n, n + 1, dtype=int)
    idx = np.array([rng.integers(bins[i], bins[i + 1]) for i in range(n)], dtype=int)
    rng.shuffle(idx)
    return idx


class BatchGenerator:
    """Host-side batcher over a list of (features, labels) groups."""

    def __init__(self, pairs: List[Tuple[np.ndarray, Labels]], batch_size: int,
                 collapse_axes: Optional[Sequence[int]] = (0, 1), shuffle: bool = True,
                 stack_labels: bool = False, drop_remainder: bool = True,
                 seed: int = 0, lhs_shuffle: bool = False,
                 collapse_order: str = "F"):
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.stack_labels = stack_labels
        self.drop_remainder = drop_remainder
        self._rng = np.random.RandomState(seed)

        if not isinstance(pairs, list):
            raise ValueError("pairs must be a list of (features, labels) tuples")
        if not pairs:
            self.x_all = np.zeros((0,), np.float32)
            self.y_all: Labels = np.zeros((0,), np.float32)
            self.is_dict = False
            self.label_keys: List[str] = []
            self.N = 0
            self.indices = np.zeros((0,), int)
            return

        if collapse_order not in ("F", "C"):
            raise ValueError(f"collapse_order must be 'F' or 'C', got {collapse_order!r}")
        cax = list(collapse_axes) if collapse_axes else []
        flat = lambda a: (collapse_axes_fortran(np.asarray(a), cax, collapse_order)  # noqa: E731
                          if cax else np.asarray(a))

        self.is_dict = isinstance(pairs[0][1], dict)
        self.x_all = np.concatenate([flat(f) for f, _ in pairs], axis=0)
        if self.is_dict:
            self.label_keys = list(pairs[0][1].keys())
            self.y_all = {k: np.concatenate([flat(l[k]) for _, l in pairs], axis=0)
                          for k in self.label_keys}
        else:
            self.label_keys = []
            self.y_all = np.concatenate([flat(l) for _, l in pairs], axis=0)

        self.N = self.x_all.shape[0]
        self.indices = lhs_shuffle_indices(self.N) if lhs_shuffle else np.arange(self.N)
        if self.shuffle:
            self._rng.shuffle(self.indices)

    def __len__(self) -> int:
        if self.N == 0:
            return 0
        if self.drop_remainder:
            return self.N // self.batch_size
        return int(np.ceil(self.N / self.batch_size))

    def __getitem__(self, idx: int):
        sl = self.indices[idx * self.batch_size: (idx + 1) * self.batch_size]
        x = self.x_all[sl]
        if self.is_dict:
            y = {k: self.y_all[k][sl] for k in self.label_keys}
            if self.stack_labels:
                y = np.stack([y[k] for k in self.label_keys], axis=0)
        else:
            y = self.y_all[sl]
        return x, y

    def on_epoch_end(self):
        if self.shuffle and self.N > 0:
            self._rng.shuffle(self.indices)

    def epoch_batches(self):
        """All batches of this epoch as one (num_batches, B, ...) gather —
        a single host→device transfer per epoch instead of per step."""
        nb = len(self)
        take = self.indices[: nb * self.batch_size].reshape(nb, self.batch_size)
        x = self.x_all[take]
        if self.is_dict:
            y = {k: self.y_all[k][take] for k in self.label_keys}
            if self.stack_labels:
                y = np.stack([y[k] for k in self.label_keys], axis=0)
        else:
            y = self.y_all[take]
        return x, y
