"""Tracing / profiling utilities.

The reference's only observability was wall-clock epoch timers and
graph-mode tensor dumps to UUID-named text files
(``/root/reference/training.py:585,685-686``;
``well_rate_bhp_Subclassed.py:326-463``). Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible device trace (new capability).
* :class:`EpochTimer` — wall-clock + steps/sec bookkeeping.
* :func:`log_tensor_to_file` — host-side dump of (iteration-history) tensors
  from inside jitted code via ``jax.debug.callback``, the functional
  equivalent of the reference's in-graph ``tf.io.write_file`` logging.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
import uuid
from typing import Iterator, List, Optional

import numpy as np

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/srm_tpu_trace", create_perfetto_link: bool = False
          ) -> Iterator[str]:
    """Profile the enclosed device work with jax.profiler."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info("Profiler trace written to %s", log_dir)


class EpochTimer:
    """Per-epoch wall-clock + throughput accounting (ms, as the reference's
    history['epoch_times'])."""

    def __init__(self):
        self.epoch_times_ms: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, steps: int = 0) -> float:
        ms = (time.perf_counter() - self._t0) * 1000.0
        self.epoch_times_ms.append(ms)
        if steps:
            log.info("epoch: %.0f ms (%.2f steps/s)", ms, steps / (ms / 1000.0))
        return ms

    def summary(self) -> dict:
        arr = np.asarray(self.epoch_times_ms)
        return {"count": len(arr), "mean_ms": float(arr.mean()) if arr.size else 0.0,
                "total_s": float(arr.sum() / 1000.0)}


def log_tensor_to_file(tensor, it_final=None, final_tensor=None,
                       tensor_name: str = "tensor", file_prefix: str = "tensor_log",
                       values_per_line: int = 10, directory: str = "/tmp/srm_tpu_logs",
                       well_specific: bool = False) -> None:
    """Dump an iteration-history tensor to a uniquely named text file from
    inside jitted code (use via ``jax.debug.callback(log_tensor_to_file, t)``).
    Mirrors the reference's graph-mode logger output format: one
    ``values: "..."`` row per iteration."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{file_prefix}_{uuid.uuid4().hex[:8]}.txt")
    arr = np.asarray(tensor)
    with open(path, "w") as f:
        f.write(f"# {tensor_name}, shape {list(arr.shape)}\n")
        it_rows = arr.reshape(arr.shape[0], -1) if arr.ndim > 1 else arr.reshape(1, -1)
        for i, row in enumerate(it_rows):
            nz = row[np.nonzero(row)] if well_specific else row
            vals = " ".join(f"{v:.6g}" for v in nz[:values_per_line])
            f.write(f'iter {i} values: "{vals}"\n')
        if final_tensor is not None:
            fin = np.asarray(final_tensor).reshape(-1)
            fin = fin[np.nonzero(fin)] if well_specific else fin
            f.write(f'final values: "{" ".join(f"{v:.6g}" for v in fin[:values_per_line])}"\n')
    log.debug("tensor log written: %s", path)
