"""Test-set visualization (ModelPlotter equivalent).

Re-implements the reference ``ModelPlotter``
(``/root/reference/plot_functions.py:50-472``) over the TPU model map:
per-point / averaged time-series predicted-vs-true line plots, and paginated
predicted / observed / %-residual image triptychs. Prediction batching runs
through one jitted forward; matplotlib stays host-side.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)


class ModelPlotter:
    """Plots model predictions against test labels.

    ``test_pairs`` is a list of (features, labels-dict) groups with features
    shaped (A, B, T, H, W, C) — A realizations, B times (ref
    plot_functions.py:64-88). Predictions use the pressure model.
    """

    def __init__(self, models, params, test_pairs, time_channel: int = -2,
                 data_summary=None, norm_config=None, batch_size: int = 64,
                 model_key: str = "pressure"):
        self.models = models
        self.params = params
        self.model_key = model_key
        self.test_pairs = test_pairs
        self.time_channel = time_channel
        self.data_summary = data_summary
        self.norm_config = norm_config
        self.batch_size = batch_size
        self.font_size = 10.0
        self.font_type = None
        self.x_unit_label = ""
        self.y_unit_label = ""
        self._predict = None

    def set_unit_labels(self, x_unit_label: str = "", y_unit_label: str = ""):
        self.x_unit_label = x_unit_label
        self.y_unit_label = y_unit_label

    def set_font_settings(self, font_size: float = 10.0, font_type: Optional[str] = None):
        self.font_size = font_size
        self.font_type = font_type

    # ------------------------------------------------------------------
    def _predict_fn(self):
        if self._predict is None:
            import jax
            model = self.models[self.model_key]
            params = self.params[self.model_key]
            self._predict = jax.jit(lambda x: model.apply(params, x))
        return self._predict

    def predict(self, features: np.ndarray) -> np.ndarray:
        """Batched pressure prediction over (A, B, T, H, W, C) features."""
        import jax.numpy as jnp
        A, B = features.shape[:2]
        flat = features.reshape((-1,) + features.shape[2:])
        outs = []
        f = self._predict_fn()
        for i in range(0, flat.shape[0], self.batch_size):
            outs.append(np.asarray(f(jnp.asarray(flat[i:i + self.batch_size]))))
        out = np.concatenate(outs, axis=0)
        return out.reshape((A, B) + out.shape[1:])

    def extract_times(self, features: np.ndarray) -> np.ndarray:
        """Per-(a,b) scalar times from the time channel (ref :123-160),
        denormalized when a DataSummary is available."""
        t = features[..., 0, 0, 0, self.time_channel]
        if self.data_summary is not None and self.norm_config is not None:
            from srm_tpu.utils.stats import denormalize
            import jax.numpy as jnp
            row = jnp.asarray(self.data_summary.row("time"))
            t = np.asarray(denormalize(
                jnp.asarray(t), row,
                method=self.norm_config["feature_normalization_method"],
                limits=tuple(self.norm_config["normalization_limits"]), is_log=False))
        return t

    # ------------------------------------------------------------------
    def plot_line(self, key: str = "PRESSURE", a_indices: Optional[Sequence[int]] = None,
                  b_indices: Optional[Sequence[int]] = None, avg: bool = False,
                  indices: Optional[Sequence[Tuple[int, int, int]]] = None,
                  superimpose_indices: bool = True, figsize=(8, 4),
                  title: str = "", save_path: Optional[str] = None):
        """Predicted-vs-true time series at grid points (ref :162-321)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        feats, labels = self.test_pairs[0]
        feats = np.asarray(feats)
        if feats.ndim == 5:      # (A*B, T, H, W, C) — single collapsed axis
            feats = feats[None]
        pred = self.predict(feats)                       # (A, B, T, H, W, 1)
        true = np.asarray(labels[key]) if isinstance(labels, dict) else np.asarray(labels)
        true = true.reshape(pred.shape[:2] + pred.shape[2:-1])
        times = self.extract_times(feats)

        a_indices = list(a_indices or range(min(2, pred.shape[0])))
        indices = list(indices or [(0, pred.shape[-3] // 2, pred.shape[-2] // 2)])

        fig, axes = plt.subplots(len(a_indices), 1, figsize=figsize, squeeze=False)
        for row, a in enumerate(a_indices):
            ax = axes[row][0]
            for (t_i, h, w_) in indices:
                p_series = pred[a, :, t_i, h, w_, 0]
                y_series = true[a, :, t_i, h, w_]
                if avg:
                    p_series = pred[a].mean(axis=(1, 2, 3, 4))
                    y_series = true[a].mean(axis=(1, 2, 3))
                ax.plot(times[a], p_series, "-", label=f"pred ({h},{w_})")
                ax.plot(times[a], y_series, "o", ms=2, label=f"true ({h},{w_})")
            ax.set_xlabel(f"time {self.x_unit_label}", fontsize=self.font_size)
            ax.set_ylabel(f"{key} {self.y_unit_label}", fontsize=self.font_size)
            ax.legend(fontsize=self.font_size * 0.8)
            ax.set_title(f"{title} — realization {a}", fontsize=self.font_size)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return fig

    def plot_images(self, key: str = "PRESSURE", a_index: int = 0,
                    b_indices: Optional[Sequence[int]] = None, per_page: int = 4,
                    save_path: Optional[str] = None, t_index: int = 0):
        """Predicted / observed / %-residual triptychs (ref :323-472).

        ``b_indices`` selects the paginated rows along axis 1 (time groups);
        ``t_index`` picks the slice of the folded temporal/depth axis 2 of
        each image, previously hard-coded to 0 (the reference's triptychs let
        the caller pick the time slice — ref plot_functions.py:323-472)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        feats, labels = self.test_pairs[0]
        feats = np.asarray(feats)
        if feats.ndim == 5:
            feats = feats[None]
        pred = self.predict(feats)
        true = np.asarray(labels[key]) if isinstance(labels, dict) else np.asarray(labels)
        true = true.reshape(pred.shape[:2] + pred.shape[2:-1])
        b_indices = list(b_indices or range(min(per_page, pred.shape[1])))

        figs = []
        for page_start in range(0, len(b_indices), per_page):
            page = b_indices[page_start:page_start + per_page]
            fig, axes = plt.subplots(len(page), 3, figsize=(9, 3 * len(page)),
                                     squeeze=False)
            for r, b in enumerate(page):
                p_img = pred[a_index, b, t_index, :, :, 0]
                t_img = true[a_index, b, t_index, :, :]
                resid = 100.0 * (p_img - t_img) / np.where(np.abs(t_img) > 0, t_img, 1.0)
                for c, (img, name) in enumerate([(p_img, "predicted"),
                                                 (t_img, "observed"),
                                                 (resid, "% residual")]):
                    im = axes[r][c].imshow(img, cmap="viridis")
                    axes[r][c].set_title(f"{name} b={b}", fontsize=self.font_size)
                    fig.colorbar(im, ax=axes[r][c], fraction=0.046)
            fig.tight_layout()
            if save_path:
                root, ext = os.path.splitext(save_path)
                fig.savefig(f"{root}_p{page_start // per_page}{ext or '.png'}", dpi=120)
            figs.append(fig)
            plt.close(fig)
        return figs


def pressure_rmse(models, params, test_pairs, key: str = "PRESSURE",
                  batch_size: int = 64, model_key: str = "pressure") -> float:
    """RMSE of the pressure model against test labels — the accuracy metric
    from BASELINE.md's measurement plan."""
    plotter = ModelPlotter(models, params, test_pairs, batch_size=batch_size,
                           model_key=model_key)
    feats, labels = test_pairs[0]
    feats = np.asarray(feats)
    if feats.ndim == 5:
        feats = feats[None]
    pred = plotter.predict(feats)[..., 0]
    true = np.asarray(labels[key]) if isinstance(labels, dict) else np.asarray(labels)
    true = true.reshape(pred.shape)
    return float(np.sqrt(np.mean((pred - true) ** 2)))


def saturation_rmse(models, params, test_pairs, key: str = "SGAS",
                    batch_size: int = 64) -> float:
    """RMSE of the GC saturation model against SGAS test labels."""
    return pressure_rmse(models, params, test_pairs, key=key,
                         batch_size=batch_size, model_key="saturation_model")
