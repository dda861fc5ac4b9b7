"""Residual network (Model 2: learned adaptive PDE time step).

TPU-native redesign of the reference ``ResidualNetworkLayer``
(``/root/reference/residual_neural_network_subclassed.py:21-371``):
a stack of residual blocks (cnn / cnn3d / dense), then one of three heads:

* plain 1×1 conv (or Dense) + output activation — used with the scaled
  ``x·tanh(x)`` activation bounding the time step to
  (min_srm_timestep, max_srm_timestep] in the dry-gas case;
* ``output_distribution``: GlobalAvgPool → Dense(num_bins) → Softmax, the
  time step as a categorical distribution over bins (ref :230-238, 328-344);
* VAE-style latent sampling head (ref :284-305).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from srm_tpu.nn.common import fold_time, get_activation, get_initializer

Array = jnp.ndarray


class ResidualBlock(nn.Module):
    """conv→[BN]→act→[dropout]→conv→[BN] + (projected) shortcut (ref :21-154)."""

    filters: int
    kernel_size: int = 3
    strides: int = 1
    activation: Any = "swish"
    use_batch_norm: bool = False
    dropout_rate: float = 0.0
    use_projection: bool = False
    network_type: str = "cnn"
    kernel_init_name: str = "glorot_normal"
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        act = get_activation(self.activation)
        init = get_initializer(self.kernel_init_name)
        nt = self.network_type.lower()
        use_bias = not self.use_batch_norm
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None

        def make(name, k=None, f=None, s=1):
            f = f or self.filters
            if nt == "cnn":
                return nn.Conv(f, (k or self.kernel_size,) * 2, strides=s,
                               padding="SAME", use_bias=use_bias, kernel_init=init,
                               dtype=cdt, name=name)
            if nt == "cnn3d":
                return nn.Conv(f, (k or self.kernel_size,) * 3, strides=s,
                               padding="SAME", use_bias=use_bias, kernel_init=init,
                               dtype=cdt, name=name)
            return nn.Dense(f, kernel_init=init, dtype=cdt, name=name)

        shortcut = x
        y = make("layer1", s=self.strides)(x)
        if self.use_batch_norm:
            y = nn.BatchNorm(use_running_average=not training, name="bn1")(y)
        y = act(y)
        if self.dropout_rate > 0:
            y = nn.Dropout(self.dropout_rate, deterministic=not training)(y)
        y = make("layer2")(y)
        if self.use_batch_norm:
            y = nn.BatchNorm(use_running_average=not training, name="bn2")(y)

        if self.use_projection and shortcut.shape != y.shape:
            shortcut = make("proj", k=1, s=self.strides)(shortcut)
            if self.use_batch_norm:
                shortcut = nn.BatchNorm(use_running_average=not training,
                                        name="bn_proj")(shortcut)
        return act(y + shortcut)


class ResidualNetworkLayer(nn.Module):
    num_blocks: int = 4
    filters: int = 32
    kernel_size: int = 3
    activation: Any = "swish"
    output_activation: Any = None
    output_filters: int = 1
    kernel_init_name: str = "glorot_normal"
    network_type: str = "cnn"
    use_batch_norm: bool = False
    dropout_rate: float = 0.0
    latent_output: bool = False
    latent_a: float = 0.0
    latent_b: float = 1.0
    temporal: bool = False
    output_distribution: bool = False
    number_of_output_bins: int = 50
    include_output_layer: bool = True
    compute_dtype: str | None = None
    spatial_pad_to: Optional[int] = None   # pad H/W to a TPU-tile-friendly
                                           # size at entry, crop at the head
                                           # (the blocks run every layer at
                                           # full resolution — alignment is
                                           # worth ~2x wall on 39-wide grids)

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "ResidualNetworkLayer":
        return cls(
            num_blocks=config.get("num_blocks", 4),
            filters=config.get("filters", 32),
            kernel_size=config.get("kernel_size", 3),
            activation=config.get("hidden_activation", "swish"),
            output_activation=config.get("output_activation"),
            output_filters=config.get("output_filters", 1),
            kernel_init_name=(config.get("kernel_initializer", "glorot_normal")
                              if isinstance(config.get("kernel_initializer"), str)
                              else "glorot_normal"),
            network_type=config.get("network_type", "cnn"),
            use_batch_norm=config.get("use_batch_norm", False),
            dropout_rate=config.get("dropout_rate", 0.0),
            temporal=config.get("temporal", False),
            output_distribution=config.get("output_distribution", False),
            number_of_output_bins=config.get("number_of_output_bins", 50),
            compute_dtype=config.get("compute_dtype"),
            spatial_pad_to=config.get("spatial_pad_to"),
        )

    @nn.compact
    def __call__(self, inputs: Array, training: bool = False) -> Array:
        init = get_initializer(self.kernel_init_name)
        x, unfold = fold_time(inputs, self.temporal)
        nt = self.network_type.lower()
        pad_hw = None
        if self.spatial_pad_to and nt in ("cnn", "cnn3d"):
            h_axis = x.ndim - 3          # (..., H, W, C)
            true_hw = (x.shape[h_axis], x.shape[h_axis + 1])
            pad_hw = [max(self.spatial_pad_to - s, 0) for s in true_hw]
            if any(pad_hw):
                pads = [(0, 0)] * x.ndim
                pads[h_axis] = (0, pad_hw[0])
                pads[h_axis + 1] = (0, pad_hw[1])
                x = jnp.pad(x, pads)
        for i in range(self.num_blocks):
            x = ResidualBlock(filters=self.filters, kernel_size=self.kernel_size,
                              activation=self.activation, use_batch_norm=self.use_batch_norm,
                              dropout_rate=self.dropout_rate, use_projection=(i == 0),
                              network_type=self.network_type,
                              kernel_init_name=self.kernel_init_name,
                              compute_dtype=self.compute_dtype,
                              name=f"res_block_{i+1}")(x, training=training)

        if pad_hw is not None and any(pad_hw):
            h_axis = x.ndim - 3
            sl = [slice(None)] * x.ndim
            sl[h_axis] = slice(0, true_hw[0])
            sl[h_axis + 1] = slice(0, true_hw[1])
            x = x[tuple(sl)]

        if not self.include_output_layer:
            return unfold(x)

        if self.output_distribution:
            # GlobalAvgPool over spatial dims → Dense(bins) → softmax, shaped
            # back to (B, 1, 1, bins) (ref :328-344)
            spatial_axes = tuple(range(1, x.ndim - 1))
            pooled = jnp.mean(x, axis=spatial_axes)
            logits = nn.Dense(self.number_of_output_bins, kernel_init=init,
                              name="timestep_dense")(pooled)
            probs = nn.softmax(logits, axis=-1)
            probs = probs.reshape((probs.shape[0],) + (1,) * len(spatial_axes)
                                  + (self.number_of_output_bins,))
            return unfold(probs)

        if self.latent_output:
            pooled = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
            z_mean = nn.Dense(self.output_filters, name="z_mean")(pooled)
            z_log_var = nn.Dense(self.output_filters, name="z_log_var")(pooled)
            eps = jax.random.normal(self.make_rng("sample"), z_mean.shape)
            z = z_mean + jnp.exp(0.5 * z_log_var) * eps
            z = (self.latent_b - self.latent_a) * nn.sigmoid(z) + self.latent_a
            z = z.reshape((z.shape[0],) + (1,) * (x.ndim - 2) + (self.output_filters,))
            out = jnp.broadcast_to(z, x.shape[:-1] + (self.output_filters,))
            return unfold(get_activation(self.output_activation)(out))

        nd = 3 if self.network_type.lower() == "cnn3d" else 2
        if self.network_type.lower() == "dense":
            out = nn.Dense(self.output_filters, kernel_init=init, name="output_layer")(x)
        else:
            out = nn.Conv(self.output_filters, (1,) * nd, padding="SAME",
                          kernel_init=init, name="output_layer")(x)
        out = get_activation(self.output_activation)(out)
        if self.compute_dtype:
            out = out.astype(jnp.float32)
        return unfold(out)
