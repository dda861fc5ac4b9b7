"""Convolutional encoder–decoder over 2D/3D grids with optional temporal axis.

TPU-native redesign of the reference ``EncoderDecoderModel``
(``/root/reference/EncoderDecoderSubclassed.py:74-969``). The exact geometry
is reproduced — it is a parity-critical detail for non-power-of-2 grids
(39×39):

encoder (depth=4, k=3):
  L1: Conv(k, s=1, VALID)                       39 → 37
  L2: ZeroPad(1) → Conv(k+2, s=2, VALID)        37 → 39 → 18
  L3: ZeroPad(1) → Conv(k+2, s=2, VALID)        18 → 20 → 8
  L4: ZeroPad(1) → Conv(k,   s=2, VALID)         8 → 10 → 4
  (+2 extra SAME convs), filters [32, 48, 72, 108] (geometric 1.5x, even)
latent: Dense stack on channels (no flatten by default)
decoder: [dense-start if innermost skip] → {ConvTranspose(k, s=2, VALID) →
  skip pad/project/add → act} ×(depth-1):                4 → 9 → 19 → 39
  → bilinear resize only if the shape still mismatches → extra SAME convs →
  Dense → 1×1 conv to input channels → out-activation → 1×1 projection to
  output_filters.

Differences from the reference, all deliberate:
* TimeDistributed wrappers become a single (B,T)→B*T fold (same weight
  sharing, zero overhead under XLA).
* Skip tensors are returned functionally instead of stored as layer
  attributes (the reference's encoder mutates ``self.skip_connections`` at
  call time — unsafe under tracing; ref :268).
* Skip channel projections live where they are used (decoder) and project to
  the decoder's current width, equivalent to the reference's
  Dense(filter_list[level]) when Decoder_Filter_Fac == 1.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from srm_tpu.nn.common import fold_time, get_activation, get_initializer, network_width_list
from srm_tpu.parallel.mesh import constrain_spatial

Array = jnp.ndarray


def _skip_layers_list(residual_params: Dict) -> list:
    sc = residual_params.get("Skip_Connections", {}) or {}
    if not sc.get("Add", False):
        return []
    layers = sc.get("Layers", [])
    if layers and isinstance(layers[0], (list, tuple)):
        layers = layers[0]
    return list(layers)


class EncoderDecoderModel(nn.Module):
    """Encoder–decoder with HardLayer-free output (pressure / saturation net)."""

    depth: int = 4
    width: Tuple[int, float] = (32, 1.5)           # (Bottom_Size, Growth_Rate)
    spatial_dims: int = 2
    temporal: bool = False
    output_filters: int = 1
    kernel_size: int = 3
    kernel_init_name: str = "glorot_normal"
    activation: Any = "swish"
    out_activation: Any = None
    dropout_rate: float = 0.0
    dropout_layers: Tuple[int, ...] = ()
    skip_layers: Tuple[int, ...] = ()              # 1/0 per encoder level
    decoder_filter_fac: float = 1.0
    latent_flatten: bool = False
    latent_depth: int = 1
    latent_width: int = 128
    latent_activation: Any = None
    extra_conv_layers: int = 2
    extra_dec_conv_layers: int = 2
    compute_dtype: Optional[str] = None   # e.g. 'bfloat16' for MXU-friendly
                                          # compute; params stay float32
    f32_io: bool = False                  # mixed policy: keep the first conv
                                          # (5-channel input) and the final
                                          # dense/1x1 output chain in float32
                                          # while the bulk runs compute_dtype
    spatial_pad_to: Optional[int] = None  # pad H/W up to this size at entry
                                          # and crop back at the output: 39 is
                                          # the worst possible TPU tile count,
                                          # padding to 48 measured 2.7x faster
                                          # f32 conv wall-clock (tools/mfu_probe)

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "EncoderDecoderModel":
        rp = config.get("residual_params", {}) or {}
        w = config.get("width", {"Bottom_Size": 32, "Growth_Rate": 1.5})
        drop = rp.get("Dropout", {}) or {}
        lat = rp.get("Latent_Layer", {}) or {}
        return cls(
            depth=config.get("depth", 4),
            width=(w["Bottom_Size"], w["Growth_Rate"]),
            spatial_dims=config.get("spatial_dims", 2),
            temporal=config.get("temporal", False),
            output_filters=config.get("output_filters", 1),
            kernel_size=rp.get("Kernel_Size", 3),
            kernel_init_name=rp.get("Kernel_Init", "glorot_normal"),
            activation=rp.get("Activation_Func", "swish"),
            out_activation=rp.get("Out_Activation_Func"),
            dropout_rate=drop.get("Rate", 0.0) if drop.get("Add", False) else 0.0,
            dropout_layers=tuple(drop.get("Layer", []) or ()),
            skip_layers=tuple(_skip_layers_list(rp)),
            decoder_filter_fac=rp.get("Decoder_Filter_Fac", 1.0),
            latent_flatten=lat.get("Flatten", False),
            latent_depth=lat.get("Depth", 1),
            latent_width=lat.get("Width", 128),
            latent_activation=lat.get("Activation"),
            extra_conv_layers=(rp.get("Extra_Conv_Layers", {}) or {}).get("Count", 0),
            extra_dec_conv_layers=(rp.get("Extra_Dec_Conv_Layers", {}) or {}).get("Count", 0),
            compute_dtype=config.get("compute_dtype"),
            f32_io=bool(config.get("f32_io", False)),
            spatial_pad_to=config.get("spatial_pad_to"),
        )

    def _filters(self) -> list[int]:
        return network_width_list(self.depth, self.width[0], ngens=self.depth,
                                  growth_rate=self.width[1], network_type="plain")

    def _use_skip(self, level_i: int) -> bool:
        return (level_i < len(self.skip_layers)
                and self.skip_layers[level_i] not in (None, 0))

    @nn.compact
    def __call__(self, inputs: Array, training: bool = False) -> Array:
        act = get_activation(self.activation)
        init = get_initializer(self.kernel_init_name)
        filters = self._filters()
        k = self.kernel_size
        nd = self.spatial_dims
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        # mixed-precision islands: the input conv and the output head carry
        # the field's absolute scale (thousands of psia) — bf16's 8-bit
        # mantissa costs ~3.8 psia converged RMSE there, while the interior
        # layers tolerate it (measured in tools/rmse_experiment.py --bf16)
        cdt_io = None if self.f32_io else cdt

        x, unfold = fold_time(inputs, self.temporal)
        # (data × space) mesh anchor: pin every conv-level activation so XLA
        # SPMD keeps one consistent plan through forward AND backward (the
        # constraint is its own transpose) instead of falling back to
        # "Involuntary full rematerialization" on the low-res interior.
        # No-op outside a trainer's activation_mesh_scope.
        h_ax = 1 + (nd - 2)
        x = constrain_spatial(x, h_ax)
        in_channels = x.shape[-1]
        true_spatial = x.shape[1:-1]
        # TPU tile alignment: zero-pad H/W up to spatial_pad_to before the
        # first conv; the output is cropped back after the decoder. (Depth is
        # left alone — it folds into sublane-friendly tiles already.)
        pad_hw = None
        if self.spatial_pad_to:
            h_axis = 1 + (nd - 2)               # (B, H, W, C) or (B, D, H, W, C)
            pad_hw = [max(self.spatial_pad_to - x.shape[h_axis + j], 0)
                      for j in range(2)]
            if any(pad_hw):
                pads = [(0, 0)] * x.ndim
                pads[h_axis] = (0, pad_hw[0])
                pads[h_axis + 1] = (0, pad_hw[1])
                x = jnp.pad(x, pads)
        target_spatial = x.shape[1:-1]

        # ---------------- encoder (ref EncoderLayer.build/call :104-285) -----
        skips: Dict[int, Array] = {}
        for i in range(self.depth):
            if i == 0:
                x = nn.Conv(dtype=cdt_io, features=filters[0], kernel_size=(k,) * nd, strides=1, padding="VALID",
                            kernel_init=init, name=f"enc_conv_{i+1}")(x)
            else:
                pad = [(0, 0)] + [(1, 1)] * nd + [(0, 0)]
                # the pad is anchored too: the conv input-gradient otherwise
                # back-propagates its own (spatially resharded) layout through
                # the pad's slice-transpose into the activation cotangents
                x = constrain_spatial(jnp.pad(x, pad), h_ax)
                ks = k + 2 if i < self.depth - 1 else k
                x = nn.Conv(dtype=cdt, features=filters[i], kernel_size=(ks,) * nd, strides=2, padding="VALID",
                            kernel_init=init, name=f"enc_conv_{i+1}")(x)
            x = constrain_spatial(x, h_ax)
            if self._use_skip(i):
                skips[i + 1] = x        # pre-activation, as in ref :267-268
            # anchor the post-activation tensor too: its cotangent feeds the
            # next conv's input gradient, which otherwise picks its own layout
            x = constrain_spatial(act(x), h_ax)
            if (self.dropout_rate > 0 and i < len(self.dropout_layers)
                    and self.dropout_layers[i] == 1):
                x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        for j in range(self.extra_conv_layers):
            x = nn.Conv(dtype=cdt, features=filters[-1], kernel_size=(k,) * nd, strides=1, padding="SAME",
                        kernel_init=init, name=f"enc_extra_conv_{j+1}")(x)
            x = act(constrain_spatial(x, h_ax))

        # ---------------- latent (ref EncoderDecoderModel :855-958) ----------
        lat_act = get_activation(self.latent_activation)
        if self.latent_flatten:
            shape = x.shape
            flat = x.reshape((shape[0], -1))
            total = flat.shape[-1]
            width = self.latent_width
            spatial_elems = int(jnp.prod(jnp.asarray(shape[1:-1])))
            if width < spatial_elems:
                width = spatial_elems
            channels = max(width // spatial_elems, 1)
            width = channels * spatial_elems
            flat = lat_act(nn.Dense(dtype=cdt, features=width, kernel_init=init, name="latent_dense")(flat))
            x = flat.reshape(shape[:-1] + (channels,))
        elif self.latent_depth > 0:
            for d in range(self.latent_depth):
                x = lat_act(nn.Dense(dtype=cdt, features=self.latent_width, kernel_init=init,
                                     name=f"latent_dense_{d}")(x))
        x = constrain_spatial(x, h_ax)

        # XLA:TPU miscompile guard: when the deconv chain will NOT land
        # exactly on the target grid (small grids: 9→15, 13→23 — the bilinear
        # resize path), the kernel XLA fuses across the latent→decoder
        # boundary computes NaN on TPU v5e for some batch sizes (eager and
        # CPU are clean; observed b∈{10,16} at 9², b=32 at 13²; repro:
        # tools/tpu_fusion_nan_repro.py). One optimization_barrier here stops
        # that fusion. Production grids (39²/39²×10) land exactly and keep
        # full fusion — the guard is statically off for them.
        pred_spatial = list(x.shape[1:-1])
        for _ in range(self.depth - 1):
            pred_spatial = [(s - 1) * 2 + k for s in pred_spatial]
        if tuple(pred_spatial) != tuple(target_spatial):
            x = jax.lax.optimization_barrier(x)
        # ---------------- decoder (ref DecoderLayer :316-735) ----------------
        innermost_skip = bool(self.skip_layers) and self.skip_layers[-1] == 1
        for i in range(self.depth):
            if i == 0:
                if innermost_skip:
                    x = act(nn.Dense(dtype=cdt, features=filters[self.depth - 1], kernel_init=init,
                                     name="dec_dense_start")(x))
            else:
                f = int(filters[self.depth - i - 1] * self.decoder_filter_fac)
                x = nn.ConvTranspose(dtype=cdt, features=f, kernel_size=(k,) * nd, strides=(2,) * nd, padding="VALID",
                                     kernel_init=init, name=f"dec_deconv_{self.depth-i}")(x)
            level = self.depth - i
            if level in skips:
                skip = skips[level]
                # center zero-pad skip to x's spatial shape (ref :470-562)
                pads = [(0, 0)]
                for s, t in zip(skip.shape[1:-1], x.shape[1:-1]):
                    diff = t - s
                    pads.append((diff // 2, diff - diff // 2))
                pads.append((0, 0))
                skip = jnp.pad(skip, pads)
                if skip.shape[-1] != x.shape[-1]:
                    skip = nn.Dense(dtype=cdt, features=x.shape[-1], kernel_init=init,
                                    name=f"skip_proj_{level}")(skip)
                x = x + skip
            x = act(constrain_spatial(x, h_ax))
            if (self.dropout_rate > 0 and (self.depth - i - 1) < len(self.dropout_layers)
                    and self.dropout_layers[self.depth - i - 1] == 1):
                x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)

        # resize back to the input spatial shape if needed (ref :643-719);
        # with the depth-4 geometry on 39x39 the deconvs land exactly on 39.
        if x.shape[1:-1] != target_spatial:
            if nd == 2:
                x = jax.image.resize(x, (x.shape[0],) + tuple(target_spatial) + (x.shape[-1],),
                                     method="bilinear")
            else:
                d_t, h_t, w_t = target_spatial
                x = jax.image.resize(x, (x.shape[0], x.shape[1], h_t, w_t, x.shape[-1]),
                                     method="bilinear")
                d_c = x.shape[1]
                if d_c > d_t:
                    start = (d_c - d_t) // 2
                    x = x[:, start:start + d_t]
                elif d_c < d_t:
                    diff = d_t - d_c
                    x = jnp.pad(x, [(0, 0), (diff // 2, diff - diff // 2),
                                    (0, 0), (0, 0), (0, 0)])
            x = constrain_spatial(x, h_ax)

        for j in range(self.extra_dec_conv_layers):
            x = nn.Conv(dtype=cdt, features=filters[0], kernel_size=(k,) * nd, strides=1, padding="SAME",
                        kernel_init=init, name=f"dec_extra_conv_{j+1}")(x)
            x = act(constrain_spatial(x, h_ax))

        if pad_hw is not None and any(pad_hw):
            # crop the alignment padding before the (full-resolution) output
            # head — the physics stencil sees the true grid only
            h_axis = 1 + (nd - 2)
            sl = [slice(None)] * x.ndim
            sl[h_axis] = slice(0, true_spatial[h_axis - 1])
            sl[h_axis + 1] = slice(0, true_spatial[h_axis])
            x = x[tuple(sl)]

        x = act(nn.Dense(dtype=cdt_io, features=int(filters[0] * self.decoder_filter_fac), kernel_init=init,
                         name="dec_final_dense")(x))
        x = nn.Conv(dtype=cdt_io, features=in_channels, kernel_size=(1,) * nd, padding="SAME", kernel_init=init,
                    name="dec_final_conv")(x)
        x = get_activation(self.out_activation)(x)
        if x.shape[-1] != self.output_filters:
            x = nn.Conv(dtype=cdt_io, features=self.output_filters, kernel_size=(1,) * nd, padding="SAME",
                        kernel_init=init, name="output_proj")(x)
        if cdt is not None:
            x = x.astype(jnp.float32)
        return unfold(constrain_spatial(x, h_ax))
