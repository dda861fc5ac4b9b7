"""Normalization/statistics golden tests (correctness linchpin — the physics
loss denormalizes its inputs through these maps)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srm_tpu.utils.stats import (
    DataSummary, normalize, denormalize, normalize_diff, normalize_derivative,
    compute_statistics,
)

STATS = {
    "z": {"min": 40.0, "max": 40.0, "mean": 40.0, "std": 0.0, "shape": [1]},
    "y": {"min": 37.18, "max": 2862.8, "mean": 1450.0, "std": 830.0, "shape": [1]},
    "x": {"min": 37.18, "max": 2862.8, "mean": 1450.0, "std": 830.0, "shape": [1]},
    "time": {"min": 0.0, "max": 255.0, "mean": 127.5, "std": 75.0, "shape": [1]},
    "permx": {"min": 0.26, "max": 24.0, "mean": 2.96, "std": 1.43, "shape": [1]},
}
CFG = {"feature_normalization_method": "lnk-linear-scaling", "normalization_limits": [-1.0, 1.0]}


def test_linear_roundtrip():
    ds = DataSummary([STATS])
    row = jnp.asarray(ds.row("time"))
    x = jnp.linspace(0.0, 255.0, 11)
    xn = normalize(x, row, method="lnk-linear-scaling", is_log=False)
    assert float(xn.min()) == pytest.approx(-1.0)
    assert float(xn.max()) == pytest.approx(1.0)
    back = denormalize(xn, row, method="lnk-linear-scaling", is_log=False)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5, atol=1e-4)


def test_log_roundtrip_permeability():
    ds = DataSummary([STATS])
    assert ds.is_log_np[ds.get_key_index("permx")]
    row = jnp.asarray(ds.row("permx"))
    x = jnp.asarray([0.26, 1.0, 3.0, 24.0])
    xn = normalize(x, row, method="lnk-linear-scaling", is_log=True)
    assert float(xn[0]) == pytest.approx(-1.0, abs=1e-5)
    assert float(xn[-1]) == pytest.approx(1.0, abs=1e-5)
    back = denormalize(xn, row, method="lnk-linear-scaling", is_log=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4)


def test_zscore():
    ds = DataSummary([STATS])
    row = jnp.asarray(ds.row("time"))
    x = jnp.asarray([127.5, 202.5])
    xn = normalize(x, row, method="z-score")
    np.testing.assert_allclose(np.asarray(xn), [0.0, 1.0], atol=1e-6)


def test_normalize_diff_linear_scale():
    ds = DataSummary([STATS])
    row = jnp.asarray(ds.row("time"))
    d = jnp.asarray(5.0)
    dn = normalize_diff(d, row, method="lnk-linear-scaling", is_log=False)
    # scale = (b-a)/(max-min) = 2/255
    assert float(dn) == pytest.approx(2.0 / 255.0 * 5.0, rel=1e-6)
    # derivative of the normalization map matches
    dv = normalize_derivative(row, method="lnk-linear-scaling", is_log=False)
    assert float(dv) == pytest.approx(2.0 / 255.0, rel=1e-6)


def test_channelwise_map():
    ds = DataSummary([STATS])
    cfg = CFG
    x = np.stack([np.full((4, 4), 127.5), np.full((4, 4), 3.0)], axis=-1).astype(np.float32)
    idx = np.array([[0, 1], [3, 4]])  # channel0→time row, channel1→permx row
    out = np.asarray(ds.normalize(x, cfg, idx, compute=True))
    assert out[..., 0].mean() == pytest.approx(0.0, abs=1e-6)
    # permx=3.0 log-normalized: 2*log(3/0.26)/log(24/0.26)-1
    expect = 2 * np.log(3.0 / 0.26) / np.log(24.0 / 0.26) - 1
    assert out[..., 1].mean() == pytest.approx(expect, rel=1e-3)
    back = np.asarray(ds.nonormalize(out, cfg, idx, compute=True))
    np.testing.assert_allclose(back[..., 0], 127.5, rtol=1e-4)
    np.testing.assert_allclose(back[..., 1], 3.0, rtol=1e-4)


def test_nan_scrub():
    ds = DataSummary([STATS])
    row = jnp.asarray(ds.row("z"))  # min==max → division by zero
    out = normalize(jnp.asarray([40.0]), row, method="lnk-linear-scaling")
    assert np.isfinite(np.asarray(out)).all()


def test_compute_statistics_keys():
    f = np.random.rand(2, 3, 1, 4, 4, 5).astype(np.float32)
    stats = compute_statistics(f, ["z", "y", "x", "time", "permx"])
    assert set(stats) == {"z", "y", "x", "time", "permx"}
    assert stats["time"]["shape"] == [2, 3, 1, 4, 4]
