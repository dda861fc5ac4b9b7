"""Serving export (jax.export StableHLO artifacts) round-trip.

The exported artifact must reproduce the live SRMPredictor bit-for-bit on
the same inputs, serve arbitrary batch sizes through its symbolic batch
dimension, and load with no model classes or config state.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dg_predictor(dg13_case):
    from srm_tpu.eval.predictor import SRMPredictor
    proc = dg13_case["processor"]
    pred = SRMPredictor(dg13_case["models"], dg13_case["params"],
                        dg13_case["data_summary"],
                        general_config=dg13_case["general_config"],
                        reservoir_config=proc.reservoir_config, batch_size=16)
    permx = proc.generate_kle_splits()["test"][:2]
    return pred, permx


def test_export_roundtrip_matches_predictor(dg_predictor, tmp_path):
    from srm_tpu.eval.serving import export_surrogate, load_surrogate

    pred, permx = dg_predictor
    out = str(tmp_path / "bundle")
    paths = export_surrogate(pred, out, fields=("pressure",),
                             platforms=("cpu",))
    assert set(paths) == {"pressure"}

    srv = load_surrogate(out)
    assert srv.fields == ["pressure"]
    assert srv.manifest["grid"] == [1, 13, 13]

    times = [0.0, 10.0, 50.0]
    live = pred.predict_pressure(permx, times)           # (K, T, 1, H, W)
    K, T = live.shape[:2]

    # flatten the (K, T) grid into a batch exactly as the predictor does
    permx_flat = np.repeat(permx, T, axis=0)             # (K*T, 1, H, W)
    t_flat = np.tile(np.asarray(times, np.float32), K)
    served = srv("pressure", permx_flat, t_flat)
    np.testing.assert_allclose(
        served.reshape(live.shape), live, rtol=1e-5, atol=1e-3)

    # hard IC survives the export
    t0 = served.reshape(K, T, *served.shape[1:])[:, 0]
    np.testing.assert_allclose(t0, 5000.0, rtol=1e-5)


def test_export_symbolic_batch(dg_predictor, tmp_path):
    """One artifact serves every batch size (shape-polymorphic export)."""
    from srm_tpu.eval.serving import export_surrogate, load_surrogate

    pred, permx = dg_predictor
    out = str(tmp_path / "bundle")
    export_surrogate(pred, out, fields=("pressure",), platforms=("cpu",))
    srv = load_surrogate(out)

    vol = permx.shape[1:]                     # (1, H, W); permx is (K, 1, H, W)
    for b in (1, 3, 7):
        px = np.broadcast_to(permx[0], (b,) + vol).copy()
        p = srv("pressure", px, np.linspace(0.0, 50.0, b, dtype=np.float32))
        assert p.shape == (b,) + vol
        assert np.isfinite(p).all()


def test_serving_needs_no_python_stack(dg_predictor, tmp_path):
    """The bundle loads from disk alone: a fresh ServingSurrogate built only
    from the directory (no models/params/summary objects) must serve."""
    from srm_tpu.eval.serving import ServingSurrogate, export_surrogate

    pred, permx = dg_predictor
    out = str(tmp_path / "bundle")
    export_surrogate(pred, out, fields=("pressure",), platforms=("cpu",))

    srv = ServingSurrogate(out)
    p = srv("pressure", permx, np.array([5.0, 25.0], np.float32))
    assert p.shape == permx.shape
    assert np.isfinite(p).all()


def test_cli_export_gc(tmp_path, capsys):
    """`srm_tpu export --fluid GC` writes a bundle with BOTH heads that
    loads and serves from the directory alone."""
    from srm_tpu.__main__ import main
    from srm_tpu.eval.serving import load_surrogate

    out_dir = tmp_path / "bundle"
    rc = main(["export", "--fluid", "GC", "--nx", "9", "--realizations", "4",
               "--base-dir", str(tmp_path), "--out-dir", str(out_dir),
               "--platforms", "cpu"])
    assert rc in (0, None)
    assert "serving bundle written" in capsys.readouterr().out

    srv = load_surrogate(str(out_dir))
    assert srv.fields == ["pressure", "saturation"]
    px = np.exp(np.random.RandomState(0).randn(2, 1, 9, 9).astype(np.float32))
    for field in srv.fields:
        o = srv(field, px, np.array([0.0, 30.0], np.float32))
        assert o.shape == (2, 1, 9, 9)
        assert np.isfinite(o).all()
