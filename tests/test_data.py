"""Data-engine tests: KLE, weaving, splits, batching."""

import numpy as np
import pytest

from srm_tpu.data.kle import generate_kle_numpy, split_realizations
from srm_tpu.data.weave import (
    weave_tensors, create_positional_grids, split_tensor_sequence,
)
from srm_tpu.data.batching import BatchGenerator, collapse_axes_fortran
from srm_tpu.data.dataset import SRMDataProcessor


def test_kle_shapes_and_conditioning():
    cond = {(5, 5, 0): 2.0, (1, 8, 0): 0.5}
    fields, modes, grid = generate_kle_numpy(
        4, Nx=10, Ny=10, Nz=1, Lx=100.0, Ly=100.0, Lz=10.0,
        real_mean=3.0, real_std=1.5, seed=2000, reverse_order=True, cond_values=cond)
    assert fields.shape == (4, 1, 10, 10)
    assert modes >= 1
    assert (fields > 0).all()
    # kriging honors observations exactly (up to float32): fields are (n, Nz, Ny, Nx)
    np.testing.assert_allclose(fields[:, 0, 5, 5], 2.0, rtol=1e-3)
    np.testing.assert_allclose(fields[:, 0, 8, 1], 0.5, rtol=1e-3)


def test_kle_deterministic():
    a, _, _ = generate_kle_numpy(2, Nx=6, Ny=6, Nz=1, seed=7)
    b, _, _ = generate_kle_numpy(2, Nx=6, Ny=6, Nz=1, seed=7)
    np.testing.assert_array_equal(a, b)


def test_kle_jax_matches_distribution():
    import jax
    from srm_tpu.data.kle import generate_kle_jax
    fields, modes = generate_kle_jax(jax.random.PRNGKey(0), 64, Nx=8, Ny=8, Nz=1,
                                     Lx=100.0, Ly=100.0, Lz=10.0, real_mean=3.0, real_std=1.5)
    f = np.asarray(fields)
    assert f.shape == (64, 1, 8, 8)
    assert abs(np.log(f).mean() - (np.log(3.0) - 0.5 * np.log(1 + 0.25))) < 0.3


def test_weave_channel_order():
    K, T, Nz, Ny, Nx = 3, 4, 1, 5, 6
    permx = np.random.rand(K, Nz, Ny, Nx).astype(np.float32)
    time = np.arange(T, dtype=np.float32).reshape(T, 1)
    x = np.random.rand(1, Nz, Ny, Nx).astype(np.float32)
    y = np.random.rand(1, Nz, Ny, Nx).astype(np.float32)
    z = np.random.rand(1, Nz, Ny, Nx).astype(np.float32)
    woven = weave_tensors([permx, time, x, y, z], target_trailing_shape=(Nz, Ny, Nx))
    assert woven.shape == (K, T, Nz, Ny, Nx, 5)
    # flipped channel order: [z, y, x, time, permx]
    np.testing.assert_allclose(woven[0, 0, ..., 0], z[0])
    np.testing.assert_allclose(woven[0, 2, ..., 3], 2.0)
    np.testing.assert_allclose(woven[1, 0, ..., 4], permx[1])


def test_positional_grids_midpoints():
    grids = create_positional_grids([100.0, 50.0, 10.0], [4, 5, 1],
                                    transpose_order=[2, 1, 0])
    X, Y, Z = grids
    assert X.shape == (1, 5, 4)
    np.testing.assert_allclose(X[0, 0, :], [12.5, 37.5, 62.5, 87.5])
    np.testing.assert_allclose(Z[0, 0, 0], 5.0)


def test_split_tensor_sequence():
    arr = np.arange(100 * 10).reshape(100, 10)
    tr, va, te = split_tensor_sequence([arr], {0: (0.3, 0.0, 0.7), 1: (0.7, 0.0, 0.3)}, [0, 1])
    assert tr[0].shape == (30, 7)
    assert va[0].shape == (0, 0)
    assert te[0].shape == (70, 3)


def test_collapse_axes_fortran():
    a = np.arange(2 * 3 * 4).reshape(2, 3, 4)
    flat = collapse_axes_fortran(a, [0, 1])
    assert flat.shape == (6, 4)
    # Fortran order: first axis varies fastest
    np.testing.assert_array_equal(flat[0], a[0, 0])
    np.testing.assert_array_equal(flat[1], a[1, 0])
    np.testing.assert_array_equal(flat[2], a[0, 1])
    # C order: last axis varies fastest (full reference BatchGenerator
    # parity, ref training.py:150-229; VERDICT r3 item 8)
    flat_c = collapse_axes_fortran(a, [0, 1], order="C")
    np.testing.assert_array_equal(flat_c[0], a[0, 0])
    np.testing.assert_array_equal(flat_c[1], a[0, 1])
    np.testing.assert_array_equal(flat_c[3], a[1, 0])


def test_batch_generator_c_order():
    K, T = 3, 4
    feats = np.arange(K * T * 2, dtype=np.float32).reshape(K, T, 2)
    gen = BatchGenerator([(feats, feats.copy())], batch_size=4, shuffle=False,
                         collapse_order="C")
    x, _ = gen[0]
    np.testing.assert_array_equal(x[1], feats[0, 1])


def test_batch_generator():
    K, T = 6, 5
    feats = np.random.rand(K, T, 1, 4, 4, 5).astype(np.float32)
    labels = {"PRESSURE": np.zeros((K, T, 1, 4, 4), np.float32)}
    gen = BatchGenerator([(feats, labels)], batch_size=8, shuffle=True, seed=0)
    assert gen.N == 30
    assert len(gen) == 3  # drop remainder
    x, y = gen[0]
    assert x.shape == (8, 1, 4, 4, 5)
    assert y["PRESSURE"].shape == (8, 1, 4, 4)
    xb, yb = gen.epoch_batches()
    assert xb.shape == (3, 8, 1, 4, 4, 5)
    gen.on_epoch_end()


def test_dataset_end_to_end_small(tmp_path):
    proc = SRMDataProcessor(base_dir=str(tmp_path))
    # shrink the problem for test speed
    proc.reservoir_config["Nx"] = proc.reservoir_config["Ny"] = 13
    proc.reservoir_config["realizations"]["permx"]["number"] = 10
    proc.reservoir_config["realizations"]["permx"]["conditional_values"] = {(5, 5, 0): 2.0}
    path, tr, va, te, pr = proc.get_or_generate_training_data()
    f, l = tr[0]
    assert f.shape[-1] == 5
    assert f.shape[0] == 3       # 30% of 10 realizations
    assert set(l) == {"PRESSURE"}
    # normalized features in [-1, 1]
    assert f.min() >= -1.0001 and f.max() <= 1.0001
    # cache round-trip
    path2, tr2, *_ = proc.get_or_generate_training_data()
    assert path2 == path
    np.testing.assert_allclose(tr2[0][0], f)
    # a killed writer's truncated cache must regenerate, not crash
    with open(path, "wb") as fh:
        fh.write(b"PK\x03\x04 truncated")
    path3, tr3, *_ = proc.get_or_generate_training_data()
    assert path3 == path
    np.testing.assert_allclose(tr3[0][0], f)
    # and the regenerated file is a valid npz again
    import zipfile
    assert zipfile.ZipFile(path).namelist()
