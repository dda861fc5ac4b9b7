"""KLE dataset-factory tests (file layout + Eclipse deck export)."""

import json
import os

import numpy as np

from srm_tpu.data.kle_generator import (
    KLConfig, generate_and_save_realizations, write_permx_dat,
)


def test_write_permx_dat(tmp_path):
    field = np.arange(1.0, 1.0 + 2 * 3 * 4).reshape(1, 1, 24)[0].reshape(1, 4, 6)
    path = str(tmp_path / "PERMX_0000.dat")
    write_permx_dat(field, path)
    text = open(path).read()
    assert text.startswith("PERMX\n")
    assert text.strip().endswith("/")
    vals = [float(v) for line in text.splitlines()[1:-1] for v in line.split()]
    assert len(vals) == 24
    np.testing.assert_allclose(vals, field.reshape(-1))


def test_generate_and_save_layout(tmp_path):
    cfg = KLConfig(n_realizations=6, Nx=8, Ny=8, Nz=1, Lx=100.0, Ly=100.0, Lz=10.0,
                   conditional_values={(3, 3, 0): 2.0}, split_ratio=(0.5, 0.0, 0.5))
    folder = generate_and_save_realizations(cfg, base_dir=str(tmp_path))
    assert os.path.isdir(folder)
    for fn in ["grid.json", "grid_x.npy", "realizations_all.npy",
               "realizations_train.npy", "realizations_test.npy", "split_info.json",
               "summary_train.json"]:
        assert os.path.isfile(os.path.join(folder, fn)), fn
    info = json.load(open(os.path.join(folder, "split_info.json")))
    assert info["counts"]["train"] == 3
    assert info["counts"]["test"] == 3
    # Eclipse decks exist for each split realization
    dat_dirs = [d for d in os.listdir(folder) if d.startswith("dat_files_train_")]
    assert dat_dirs
    dats = os.listdir(os.path.join(folder, dat_dirs[0], "static"))
    assert len(dats) == 3
