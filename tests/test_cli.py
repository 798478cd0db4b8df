"""CLI coverage (the reference has no CLI; this one is ours)."""

import h5py
import numpy as np
import pytest

from deeprank_gnn_tpu.cli import build_parser, main


def test_parser_subcommands():
    p = build_parser()
    args = p.parse_args(
        ["graphgen", "--pdb", "x", "--out", "y.hdf5", "--nproc", "2"]
    )
    assert args.cmd == "graphgen" and args.nproc == 2
    args = p.parse_args(
        ["train", "--database", "d.hdf5", "--target", "fnat", "--epochs", "3"]
    )
    assert args.epochs == 3 and args.model == "GINet"
    with pytest.raises(SystemExit):
        p.parse_args(["train"])  # missing --database


def test_cli_add_target_and_csv(tmp_path, fixture_hdf5):
    lst = tmp_path / "t.lst"
    with open(lst, "w") as f:
        for i in range(1, 11):
            f.write(f"1ATN_{i}w {i * 0.1}\n")
    main(["add-target", fixture_hdf5, "cli_target", str(lst)])
    with h5py.File(fixture_hdf5) as f:
        np.testing.assert_allclose(
            f["1ATN_3w/score/cli_target"][()], 0.3
        )


def test_cli_unknown_model(tmp_path, fixture_hdf5):
    with pytest.raises(SystemExit):
        main(
            [
                "train",
                "--database",
                fixture_hdf5,
                "--model",
                "NotAModel",
                "--epochs",
                "1",
            ]
        )
