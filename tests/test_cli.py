"""CLI smoke tests (in-process; CPU)."""

import os

import numpy as np
import pytest

from mixedprecisionblockqr_tpu.cli import main


def test_cli_dataset_qr_solve_plot(tmp_path):
    d = str(tmp_path)
    assert main(["dataset", "--out", f"{d}/jac", "--sizes", "64x32,48x24"]) == 0
    assert os.path.exists(f"{d}/jac/A_000000100.txt")
    assert (
        main(
            ["qr", "--m", "96", "--n", "64", "--block-size", "32",
             "--policy", "fp32", "--log-dir", f"{d}/log"]
        )
        == 0
    )
    assert (
        main(
            ["qr", "--file", f"{d}/jac/A_000000100.txt", "--block-size", "16",
             "--log-dir", f"{d}/log"]
        )
        == 0
    )
    assert (
        main(
            ["solve", "--m", "128", "--n", "48", "--block-size", "16",
             "--log-dir", f"{d}/log"]
        )
        == 0
    )
    assert main(["plot", f"{d}/log/tpu_block_fp32.txt", "--out", f"{d}/p"]) == 0
    assert os.listdir(f"{d}/p")


def test_cli_qr_conditioned(tmp_path):
    assert (
        main(
            ["qr", "--n", "64", "--cond", "1000", "--block-size", "16",
             "--policy", "fp32", "--panel-method", "cholqr2s",
             "--log-dir", str(tmp_path)]
        )
        == 0
    )


def test_cli_suite_quick(tmp_path):
    assert (
        main(["suite", "--quick", "--max-jacobians", "0",
              "--log-dir", str(tmp_path)])
        == 0
    )


def test_cli_dist(tmp_path):
    assert (
        main(["dist", "--m", "128", "--n", "64", "--block-size", "16",
              "--policy", "fp32", "--log-dir", str(tmp_path)])
        == 0
    )
