"""CLI flag-system parity tests (`tt_utils.py:17-85` semantics)."""

import numpy as np
import pytest

from falcon_ttdforgnns_tpu.utils.config import parse_args, apply_preset, DATASET_PRESETS


def test_defaults_match_reference():
    a = parse_args([])
    assert a.batch == 1024
    assert a.fan_out == [5, 10, 15]
    assert a.tt_rank == [16, 16]
    assert a.num_hidden == 256
    assert a.num_layers == 3
    assert a.lr == 0.003
    assert a.use_tt and a.use_sample


def test_partition_flag_semantics():
    a = parse_args(["--partition", "-2"])
    assert a.partition == -2
    a = parse_args(["--partition", "128"])
    assert a.partition == 128


def test_int_lists():
    a = parse_args(["--fan-out", "3,4", "--tt-rank", "8,8",
                    "--p-shapes", "50,60,60", "--q-shapes", "8,4,4"])
    assert a.fan_out == [3, 4]
    assert a.p_shapes == [50, 60, 60]


def test_presets():
    a = apply_preset(parse_args(["--dataset", "ogbn-products"]))
    assert a.p_shapes == [125, 140, 140]
    assert a.q_shapes == [5, 5, 4]  # the reference default (tt_utils.py:57)
    a = apply_preset(parse_args(["--dataset", "ogbn-papers100M"]))
    assert a.p_shapes == [400, 500, 600]
    # explicit shapes win over presets
    a = apply_preset(parse_args(["--dataset", "ogbn-products",
                                 "--p-shapes", "1,2,3"]))
    assert a.p_shapes == [1, 2, 3]


def test_no_tt():
    a = parse_args(["--no-tt"])
    assert not a.use_tt


def test_smoke_run_one(tmp_path):
    """End-to-end CLI dispatch: one fwd/bwd step on a tiny synthetic
    dataset (the reference's --run-one, `sage_profiler.py:715-787`)."""
    from falcon_ttdforgnns_tpu.cli import main
    main(["--device", "cpu", "--model", "sage", "--dataset", "tiny-test",
          "--synthetic-scale", "1.0", "--batch", "32", "--fan-out", "3,3",
          "--num-hidden", "16", "--num-layers", "2", "--tt-rank", "4,4",
          "--init", "normal", "--run-one",
          "--log-dir", str(tmp_path), "--ckpt-dir", str(tmp_path)])
