"""Scaling harness smoke tests on the virtual CPU mesh."""

import numpy as np
import pytest

from test_model_parity import make_weights
from utils import TINY_CONFIG

from qwen3_rs_tpu.parallel.distributed import scaling_report


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    _, weights = make_weights(TINY_CONFIG, rng)
    return TINY_CONFIG, weights


def test_scaling_report_runs(setup):
    config, weights = setup
    report = scaling_report(
        config, weights, device_counts=[1, 2], tp_per_group=1, batch_per_dp=1, steps=8
    )
    assert set(report["throughput"]) == {1, 2}
    assert report["efficiency"][1] == pytest.approx(1.0)
    assert report["efficiency"][2] > 0  # CPU-mesh efficiency is not meaningful,
    # only that the dp=2 path executes end to end.


def test_scaling_report_tp(setup):
    config, weights = setup
    report = scaling_report(
        config, weights, device_counts=[2], tp_per_group=2, batch_per_dp=2, steps=4
    )
    assert 2 in report["throughput"]
