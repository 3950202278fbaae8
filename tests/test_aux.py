"""Aux subsystems: profiling timers, checkpoint round-trip, config env."""

import os

import jax
import numpy as np
import pytest

from videoquery.core.config import BrokerConfig, HyperParams, compute_eps, random_seed
from videoquery.core.profiling import StageTimer


def test_stage_timer_accumulates():
    import time

    t = StageTimer()
    with t.stage("a") as h:
        h.value = jax.numpy.ones((4,))
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0.02
    assert "a" in t.report()


def test_checkpoint_roundtrip(tmp_path):
    from videoquery.nn import bn_inception
    from videoquery.train.checkpoint import load_train_state, save_train_state
    from videoquery.train.trainer import TrainConfig, make_optimizer

    params = bn_inception.init_params(0, num_classes=5)
    opt_state = make_optimizer(TrainConfig(num_classes=5)).init(
        jax.tree.map(jax.numpy.asarray, params))
    path = str(tmp_path / "ckpt")
    save_train_state(path, params, opt_state, step=7)
    state = load_train_state(path, like={"params": params,
                                         "opt_state": opt_state,
                                         "step": np.asarray(7)})
    assert int(state["step"]) == 7
    np.testing.assert_allclose(
        np.asarray(state["params"]["conv1/7x7_s2"]["w"]),
        np.asarray(params["conv1/7x7_s2"]["w"]),
    )


def test_compute_eps_env(monkeypatch):
    monkeypatch.setenv("COMPUTE_EPS", "1e-4")
    assert compute_eps() == 1e-4
    monkeypatch.setenv("COMPUTE_EPS", "None")
    assert compute_eps() == 1e-6  # default when unset/None


def test_random_seed_env(monkeypatch):
    monkeypatch.setenv("RANDOM_SEED", "None")
    assert random_seed() is None
    monkeypatch.setenv("RANDOM_SEED", "42")
    assert random_seed() == 42
    monkeypatch.setenv("RANDOM_SEED", "hello")
    assert random_seed() == "hello"


def test_broker_config_env(monkeypatch):
    monkeypatch.setenv("BASE_URL", "http://x:1/")
    monkeypatch.setenv("BROKER_THREADING", "True")
    cfg = BrokerConfig.from_env()
    assert cfg.base_url == "http://x:1/"
    assert cfg.threading is True


def test_hyperparams_validation():
    with pytest.raises(ValueError):
        HyperParams(bootstrap_type="bogus")
    with pytest.raises(ValueError):
        HyperParams(f_bootstrap=0.0)
    with pytest.raises(ValueError):
        HyperParams(ballast=1.0)
