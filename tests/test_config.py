"""Config system and profiling-utils tests."""

import time

import yaml

from openeat_tpu.config import (TrainConfig, load_config,
                                resolve_mesh_conf, resolve_model_conf,
                                save_config)
from openeat_tpu.utils.profiling import StepTimer


def test_config_roundtrip(tmp_path):
    cfg = {"model_conf": {"d_model": 128, "custom_key": 7},
           "optim_conf": {"lr": 0.003}, "warmup_epoch": 5}
    p = str(tmp_path / "c.yaml")
    save_config(cfg, p)
    loaded = load_config(p)
    assert loaded == cfg


def test_resolve_model_conf_defaults_and_overrides():
    mc = resolve_model_conf({"model_conf": {"d_model": 128,
                                            "custom_key": 7}})
    assert mc["d_model"] == 128        # override
    assert mc["attention_heads"] == 4  # default
    assert mc["custom_key"] == 7       # unknown keys preserved
    assert mc["positional_dropout_rate"] == 0.0


def test_resolve_mesh_conf():
    m = resolve_mesh_conf({})
    assert m == {"data": -1, "model": 1}
    m = resolve_mesh_conf({"mesh_conf": {"model": 2}})
    assert m["model"] == 2 and m["data"] == -1


def test_train_config_from_dict():
    tc = TrainConfig.from_dict({"grad_clip": 3, "optim_conf": {"lr": 0.01},
                                "warmup_epoch": 2, "accum_grad": 4})
    assert tc.grad_clip == 3 and tc.lr == 0.01
    assert tc.accum_grad == 4 and tc.max_epoch == 50  # default


def test_step_timer():
    st = StepTimer(n_chips=1)
    assert st.tick(1000) == {}  # first tick has no interval
    time.sleep(0.01)
    out = st.tick(1000)
    assert out["step_time_s"] > 0
    # 1000 frames = 10 s audio over the measured interval
    assert abs(out["audio_sec_per_sec_per_chip"]
               - 10.0 / out["step_time_s"]) < 1e-6
