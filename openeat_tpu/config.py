"""YAML config system.

Mirrors the reference's three-tier config (YAML `model_conf` /
`collate_conf` / `dataset_conf` / `optim_conf` + scalar training keys,
reference examples/aishell/conf/train.yaml:1-78 and
openeat/bin/train.py:88-89) so reference recipe YAMLs port with minimal
edits, while adding TPU-specific keys (`mesh_conf`, dtype, bucketing).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any

import yaml

_MODEL_DEFAULTS: dict[str, Any] = {
    "d_model": 256,
    "attention_heads": 4,
    "linear_units": 1024,
    "dropout_rate": 0.1,
    "positional_dropout_rate": 0.0,  # reference PEs have no dropout
    "attention_dropout_rate": 0.0,
    "length_normalized_loss": False,
    "input_layer": "conv2d",
    "pos_enc_layer_type": "rel_pos",
    "encoder_num_blocks_share": 1,
    "encoder_num_blocks": 12,
    "activation": "swish",
    "macaron_style": True,
    "use_cnn_module": True,
    "cnn_module_kernel": 15,
    "causal": False,
    "encoder_use_adapter": False,
    "decoder_use_adapter": False,
    "down_size": 64,
    "scalar": 0.1,
    "ctc_weight": 0.3,
    "lsm_weight": 0.1,
    "decoder_num_blocks_share": 1,
    "decoder_num_blocks": 3,
    "r_decoder_num_blocks": 0,
    "reverse_weight": 0.0,
    "tie_word_embedding": False,
    # TPU-specific
    "compute_dtype": "bfloat16",
    "param_dtype": "float32",
}

_MESH_DEFAULTS: dict[str, Any] = {
    # logical mesh axes; data parallel is the day-one axis, model axis for TP
    "data": -1,   # -1: all remaining devices
    "model": 1,
}


def _deep_update(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_update(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(path: str) -> dict:
    """Load a YAML config file into a plain nested dict."""
    with open(path, "r") as f:
        cfg = yaml.safe_load(f) or {}
    return cfg


def save_config(cfg: dict, path: str) -> None:
    """Re-dump the resolved config (reference train.py:149-152 behavior)."""
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, default_flow_style=False, sort_keys=False)


def resolve_model_conf(cfg: dict) -> dict:
    """Apply defaults to `model_conf` (unknown keys are preserved)."""
    return _deep_update(_MODEL_DEFAULTS, cfg.get("model_conf", {}))


def resolve_mesh_conf(cfg: dict) -> dict:
    return _deep_update(_MESH_DEFAULTS, cfg.get("mesh_conf", {}))


@dataclass
class TrainConfig:
    """Scalar training keys with reference defaults (train.yaml:66-78)."""

    grad_clip: float = 5.0
    accum_grad: int = 1
    max_epoch: int = 50
    log_interval: int = 100
    optim: str = "adam"
    lr: float = 0.001
    warmup_epoch: float = 10.0
    warmup_steps: int | None = None  # overrides warmup_epoch if set
    seed: int = 777
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, cfg: dict) -> "TrainConfig":
        optim_conf = cfg.get("optim_conf", {}) or {}
        known = {
            "grad_clip": cfg.get("grad_clip", 5.0),
            "accum_grad": cfg.get("accum_grad", 1),
            "max_epoch": cfg.get("max_epoch", 50),
            "log_interval": cfg.get("log_interval", 100),
            "optim": cfg.get("optim", "adam"),
            "lr": optim_conf.get("lr", 0.001),
            "warmup_epoch": cfg.get("warmup_epoch", 10.0),
            "warmup_steps": cfg.get("warmup_steps"),
            "seed": cfg.get("seed", 777),
        }
        return cls(**known)
