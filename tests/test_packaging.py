"""Packaging sanity: every console entry point in pyproject.toml resolves.

The reference has no packaging at all (its bin scripts sys.path.append
the repo root, reference openeat/bin/train.py:17-22); this guards the
install surface the TPU build adds.
"""

import importlib
import pathlib
import tomllib

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_console_scripts_resolve():
    meta = tomllib.loads((ROOT / "pyproject.toml").read_text())
    scripts = meta["project"]["scripts"]
    assert len(scripts) >= 9
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        func = getattr(mod, func_name)
        assert callable(func), f"{name} -> {target} is not callable"


def test_package_discovery_excludes_tests():
    meta = tomllib.loads((ROOT / "pyproject.toml").read_text())
    include = meta["tool"]["setuptools"]["packages"]["find"]["include"]
    assert include == ["openeat_tpu*"]
