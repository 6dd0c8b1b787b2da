"""Expert-config grid generation.

Parity with the reference's ``experts/config_maker.py``: pydantic-validated
grid search — datamixes x base_configs x param_ranges — expanded into one
YAML config per combination.
"""

from __future__ import annotations

import itertools
import os
from typing import Any, Dict, List

import yaml
from pydantic import BaseModel, Field


class DataMix(BaseModel):
    name: str
    datasets: List[Dict[str, Any]]


class ParamRange(BaseModel):
    name: str
    values: List[Any]


class Configurations(BaseModel):
    output_dir: str = "expert_configs"
    base_configs: List[Dict[str, Any]] = Field(default_factory=lambda: [{}])
    datamixes: List[DataMix]
    param_ranges: List[ParamRange] = Field(default_factory=list)


def expand_configurations(spec: Configurations) -> List[Dict[str, Any]]:
    """Cartesian product of base configs x datamixes x param ranges."""
    configs = []
    range_names = [r.name for r in spec.param_ranges]
    range_values = [r.values for r in spec.param_ranges]
    combos = list(itertools.product(*range_values)) if range_values else [()]
    for base_idx, base in enumerate(spec.base_configs):
        for mix in spec.datamixes:
            for combo in combos:
                cfg = dict(base)
                cfg["datasets"] = mix.datasets
                for name, value in zip(range_names, combo):
                    node = cfg
                    parts = name.split(".")
                    for p in parts[:-1]:
                        node = node.setdefault(p, {})
                    node[parts[-1]] = value
                suffix = "_".join(
                    f"{n.split('.')[-1]}{v}" for n, v in zip(range_names, combo)
                )
                cfg["run_name"] = f"expert_{mix.name}_b{base_idx}" + (
                    f"_{suffix}" if suffix else ""
                )
                configs.append(cfg)
    return configs


def write_configurations(spec: Configurations) -> List[str]:
    os.makedirs(spec.output_dir, exist_ok=True)
    paths = []
    for cfg in expand_configurations(spec):
        path = os.path.join(spec.output_dir, f"{cfg['run_name']}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        paths.append(path)
    return paths
