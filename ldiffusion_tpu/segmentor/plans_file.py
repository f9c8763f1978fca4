"""Multi-configuration plans file with inheritance.

Behavioral contract: nnUNet's ``PlansManager``/``ConfigurationManager``
(reference ``utilities/plans_handling/plans_handler.py:32-307``): one
``nnUNetPlans.json`` holds named configurations ("2d", "3d_fullres",
"3d_lowres", "3d_cascade_fullres", custom); a configuration may declare
``inherits_from`` and override only some keys (``:197-220``); consumers ask
the manager for a resolved configuration.

TPU-first deviation (documented): resolved configurations materialize into
the typed ``SegPlan`` / ``SegPlan3D`` dataclasses (rank decides which)
instead of lazy dict property views, and class-by-name resolution is limited
to this package's registry (``core/registry.py``) — there is no arbitrary
recursive import walk.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Union

from ldiffusion_tpu.segmentor.planner import SegPlan
from ldiffusion_tpu.segmentor.planner3d import SegPlan3D

AnyPlan = Union[SegPlan, SegPlan3D]


def save_plans_file(path: str, configurations: Dict[str, AnyPlan],
                    dataset_name: str = "", extra: Dict = None) -> None:
    """Write an nnUNetPlans.json-style file from resolved plan objects."""
    out = {
        "dataset_name": dataset_name,
        "plans_name": os.path.splitext(os.path.basename(path))[0],
        "configurations": {
            name: dataclasses.asdict(plan) for name, plan in configurations.items()
        },
        **(extra or {}),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


class PlansFile:
    """Reader with ``inherits_from`` resolution (reference ``:197-220``)."""

    def __init__(self, path_or_dict):
        self.plans = (json.load(open(path_or_dict))
                      if isinstance(path_or_dict, str) else dict(path_or_dict))
        self.configurations = self.plans.get("configurations", {})

    def configuration_names(self):
        return list(self.configurations.keys())

    def _resolved_dict(self, name: str, _seen=()) -> Dict:
        if name in _seen:
            raise ValueError(f"circular inherits_from chain at '{name}'")
        if name not in self.configurations:
            raise KeyError(f"no configuration '{name}' "
                           f"(have {self.configuration_names()})")
        cfg = dict(self.configurations[name])
        parent = cfg.pop("inherits_from", None)
        if parent is not None:
            base = self._resolved_dict(parent, _seen + (name,))
            base.update(cfg)
            cfg = base
        return cfg

    def get_configuration(self, name: str) -> AnyPlan:
        d = self._resolved_dict(name)
        is_3d = len(d["patch_size"]) == 3
        for k in ("patch_size", "features_per_stage", "strides", "median_shape",
                  "n_blocks_per_stage", "spacing", "kernel_sizes"):
            if k in d and d[k] is not None:
                d[k] = tuple(tuple(v) if isinstance(v, list) else v for v in d[k]) \
                    if k in ("strides", "kernel_sizes") and is_3d else tuple(d[k])
        cls = SegPlan3D if is_3d else SegPlan
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})
