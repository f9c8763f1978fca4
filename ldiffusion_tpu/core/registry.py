"""Plugin lookup + misc utilities.

Behavioral contract: nnUNet's ``recursive_find_python_class`` (reference
``utilities/find_class_by_name.py``, used for trainer/planner/preprocessor
selection by name), ``collate_outputs`` (``utilities/collate_outputs.py``)
and ``dummy_context`` (``utilities/helpers.py``).

Here plugins register explicitly (decorator) instead of filesystem scanning —
deterministic and import-safe — with a module-walk fallback for externally
provided classes.
"""
from __future__ import annotations

import contextlib
import importlib
import pkgutil
from typing import Any, Callable, Dict, List, Optional

import numpy as np

_REGISTRIES: Dict[str, Dict[str, Any]] = {}


def register(kind: str, name: Optional[str] = None) -> Callable:
    """Decorator: ``@register("trainer")`` adds the class to a named registry."""

    def deco(obj):
        _REGISTRIES.setdefault(kind, {})[name or obj.__name__] = obj
        return obj

    return deco


def find_class(kind: str, name: str, search_modules: Optional[List[str]] = None):
    """Resolve a class by name — registry first, then a module walk (the
    analog of ``recursive_find_python_class``)."""
    reg = _REGISTRIES.get(kind, {})
    if name in reg:
        return reg[name]
    for mod_name in search_modules or []:
        mod = importlib.import_module(mod_name)
        if hasattr(mod, name):
            return getattr(mod, name)
        path = getattr(mod, "__path__", None)
        if path:
            for info in pkgutil.iter_modules(path):
                sub = importlib.import_module(f"{mod_name}.{info.name}")
                if hasattr(sub, name):
                    return getattr(sub, name)
    raise KeyError(f"no {kind} named {name!r} (registered: {sorted(reg)})")


def collate_outputs(outputs: List[Dict[str, Any]]) -> Dict[str, Any]:
    """List-of-dicts → dict of stacked arrays / summed scalars (reference
    ``collate_outputs``: numpy arrays stack, scalars become arrays)."""
    if not outputs:
        return {}
    collated: Dict[str, Any] = {}
    for key in outputs[0]:
        vals = [o[key] for o in outputs]
        first = vals[0]
        if np.isscalar(first) or (hasattr(first, "ndim") and first.ndim == 0):
            collated[key] = np.array(vals)
        else:
            collated[key] = np.stack([np.asarray(v) for v in vals])
    return collated


@contextlib.contextmanager
def dummy_context():
    yield
