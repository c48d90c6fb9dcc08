"""String-keyed component registries (reference ``mmedit/models/registry.py``,
``mmedit/datasets/registry.py`` -- the mmcv Registry pattern, rebuilt)."""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._module_dict: Dict[str, Any] = {}

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def get(self, key: str):
        if key not in self._module_dict:
            raise KeyError(
                f"{key!r} is not registered in {self.name} "
                f"(available: {sorted(self._module_dict)})"
            )
        return self._module_dict[key]

    def register_module(self, cls: Optional[Callable] = None, *, name: Optional[str] = None):
        def _register(obj):
            key = name or obj.__name__
            if key in self._module_dict:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self._module_dict[key] = obj
            return obj

        if cls is None:
            return _register
        return _register(cls)

    @property
    def module_dict(self):
        return dict(self._module_dict)


MODELS = Registry("models")
BACKBONES = Registry("backbones")
COMPONENTS = Registry("components")
LOSSES = Registry("losses")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")


def build_from_cfg(cfg: dict, registry: Registry, default_args: Optional[dict] = None):
    """{'type': 'Name', ...kwargs} -> registry['Name'](**kwargs)."""
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise TypeError(f"cfg must be a dict with a 'type' key, got {cfg!r}")
    args = dict(cfg)
    obj_type = args.pop("type")
    if default_args:
        for k, v in default_args.items():
            args.setdefault(k, v)
    obj_cls = registry.get(obj_type) if isinstance(obj_type, str) else obj_type
    if not (inspect.isclass(obj_cls) or inspect.isfunction(obj_cls)):
        raise TypeError(f"registered object {obj_type!r} is not callable")
    return obj_cls(**args)
