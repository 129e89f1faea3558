"""Typed config system unifying the reference's four idioms.

The reference uses yaml-over-deep-defaults (TAL libs/core/config.py:4-158),
yacs (anticipation config/defaults.py), 112-flag argparse (VTG
main/config.py:16) and yml+argparse (dense-captioning opts.py). Here: one
dataclass-backed `Config` with deep dict merge, yaml loading, dotted-key
overrides and attribute access.
"""

from __future__ import annotations

import copy
import json
from typing import Any, Dict, Mapping, Optional


class Config(dict):
    """Dict with attribute access and recursive wrapping."""

    def __init__(self, data: Optional[Mapping[str, Any]] = None, **kw):
        super().__init__()
        data = dict(data or {})
        data.update(kw)
        for k, v in data.items():
            self[k] = self._wrap(v)

    @staticmethod
    def _wrap(v):
        if isinstance(v, Mapping) and not isinstance(v, Config):
            return Config(v)
        if isinstance(v, list):
            return [Config._wrap(x) for x in v]
        return v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = self._wrap(v)

    def merged(self, other: Mapping[str, Any]) -> "Config":
        """Deep merge: `other` wins (the TAL _merge semantics,
        libs/core/config.py:135-148)."""
        out = copy.deepcopy(self)

        def rec(dst, src):
            for k, v in src.items():
                if (
                    k in dst
                    and isinstance(dst[k], Mapping)
                    and isinstance(v, Mapping)
                ):
                    rec(dst[k], v)
                else:
                    dst[k] = Config._wrap(v)

        rec(out, other)
        return out

    def override(self, dotted: Dict[str, Any]) -> "Config":
        """Apply {'a.b.c': v} style overrides."""
        out = copy.deepcopy(self)
        for key, v in dotted.items():
            node = out
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    node[p] = Config()
                node = node[p]
            node[parts[-1]] = Config._wrap(v)
        return out

    def to_dict(self) -> dict:
        def rec(v):
            if isinstance(v, Config):
                return {k: rec(x) for k, x in v.items()}
            if isinstance(v, list):
                return [rec(x) for x in v]
            return v

        return rec(self)

    def dumps(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)


def load_config(path: str, defaults: Optional[Mapping[str, Any]] = None) -> Config:
    """Load yaml (or json) over defaults with deep merge."""
    text = open(path).read()
    data = None
    if path.endswith((".json",)):
        data = json.loads(text)
    else:
        try:
            import yaml  # available transitively; gated anyway

            data = yaml.safe_load(text)
        except ImportError:
            data = json.loads(text)
    base = Config(defaults or {})
    return base.merged(data or {})
