"""Config presets for the seven suites, mirroring the reference's published
training configurations (SURVEY.md §2.3 + the per-suite configs/scripts).

Each preset is a plain dict consumable by utils.config.Config; the yaml files
under this directory hold the same data for file-based workflows
(`load_config(path, defaults=PRESETS[name])`).
"""

from .presets import PRESETS, get_preset

__all__ = ["PRESETS", "get_preset"]
