"""JSON-safe pretty printing of result dicts.

Capability parity with the reference package util (`copo_code/copo/__init__.py:8-42`):
a JSON encoder that falls back to `str()`/`None` for non-serializable values
(jax arrays, numpy scalars, nan) and a YAML-ish pretty printer used by the
training loop to render per-iteration results.
"""

import json
import numbers

import numpy as np


class SafeFallbackEncoder(json.JSONEncoder):
    """JSON encoder that never raises: nan -> null, arrays -> lists, other -> str."""

    def __init__(self, nan_str="null", **kwargs):
        super().__init__(**kwargs)
        self.nan_str = nan_str

    def default(self, value):
        try:
            if np.isnan(value).all():
                return None
        except (TypeError, ValueError):
            pass
        if hasattr(value, "tolist"):  # numpy / jax arrays and scalars
            return value.tolist()
        if isinstance(value, numbers.Integral):
            return int(value)
        if isinstance(value, numbers.Number):
            return float(value)
        return str(value)


def pretty_print(result: dict) -> str:
    """Render a (possibly nested) result dict as sorted, indented text."""
    result = {k: v for k, v in result.items() if v is not None}
    cleaned = json.dumps(result, cls=SafeFallbackEncoder, sort_keys=True, indent=2)
    return cleaned
