"""Config handling — same JSON schema as the reference so its sample
configs load verbatim.

Reference parity: /root/reference/dgraphpandas/config.py:9-39
(``get_from_config`` kwargs > config > default precedence, ``_get_config``
path-or-dict passthrough).  Pure driver-side; no Spark involvement.
"""
from __future__ import annotations

import json
from typing import Any, Dict, Union


def get_from_config(key: str, config: Dict[str, Any], default: Any = None, **kwargs) -> Any:
    """Option lookup precedence: kwargs > config > default.

    Parity: reference config.py:9-21 (S4).
    """
    if not key:
        raise ValueError('key')
    if not config:
        raise ValueError('config')
    return kwargs.get(key, config.get(key, default))


def load_config(config: Union[str, Dict[str, Any]]) -> Dict[str, Any]:
    """Load config dict from a JSON file path, or pass through a dict.

    Parity: reference config.py:24-39 (S3).
    """
    if config is None:
        raise ValueError('config')
    if isinstance(config, str):
        with open(config, 'r') as f:
            return json.load(f)
    return config
