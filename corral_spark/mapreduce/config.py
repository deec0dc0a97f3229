"""Reference-parity config chain for the MapReduce facade.

The reference loads settings through viper (reference config.go:7-45):
defaults < ``corralrc`` config file (cwd, then ``$HOME/.corral``)
< ``CORRAL_*`` environment variables < explicit flags. This module
reproduces that precedence with a JSON ``corralrc.json`` file (stdlib
only — the reference's viper accepts several formats; JSON is the one
this container can parse without extra deps).

Key mapping to Spark (documented, deliberate):

* ``splitSize`` (default 100 MB, reference config.go:28) — honored:
  the facade sizes ``sc.textFile`` partitions so each split is
  ~splitSize bytes.
* ``mapBinSize`` / ``reduceBinSize`` (512 MB) — accepted for parity;
  shuffle-file bin packing is superseded by Spark's shuffle manager +
  AQE partition coalescing (SURVEY F9).
* ``maxConcurrency`` (500) — accepted; superseded by the Spark
  scheduler's executor-slot model (SURVEY F14).
* ``cleanup`` — accepted; intermediate shuffle data lifecycle is
  native to Spark (SURVEY F18).
* ``verbose`` — honored: raises driver log level.
* ``workingLocation`` — honored (Driver output location).

Aliases (reference config.go:38-44): ``v`` -> ``verbose``, ``o`` ->
``workingLocation``.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping
from typing import Any

#: Reference defaults (config.go:20-33), minus the lambda-deployment
#: keys (out of scope per SURVEY §2.1 F15/F19).
DEFAULTS: dict[str, Any] = {
    "cleanup": True,
    "verbose": False,
    "splitSize": 100 * 1024 * 1024,
    "mapBinSize": 512 * 1024 * 1024,
    "reduceBinSize": 512 * 1024 * 1024,
    "maxConcurrency": 500,
    "workingLocation": ".",
}

#: reference config.go:38-44 (viper.RegisterAlias)
ALIASES = {"v": "verbose", "o": "workingLocation"}

_CONFIG_BASENAME = "corralrc.json"


def _canon(key: str) -> str | None:
    """Resolve a key (case-insensitive, alias-aware) to its canonical
    name, or None if unknown."""
    k = ALIASES.get(key, key)
    for known in DEFAULTS:
        if known.lower() == k.lower():
            return known
    return None


def _coerce(key: str, value: Any) -> Any:
    """Coerce string-typed values (env vars) to the default's type."""
    target = DEFAULTS[key]
    if isinstance(value, str):
        if isinstance(target, bool):
            return value.strip().lower() in ("1", "true", "yes", "on")
        if isinstance(target, int):
            return int(value)
    return value


def _read_config_file(path: str) -> dict[str, Any]:
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}
    out = {}
    for k, v in raw.items():
        canon = _canon(k)
        if canon is not None:
            out[canon] = _coerce(canon, v)
    return out


def load_config(
    cwd: str | None = None,
    env: Mapping[str, str] | None = None,
    overrides: Mapping[str, Any] | None = None,
) -> dict[str, Any]:
    """Effective facade config with the reference's precedence:
    defaults < corralrc.json (cwd, then ~/.corral) < CORRAL_* env
    < ``overrides`` (flags / explicit constructor args)."""
    cwd = cwd or os.getcwd()
    env = env if env is not None else os.environ

    conf = dict(DEFAULTS)
    # File: cwd first, then $HOME/.corral — first hit wins (viper
    # stops at the first config file found, config.go:9-11).
    for d in (cwd, os.path.join(os.path.expanduser("~"), ".corral")):
        path = os.path.join(d, _CONFIG_BASENAME)
        if os.path.isfile(path):
            conf.update(_read_config_file(path))
            break
    # Env: CORRAL_<KEY>, case-insensitive, aliases allowed
    # (viper.SetEnvPrefix + AutomaticEnv, config.go:16-17).
    for name, value in env.items():
        if not name.upper().startswith("CORRAL_"):
            continue
        canon = _canon(name[len("CORRAL_") :].lower())
        if canon is not None:
            conf[canon] = _coerce(canon, value)
    # Flags / explicit args.
    for k, v in (overrides or {}).items():
        canon = _canon(k)
        if canon is not None and v is not None:
            conf[canon] = _coerce(canon, v)
    return conf
