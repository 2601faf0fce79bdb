"""CLI configuration file — the analog of the reference's
``src/cli/config.py`` (Config: DEFAULT_CONFIG, deep-merge of user file
over defaults, dotted ``get``/``set``, graceful fallback to defaults on an
unreadable file; config.py:14-163). The reference reads
``~/.validate-bio/config.yml``; this engine reads ``~/.bdvr/config.yml``,
overridable with ``--config PATH`` or ``$BDVR_CONFIG``.

Precedence, highest first: explicit CLI flag > config-file value >
built-in default. Unlike the reference the loader never auto-creates the
default file — reading a validation engine's config must not write to
``$HOME`` — but ``config set`` (the setup-wizard analog) creates it on
demand.
"""

from __future__ import annotations

import copy
import os
from pathlib import Path
from typing import Any

DEFAULT_CONFIG: dict[str, Any] = {
    "version": "1.0",
    "validation": {
        # decision-table preset (policy.py PRESETS; reference
        # decision_tables.py:258-298)
        "policy": "default",
        # reject immediately on CRITICAL row violations
        "strict": False,
        # skip shards already committed for this ruleset hash
        "resume": True,
        # chunk size for --resumable per-pass commits
        "files_per_pass": 64,
        # default YAML ruleset path (None = built-in transcript registry)
        "rules": None,
        # default drift-baseline digests JSON path
        "baseline": None,
    },
    "output": {
        "format": "text",          # text | json | markdown | html
        "run_dir": None,           # default artifact directory
    },
    "performance": {
        "num_cpus": None,          # None = let Ray size the local cluster
    },
}


def default_path() -> Path:
    """``$BDVR_CONFIG`` if set, else ``~/.bdvr/config.yml`` (the
    ``~/.validate-bio/config.yml`` analog)."""
    env = os.environ.get("BDVR_CONFIG")
    if env:
        return Path(env)
    return Path.home() / ".bdvr" / "config.yml"


def _deep_merge(base: dict, override: dict) -> None:
    for key, value in override.items():
        if key in base and isinstance(base[key], dict) and isinstance(value, dict):
            _deep_merge(base[key], value)
        else:
            base[key] = value


class Config:
    """Merged view of DEFAULT_CONFIG and one YAML file."""

    def __init__(self, config_path: str | Path | None = None):
        self.config_path = Path(config_path) if config_path else default_path()
        self.load_error: str | None = None
        self._config = self._load()

    def _load(self) -> dict:
        merged = copy.deepcopy(DEFAULT_CONFIG)
        if not self.config_path.exists():
            return merged
        try:
            import yaml

            with open(self.config_path) as fh:
                user = yaml.safe_load(fh)
            if user is None:
                return merged
            if not isinstance(user, dict):
                raise ValueError(f"top level must be a mapping, got "
                                 f"{type(user).__name__}")
            _deep_merge(merged, user)
            return merged
        except Exception as e:  # unreadable file -> defaults, like the ref
            self.load_error = f"{type(e).__name__}: {e}"
            return copy.deepcopy(DEFAULT_CONFIG)

    def get(self, *keys: str, default: Any = None) -> Any:
        """Dotted-path lookup: ``cfg.get('output', 'format')``."""
        value: Any = self._config
        for key in keys:
            if isinstance(value, dict) and key in value:
                value = value[key]
            else:
                return default
        return value

    def set(self, *keys_and_value: Any) -> None:
        """Set a value by path and persist the file
        (``config set output.format json``)."""
        if len(keys_and_value) < 2:
            raise ValueError("need at least one key and a value")
        keys, value = keys_and_value[:-1], keys_and_value[-1]
        current = self._config
        for key in keys[:-1]:
            current = current.setdefault(key, {})
        current[keys[-1]] = value
        self.save()

    def save(self) -> None:
        import yaml

        self.config_path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.config_path, "w") as fh:
            yaml.dump(self._config, fh, default_flow_style=False,
                      sort_keys=False)

    def to_dict(self) -> dict:
        return copy.deepcopy(self._config)


def load_config(config_path: str | Path | None = None) -> Config:
    return Config(config_path)


def parse_scalar(text: str) -> Any:
    """Parse a ``config set`` value the way YAML would (so ``true``,
    ``8``, ``0.5`` and ``null`` round-trip as their types)."""
    import yaml

    return yaml.safe_load(text)
