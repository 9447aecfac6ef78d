"""User configuration profiles.

Capability parity with the reference's profiles (utils/profiles.py:15,
CLI precedence cli.py:452): named saved Config sets under
~/.framewright_tpu/profiles/, layered between CLI flags and presets.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional

from framewright_tpu.config import Config
from framewright_tpu.errors import ConfigError


def profiles_dir() -> Path:
    env = os.environ.get("FRAMEWRIGHT_PROFILES_DIR")
    if env:
        return Path(env)
    return Path.home() / ".framewright_tpu" / "profiles"


def save_profile(name: str, config: Config) -> Path:
    from framewright_tpu.security import sanitize_filename

    path = profiles_dir() / f"{sanitize_filename(name)}.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(config.to_dict(), indent=2, sort_keys=True))
    return path


def load_profile(name: str) -> Config:
    from framewright_tpu.security import sanitize_filename

    path = profiles_dir() / f"{sanitize_filename(name)}.json"
    if not path.exists():
        raise ConfigError(
            f"Profile {name!r} not found; available: {list_profiles()}")
    return Config.from_dict(json.loads(path.read_text()))


def list_profiles() -> List[str]:
    d = profiles_dir()
    if not d.is_dir():
        return []
    return sorted(p.stem for p in d.glob("*.json"))


def delete_profile(name: str) -> bool:
    from framewright_tpu.security import sanitize_filename

    path = profiles_dir() / f"{sanitize_filename(name)}.json"
    if path.exists():
        path.unlink()
        return True
    return False
