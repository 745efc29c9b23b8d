"""Config system: YAML configs + dotted CLI overrides + timestamped run dirs.

Replaces Hydra/OmegaConf (reference `@hydra.main`, SURVEY.md §5 "Config/flag
system") with the same observable behavior:
- one YAML per entry point under configs/ with the reference's key schema,
- dotted overrides on the CLI (`datamodule.batch_size=8`),
- auto-created timestamped run directory (outputs/YYYY-MM-DD/HH-MM-SS),
- full resolved-config snapshot dumped to config.yaml in the run dir; the
  eval harness consumes the predict run's snapshot (reference eval.py:874-876).
"""
from __future__ import annotations

import copy
import datetime
import pathlib
from typing import Any, Optional, Sequence

import yaml

CONFIG_DIR = pathlib.Path(__file__).resolve().parents[2] / "configs"


class Config(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, key):
        try:
            v = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return Config(v) if isinstance(v, dict) else v

    def __setattr__(self, key, value):
        self[key] = value

    def to_container(self) -> dict:
        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [conv(x) for x in v]
            return v
        return conv(self)


def _parse_value(s: str) -> Any:
    return yaml.safe_load(s)


def apply_override(cfg: dict, dotted_key: str, value: Any):
    parts = dotted_key.split(".")
    node = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            node[p] = {}
        node = node[p]
    node[parts[-1]] = value


def load_config(name: str, overrides: Optional[Sequence[str]] = None,
                config_dir: Optional[pathlib.Path] = None) -> Config:
    """Load configs/<name>.yaml and apply key=value dotted overrides."""
    cdir = pathlib.Path(config_dir) if config_dir else CONFIG_DIR
    path = cdir / f"{name}.yaml"
    with path.open() as f:
        cfg = yaml.safe_load(f) or {}
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, _, val = ov.partition("=")
        apply_override(cfg, key.strip(), _parse_value(val))
    return Config(cfg)


def make_run_dir(base: str = "outputs",
                 run_dir: Optional[str] = None) -> pathlib.Path:
    """Hydra-style timestamped run directory."""
    if run_dir is not None:
        out = pathlib.Path(run_dir).expanduser()
    else:
        now = datetime.datetime.now()
        out = (pathlib.Path(base) / now.strftime("%Y-%m-%d")
               / now.strftime("%H-%M-%S"))
        i = 0
        while out.exists():
            i += 1
            out = out.parent / f"{now.strftime('%H-%M-%S')}-{i}"
    out.mkdir(parents=True, exist_ok=True)
    return out


def dump_config(cfg: dict, run_dir: pathlib.Path, extra: dict = None,
                name: str = "config.yaml"):
    """Write the resolved config snapshot ({'config': ..., ...extra})."""
    payload = {"config": Config(copy.deepcopy(dict(cfg))).to_container(),
               "output_dir": str(run_dir)}
    if extra:
        payload.update(extra)
    with (pathlib.Path(run_dir) / name).open("w") as f:
        yaml.dump(payload, f, default_flow_style=False)
    return payload


def load_yaml(path) -> Config:
    with pathlib.Path(path).expanduser().open() as f:
        return Config(yaml.safe_load(f))


def parse_cli(argv: Sequence[str]) -> list[str]:
    """All args of the form key=value are overrides (hydra CLI parity)."""
    return [a for a in argv if "=" in a and not a.startswith("-")]
