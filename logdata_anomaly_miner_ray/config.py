"""Declarative YAML suite configuration.

Recasts AMiner's YAML-driven assembly (reference:
aminer/YamlConfig.py:129-1020 ``build_parsing_model`` /
``build_analysis_components``) and its up-front schema validation
(reference: aminer/ConfigValidator.py:1-224 — typed per-key specs
with required/default/allowed semantics, failing fast with the exact
offending key) for the batch engine: a YAML file declares the input,
output, runtime knobs and the per-check parameter blocks; validation
happens BEFORE any Ray work starts, and every error names its key
path and the expected/actual type.

Example::

    input: /data/pages
    out: /data/run1
    ts_index: /data/ts_index      # optional
    window_seconds: 600
    resume: true
    allowed_langs: [en, de, fr]
    checks:
      entropy: {prob_thresh: 0.05}
      frequency: {confidence_factor: 0.33}
      uniqueness: {enabled: true}
      referential: {enabled: true}
      ordering: {enabled: true}
"""

from __future__ import annotations

from typing import Any

from .schema import SuiteConfig

# per-key spec: (type(s), required, default) — the ConfigValidator
# "config_properties" table shape
_TOP_SPEC: dict[str, tuple[tuple[type, ...], bool, Any]] = {
    "input": ((str,), True, None),
    "out": ((str,), True, None),
    "ts_index": ((str, type(None)), False, None),
    "num_cpus": ((int, type(None)), False, None),
    "window_seconds": ((int,), False, 600),
    "resume": ((bool,), False, True),
    "allowed_langs": ((list, type(None)), False, None),
    "checks": ((dict,), False, {}),
    # False = keyed checks re-derive the narrow projection instead of
    # materializing it (O(1) object-store footprint; one extra read)
    "materialize_narrow": ((bool,), False, True),
}

# allowed parameter keys + types per check block
_CHECK_SPEC: dict[str, dict[str, tuple[type, ...]]] = {
    "entropy": {"prob_thresh": (float, int), "enabled": (bool,)},
    "lang_domain": {"enabled": (bool,)},
    "charset": {"enabled": (bool,)},
    "token_range": {"enabled": (bool,)},
    "frequency": {"confidence_factor": (float, int), "enabled": (bool,)},
    "empty_windows": {"enabled": (bool,)},
    "uniqueness": {"enabled": (bool,)},
    "referential": {"enabled": (bool,)},
    "ordering": {"enabled": (bool,)},
    "ks_drift": {"min_effect": (float, int), "enabled": (bool,)},
}


class ConfigError(ValueError):
    """A config that ConfigValidator-style validation rejected."""


def validate_suite_config(raw: Any) -> dict:
    """Validate + normalize a parsed YAML dict. Raises ConfigError
    naming the offending key path, expected and actual type — the
    reference ConfigValidator failure style."""
    if not isinstance(raw, dict):
        raise ConfigError(f"config root: expected a mapping, got {type(raw).__name__}")
    out: dict[str, Any] = {}
    for key, (types, required, default) in _TOP_SPEC.items():
        if key not in raw or raw[key] is None and key in ("ts_index", "num_cpus", "allowed_langs"):
            if required and key not in raw:
                raise ConfigError(f"config key '{key}': required but missing")
            out[key] = raw.get(key, default)
            continue
        v = raw[key]
        if not isinstance(v, types) or isinstance(v, bool) and bool not in types:
            raise ConfigError(
                f"config key '{key}': expected {'/'.join(t.__name__ for t in types)},"
                f" got {type(v).__name__} ({v!r})"
            )
        out[key] = v
    for key in raw:
        if key not in _TOP_SPEC:
            raise ConfigError(
                f"config key '{key}': unknown (allowed: {sorted(_TOP_SPEC)})"
            )
    if out["window_seconds"] <= 0:
        raise ConfigError(
            f"config key 'window_seconds': must be positive, got {out['window_seconds']}"
        )
    if out["allowed_langs"] is not None:
        for i, lang in enumerate(out["allowed_langs"]):
            if not isinstance(lang, str):
                raise ConfigError(
                    f"config key 'allowed_langs[{i}]': expected str, got {type(lang).__name__}"
                )
    checks: dict[str, dict] = {}
    for cname, params in (out["checks"] or {}).items():
        if cname not in _CHECK_SPEC:
            raise ConfigError(
                f"config key 'checks.{cname}': unknown check (allowed: {sorted(_CHECK_SPEC)})"
            )
        if params is None:
            params = {}
        if not isinstance(params, dict):
            raise ConfigError(
                f"config key 'checks.{cname}': expected a mapping of parameters,"
                f" got {type(params).__name__}"
            )
        spec = _CHECK_SPEC[cname]
        for pk, pv in params.items():
            if pk not in spec:
                raise ConfigError(
                    f"config key 'checks.{cname}.{pk}': unknown parameter"
                    f" (allowed: {sorted(spec)})"
                )
            if not isinstance(pv, spec[pk]) or (
                isinstance(pv, bool) and bool not in spec[pk]
            ):
                raise ConfigError(
                    f"config key 'checks.{cname}.{pk}': expected"
                    f" {'/'.join(t.__name__ for t in spec[pk])}, got {type(pv).__name__}"
                )
        checks[cname] = dict(params)
    out["checks"] = checks
    return out


def load_suite_yaml(path: str) -> dict:
    """Parse + validate a suite YAML file."""
    import yaml

    with open(path) as f:
        try:
            raw = yaml.safe_load(f)
        except yaml.YAMLError as ex:
            raise ConfigError(f"config file {path}: YAML parse error: {ex}") from ex
    return validate_suite_config(raw)


def to_suite_config(cfg: dict) -> SuiteConfig:
    """Validated config dict → the pipeline's SuiteConfig."""
    return SuiteConfig(
        checks=cfg.get("checks", {}),
        window_seconds=cfg.get("window_seconds", 600),
    )
