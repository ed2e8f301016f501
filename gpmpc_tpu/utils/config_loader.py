"""YAML → config-object loader (making the reference's dead schema live).

The reference ships four YAML schemas (``config/*.yaml``) but its
``src/utils/config_loader.py`` is an empty placeholder and nothing reads them
(SURVEY.md §5.6). This loader is real: it reads the same schema layout and
builds the framework's dataclass configs, with dot-path overrides for CLI
flags.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import yaml


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def apply_overrides(cfg: Dict[str, Any], overrides: Dict[str, Any]) -> Dict[str, Any]:
    """Apply {'a.b.c': value} dot-path overrides (CLI flag support)."""
    out = dict(cfg)
    for path, value in overrides.items():
        node = out
        keys = path.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value
    return out


def build_rocket_params(cfg: Dict[str, Any]):
    """rocket_params.yaml → Rocket3DoFParams / Rocket6DoFParams."""
    from ..dynamics import Rocket3DoFParams, Rocket6DoFParams

    model = cfg.get("model", "3dof")
    common = dict(
        m_dry=cfg.get("m_dry", 1.0),
        m_wet=cfg.get("m_wet", 2.0),
        I_sp=cfg.get("I_sp", 30.0),
        g0=cfg.get("g0", 1.0),
        T_min=cfg.get("T_min", 0.3 if model == "3dof" else 1.5),
        T_max=cfg.get("T_max", 5.0 if model == "3dof" else 6.5),
    )
    if "g_I" in cfg:
        common["g_I"] = jnp.asarray(cfg["g_I"], jnp.float32)
    if model == "3dof":
        return Rocket3DoFParams(**common)
    extra = {}
    if "J_B" in cfg:
        extra["J_B"] = jnp.asarray(cfg["J_B"], jnp.float32)
    if "r_T_B" in cfg:
        extra["r_T_B"] = jnp.asarray(cfg["r_T_B"], jnp.float32)
    return Rocket6DoFParams(**common, **extra)


def build_mpc_config(cfg: Dict[str, Any]):
    """mpc_params.yaml → RTIConfig / GPMPCConfig."""
    from ..mpc import GPMPCConfig, RTIConfig
    from ..ops.qp import ADMMConfig

    admm = ADMMConfig(
        max_iter=cfg.get("solver", {}).get("max_iter", 100),
        eps_abs=cfg.get("solver", {}).get("eps_abs", 1e-4),
        eps_rel=cfg.get("solver", {}).get("eps_rel", 1e-4),
        polish=cfg.get("solver", {}).get("polish", True),
    )
    kw = {}
    if "Q_diag" in cfg:
        kw["Q"] = jnp.diag(jnp.asarray(cfg["Q_diag"], jnp.float32))
        kw["Qf"] = jnp.diag(jnp.asarray(cfg["Q_diag"], jnp.float32)) * cfg.get(
            "terminal_scale", 10.0
        )
    if "R_diag" in cfg:
        kw["R"] = jnp.diag(jnp.asarray(cfg["R_diag"], jnp.float32))
    base = RTIConfig(
        N=cfg.get("N", 15),
        dt=cfg.get("dt", 0.1),
        admm=admm,
        **kw,
    )
    if cfg.get("use_gp", False):
        return GPMPCConfig(
            base=base,
            scp_iterations=cfg.get("rti", {}).get("scp_iterations", 3),
            tighten=cfg.get("chance_constraints", {}).get("enabled", True),
            confidence=cfg.get("chance_constraints", {}).get("confidence", 0.95),
        )
    return base


def build_gp_config(cfg: Dict[str, Any]):
    """gp_params.yaml → StructuredGPConfig + OnlineUpdateConfig."""
    from ..gp import OnlineUpdateConfig, StructuredGPConfig

    gp = StructuredGPConfig(
        max_data_points=cfg.get("max_data_points", 512),
        n_inducing=cfg.get("n_inducing", 100),
        kernel=cfg.get("kernel", "se_ard"),
        method=cfg.get("approximation", "fitc"),
        noise=cfg.get("noise", 1e-4),
        novelty_threshold=cfg.get("novelty_threshold", 0.3),
    )
    online = OnlineUpdateConfig(
        capacity=cfg.get("online", {}).get("capacity", 512),
        update_interval=cfg.get("online", {}).get("update_interval", 10),
        refit_interval=cfg.get("online", {}).get("refit_interval", 100),
        min_distance=cfg.get("online", {}).get("min_distance", 1e-3),
    )
    return gp, online


def build_safety_config(cfg: Dict[str, Any]):
    """safety_params.yaml → SafetyFilterConfig."""
    from ..safety import SafetyFilterConfig

    kw = {}
    if "u_min" in cfg:
        kw["u_min"] = jnp.asarray(cfg["u_min"], jnp.float32)
    if "u_max" in cfg:
        kw["u_max"] = jnp.asarray(cfg["u_max"], jnp.float32)
    return SafetyFilterConfig(
        N=cfg.get("filter", {}).get("N", 10),
        dt=cfg.get("filter", {}).get("dt", 0.1),
        alpha_margin=cfg.get("filter", {}).get("alpha_margin", 0.9),
        soft=cfg.get("filter", {}).get("soft", True),
        **kw,
    )


def load_experiment_config(
    directory: str, overrides: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Load the full config directory (rocket/mpc/gp/safety yaml files) into
    constructed config objects."""
    import os

    out: Dict[str, Any] = {}
    paths = {
        "rocket": "rocket_params.yaml",
        "mpc": "mpc_params.yaml",
        "gp": "gp_params.yaml",
        "safety": "safety_params.yaml",
    }
    raw = {}
    for key, fname in paths.items():
        p = os.path.join(directory, fname)
        raw[key] = load_yaml(p) if os.path.exists(p) else {}
    if overrides:
        raw = apply_overrides(raw, overrides)
    out["rocket_params"] = build_rocket_params(raw["rocket"])
    out["mpc_config"] = build_mpc_config(raw["mpc"])
    out["gp_config"], out["online_config"] = build_gp_config(raw["gp"])
    out["safety_config"] = build_safety_config(raw["safety"])
    out["raw"] = raw
    return out
