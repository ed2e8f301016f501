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


def build_mpc_config(cfg: Dict[str, Any], gp_raw: Optional[Dict[str, Any]] = None):
    """mpc_params.yaml → RTIConfig / GPMPCConfig. ``gp_raw`` (the parsed
    gp_params.yaml) supplies the uncertainty β block for GP-MPC tightening."""
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
    if cfg.get("x_bound_mask") is not None:
        # bound-row elision (the round-5 flagship lever): state components
        # whose boxes are loose envelopes stop paying condensed Γ rows
        kw["x_bound_mask"] = tuple(bool(b) for b in cfg["x_bound_mask"])
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
            **build_uncertainty_kwargs(gp_raw or {}),
        )
    return base


def build_gp_config(cfg: Dict[str, Any]):
    """gp_params.yaml → StructuredGPConfig + OnlineUpdateConfig (+ see
    :func:`build_training_config` and :func:`build_uncertainty_config` for
    the training/uncertainty blocks)."""
    from ..gp import OnlineUpdateConfig, StructuredGPConfig

    hyp = cfg.get("hyperparameters", {}) or {}
    ls = hyp.get("lengthscales", {}) or {}
    as_tuple = lambda v: tuple(float(x) for x in v) if v is not None else None
    gp = StructuredGPConfig(
        max_data_points=cfg.get("max_data_points", 512),
        n_inducing=cfg.get("n_inducing", 100),
        kernel=cfg.get("kernel", "se_ard"),
        method=cfg.get("approximation", "fitc"),
        noise=cfg.get("noise", 1e-4),
        novelty_threshold=cfg.get("novelty_threshold", 0.3),
        trans_lengthscales=as_tuple(ls.get("translational")),
        rot_lengthscales=as_tuple(ls.get("rotational")),
        signal_variance=hyp.get("signal_variance", 1.0),
    )
    online = OnlineUpdateConfig(
        capacity=cfg.get("online", {}).get("capacity", 512),
        update_interval=cfg.get("online", {}).get("update_interval", 10),
        refit_interval=cfg.get("online", {}).get("refit_interval", 100),
        min_distance=cfg.get("online", {}).get("min_distance", 1e-3),
    )
    return gp, online


def build_training_config(cfg: Dict[str, Any]):
    """gp_params.yaml ``training:`` block → HyperparameterConfig."""
    from ..learning import HyperparameterConfig

    tr = cfg.get("training", {}) or {}
    return HyperparameterConfig(
        steps=tr.get("steps", 150),
        learning_rate=tr.get("learning_rate", 0.05),
        retrain_every_episodes=tr.get("retrain_every_episodes", 5),
        method=tr.get("method", "mle"),
    )


def build_uncertainty_kwargs(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """gp_params.yaml ``uncertainty:`` block → GPMPCConfig β kwargs."""
    un = cfg.get("uncertainty", {}) or {}
    return {
        "beta_method": un.get("beta_method", "quantile"),
        "beta_fixed": un.get("beta_fixed", 2.0),
        "beta_calibration": un.get("beta_calibration", 1.0),
    }


def build_safety_config(cfg: Dict[str, Any]):
    """safety_params.yaml → SafetyFilterConfig (incl. the recovery-policy
    block, reference ``safety_params.yaml:91-98``)."""
    from ..safety import SafetyFilterConfig

    kw = {}
    if "u_min" in cfg:
        kw["u_min"] = jnp.asarray(cfg["u_min"], jnp.float32)
    if "u_max" in cfg:
        kw["u_max"] = jnp.asarray(cfg["u_max"], jnp.float32)
    rec = cfg.get("recovery", {}) or {}
    return SafetyFilterConfig(
        N=cfg.get("filter", {}).get("N", 10),
        dt=cfg.get("filter", {}).get("dt", 0.1),
        alpha_margin=cfg.get("filter", {}).get("alpha_margin", 0.9),
        soft=cfg.get("filter", {}).get("soft", True),
        max_consecutive=rec.get("max_consecutive", 10),
        after_max=rec.get("after_max", "continue"),
        **kw,
    )


def build_tube_config(cfg: Dict[str, Any]):
    """safety_params.yaml ``tube:`` block → TubeMPCConfig."""
    from ..safety import TubeMPCConfig

    tube = cfg.get("tube", {}) or {}
    return TubeMPCConfig(
        n_sigma=tube.get("n_sigma", 2.0),
        dt=cfg.get("filter", {}).get("dt", 0.1),
        quantile=tube.get("quantile", 0.95),
    )


def backup_kind(cfg: Dict[str, Any]) -> str:
    """safety_params.yaml ``backup.type`` → create_backup_controller kind."""
    kind = (cfg.get("backup", {}) or {}).get("type", "lqr")
    if kind not in ("lqr", "pd", "braking"):
        raise ValueError(f"unknown backup type {kind!r}")
    return kind


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
    out["mpc_config"] = build_mpc_config(raw["mpc"], gp_raw=raw["gp"])
    out["gp_config"], out["online_config"] = build_gp_config(raw["gp"])
    out["training_config"] = build_training_config(raw["gp"])
    out["safety_config"] = build_safety_config(raw["safety"])
    out["tube_config"] = build_tube_config(raw["safety"])
    out["backup_kind"] = backup_kind(raw["safety"])
    out["raw"] = raw
    return out
