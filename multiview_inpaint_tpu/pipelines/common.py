"""Shared CLI plumbing for the pipeline stages.

Mirrors the reference arg groups (``gs-simp/arguments/__init__.py``):
model/pipeline/optimization parameters with a ``cfg_args`` dump in the
model dir so render-side tools can recover training settings — but as
plain JSON instead of eval()'d Namespace repr.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

from ..models.gs_trainer import OptimizationConfig


@dataclasses.dataclass
class ModelArgs:
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = 8
    white_background: bool = False
    sh_degree: int = 0
    eval: bool = False


def add_registry_arg(parser: argparse.ArgumentParser):
    parser.add_argument(
        "--registry", type=str, default=None,
        help="JSON with front_views/insertion_prompts/orbit_params "
             "overrides for scenes not in the built-in registry")


def apply_registry(args):
    if getattr(args, "registry", None):
        from ..config.registries import load_registry_overrides
        load_registry_overrides(args.registry)


def add_orbit_args(parser: argparse.ArgumentParser):
    parser.add_argument(
        "--allow_default_orbit", action="store_true",
        help="use default OrbitParams (with a warning) when the scene is "
             "not in the orbit registry, instead of erroring")


def resolve_orbit(args, table=None):
    """Orbit geometry for args.scene_id (reference helpers.py raises on
    unknown scenes; see registries.get_orbit_params)."""
    from ..config.registries import get_orbit_params
    return get_orbit_params(
        args.scene_id.split("_")[0], table,
        allow_default=getattr(args, "allow_default_orbit", False))


def add_backend_arg(parser: argparse.ArgumentParser):
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "xla", "pallas"],
                        help="rasterizer backend; auto = pallas on TPU")


def resolve_backend(backend: str) -> str:
    """'auto' -> pallas off-CPU (fused kernels), xla on CPU (pallas
    interpret mode is orders of magnitude slower there)."""
    if backend != "auto":
        return backend
    import jax
    return "pallas" if jax.default_backend() not in ("cpu",) else "xla"


def add_model_args(parser: argparse.ArgumentParser):
    parser.add_argument("--source_path", "-s", type=str, default="")
    parser.add_argument("--model_path", "-m", type=str, default="")
    parser.add_argument("--images", "-i", type=str, default="images")
    parser.add_argument("--resolution", "-r", type=int, default=8)
    parser.add_argument("--white_background", "-w", action="store_true")
    parser.add_argument("--sh_degree", type=int, default=0)
    parser.add_argument("--eval", action="store_true")


def model_args_from(args) -> ModelArgs:
    return ModelArgs(source_path=os.path.abspath(args.source_path),
                     model_path=args.model_path, images=args.images,
                     resolution=args.resolution,
                     white_background=args.white_background,
                     sh_degree=args.sh_degree, eval=args.eval)


def add_optimization_args(parser: argparse.ArgumentParser,
                          preset: OptimizationConfig = OptimizationConfig()):
    for f in dataclasses.fields(OptimizationConfig):
        parser.add_argument(f"--{f.name}", type=type(getattr(preset, f.name)),
                            default=getattr(preset, f.name))


def optimization_config_from(args) -> OptimizationConfig:
    kw = {f.name: getattr(args, f.name)
          for f in dataclasses.fields(OptimizationConfig)}
    return OptimizationConfig(**kw)


def dump_cfg(model_path: str, args: argparse.Namespace):
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump({k: v for k, v in vars(args).items()
                   if isinstance(v, (int, float, str, bool, type(None)))},
                  f, indent=1)


def load_cfg(model_path: str, args: argparse.Namespace,
             cli_specified: set) -> argparse.Namespace:
    """Merge stored training cfg with CLI (CLI wins for specified flags)."""
    path = os.path.join(model_path, "cfg_args.json")
    if os.path.exists(path):
        with open(path) as f:
            stored = json.load(f)
        for k, v in stored.items():
            if hasattr(args, k) and k not in cli_specified:
                setattr(args, k, v)
    return args


def default_background(white_background: bool):
    import jax.numpy as jnp
    return (jnp.ones(3, jnp.float32) if white_background
            else jnp.zeros(3, jnp.float32))
