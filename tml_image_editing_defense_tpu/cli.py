"""Command-line interface.

The reference's live path has no CLI (configs are constructed in
``__main__``/``run_all.py``; the argparse in ``utils/parser.py`` is legacy
and broken — it references ``os`` without importing it, ``utils/parser.py:346``).
Per SURVEY.md §5 the rebuild exposes a thin CLI that mirrors the dataclass
configs: flags are auto-generated from ``TrainConfig``/``InferenceConfig``/
``SweepConfig`` fields.

    python -m tml_image_editing_defense_tpu.cli immunize --source-image-path img.jpg ...
    python -m tml_image_editing_defense_tpu.cli evaluate --adversarial-image out/adversarial_image.png ...
    python -m tml_image_editing_defense_tpu.cli sweep --images-dir ./images ...
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path
from typing import Optional, get_args, get_origin

from tml_image_editing_defense_tpu.configs import (
    INFERENCE_PROMPTS,
    InferenceConfig,
    SweepConfig,
    TrainConfig,
)

_SKIP_FIELDS = {"prompts", "n_prompts_grid", "n_noises_grid"}


def _add_dataclass_args(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        if f.name in _SKIP_FIELDS:
            continue
        name = "--" + f.name.replace("_", "-")
        default = f.default if f.default is not dataclasses.MISSING else None
        # Resolve the annotation to a concrete scalar type.  Configs use
        # `from __future__ import annotations`, so f.type is a string like
        # "Optional[int]"; fall back to typing introspection for real types.
        # The annotation (not the default) drives the dispatch — a None
        # default (Optional[int] fields like eot_shards) must still parse
        # as its declared type, not as str.
        ann = f.type
        if isinstance(ann, str):
            ann = {"int": int, "float": float, "str": str, "bool": bool,
                   "Path": Path}.get(ann.replace("Optional[", "").rstrip("]"), str)
        elif get_origin(ann) is not None:
            args = [a for a in get_args(ann) if a is not type(None)]
            ann = args[0] if args else str
        if ann is bool or isinstance(default, bool):
            parser.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=default, metavar="BOOL")
        elif ann is int or (isinstance(default, int) and not isinstance(default, bool)):
            parser.add_argument(name, type=int, default=default)
        elif ann is float or isinstance(default, float):
            parser.add_argument(name, type=float, default=default)
        elif ann is Path or isinstance(default, Path):
            parser.add_argument(name, type=Path, default=default)
        else:
            parser.add_argument(name, type=str, default=default)


def _build_cfg(cls, args: argparse.Namespace):
    names = {f.name for f in dataclasses.fields(cls)} - _SKIP_FIELDS
    kwargs = {n: getattr(args, n) for n in names if getattr(args, n, None) is not None}
    return cls(**kwargs)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="tml-image-editing-defense-tpu",
        description="TPU-native PhotoGuard-style image immunization",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_imm = sub.add_parser("immunize", help="PGD-immunize an image (Trainer.run)")
    _add_dataclass_args(p_imm, TrainConfig)
    p_imm.add_argument("--prompts", nargs="*", default=None,
                       help="override the EOT prompt bank")
    p_imm.add_argument("--resume-from", type=Path, default=None)

    p_batch = sub.add_parser(
        "immunize-batch",
        help="immunize many images as one data-parallel program over the TPU mesh",
    )
    _add_dataclass_args(p_batch, TrainConfig)
    p_batch.add_argument("--images", nargs="+", type=Path, required=True)
    p_batch.add_argument("--prompts", nargs="*", default=None)

    p_eval = sub.add_parser("evaluate", help="clean-vs-adversarial comparison (Inference)")
    _add_dataclass_args(p_eval, InferenceConfig)
    p_eval.add_argument("--adversarial-image", type=Path, required=True)
    p_eval.add_argument("--noise-pool", type=Path, default=None,
                        help="noise.npz saved by immunize")
    p_eval.add_argument("--prompts", nargs="*", default=None)

    p_sweep = sub.add_parser("sweep", help="grid sweep (run_all)")
    _add_dataclass_args(p_sweep, SweepConfig)
    p_sweep.add_argument("--n-prompts-grid", nargs="*", type=str, default=None,
                         help="e.g. 1 10 25 all")
    p_sweep.add_argument("--n-noises-grid", nargs="*", type=str, default=None)

    args = parser.parse_args(argv)

    if args.command == "immunize":
        from tml_image_editing_defense_tpu import api

        cfg = _build_cfg(TrainConfig, args)
        if args.prompts:
            cfg.prompts = list(args.prompts)
        res = api.immunize(cfg, resume_from=args.resume_from)
        print(f"adversarial image -> {Path(cfg.output_path) / 'adversarial_image.png'}")
        return 0

    if args.command == "immunize-batch":
        from tml_image_editing_defense_tpu import api

        cfg = _build_cfg(TrainConfig, args)
        if args.prompts:
            cfg.prompts = list(args.prompts)
        results = api.immunize_batch(cfg, args.images)
        print(f"{len(results)} images immunized -> {cfg.output_path}")
        return 0

    if args.command == "evaluate":
        from PIL import Image

        from tml_image_editing_defense_tpu import api
        from tml_image_editing_defense_tpu.core.rng import load_noise_pool

        cfg = _build_cfg(InferenceConfig, args)
        adv = Image.open(args.adversarial_image).convert("RGB")
        noises = load_noise_pool(args.noise_pool) if args.noise_pool else None
        prompts = list(args.prompts) if args.prompts else INFERENCE_PROMPTS
        api.evaluate(cfg, adv, prompts, noises=noises)
        print(f"grids -> {cfg.output_path}")
        return 0

    if args.command == "sweep":
        from tml_image_editing_defense_tpu import api

        cfg = _build_cfg(SweepConfig, args)

        def parse_grid(vals):
            return tuple(None if v in ("all", "none", "None") else int(v) for v in vals)

        if args.n_prompts_grid:
            cfg.n_prompts_grid = parse_grid(args.n_prompts_grid)
        if args.n_noises_grid:
            cfg.n_noises_grid = parse_grid(args.n_noises_grid)
        results = api.sweep(cfg)
        print(f"{len(results)} sweep cells -> {cfg.output_root}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
