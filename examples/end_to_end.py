"""End-to-end example mirroring the reference's ``__main__`` flow
(``main.py:592-651``): train → save artifacts (PNG + noise pool) → reload
through the uint8 round-trip → evaluate with the training noises.

Run small/dev:   python examples/end_to_end.py --family tiny --steps 10
Run full SD-1.5: python examples/end_to_end.py --source path/to/img.jpg
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

# allow running the script straight from a checkout without installation
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from PIL import Image

from tml_image_editing_defense_tpu import api
from tml_image_editing_defense_tpu.configs import (
    INFERENCE_PROMPTS,
    InferenceConfig,
    TrainConfig,
)
from tml_image_editing_defense_tpu.core.rng import load_noise_pool


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", type=Path, default=Path("/root/reference/data/images/japan.jpg"))
    ap.add_argument("--target", type=Path, default=None)
    ap.add_argument("--output", type=Path, default=Path("./output/example"))
    ap.add_argument("--family", type=str, default=None, help="sd15|sdxl|tiny")
    ap.add_argument("--steps", type=int, default=100)
    def _positive_int(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError(f"must be a positive int, got {n}")
        return n

    ap.add_argument("--eval-prompts", type=_positive_int, default=None,
                    help="evaluate only the first N inference prompts "
                         f"(default: 2 for dev families, "
                         f"all {len(INFERENCE_PROMPTS)} otherwise)")
    ap.add_argument("--use-lcm-training", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--use-lcm-inference", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--dtype", type=str, default=None,
                    choices=("float32", "bfloat16"),
                    help="compute dtype for BOTH legs (default: config default "
                         "f32; sdxl at 2.57B params needs bfloat16 on a 16 GB "
                         "chip)")
    ap.add_argument("--validation-images", type=Path, default=None,
                    help="validation_images.txt-style file; enables the "
                         "perturbation-transfer leg (reference "
                         "main.py:523-587)")
    ap.add_argument("--dispatch-block", type=int, default=None,
                    help="fuse up to N PGD iterations per dispatch "
                         "(TrainConfig.dispatch_block; worth ~15%% sustained "
                         "on tunneled chips — docs/PERF.md round 5)")
    ap.add_argument("--checkpoint-interval", type=int, default=0,
                    help="save PGD state (attack_state.npz) every N steps "
                         "(0 = off); with --resume a crashed run continues "
                         "the exact RNG stream (utils/checkpoint.py)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from <output>/attack_state.npz if present "
                         "(tunneled-TPU runs: the worker can crash/restart "
                         "mid-immunize)")
    ap.add_argument("--params", type=Path, default=None,
                    help="converted real-weight .msgpack "
                         "(scripts/prepare_real_weights.py)")
    ap.add_argument("--tokenizer", type=Path, nargs="*", default=None,
                    help="local HF tokenizer dir(s), one per text encoder")
    args = ap.parse_args()
    weights = dict(
        params_path=args.params,
        tokenizer_paths=None if args.tokenizer is None
        else [str(t) for t in args.tokenizer],
    )
    if args.dtype is not None:
        weights["dtype"] = args.dtype
    target = args.target or args.source
    dev = args.family in ("tiny", "tiny-sdxl")
    size = 32 if dev else 512

    # Part 1: training (reference main.py:603-619)
    train_cfg = TrainConfig(
        source_image_path=args.source,
        target_image_path=target,
        output_path=args.output,
        n_optimization_steps=args.steps,
        guidance_scale=4.0,
        n_noise=1,
        use_fixed_noise=True,
        use_lcm=args.use_lcm_training,
        model_family=args.family,
        image_size=size,
        **(dict(n_denoising_steps_per_iteration=2, limit_timesteps=False,
                derive_norm_hyperparams=False, norm_type="linf", eps=0.1,
                step_size=0.02, grad_reps=2, apply_loss_on_latents=True,
                apply_loss_on_images=False, perturbation_loss_lambda=0.0,
                prompts=["melting", "origami"]) if dev else {}),
        checkpoint_interval=args.checkpoint_interval,
        dispatch_block=args.dispatch_block,
        **weights,
    )
    resume_from = args.output / "attack_state.npz" if args.resume else None
    result = api.immunize(train_cfg, resume_from=resume_from)

    # Artifact round-trip (reference main.py:618-622): PNG quantization is
    # deliberately part of the measured defense.
    adversarial_image = Image.open(args.output / "adversarial_image.png").convert("RGB")
    noises = load_noise_pool(args.output / "noise.npz")

    # Part 2: inference (reference main.py:624-651)
    inference_cfg = InferenceConfig(
        experiment_name="use_train_noises",
        source_image_path=args.source,
        target_image_path=target,
        output_path=args.output / "eval",
        n_steps=4 if args.use_lcm_inference else (2 if dev else 50),
        guidance_scale=4.0,
        strength=0.60,
        use_fixed_noise=True,
        n_noise=train_cfg.n_noise,
        validation_images_path=args.validation_images,
        use_lcm=args.use_lcm_inference or dev,
        model_family=args.family,
        image_size=size,
        **weights,
    )
    grids = api.evaluate(
        inference_cfg,
        adversarial_image,
        inference_prompts=INFERENCE_PROMPTS[:args.eval_prompts]
        if args.eval_prompts is not None
        else (INFERENCE_PROMPTS[:2] if dev else INFERENCE_PROMPTS),
        model=result.model,
        noises=noises,
        training_prompts=train_cfg.prompts,
    )
    print(f"{len(grids)} comparison grids -> {inference_cfg.output_path}")


if __name__ == "__main__":
    main()
