"""Universal-perturbation training entrypoint (reference C16,
``old/train_noise.py`` — the reference runs it as a pyrallis CLI; this is the
argparse equivalent over :class:`UniversalConfig`).

Trains ONE perturbation tensor over a folder of images so that any covered
image, once perturbed, resists 1-step LCM editing; the loss-side decode runs
through the TAESD preview decoder exactly like the reference
(``old/train_noise.py:82, 151``) unless ``--no-preview`` is given.

Run small/dev:  python examples/universal_attack.py --family tiny \
                    --dataset-dir data/images --steps 5
Run full:       python examples/universal_attack.py --family sd15 \
                    --dataset-dir data/images --params /ckpts/sd15_lcm.msgpack \
                    --preview-params /ckpts/taesd
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dataset-dir", type=Path, required=True,
                    help="folder of images (old/train_noise.py:22)")
    ap.add_argument("--output", type=Path, default=Path("./output/universal"))
    ap.add_argument("--family", type=str, default="sd15",
                    help="sd15|sdxl|tiny")
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--steps", type=int, default=100, dest="max_steps")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--grad-reps", type=int, default=4)
    ap.add_argument("--eps", type=float, default=0.1)
    ap.add_argument("--step-size", type=float, default=0.006)
    ap.add_argument("--optimizer", type=str, default=None, choices=["adam"],
                    help="opt into the Adam update the reference configured "
                         "but never stepped (old/train_noise.py:96); default "
                         "is the normalized-gradient rule it actually used")
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--eot-shards", type=int, default=1,
                    help="shard the grad_reps EOT samples over this many "
                         "devices (mesh reps axis, parallel/eot.py); must "
                         "divide --grad-reps")
    ap.add_argument("--remat-policy", type=str, default="none",
                    choices=["none", "full", "dots", "conv_dots"],
                    help="rematerialize the per-rep gradient body; 'full' is "
                         "required to fit the reference's native SDXL@1024² "
                         "config (old/train_noise.py:94) in 16 GB HBM")
    ap.add_argument("--default-prompt", type=str, default="")
    ap.add_argument("--edit-prompts", type=str, nargs="*", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--vis-every", type=int, default=None,
                    help="save a [perturbed|source|validation] collage every "
                         "k steps (old/train_noise.py:196-214)")
    ap.add_argument("--params", type=Path, default=None,
                    help="converted main-model .msgpack "
                         "(scripts/prepare_real_weights.py)")
    ap.add_argument("--no-preview", action="store_true",
                    help="decode the loss through the full VAE instead of "
                         "the TAESD preview decoder")
    ap.add_argument("--preview-params", type=Path, default=None,
                    help="real madebyollin/taesd[xl] directory "
                         "(random-init preview otherwise)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tml_image_editing_defense_tpu.attack.universal import (
        UniversalConfig,
        train_universal_perturbation,
    )
    from tml_image_editing_defense_tpu.data.dataset import ImagePromptDataset
    from tml_image_editing_defense_tpu.models import (
        build_model,
        build_tiny_autoencoder,
    )
    from tml_image_editing_defense_tpu.core.image_ops import to_pil
    from tml_image_editing_defense_tpu.models.tiny_vae import load_taesd_checkpoint

    model = build_model(args.family, key=jax.random.key(args.seed),
                        image_size=args.image_size, fast_init=True)
    if args.params is not None:
        from tml_image_editing_defense_tpu.models.checkpoint_io import load_params

        model.params = load_params(Path(args.params),
                                   jax.device_get(model.params))
    size = model.image_size

    cfg_kw = dict(eps=args.eps, step_size=args.step_size,
                  grad_reps=args.grad_reps, epochs=args.epochs,
                  max_steps=args.max_steps, image_size=size,
                  default_prompt=args.default_prompt,
                  optimizer=args.optimizer, lr=args.lr,
                  remat_policy=args.remat_policy)
    if args.edit_prompts:
        cfg_kw["edit_prompts"] = tuple(args.edit_prompts)
    cfg = UniversalConfig(**cfg_kw)

    preview = None
    if not args.no_preview:
        if args.preview_params is not None:
            preview = load_taesd_checkpoint(args.preview_params)
        else:
            # pick the preview preset by the main VAE's downsampling factor:
            # "taesd" is 8× (sd15/sdxl), "tiny" is 2× (the dev families —
            # including tiny-sdxl/tiny-inpaint, whose base family is not
            # "tiny"); any other geometry falls back to the full VAE decode
            factor = 2 ** (len(model.vae.config.block_out_channels) - 1)
            preset = {8: "taesd", 2: "tiny"}.get(factor)
            if preset is not None:
                preview = build_tiny_autoencoder(
                    preset, key=jax.random.key(args.seed + 1), fast_init=True)
            else:
                print(f"no preview preset for a {factor}x VAE; "
                      "using the full VAE decode", flush=True)

    ds = ImagePromptDataset(str(args.dataset_dir), args.default_prompt,
                            size=size)
    if len(ds) == 0:
        raise SystemExit(f"no images under {args.dataset_dir}")
    # dataset yields CHW at the artifact boundary; device side is NHWC
    images = [np.transpose(ds[i][0], (1, 2, 0))[None].astype(np.float32)
              for i in range(len(ds))]

    def log_fn(step, loss):
        print(f"step {step}: loss {loss:.4f}", flush=True)

    args.output.mkdir(parents=True, exist_ok=True)

    def vis_fn(step, collage):
        from PIL import Image as PILImage

        PILImage.fromarray(collage).save(
            args.output / f"validation_{step:05d}.png")

    mesh = None
    if args.eot_shards > 1:
        from tml_image_editing_defense_tpu.parallel.mesh import (
            REPS_AXIS,
            make_mesh,
        )

        mesh = make_mesh({REPS_AXIS: args.eot_shards})

    pert, losses = train_universal_perturbation(
        model, images, cfg, jax.random.key(args.seed + 2),
        log_fn=log_fn, preview=preview,
        vis_every=args.vis_every,
        vis_fn=vis_fn if args.vis_every else None,
        mesh=mesh)

    args.output.mkdir(parents=True, exist_ok=True)
    np.save(args.output / "perturbation.npy", np.asarray(pert))
    perturbed = np.clip(images[0] + np.asarray(pert), -1.0, 1.0)
    # to_pil takes CHW (NCHW is the artifact-boundary layout)
    to_pil(perturbed[0].transpose(2, 0, 1)).save(
        args.output / "perturbed_example.png")
    print(f"final loss {losses[-1]:.4f}; artifacts in {args.output}")


if __name__ == "__main__":
    main()
