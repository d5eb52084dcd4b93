#!/usr/bin/env python
"""One-command real-weight preparation (VERDICT r2 item 10).

The moment checkpoints land on disk, this converts a diffusers-layout model
directory into the framework's native param file and verifies it, so the
first networked run is:

    # 1. convert + verify (offline after the download)
    python scripts/prepare_real_weights.py \
        --model-dir /ckpts/stable-diffusion-v1-5 \
        --vae-dir   /ckpts/sd-vae-ft-mse \
        --lora      /ckpts/lcm-lora-sdv1-5/pytorch_lora_weights.safetensors \
        --out       /ckpts/sd15_lcm.msgpack --smoke

    # 2. immunize + evaluate with real weights (the reference's end-to-end
    #    entrypoint, main.py:592-651)
    python examples/end_to_end.py --family sd15 --source data/images/japan.jpg \
        --params /ckpts/sd15_lcm.msgpack --tokenizer /ckpts/.../tokenizer

Every step is the offline analog of ``Trainer.load_models``
(reference main.py:278-309): base checkpoint → VAE swap (sd-vae-ft-mse /
sdxl-vae-fp16-fix) → LCM-LoRA fuse → ready-to-train bundle.  The conversion
itself is validated offline today by the full-size key/shape manifests
(tests/manifests/, scripts/gen_key_manifests.py) and the torch-oracle parity
tests (tests/test_unet_vae_torch_parity.py).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(msg: str) -> None:
    print(f"[prepare] {msg}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model-dir", type=Path, default=None,
                    help="diffusers-layout dir: unet/ vae/ text_encoder/ "
                         "[text_encoder_2/] *.safetensors")
    ap.add_argument("--rmbg-dir", type=Path, default=None,
                    help="briaai/RMBG-1.4 checkpoint dir: converts through "
                         "the flax ISNet (models/isnet.py) and smoke-runs "
                         "mask inference; no artifact is written — "
                         "get_salient_mask loads the dir directly (pass it "
                         "as segmentation_model_path)")
    ap.add_argument("--family", default="sd15",
                    choices=["sd15", "sdxl", "tiny", "tiny-sdxl"])  # tiny: CI
    ap.add_argument("--image-size", type=int, default=512,
                    help="training resolution (the reference trains SDXL at "
                         "512 too; eval can rebuild at native size)")
    ap.add_argument("--vae-dir", type=Path, default=None,
                    help="VAE override dir (sd-vae-ft-mse / sdxl-vae-fp16-fix"
                         " — main.py:290,302)")
    ap.add_argument("--lora", type=Path, default=None,
                    help="LCM-LoRA .safetensors to fuse into the UNet "
                         "(main.py:292-295,305-308)")
    ap.add_argument("--lora-scale", type=float, default=1.0)
    ap.add_argument("--out", type=Path, default=None,
                    help="output .msgpack param file")
    ap.add_argument("--smoke", action="store_true",
                    help="run a tiny encode→denoise→decode smoke step after "
                         "conversion")
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("TID_FORCE_CPU"):       # CI: the axon TPU plugin
        jax.config.update("jax_platforms", "cpu")  # ignores JAX_PLATFORMS
    import jax.numpy as jnp

    if args.rmbg_dir is not None:
        import numpy as np

        from tml_image_editing_defense_tpu.models.isnet import (
            load_rmbg_checkpoint,
            salient_mask,
        )

        t0 = time.time()
        log(f"converting RMBG-1.4 from {args.rmbg_dir} (strict; every key "
            "must land — manifest tests/manifests/rmbg_isnet.json)…")
        bundle = load_rmbg_checkpoint(args.rmbg_dir)
        log("smoke: mask inference on a synthetic image…")
        img = np.zeros((256, 256, 3), np.float32)
        img[64:192, 64:192] = 0.8
        mask = salient_mask(bundle, img, out_size=512)
        assert mask.shape == (512, 512) and np.isfinite(mask).all()
        log(f"RMBG OK in {time.time() - t0:.1f}s; use it with "
            f"TrainConfig(use_segmentation_mask=True, "
            f"segmentation_model_path='{args.rmbg_dir}')")
        if args.model_dir is None:
            return

    if args.model_dir is None or args.out is None:
        ap.error("--model-dir and --out are required (unless only --rmbg-dir)")

    from tml_image_editing_defense_tpu.models import build_model
    from tml_image_editing_defense_tpu.models.checkpoint_io import save_params
    from tml_image_editing_defense_tpu.models.convert import (
        convert_state_dict,
        load_sd_checkpoint,
    )
    from tml_image_editing_defense_tpu.models.lora import fuse_lora

    t0 = time.time()
    log(f"building {args.family} template (random init, shapes only)…")
    model = build_model(args.family, key=jax.random.key(0),
                        image_size=args.image_size, fast_init=True)

    log(f"converting {args.model_dir} …")
    params = load_sd_checkpoint(args.model_dir, model.params, strict=True)

    if args.vae_dir is not None:
        log(f"swapping VAE from {args.vae_dir} (main.py:290,302)…")
        from tml_image_editing_defense_tpu.models.convert import load_safetensors

        state = {}
        for f in sorted(Path(args.vae_dir).glob("*.safetensors")):
            state.update(load_safetensors(f))
        if not state:
            raise FileNotFoundError(f"no .safetensors under {args.vae_dir}")
        params["vae"] = convert_state_dict(model.params["vae"], state, "vae")

    if args.lora is not None:
        log(f"fusing LCM-LoRA {args.lora} (scale {args.lora_scale})…")
        from tml_image_editing_defense_tpu.models.convert import load_safetensors

        params["unet"] = fuse_lora(
            params["unet"], load_safetensors(args.lora), scale=args.lora_scale
        )

    log(f"saving {args.out} …")
    save_params(args.out, params)
    log(f"done in {time.time() - t0:.1f}s "
        f"({args.out.stat().st_size / 1e9:.2f} GB)")

    if args.smoke:
        log("smoke test: encode → 1 UNet step → decode …")
        import dataclasses

        import numpy as np

        model = dataclasses.replace(model, params=params)
        img = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
        z = model.encode_image(params["vae"], img)
        ctx = model.embed_prompt_bank(["a photo"]).embeds[:1]
        kw = {}
        if model.family == "sdxl":
            from tml_image_editing_defense_tpu.attack.forward import make_time_ids

            bank = model.embed_prompt_bank(["a photo"])
            kw = {"text_embeds": bank.pooled[:1],
                  "time_ids": make_time_ids(args.image_size, jnp.float32)[:1]}
        eps = model.unet.apply({"params": params["unet"]}, z,
                               jnp.asarray(519, jnp.int32), ctx, **kw)
        out = model.decode_latent(params["vae"], z, scaled=False)
        for name, arr in (("latent", z), ("eps", eps), ("decode", out)):
            assert np.isfinite(np.asarray(arr)).all(), f"{name} has non-finite values"
        log(f"smoke OK: latent {z.shape}, eps {eps.shape}, decode {out.shape}")

    tok = args.model_dir / "tokenizer"
    tok2 = args.model_dir / "tokenizer_2"
    toks = " ".join(str(t) for t in (tok, tok2) if t.exists()) or "<tokenizer dir>"
    log("next steps:")
    log(f"  python examples/end_to_end.py --family {args.family} "
        f"--params {args.out} --tokenizer {toks}")


if __name__ == "__main__":
    main()
