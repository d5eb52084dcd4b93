"""FLOPs/MFU accounting for the 1024² paths (VERDICT r4 item 3).

docs/PERF.md records wall-clock for SDXL-1024 PGD (latent 10.49 / image
13.37 s/step, chunk-512, remat "full"+remat_vae) and the universal
trainer's native SDXL@1024² step (7.77 s with the TAESD preview decoder)
but never the model-TFLOPs behind them.  This script traces the exact
component jaxprs with ABSTRACT parameters (``jax.make_jaxpr`` over
``ShapeDtypeStruct`` trees — no 2.57B-param materialization, runs on CPU in
seconds) and reports, per path:

- useful model TFLOPs/step (fwd + input-grad backward = 2×fwd; remat
  recompute NOT counted — the convention utils/flops.py and bench.py use),
- useful MFU on the v5e (197 bf16 TFLOP/s peak),
- executed TFLOPs/step and executed "utilization" including the remat
  recompute: remat "full" re-runs each checkpointed forward inside the
  backward, so the differentiated chain executes ≈ 3×fwd instead of 2×fwd.

Reference anchor: 1024² is the reference-native universal-perturbation
size (old/train_noise.py:94) and SDXL's native resolution.

Run (CPU): TID_FORCE_CPU=1 PYTHONPATH=/root/repo python scripts/flops_1024.py
"""

from __future__ import annotations

import json
import os
import sys

import jax

if os.environ.get("TID_FORCE_CPU", "1") != "0":
    # default CPU (abstract tracing needs no chip); TID_FORCE_CPU=0 opts out
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK = 197e12

# Measured on the v5e (docs/PERF.md):
MEASURED = {
    "sdxl1024_pgd_latent": 10.49,   # "SDXL at native 1024²" table, chunk 512
    "sdxl1024_pgd_image": 13.37,    # same table, full reference config
    "universal_sdxl1024": 7.77,     # "Round 4: universal trainer" table
}
GRAD_REPS = 10
K_EFFECTIVE = 2                     # K=4 LCM, t<700 filter → 2 steps


def main():
    from tml_image_editing_defense_tpu.models.model_zoo import (
        _FAMILIES,
        param_shapes,
    )
    from tml_image_editing_defense_tpu.models.unet import UNet2DCondition
    from tml_image_editing_defense_tpu.models.vae import AutoencoderKL
    from tml_image_editing_defense_tpu.models.tiny_vae import (
        TAESD,
        AutoencoderTiny,
    )
    from tml_image_editing_defense_tpu.utils import flops as F

    size = 1024
    lat = size // 8
    shapes = param_shapes("sdxl", image_size=size)
    unet_cfg = _FAMILIES["sdxl"][0]
    unet = UNet2DCondition(unet_cfg)
    vae = AutoencoderKL(_FAMILIES["sdxl"][1])

    sds = lambda s: jax.ShapeDtypeStruct(s, jnp.float32)

    # one CFG-batched UNet call at 128² latents (text_time conditioning)
    unet1 = F.count_fn_flops(
        lambda p, l, t, c, te, ti: unet.apply(
            {"params": p}, l, t, c, text_embeds=te, time_ids=ti),
        shapes["unet"], sds((2, lat, lat, 4)),
        jax.ShapeDtypeStruct((), jnp.int32), sds((2, 77, 2048)),
        sds((2, 1280)), sds((2, 6)),
    )
    enc = F.count_fn_flops(
        lambda p, im: vae.apply({"params": p}, im, method=AutoencoderKL.encode),
        shapes["vae"], sds((1, size, size, 3)),
    )
    dec = F.count_fn_flops(
        lambda p, z: vae.apply({"params": p}, z, method=AutoencoderKL.decode),
        shapes["vae"], sds((1, lat, lat, 4)),
    )
    taesd = AutoencoderTiny(TAESD)
    taesd_shapes = jax.eval_shape(
        lambda: taesd.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))
    )["params"]
    taesd_dec = F.count_fn_flops(
        lambda p, z: taesd.apply({"params": p}, z, method=AutoencoderTiny.decode),
        taesd_shapes, sds((1, lat, lat, 4)),
    )
    print(f"component fwd TFLOPs @1024²: unet(CFG pair)={unet1/1e12:.2f} "
          f"enc={enc/1e12:.2f} dec={dec/1e12:.2f} taesd_dec={taesd_dec/1e12:.3f}",
          file=sys.stderr)

    rows = {}

    def row(name, useful, executed):
        s = MEASURED[name]
        rows[name] = {
            "s_per_step": s,
            "useful_tflops": round(useful / 1e12, 1),
            "useful_mfu": round(useful / s / V5E_PEAK, 4),
            "executed_tflops": round(executed / 1e12, 1),
            "executed_util": round(executed / s / V5E_PEAK, 4),
        }

    # SDXL-1024 PGD step (probe_sdxl_1024.py structure = attack/pgd.py):
    # per rep the K-step CFG UNet chain (+ full-VAE decode when image loss),
    # once per step the factored VAE encode fwd+VJP and one vis decode (the
    # probe predates decode_vis=False).  remat "full" + remat_vae ⇒ the
    # backward re-runs every checkpointed forward: executed ≈ 3×fwd on the
    # differentiated chain (vs 2×fwd useful).
    chain = K_EFFECTIVE * unet1
    useful_lat = F.pgd_step_model_flops(chain, enc, dec, GRAD_REPS,
                                        image_loss=False, vis_decode=True)
    exec_lat = GRAD_REPS * 3 * chain + 3 * enc + dec
    row("sdxl1024_pgd_latent", useful_lat, exec_lat)

    useful_img = F.pgd_step_model_flops(chain, enc, dec, GRAD_REPS,
                                        image_loss=True, vis_decode=True)
    exec_img = GRAD_REPS * 3 * (chain + dec) + 3 * enc + dec
    row("sdxl1024_pgd_image", useful_img, exec_img)

    # Universal step (attack/universal.py::_universal_rep_loss): per rep
    # VAE encode + ONE CFG UNet call + TAESD preview decode, all inside the
    # grad; stage-wise remat "full" ⇒ executed ≈ 3× the same chain.
    per_rep = enc + unet1 + taesd_dec
    row("universal_sdxl1024",
        GRAD_REPS * F.input_grad_flops(per_rep),
        GRAD_REPS * 3 * per_rep)

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
