"""AutoencoderTiny (TAESD) parity + universal-trainer preview decoding.

The reference's universal-perturbation trainer decodes its edited latents
through ``AutoencoderTiny.from_pretrained("madebyollin/taesdxl")`` inside the
gradient path (``old/train_noise.py:82, 151``).  These tests pin our linen
implementation to a from-scratch functional torch mirror of diffusers'
``EncoderTiny``/``DecoderTiny``/``AutoencoderTinyBlock`` (flat Sequential
indices, bias-free stride-2/stage-exit convs, [-1,1]↔[0,1] rescales, tanh
latent clamp), verify converter round-trips and the full-size taesd manifest,
and exercise the preview path through the universal trainer.
"""

import json
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.models.convert import (
    convert_state_dict,
    export_key_shapes,
    export_state_dict,
)
from tml_image_editing_defense_tpu.models.tiny_vae import (
    TAESD,
    TINY_TAESD,
    AutoencoderTiny,
    build_tiny_autoencoder,
    tiny_vae_param_shapes,
)

torch.set_grad_enabled(False)

MANIFESTS = Path(__file__).parent / "manifests"


# --------------------------------------------------------------------------
# torch-side functional mirror (NCHW, diffusers AutoencoderTiny structure)
# --------------------------------------------------------------------------

def _t(sd, key):
    return torch.from_numpy(np.ascontiguousarray(sd[key]))


def _conv(sd, p, x, stride=1):
    bias = _t(sd, p + ".bias") if (p + ".bias") in sd else None
    return F.conv2d(x, _t(sd, p + ".weight"), bias, stride=stride, padding=1)


def _block(sd, p, x):
    h = F.relu(_conv(sd, p + ".conv.0", x))
    h = F.relu(_conv(sd, p + ".conv.2", h))
    h = _conv(sd, p + ".conv.4", h)
    if (p + ".skip.weight") in sd:
        x = F.conv2d(x, _t(sd, p + ".skip.weight"), None)
    return F.relu(h + x)


def torch_tiny_encode(sd, cfg, x):
    x = x.add(1).div(2)                  # [-1,1] → [0,1] (EncoderTiny.forward)
    idx = 0
    for i, n_blocks in enumerate(cfg.num_encoder_blocks):
        x = _conv(sd, f"encoder.layers.{idx}", x, stride=1 if i == 0 else 2)
        idx += 1
        for _ in range(n_blocks):
            x = _block(sd, f"encoder.layers.{idx}", x)
            idx += 1
    return _conv(sd, f"encoder.layers.{idx}", x)


def torch_tiny_decode(sd, cfg, z):
    m = cfg.latent_magnitude
    x = torch.tanh(z / m) * m            # latent clamp (DecoderTiny.forward)
    x = F.relu(_conv(sd, "decoder.layers.0", x))
    idx = 2
    n_stages = len(cfg.num_decoder_blocks)
    for i, n_blocks in enumerate(cfg.num_decoder_blocks):
        is_final = i == n_stages - 1
        for _ in range(n_blocks):
            x = _block(sd, f"decoder.layers.{idx}", x)
            idx += 1
        if not is_final:
            x = F.interpolate(x, scale_factor=cfg.upsampling_factor, mode="nearest")
            idx += 1                     # nn.Upsample consumes an index
        x = _conv(sd, f"decoder.layers.{idx}", x)
        idx += 1
    return x.mul(2).sub(1)               # [0,1] → [-1,1]


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))


def _nhwc(x_nchw):
    return x_nchw.numpy().transpose(0, 2, 3, 1)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def test_tiny_vae_matches_torch_mirror():
    cfg = TINY_TAESD
    module = AutoencoderTiny(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)), jnp.float32)
    params = module.init(jax.random.key(0), x)["params"]
    sd = export_state_dict(params, "vae")

    z = np.asarray(module.apply({"params": params}, x,
                                method=AutoencoderTiny.encode))
    t_z = torch_tiny_encode(sd, cfg, _nchw(x))
    np.testing.assert_allclose(z, _nhwc(t_z), rtol=1e-5, atol=1e-5)

    zin = jnp.asarray(rng.standard_normal((2, 8, 8, cfg.latent_channels)),
                      jnp.float32)
    dec = np.asarray(module.apply({"params": params}, zin,
                                  method=AutoencoderTiny.decode))
    t_dec = torch_tiny_decode(sd, cfg, _nchw(zin))
    np.testing.assert_allclose(dec, _nhwc(t_dec), rtol=1e-5, atol=1e-5)


def test_tiny_vae_skip_conv_path_matches_torch_mirror():
    """Channel-changing blocks use the 1×1 bias-free skip conv — exercise it
    even though the real TAESD checkpoints are skip-free (all-equal widths)."""
    from tml_image_editing_defense_tpu.models.tiny_vae import TinyBlock

    module = TinyBlock(in_channels=3, out_channels=6)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    params = module.init(jax.random.key(0), x)["params"]
    ours = np.asarray(module.apply({"params": params}, x))
    sd = export_state_dict({"b": params}, "vae")
    theirs = _block(sd, "b", _nchw(x))
    np.testing.assert_allclose(ours, _nhwc(theirs), rtol=1e-5, atol=1e-5)


def test_tiny_vae_convert_round_trip():
    bundle = build_tiny_autoencoder("tiny", key=jax.random.key(1))
    sd = export_state_dict(bundle.params, "vae")
    back = convert_state_dict(bundle.params, sd, "vae", strict=True)
    flat_a = jax.tree_util.tree_leaves(bundle.params)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_taesd_full_size_manifest():
    """Every parameter of the real madebyollin/taesd[xl] checkpoint maps
    (name + torch shape) through the converter — offline real-weight proxy,
    same contract as tests/test_convert.py for the big models."""
    shapes = tiny_vae_param_shapes("taesd")
    ours = {k: list(v) for k, v in export_key_shapes(shapes, "vae").items()}
    manifest = json.loads((MANIFESTS / "taesd_vae.json").read_text())
    assert ours == manifest


def test_taesd_decoder_is_cheaper_than_full_vae():
    """The point of the preview decoder: far fewer parameters/FLOPs than the
    full AutoencoderKL decoder (real ratio ~40×; structural check here)."""
    from tml_image_editing_defense_tpu.models.vae import SD_VAE
    from tml_image_editing_defense_tpu.models.vae import AutoencoderKL as KL

    tiny_shapes = tiny_vae_param_shapes("taesd")
    n_tiny = sum(int(np.prod(s.shape)) for s in
                 jax.tree_util.tree_leaves(tiny_shapes))
    kl = KL(SD_VAE)
    kl_shapes = jax.eval_shape(
        lambda: kl.init(jax.random.key(0),
                        jnp.zeros((1, 64, 64, 3)), jax.random.key(0))
    )["params"]
    n_kl = sum(int(np.prod(s.shape)) for s in
               jax.tree_util.tree_leaves(kl_shapes))
    assert n_tiny * 10 < n_kl            # 2.4 M vs 83.7 M in reality


def test_universal_trainer_adam_mode():
    """``optimizer="adam"`` really steps (the reference built Adam and never
    stepped it, old/train_noise.py:96): the update differs from the
    normalized-gradient rule while the ε/validity projections still hold."""
    from tml_image_editing_defense_tpu.attack.universal import (
        UniversalConfig,
        train_universal_perturbation,
    )
    from tml_image_editing_defense_tpu.models.model_zoo import build_model

    model = build_model("tiny", key=jax.random.key(0), fast_init=True)
    rng = np.random.default_rng(9)
    images = [rng.uniform(-1, 1, (1, model.image_size, model.image_size, 3))
              .astype(np.float32)]
    base = dict(max_steps=2, grad_reps=1, epochs=2,
                image_size=model.image_size)
    pert_adam, losses_adam = train_universal_perturbation(
        model, images, UniversalConfig(optimizer="adam", lr=1e-2, **base),
        jax.random.key(4))
    pert_ref, _ = train_universal_perturbation(
        model, images, UniversalConfig(**base), jax.random.key(4))

    assert np.isfinite(losses_adam).all()
    assert np.all(np.abs(np.asarray(pert_adam)) <= 0.1 + 1e-6)
    assert np.abs(np.asarray(pert_adam) - np.asarray(pert_ref)).max() > 0


def test_universal_attack_example_entrypoint(tmp_path):
    """examples/universal_attack.py — the argparse analog of the reference's
    pyrallis CLI (old/train_noise.py:51) — runs end-to-end on the tiny family
    and writes the perturbation + preview artifacts."""
    import sys

    sys.path.insert(0, str(Path(__file__).parents[1] / "examples"))
    try:
        import universal_attack
    finally:
        sys.path.pop(0)

    from PIL import Image
    rng = np.random.default_rng(7)
    ds = tmp_path / "ds"
    ds.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
        ).save(ds / f"im{i}.png")
    out = tmp_path / "out"
    universal_attack.main([
        "--family", "tiny", "--dataset-dir", str(ds), "--steps", "1",
        "--grad-reps", "2", "--output", str(out), "--vis-every", "1",
        "--remat-policy", "full",     # the 1024²-fit knob, plumbed through
        "--eot-shards", "2",          # reps-axis sharding, plumbed through
    ])
    pert = np.load(out / "perturbation.npy")
    assert pert.shape == (1, 32, 32, 3)
    assert np.abs(pert).max() <= 0.1 + 1e-6          # default eps
    assert (out / "perturbed_example.png").exists()
    # validation collage (old/train_noise.py:196-214): [pert|src|val] hstack
    collage = np.asarray(Image.open(out / "validation_00000.png"))
    assert collage.shape[1] == 3 * 32 and collage.shape[0] >= 32


def test_universal_trainer_with_preview_decoder():
    """End-to-end: the universal step decodes through the tiny preview VAE
    (old/train_noise.py:151 semantics) — loss differs from the full-VAE
    fallback, constraints still hold, and both paths are deterministic."""
    from tml_image_editing_defense_tpu.attack.universal import (
        UniversalConfig,
        train_universal_perturbation,
    )
    from tml_image_editing_defense_tpu.models.model_zoo import build_model

    model = build_model("tiny", key=jax.random.key(0), fast_init=True)
    preview = build_tiny_autoencoder("tiny", key=jax.random.key(2),
                                     image_size=model.image_size)
    rng = np.random.default_rng(3)
    images = [rng.uniform(-1, 1, (1, model.image_size, model.image_size, 3))
              .astype(np.float32) for _ in range(2)]
    cfg = UniversalConfig(max_steps=2, grad_reps=2,
                          image_size=model.image_size)

    pert_p, losses_p = train_universal_perturbation(
        model, images, cfg, jax.random.key(5), preview=preview)
    pert_f, losses_f = train_universal_perturbation(
        model, images, cfg, jax.random.key(5))
    pert_p2, losses_p2 = train_universal_perturbation(
        model, images, cfg, jax.random.key(5), preview=preview)

    assert np.all(np.abs(np.asarray(pert_p)) <= cfg.eps + 1e-6)
    assert np.isfinite(losses_p).all() and np.isfinite(losses_f).all()
    # deterministic given the same key
    np.testing.assert_array_equal(np.asarray(pert_p), np.asarray(pert_p2))
    assert losses_p == losses_p2
    # the preview decoder is actually on the loss path
    assert losses_p != losses_f
    assert np.abs(np.asarray(pert_p) - np.asarray(pert_f)).max() > 0
