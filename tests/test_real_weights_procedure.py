"""The real-weight landing procedure end-to-end (VERDICT r2 item 10): a
diffusers-layout checkpoint directory → ``scripts/prepare_real_weights.py``
→ native msgpack → ``cfg.params_path`` → ``api.immunize`` uses exactly those
weights.  Run offline with a tiny model exported through our own converter
(the inverse mapping is what real checkpoints will traverse —
``models/convert.py``; reference analog ``main.py:278-309``)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from tml_image_editing_defense_tpu.models import build_model
from tml_image_editing_defense_tpu.models.convert import export_state_dict

safetensors_numpy = pytest.importorskip("safetensors.numpy")

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """Tiny diffusers-layout checkpoint directory, via our exporter."""
    d = tmp_path_factory.mktemp("tiny_ckpt")
    model = build_model("tiny", key=jax.random.key(3), image_size=32)
    for sub, kind, params in (
        ("unet", "unet", model.params["unet"]),
        ("vae", "vae", model.params["vae"]),
        ("text_encoder", "clip", model.params["text"][0]),
    ):
        (d / sub).mkdir()
        state = {k: np.ascontiguousarray(v)
                 for k, v in export_state_dict(params, kind).items()}
        safetensors_numpy.save_file(state, str(d / sub / "model.safetensors"))
    return d, model


def test_prepare_script_converts_and_smokes(ckpt_dir, tmp_path):
    d, model = ckpt_dir
    out = tmp_path / "tiny.msgpack"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["TID_FORCE_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "prepare_real_weights.py"),
         "--model-dir", str(d), "--family", "tiny", "--image-size", "32",
         "--out", str(out), "--smoke"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "smoke OK" in r.stdout
    assert out.exists()

    # round-trip: the converted file holds exactly the exported weights
    from tml_image_editing_defense_tpu.models.checkpoint_io import load_params

    tmpl = build_model("tiny", key=jax.random.key(9), image_size=32,
                       fast_init=True)
    loaded = load_params(out, jax.device_get(tmpl.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=0, atol=0),
        loaded, jax.device_get(model.params),
    )


def test_params_path_threads_into_immunize(ckpt_dir, tmp_path):
    """cfg.params_path is the production weights entry: immunize must build
    its model from the converted file, not random init."""
    from PIL import Image

    from tml_image_editing_defense_tpu import api
    from tml_image_editing_defense_tpu.configs import TrainConfig
    from tml_image_editing_defense_tpu.models.checkpoint_io import save_params

    d, model = ckpt_dir
    pfile = tmp_path / "p.msgpack"
    save_params(pfile, model.params)

    rng = np.random.default_rng(0)
    img = tmp_path / "src.png"
    Image.fromarray(rng.uniform(0, 255, (40, 40, 3)).astype(np.uint8)).save(img)
    cfg = TrainConfig(
        source_image_path=img, target_image_path=img,
        output_path=tmp_path / "out", model_family="tiny", image_size=32,
        n_optimization_steps=1, n_denoising_steps_per_iteration=2,
        limit_timesteps=False, derive_norm_hyperparams=False,
        norm_type="linf", eps=0.1, step_size=0.02, grad_reps=2,
        apply_loss_on_latents=True, apply_loss_on_images=False,
        perturbation_loss_lambda=0.0, prompts=["a"], use_lcm=True,
        enable_visualization=False, params_path=pfile,
    )
    res = api.immunize(cfg)
    got = jax.device_get(res.model.params["unet"])
    want = jax.device_get(model.params["unet"])
    leaf_g = jax.tree.leaves(got)[0]
    leaf_w = jax.tree.leaves(want)[0]
    np.testing.assert_allclose(np.asarray(leaf_g), np.asarray(leaf_w))
    assert np.isfinite(np.asarray(res.x_adv)).all()
