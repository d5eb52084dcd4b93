"""Wiring tests for the example entrypoints (reference main.py:592-651).

The heavy flows are covered at the api level; these pin the example
scripts' argument plumbing — notably the round-5 ``--dtype`` and
``--validation-images`` flags (the SDXL-rehearsal configuration) — by
monkeypatching the api layer and inspecting the configs it receives.
"""

import sys
import types
from pathlib import Path

import numpy as np
from PIL import Image


def test_end_to_end_flag_plumbing(monkeypatch, tmp_path):
    import examples.end_to_end as e2e
    from tml_image_editing_defense_tpu import api
    from tml_image_editing_defense_tpu.core.rng import save_noise_pool
    import jax.numpy as jnp

    src = tmp_path / "src.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)
        .astype(np.uint8)).save(src)
    val_list = tmp_path / "validation_images.txt"
    val_list.write_text(f"{src}\n")
    out = tmp_path / "out"
    out.mkdir()

    seen = {}

    def fake_immunize(cfg, **kw):
        seen["train"] = cfg
        # the artifacts the script reloads (main.py:618-622 contract)
        Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(
            out / "adversarial_image.png")
        save_noise_pool(out / "noise.npz",
                        jnp.zeros((1, 4, 4, 4), jnp.bfloat16))
        return types.SimpleNamespace(model="MODEL")

    def fake_evaluate(cfg, adv, **kw):
        seen["infer"] = cfg
        seen["eval_kw"] = kw
        return []

    monkeypatch.setattr(api, "immunize", fake_immunize)
    monkeypatch.setattr(api, "evaluate", fake_evaluate)
    monkeypatch.setattr(sys, "argv", [
        "end_to_end", "--family", "tiny", "--steps", "3",
        "--source", str(src), "--output", str(out),
        "--dtype", "bfloat16", "--eval-prompts", "2",
        "--validation-images", str(val_list),
    ])
    e2e.main()

    train, infer = seen["train"], seen["infer"]
    assert train.dtype == "bfloat16" and infer.dtype == "bfloat16"
    assert train.n_optimization_steps == 3
    assert infer.validation_images_path == val_list
    assert len(seen["eval_kw"]["inference_prompts"]) == 2
    assert seen["eval_kw"]["model"] == "MODEL"
    # the bf16 pool survived the .npz round-trip into evaluate
    assert seen["eval_kw"]["noises"].shape == (1, 4, 4, 4)


def test_end_to_end_checkpoint_resume_plumbing(monkeypatch, tmp_path):
    """--checkpoint-interval flows into TrainConfig and --resume points
    api.immunize at <output>/attack_state.npz (round-5: tunneled-TPU
    workers can crash mid-immunize; the rehearsal must be resumable)."""
    import examples.end_to_end as e2e
    from tml_image_editing_defense_tpu import api
    from tml_image_editing_defense_tpu.core.rng import save_noise_pool
    import jax.numpy as jnp

    src = tmp_path / "src.png"
    Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(src)
    out = tmp_path / "out"
    out.mkdir()
    seen = {}

    def fake_immunize(cfg, resume_from=None, **kw):
        seen["cfg"], seen["resume_from"] = cfg, resume_from
        Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(
            out / "adversarial_image.png")
        save_noise_pool(out / "noise.npz", jnp.zeros((1, 4, 4, 4)))
        return types.SimpleNamespace(model="MODEL")

    monkeypatch.setattr(api, "immunize", fake_immunize)
    monkeypatch.setattr(api, "evaluate", lambda *a, **kw: [])
    monkeypatch.setattr(sys, "argv", [
        "end_to_end", "--family", "tiny", "--steps", "3",
        "--source", str(src), "--output", str(out),
        "--checkpoint-interval", "25", "--resume",
        "--dispatch-block", "5",
    ])
    e2e.main()
    assert seen["cfg"].checkpoint_interval == 25
    assert seen["cfg"].dispatch_block == 5
    assert seen["resume_from"] == out / "attack_state.npz"

    # without --resume the run must start fresh (resume_from=None)
    monkeypatch.setattr(sys, "argv", [
        "end_to_end", "--family", "tiny", "--steps", "3",
        "--source", str(src), "--output", str(out),
    ])
    e2e.main()
    assert seen["resume_from"] is None and seen["cfg"].checkpoint_interval == 0
    assert seen["cfg"].dispatch_block is None
