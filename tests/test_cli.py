"""CLI-level tests: the auto-generated argparse surface (cli.py) is the
product entry point (SURVEY §2 C9 — the reference's only CLI,
``utils/parser.py``, is legacy and broken), so drive it end-to-end:
flag parsing → dataclass config → immunize artifacts → evaluate grids.
"""

import numpy as np
from PIL import Image

from tml_image_editing_defense_tpu import cli

_FAST_FLAGS = [
    "--model-family", "tiny",
    "--image-size", "32",
    "--n-optimization-steps", "2",
    "--n-denoising-steps-per-iteration", "2",
    "--grad-reps", "2",
    "--limit-timesteps", "false",
    "--derive-norm-hyperparams", "false",
    "--norm-type", "linf",
    "--eps", "0.1",
    "--step-size", "0.02",
    "--apply-loss-on-images", "false",
    "--apply-loss-on-latents", "true",
    "--perturbation-loss-lambda", "0",
    "--enable-visualization", "false",
]


def _write_img(path, seed=0, size=(64, 48)):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.uniform(0, 255, (size[1], size[0], 3)).astype(np.uint8)).save(path)
    return path


def test_cli_immunize_then_evaluate(tmp_path):
    src = _write_img(tmp_path / "src.jpg", 0)
    tgt = _write_img(tmp_path / "tgt.jpg", 1)
    out = tmp_path / "out"
    rc = cli.main([
        "immunize",
        "--source-image-path", str(src),
        "--target-image-path", str(tgt),
        "--output-path", str(out),
        "--prompts", "a", "b",
        *_FAST_FLAGS,
    ])
    assert rc == 0
    assert (out / "adversarial_image.png").exists()
    assert (out / "noise.npz").exists()

    eval_out = tmp_path / "eval"
    rc = cli.main([
        "evaluate",
        "--adversarial-image", str(out / "adversarial_image.png"),
        "--noise-pool", str(out / "noise.npz"),
        "--source-image-path", str(src),
        "--target-image-path", str(tgt),
        "--output-path", str(eval_out),
        "--model-family", "tiny",
        "--image-size", "32",
        "--n-steps", "2",
        "--n-noise", "1",
        "--use-lcm", "true",
        "--prompts", "a",
        "--validation-images-path", str(tmp_path / "no_such_list.txt"),
    ])
    assert rc == 0
    pngs = list(eval_out.rglob("*.png"))
    assert pngs, "evaluate produced no comparison grids"


def test_cli_immunize_inpaint_route(tmp_path):
    """The inpaint attack is reachable from the CLI (VERDICT r4 item 4)."""
    src = _write_img(tmp_path / "src.jpg", 2)
    out = tmp_path / "out_inpaint"
    rc = cli.main([
        "immunize",
        "--source-image-path", str(src),
        "--target-image-path", str(src),
        "--output-path", str(out),
        "--prompts", "a", "b",
        "--attack-mode", "inpaint",
        "--model-family", "tiny-inpaint",
        "--image-size", "32",
        "--n-optimization-steps", "2",
        "--n-denoising-steps-per-iteration", "2",
        "--grad-reps", "2",
        "--derive-norm-hyperparams", "false",
        "--norm-type", "l2",
        "--eps", "4.0",
        "--step-size", "1.0",
        "--apply-loss-on-images", "false",
        "--apply-loss-on-latents", "true",
        "--perturbation-loss-lambda", "0",
        "--enable-visualization", "false",
    ])
    assert rc == 0
    assert (out / "adversarial_image.png").exists()


def test_cli_flag_generation_and_bool_parsing():
    """Every TrainConfig field (minus the skip-list) must be reachable as a
    flag, and BOOL flags must accept true/false/1/0 spellings."""
    import dataclasses

    from tml_image_editing_defense_tpu.configs import TrainConfig

    p = cli.argparse.ArgumentParser()
    cli._add_dataclass_args(p, TrainConfig)
    args = p.parse_args(["--use-lcm", "0", "--use-sdxl", "TRUE", "--seed", "7",
                         "--eot-shards", "2"])
    assert args.use_lcm is False
    assert args.use_sdxl is True
    assert args.seed == 7
    # Optional[int] fields (default None) must parse as int, not str —
    # api._reps_sharding compares eot_shards against device counts
    assert args.eot_shards == 2
    for f in dataclasses.fields(TrainConfig):
        if f.name in cli._SKIP_FIELDS:
            continue
        assert hasattr(args, f.name), f"flag missing for TrainConfig.{f.name}"


def test_cli_sweep_grid_parsing(monkeypatch, tmp_path):
    """`sweep --n-prompts-grid 1 all` must become (1, None) on the config —
    the reference's n_prompts=None means 'the whole bank' (run_all.py)."""
    captured = {}

    def fake_sweep(cfg):
        captured["cfg"] = cfg
        return []

    from tml_image_editing_defense_tpu import api

    monkeypatch.setattr(api, "sweep", fake_sweep)
    rc = cli.main([
        "sweep",
        "--images-dir", str(tmp_path),
        "--output-root", str(tmp_path / "sweep"),
        "--n-prompts-grid", "1", "all",
        "--n-noises-grid", "2",
    ])
    assert rc == 0
    assert captured["cfg"].n_prompts_grid == (1, None)
    assert captured["cfg"].n_noises_grid == (2,)
