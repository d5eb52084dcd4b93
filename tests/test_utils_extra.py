"""Preemption handling, params IO, profiling utilities, vis grids."""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tml_image_editing_defense_tpu.models import build_model
from tml_image_editing_defense_tpu.models.checkpoint_io import load_params, save_params
from tml_image_editing_defense_tpu.utils.preemption import preemption_guard
from tml_image_editing_defense_tpu.utils.profiling import StepTimer, device_memory_stats
from tml_image_editing_defense_tpu.utils.vis import add_text_to_image, create_table_plot


def test_preemption_guard_sets_flag():
    with preemption_guard() as flag:
        assert not flag
        os.kill(os.getpid(), signal.SIGUSR1)
        # signal delivery is synchronous for same-process kill on the main thread
        assert flag
        assert flag.signum == signal.SIGUSR1
    # handler restored: flag untouched by a second signal? (would raise default)


def test_preempted_immunize_checkpoints(tmp_path):
    """A preempted run writes attack_state.npz and exits cleanly."""
    from tml_image_editing_defense_tpu import api
    from tml_image_editing_defense_tpu.configs import TrainConfig

    rng = np.random.default_rng(0)
    img = tmp_path / "s.jpg"
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8).astype(np.uint8)).save(img)
    model = build_model("tiny", key=jax.random.key(0))
    cfg = TrainConfig(
        source_image_path=img, target_image_path=img, output_path=tmp_path,
        n_optimization_steps=50, n_denoising_steps_per_iteration=2,
        limit_timesteps=False, derive_norm_hyperparams=False, norm_type="linf",
        eps=0.1, step_size=0.02, grad_reps=1, apply_loss_on_latents=True,
        apply_loss_on_images=False, perturbation_loss_lambda=0.0, image_size=32,
        prompts=["a"], enable_visualization=False, image_visualization_interval=5,
    )

    calls = {"n": 0}
    orig_run = api.run_pgd

    def preempting_run(*a, **kw):
        # set the flag after a couple of iterations via the vis callback
        flag = kw.get("stop_flag")
        orig_cb = kw.get("vis_callback")

        def cb(it, x, aux):
            calls["n"] += 1
            if orig_cb:
                orig_cb(it, x, aux)
            if calls["n"] >= 2 and flag is not None:
                flag.set(signal.SIGUSR1)

        kw["vis_callback"] = cb
        return orig_run(*a, **kw)

    api.run_pgd = preempting_run
    try:
        api.immunize(cfg, model=model)
    finally:
        api.run_pgd = orig_run
    assert (tmp_path / "attack_state.npz").exists()


def test_params_io_roundtrip(tmp_path):
    model = build_model("tiny", key=jax.random.key(0))
    p = tmp_path / "params.msgpack"
    save_params(p, model.params)
    template = jax.tree.map(jnp.zeros_like, model.params)
    loaded = load_params(p, template)
    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["n_steps"] == 2 and t.compile_time is not None


def test_vis_grid_shapes():
    imgs = [Image.fromarray(np.zeros((32, 32, 3), np.uint8)) for _ in range(3)]
    grid = create_table_plot(imgs, captions=["a", "bb", "a longer caption wrapping"])
    assert grid.width == 96
    assert grid.height > 32
    arr = add_text_to_image(np.zeros((32, 32, 3), np.uint8), "hello", min_lines=2)
    assert arr.shape[0] > 32 and arr.shape[1] == 32


def test_memory_stats_dict():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_flops_counting_closed_form():
    """Analytic FLOPs = 2·out·reduction for conv/dot; scan multiplies by
    trip count (utils/flops.py — backs the bench MFU key)."""
    import jax
    import jax.numpy as jnp
    from tml_image_editing_defense_tpu.utils import flops as F

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = F.count_fn_flops(conv, jnp.zeros((2, 32, 32, 8)), jnp.zeros((3, 3, 8, 16)))
    assert got == 2 * 2 * 32 * 32 * 16 * 3 * 3 * 8

    def dense(a, b):
        return jnp.einsum("btd,df->btf", a, b)

    got = F.count_fn_flops(dense, jnp.zeros((4, 10, 32)), jnp.zeros((32, 64)))
    assert got == 2 * 4 * 10 * 32 * 64

    def scanned(x):
        def body(c, _):
            return jnp.dot(c, jnp.ones((16, 16))), None
        y, _ = jax.lax.scan(body, x, None, length=5)
        return y

    assert F.count_fn_flops(scanned, jnp.zeros((16, 16))) == 5 * 2 * 16**3

    assert F.training_flops(10) == 30
    assert F.input_grad_flops(10) == 20   # PGD: input gradient only, no dL/dW
    assert F.mfu(1e12, 1.0) is None or F.mfu(1e12, 1.0) <= 1.0  # CPU → None


def test_profiling_sync_forces_completion_and_returns_scalar():
    """utils.profiling.sync must work on any array (scalar, nd) and return
    the first element as a python float — it is the only reliable wait
    primitive on async remote-dispatch backends."""
    import jax.numpy as jnp

    from tml_image_editing_defense_tpu.utils.profiling import sync

    assert sync(jnp.float32(3.5)) == 3.5
    assert sync(jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3)) == 0.0
    assert isinstance(sync(jnp.ones((2, 2))), float)


def test_noise_pool_bf16_npz_round_trip(tmp_path):
    """bf16 pools survive the .npz artifact contract (main.py:619-622):
    numpy cannot represent ml_dtypes.bfloat16, so save widens to f32
    (exact) and load casts back."""
    from tml_image_editing_defense_tpu.core.rng import (
        load_noise_pool, make_noise_pool, save_noise_pool,
    )

    pool = make_noise_pool(jax.random.key(3), 2, (8, 8, 4), dtype=jnp.bfloat16)
    save_noise_pool(tmp_path / "noise.npz", pool)
    back_f32 = load_noise_pool(tmp_path / "noise.npz")
    assert back_f32.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(back_f32), np.asarray(pool).astype(np.float32))
    back_bf16 = load_noise_pool(tmp_path / "noise.npz", jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(back_bf16), np.asarray(pool))


def test_attack_state_bf16_npz_round_trip(tmp_path):
    """attack_state.npz must round-trip bf16 exactly (same numpy limitation
    as the noise pool: bf16 saves as raw void bytes and a resume explodes
    with "Dtype |V2 is not a valid JAX array type" — observed live when a
    racing bf16 SDXL rehearsal resumed from its own checkpoint)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tml_image_editing_defense_tpu.utils.checkpoint import (
        load_attack_state,
        save_attack_state,
    )

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 3), jnp.bfloat16)
    pool = jax.random.normal(jax.random.key(1), (2, 1, 4, 4, 4), jnp.bfloat16)
    key = jax.random.key(7)
    p = tmp_path / "attack_state.npz"
    save_attack_state(p, x, 42, key, pool)
    x2, it, key2, pool2 = load_attack_state(p)
    assert x2.dtype == jnp.bfloat16 and pool2.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(x, np.float32),
                                  np.asarray(x2, np.float32))
    np.testing.assert_array_equal(np.asarray(pool, np.float32),
                                  np.asarray(pool2, np.float32))
    assert it == 42
    np.testing.assert_array_equal(jax.random.key_data(key),
                                  jax.random.key_data(key2))

    # f32 states keep their dtype and byte-identity (the sd15 default path)
    xf = jax.random.normal(jax.random.key(2), (1, 4, 4, 3), jnp.float32)
    save_attack_state(p, xf, 7, key, None)
    xf2, it2, _, pool_none = load_attack_state(p)
    assert xf2.dtype == jnp.float32 and pool_none is None and it2 == 7
    np.testing.assert_array_equal(np.asarray(xf), np.asarray(xf2))
