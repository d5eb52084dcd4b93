"""Configuration system: dataclass configs + prompt banks.

Mirrors the live config generation of the reference (``configs.py:86-193``):
dataclass configs with ``__post_init__`` derivation, including the reference's
norm-conditional hyperparameter override (``configs.py:152-159`` — user-passed
``eps``/``step_size``/``grad_reps`` are *replaced* according to ``norm_type``;
we keep that behaviour behind ``derive_norm_hyperparams`` so it can be turned
off).  The prompt banks reproduce the reference's EOT prompt distribution
(``configs.py:7-60``) and evaluation prompts (``configs.py:61-82``) verbatim —
they are data, part of the measured defense.

TPU-specific knobs (absent from the reference, which is single-GPU torch):
``dtype``, ``eot_mode``, ``remat_policy``, and mesh axis names used by
:mod:`~tml_image_editing_defense_tpu.parallel`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Tuple

# ---------------------------------------------------------------------------
# Prompt banks (reference configs.py:7-83). These define the EOT distribution
# the attack is trained over and the held-out edit prompts it is evaluated on.
# ---------------------------------------------------------------------------

_TEXTURE_PROMPTS = (
    "",
    "melting",
    "shattered",
    "moldy",
    "plush",
    "futuristic",
    "glowing",
    "wet",
    "marble",
    "origami",
    "hologram",
    "made of glass",
    "covered in moss",
)

_STYLE_PROMPTS = (
    "painting",
    "sketch",
    "mosaic",
    "oil painting",
    "pencil drawing",
    "charcoal drawing",
    "pastel drawing",
    "ink drawing",
    "3d rendering",
    "comic drawing",
    "animation",
    "anime",
    "pixel art",
    "concept art",
    "minimalist art",
    "in the style of picasso",
    "in the style of van gogh",
    "in the style of monet",
    "wooden sculpture",
    "street art stencil",
    "chalk drawing",
)

_SCENE_PROMPTS = (
    "underwater",
    "on mars",
    "in utopian world",
    "in a desert",
    "in a city",
    "in an apocalypse",
    "in a fantasy world",
    "in a lightning storm",
    "in a medieval setting",
    "in a futuristic city",
    "in a forest",
    "in a jungle",
    "in a mountain",
    "on an alien planet",
    "during a sunset",
    "in an enchanted forest",
)

#: Training-time EOT prompt bank (48 entries, reference ``configs.py:7-60``).
PROMPTS_LIST: List[str] = list(_TEXTURE_PROMPTS + _STYLE_PROMPTS + _SCENE_PROMPTS)

#: Held-out evaluation prompts (reference ``configs.py:61-82``).
INFERENCE_PROMPTS: List[str] = [
    "frozen",
    "muddy",
    "gold",
    "lego",
    "made of candy",
    "watercolor painting",
    "cartoon",
    "pixel art",
    "grafiti",
    "abstract art",
    "cubism",
    "in space",
    "underwater",
    "in a snowstorm",
    "on a beach",
    "expressionist style",
    "disney style",
    "in a sci-fi world",
]

#: Negative prompt bank (reference ``configs.py:83``; commented out at every
#: call site in the reference, kept for parity).
NEGATIVE_PROMPT: str = (
    "(worst quality, low quality, blurry:1.3), (bad teeth, deformed teeth, "
    "deformed lips), (bad anatomy, bad proportions:1.1), (deformed iris, "
    "deformed pupils), (deformed eyes, bad eyes), (deformed face, ugly face, "
    "bad face), (deformed hands, bad hands, fused fingers), morbid, mutilated, "
    "mutation, disfigured"
)


def format_prompt(prompt: str, caption: str = "") -> str:
    """Reference prompt formatting: optional caption prefix + ``, detailed``
    suffix (``main.py:86-87``, ``main.py:481-482``)."""
    if caption:
        prompt = f"{caption} {prompt}"
    return f"{prompt}, detailed"


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclass
class TrainConfig:
    """Immunization (PGD attack) configuration.

    Field-for-field superset of the reference ``TrainConfig``
    (``configs.py:86-159``); extra TPU-only fields are grouped at the bottom.
    """

    # --- paths / bookkeeping (reference configs.py:88-97) ---
    source_image_path: Path = Path("data/images/japan.jpg")
    target_image_path: Path = Path("data/images/stick-figure-sticker.jpg")
    default_source_image_caption: str = ""
    output_path: Path = Path("./output")
    experiment_name: str = "experiment_l2_fixed_noise"

    # --- optimization schedule (configs.py:98-113) ---
    n_optimization_steps: int = 200
    n_denoising_steps_per_iteration: int = 4
    apply_loss_on_images: bool = True
    apply_loss_on_latents: bool = False
    limit_timesteps: bool = True          # drop denoise steps with t >= 700 (main.py:198-199)
    rec_loss_lambda: float = 1.0
    perturbation_loss_lambda: float = 1.0
    seed: int = 42

    # --- EOT distribution (configs.py:114-117) ---
    prompts: List[str] = field(default_factory=lambda: list(PROMPTS_LIST))
    #: CFG negative prompt shared by every EOT sample.  The reference defines
    #: NEGATIVE_PROMPT (configs.py:83) but leaves it commented out at each
    #: call site, so the parity default is "" — pass
    #: ``negative_prompt=NEGATIVE_PROMPT`` to switch it on.
    negative_prompt: str = ""

    # --- PGD hyperparameters (configs.py:119-135) ---
    norm_type: str = "l2"                 # "l2" | "linf"
    eps: float = 0.1
    step_size: float = 0.006
    min_value: float = -1.0
    max_value: float = 1.0
    guidance_scale: float = 3.0
    grad_reps: int = 5
    eta: float = 0.9                      # DDIM eta (used iff scheduler takes it, main.py:219-220)

    # --- behaviour toggles (configs.py:136-143) ---
    add_image_caption_to_prompts: bool = False
    use_segmentation_mask: bool = False
    use_fixed_noise: bool = True
    n_noise: int = 1
    #: Local checkpoint directories for the gated aux models (None → the
    #: reference HF ids, which need network/warm cache; docs/AUX_MODELS.md).
    caption_model_path: Optional[str] = None
    segmentation_model_path: Optional[str] = None

    # --- visualization (configs.py:145-146) ---
    image_visualization_interval: int = 25

    # --- model selection (reference passes these to Trainer(), main.py:27) ---
    use_sdxl: bool = False
    use_lcm: bool = True
    image_size: int = 512
    #: Explicit model-family override ("sd15" | "sdxl" | "tiny" | "tiny-sdxl"
    #: | "sd15-inpaint" | "tiny-inpaint"); None derives from use_sdxl (or from
    #: attack_mode="inpaint").  tiny families are for dev/CI runs.
    model_family: Optional[str] = None
    #: Which attack drives the immunization: "diffusion" (the reference's
    #: live path, Trainer.attack_forward main.py:179-246) or "inpaint"
    #: (PhotoGuard's complex attack against the 9-channel inpaint UNet,
    #: old/yuval_playground.py:46-160, 345-366 — runnable as a script there,
    #: a first-class api.immunize route here).  The inpaint mode uses the
    #: legacy timestep window 100 < t < 800 (yuval_playground.py:106) and
    #: never masks the perturbation (super_l2/linf take no mask).
    attack_mode: str = "diffusion"

    # --- TPU-native knobs (no reference equivalent) ---
    #: If True, replicate the reference's ``__post_init__`` override of
    #: eps/step_size/grad_reps by norm type (configs.py:152-159).
    derive_norm_hyperparams: bool = True
    #: Compute dtype for model forward/backward ("bfloat16" | "float32").
    dtype: str = "float32"
    #: How EOT gradient samples are evaluated inside the jitted step:
    #: "scan" (sequential, lowest memory), "vmap" (parallel on one chip),
    #: "shard" (sharded over the mesh `reps` axis, pmean-reduced).
    eot_mode: str = "scan"
    #: EOT reps evaluated per scan iteration (eot_mode="scan" only): >1 vmaps
    #: a chunk of reps through the UNet/VAE together — larger conv batches,
    #: higher MXU utilization, ×chunk activation memory.  Must divide
    #: grad_reps.
    eot_chunk: int = 1
    #: Shard the EOT gradient samples over the mesh ``reps`` axis
    #: (parallel/eot.py, pmean over ICI).  None = auto: on a multi-chip host
    #: :func:`api.immunize` uses the largest divisor of ``grad_reps`` that
    #: fits the local device count; 1 disables sharding; N forces N shards
    #: (must divide grad_reps).  This is how one image's 10-rep SDXL attack
    #: spreads over a chip slice — the reference has no analog (single GPU).
    eot_shards: Optional[int] = None
    #: Rematerialization policy for the denoising scan body:
    #: What the backward pass recomputes inside each denoise step:
    #: "none" (no checkpoint — attention is always internally remat'd, so
    #: this saves conv/dense outputs only: 5.9 GB temp at SD-1.5 512²),
    #: "dots" (save unbatched matmul outputs), "conv_dots" (save conv
    #: outputs too), "full" (recompute everything — required at SDXL 1024²).
    #: Measured on v5e @512² SD-1.5: full 2.95 → dots 2.66 → none 2.42
    #: s/step (docs/PERF.md).
    remat_policy: str = "none"
    #: Unroll the K-step denoise scan inside the jit (None = auto: unroll
    #: when K≤4, ~1.4% faster; False keeps huge programs — SDXL 1024²
    #: fwd+bwd — within the compiler's reach).
    unroll_denoise: Optional[bool] = None
    #: Fuse up to this many PGD iterations into one dispatch in the
    #: host-driven immunize loop (``lax.scan`` blocks; identical math and
    #: RNG stream; vis/checkpoint callbacks still fire at the exact same
    #: iterations — preemption polling coarsens to a block).  None = one
    #: dispatch per iteration.  Worth setting to the vis interval when
    #: dispatch rides a network tunnel (measured ~0.8 s/dispatch under
    #: load, +46% on the 200-step rehearsal — docs/ROUND4.md); irrelevant
    #: on directly-attached chips.
    dispatch_block: Optional[int] = None
    #: Checkpoint the VAE encode/decode inside the EOT gradient: their
    #: forward activations (~1.2 GB of encoder conv outputs at 1024²) are
    #: recomputed in the backward instead of saved.  Required (with
    #: attn_kv_chunk) to fit SDXL 1024² fwd+bwd in one chip's HBM.
    remat_vae: bool = False
    #: Use the fused Pallas perturbation-update kernels on TPU (ops/).
    use_pallas_update: bool = True
    #: Run host visualization callbacks (device→host sync) at vis intervals.
    enable_visualization: bool = True
    #: Optional PGD-state checkpointing every N steps (0 = off).
    checkpoint_interval: int = 0
    #: Converted real-weight checkpoint (msgpack from
    #: scripts/prepare_real_weights.py).  None = random weights (same compute
    #: graph; what tests/bench use).  This is the offline analog of the
    #: reference's runtime ``from_pretrained`` (main.py:278-309).
    params_path: Optional[Path] = None
    #: Local HF tokenizer directories (one per text encoder; None entries or
    #: None = deterministic hash tokenizer fallback).
    tokenizer_paths: Optional[List[Optional[str]]] = None

    def __post_init__(self):
        self.source_image_path = Path(self.source_image_path)
        self.target_image_path = Path(self.target_image_path)
        self.output_path = Path(self.output_path)
        if self.derive_norm_hyperparams:
            # Reference semantics (configs.py:152-159): these three are
            # *unconditionally* overridden according to the norm type.
            if self.norm_type == "l2":
                self.eps = 32.0
                self.step_size = 7.5
                self.grad_reps = 10
            else:
                self.eps = 0.1
                self.step_size = 0.006
                self.grad_reps = 5

    @property
    def latent_size(self) -> int:
        return self.image_size // 8

    def asdict(self) -> dict:
        d = dataclasses.asdict(self)
        for k, v in d.items():
            if isinstance(v, Path):
                d[k] = str(v)
        return d


@dataclass
class InferenceConfig:
    """Evaluation configuration (reference ``configs.py:162-193``)."""

    source_image_path: Path = Path("data/images/japan.jpg")
    target_image_path: Path = Path("data/images/japan.jpg")
    default_source_image_caption: str = ""
    output_path: Path = Path("./output")
    experiment_name: str = "experiment_inference"
    n_steps: int = 100                    # denoising steps for the edit
    strength: float = 0.6                 # SDEdit strength
    guidance_scale: float = 7.5
    seed: int = 42
    add_image_caption_to_prompts: bool = False
    use_fixed_noise: bool = True
    n_noise: int = 1
    #: CFG negative prompt for every evaluation edit (reference keeps its
    #: NEGATIVE_PROMPT bank commented out — default "" is parity).
    negative_prompt: str = ""
    #: Local BLIP-2 checkpoint directory (None → reference HF id).
    caption_model_path: Optional[str] = None
    validation_images_path: Optional[Path] = Path("validation_images.txt")

    # --- model selection ---
    use_sdxl: bool = False
    use_lcm: bool = False
    image_size: int = 512
    model_family: Optional[str] = None

    # --- SDXL refiner-style knobs (sdxl_img2img_pipeline.py:306-320,
    #     344-378): stop the edit early at the given fraction, and/or build
    #     aesthetic-score 5-tuple micro-conditioning ids ---
    denoising_end: Optional[float] = None
    aesthetic_score: Optional[float] = None
    negative_aesthetic_score: Optional[float] = None

    # --- TPU-native knobs ---
    dtype: str = "float32"
    save_images: bool = True
    #: Shard the (prompt × noise) evaluation cells over the mesh ``data``
    #: axis (cells are independent pipeline pairs — embarrassingly parallel,
    #: reference runs them sequentially at main.py:469-521).  None = auto
    #: (all local devices); 1 disables sharding.
    eval_shards: Optional[int] = None
    #: Converted real-weight checkpoint + local tokenizer dirs (see
    #: TrainConfig.params_path / scripts/prepare_real_weights.py).
    params_path: Optional[Path] = None
    tokenizer_paths: Optional[List[Optional[str]]] = None

    def __post_init__(self):
        self.source_image_path = Path(self.source_image_path)
        self.target_image_path = Path(self.target_image_path)
        self.output_path = Path(self.output_path)
        if self.validation_images_path is not None:
            self.validation_images_path = Path(self.validation_images_path)

    def asdict(self) -> dict:
        d = dataclasses.asdict(self)
        for k, v in d.items():
            if isinstance(v, Path):
                d[k] = str(v)
        return d


@dataclass
class SweepConfig:
    """Grid-sweep configuration (reference ``run_all.py:23-93``).

    The reference sweeps {images} × {n_prompts ∈ 1,10,25,all} ×
    {n_noises ∈ 1,3,5,∞} with manual 2-GPU data parallelism
    (``run_all.py:16-21``); here the image axis is sharded over the TPU mesh.
    """

    images_dir: Path = Path("./images")
    output_root: Path = Path("./output/sweep")
    n_prompts_grid: Tuple[Optional[int], ...] = (1, 10, 25, None)   # None = all prompts
    n_noises_grid: Tuple[Optional[int], ...] = (1, 3, 5, None)      # None = unlimited (fresh noise)
    n_optimization_steps: int = 250
    use_sdxl: bool = False
    use_lcm: bool = True
    inference_n_steps: int = 4
    inference_strength: float = 0.6
    inference_guidance_scale: float = 7.5
    seed: Optional[int] = None            # None = random per cell (run_all.py:41)
    #: Run the per-cell evaluation stage (run_all.py:69-93).  False = training
    #: only — the adversarial artifacts are still written and can be evaluated
    #: later via ``api.evaluate`` (the artifact round-trip is the contract).
    run_inference: bool = True

    def __post_init__(self):
        self.images_dir = Path(self.images_dir)
        self.output_root = Path(self.output_root)
