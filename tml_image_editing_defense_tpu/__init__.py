"""tml_image_editing_defense_tpu — TPU-native image-immunization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``OrLichter/tml_image_editing_defense`` (PhotoGuard-style PGD immunization of
images against Stable Diffusion img2img editing).  Where the reference drives a
PyTorch/diffusers pipeline with Python loops and autograd
(``/root/reference/main.py:25-408``), this framework expresses each PGD
iteration as a single jitted XLA program: Flax SD-1.5/SDXL models, a
``lax.scan`` denoising chain with rematerialized backprop, Pallas-fused
perturbation updates, and ``jax.sharding`` data/EOT parallelism over a TPU
mesh.

Public surface (mirrors the reference's ``Trainer`` / ``Inference`` /
``run_all`` entry points):

- :mod:`~tml_image_editing_defense_tpu.configs` — ``TrainConfig``,
  ``InferenceConfig``, prompt banks.
- :func:`~tml_image_editing_defense_tpu.api.immunize` — PGD immunization of one
  image (= ``Trainer.run``, reference ``main.py:47-142``).
- :func:`~tml_image_editing_defense_tpu.api.evaluate` — clean-vs-adversarial
  edit comparison (= ``Inference.run_inference``, reference ``main.py:431-589``).
- :func:`~tml_image_editing_defense_tpu.api.sweep` — grid sweeps over images ×
  prompts × noises (= ``run_all.py``), data-parallel over the TPU mesh.
"""

__version__ = "0.1.0"

from tml_image_editing_defense_tpu import configs  # noqa: F401
