from tml_image_editing_defense_tpu.data.dataset import ImagePromptDataset  # noqa: F401
