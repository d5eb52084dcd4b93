from tml_image_editing_defense_tpu.models.clip_text import (  # noqa: F401
    CLIPTextConfig,
    CLIPTextModel,
)
from tml_image_editing_defense_tpu.models.model_zoo import (  # noqa: F401
    DiffusionModel,
    PromptBank,
    build_model,
)
from tml_image_editing_defense_tpu.models.tiny_vae import (  # noqa: F401
    AutoencoderTiny,
    TinyAutoencoder,
    TinyVAEConfig,
    build_tiny_autoencoder,
)
from tml_image_editing_defense_tpu.models.unet import UNet2DCondition, UNetConfig  # noqa: F401
from tml_image_editing_defense_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: F401
