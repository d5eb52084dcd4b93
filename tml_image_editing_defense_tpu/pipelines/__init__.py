from tml_image_editing_defense_tpu.pipelines.img2img import (  # noqa: F401
    Img2ImgPipeline,
    Txt2ImgPipeline,
)
