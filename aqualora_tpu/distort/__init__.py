from aqualora_tpu.distort.noiser import Noiser, distortion_unit  # noqa: F401
from aqualora_tpu.distort.jpeg import jpeg_compress  # noqa: F401
