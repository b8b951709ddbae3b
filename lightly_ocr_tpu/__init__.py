"""lightly-ocr-tpu: TPU-native receipt OCR framework (JAX/XLA/Pallas/pjit).

A ground-up rebuild of lightly-ocr's capabilities (CRAFT text detection +
CRNN text recognition + pipeline/server/training) designed for TPU:
jitted XLA programs, static shapes with bucketing/masking, on-device
pre/post-processing, and pjit data-parallel training over a device mesh.
"""

__version__ = "0.1.0"

from lightly_ocr_tpu.config import Config, load_config  # noqa: F401
