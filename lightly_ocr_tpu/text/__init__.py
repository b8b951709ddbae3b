from lightly_ocr_tpu.text.converters import (  # noqa: F401
    AttnLabelConverter,
    CTCLabelConverter,
    build_converter,
)
