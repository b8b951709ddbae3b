from lightly_ocr_tpu.utils.metrics import (  # noqa: F401
    Averager,
    edit_distance,
    exact_match_accuracy,
    normalized_edit_distance,
)
