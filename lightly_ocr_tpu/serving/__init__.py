from lightly_ocr_tpu.serving.server import create_app, run_server  # noqa: F401
