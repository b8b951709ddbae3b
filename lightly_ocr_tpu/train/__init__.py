from lightly_ocr_tpu.train.train_step import (  # noqa: F401
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
