from lightly_ocr_tpu.data.loader import (  # noqa: F401
    AlignCollate,
    DataLoader,
    RandomSequentialSampler,
    ShuffleSampler,
    align_collate,
)
from lightly_ocr_tpu.data.records import (  # noqa: F401
    RecordDataset,
    RecordWriter,
    open_dataset,
)
