from lightly_ocr_tpu.models.attention import Attention  # noqa: F401
from lightly_ocr_tpu.models.crnn import CRNNet, init_crnn  # noqa: F401
from lightly_ocr_tpu.models.lstm import BidirectionalLSTM, SeqModeling  # noqa: F401
from lightly_ocr_tpu.models.resnet import ResNet50v2  # noqa: F401
from lightly_ocr_tpu.models.tps import TPS_STN  # noqa: F401
from lightly_ocr_tpu.models.vgg_unet import VGG_UNet  # noqa: F401
