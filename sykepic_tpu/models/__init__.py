from .resnet import ResNet, BasicBlock, Bottleneck  # noqa: F401
from .efficientnet import EfficientNet  # noqa: F401
from .mobilenet import MobileNetV3  # noqa: F401
from .registry import build_model, init_variables, MODEL_REGISTRY  # noqa: F401
from . import checkpoint, convert_torch  # noqa: F401
