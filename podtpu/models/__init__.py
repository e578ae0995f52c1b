from podtpu.models.darknet import Darknet19, Darknet19Classifier  # noqa: F401
from podtpu.models.factory import build_model  # noqa: F401
from podtpu.models.layers import ConvBnAct, V4TinyBlock  # noqa: F401
from podtpu.models.yolov1 import YoloV1  # noqa: F401
from podtpu.models.yolov2 import YoloV2  # noqa: F401
from podtpu.models.yolov3 import YoloV3  # noqa: F401
from podtpu.models.yolov4_tiny import YoloV4Tiny  # noqa: F401
