from podtpu.data.dataset import YoloTxtDataset, build_datasets  # noqa: F401
from podtpu.data.loader import Loader  # noqa: F401
