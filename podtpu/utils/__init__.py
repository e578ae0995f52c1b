from podtpu.utils.summary import summarize  # noqa: F401
from podtpu.utils.viz import draw_boxes, load_names  # noqa: F401
