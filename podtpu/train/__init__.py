from podtpu.train.optim import build_optimizer  # noqa: F401
from podtpu.train.schedule import build_schedule  # noqa: F401
from podtpu.train.state import TrainState, create_train_state  # noqa: F401
from podtpu.train.steps import make_eval_step, make_train_step  # noqa: F401
