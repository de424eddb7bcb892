from superdiff_tpu.training.state import TrainState, create_train_state
from superdiff_tpu.training.steps import make_train_step, make_eval_step

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step"]
