from .state import TrainState, create_train_state, make_optimizer, make_lr_schedule
from .checkpoint import save_checkpoint, load_checkpoint, resume, latest_step
