from tvts_tpu.train.optim import OptimizerConfig, label_params, make_optimizer
from tvts_tpu.train.step import TrainState, create_train_state, make_eval_step, make_train_step
