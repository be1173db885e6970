from .train_step import (TrainState, make_t3_train_step, make_flow_train_step,
                         init_t3_train_state, init_flow_train_state)
