from nerfool_tpu.train.trainer import TrainConfig, Trainer, make_train_step
