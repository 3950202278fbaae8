from videoquery.train.trainer import TrainConfig, TSNTrainer, train_step

__all__ = ["TrainConfig", "TSNTrainer", "train_step"]
