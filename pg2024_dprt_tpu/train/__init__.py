from .datagen import generate_proxy_dataset
from .datasets import balance_vis, depth_only, split_train_test, shuffle
from .loop import TrainConfig, fit, train_proxy_for_partition
