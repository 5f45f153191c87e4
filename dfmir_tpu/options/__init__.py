from dfmir_tpu.options.base_options import BaseOptions
from dfmir_tpu.options.train_options import TrainOptions
from dfmir_tpu.options.test_options import TestOptions

__all__ = ["BaseOptions", "TrainOptions", "TestOptions"]
