from dfmir_tpu.engine.config import RegistrationConfig
from dfmir_tpu.engine.registration import RegistrationModel, TrainState, grid_image
from dfmir_tpu.engine.schedules import LRSchedule

__all__ = ["RegistrationConfig", "RegistrationModel", "TrainState",
           "LRSchedule", "grid_image"]
